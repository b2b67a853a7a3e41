"""Testdata schema contract.

The driver regenerated events.parquet between rounds 1 and 2, silently
changing ts from TIMESTAMP(NANOS) (read as int64 via the nanosAsLong legacy
conf) to timestamp[us] — which broke three streaming queries at the
correctness gate instead of at test time.  This test pins the dtypes of
every driver table so any future drift fails loudly here first.

`ts` is special-cased: both layouts the driver has ever shipped are
accepted, because tables.normalize_event_ts handles either.  Everything
else must match the manifest exactly.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# (table, column) -> allowed pyarrow type strings
MANIFEST: dict[str, list[tuple[str, tuple[str, ...]]]] = {
    "region": [("r_regionkey", ("int32",)), ("r_name", ("string", "large_string"))],
    "nation": [
        ("n_nationkey", ("int32",)),
        ("n_name", ("string", "large_string")),
        ("n_regionkey", ("int32",)),
    ],
    "customer": [
        ("c_custkey", ("int64",)),
        ("c_name", ("string", "large_string")),
        ("c_nationkey", ("int32",)),
        ("c_acctbal", ("double",)),
        ("c_mktsegment", ("string", "large_string")),
    ],
    "supplier": [
        ("s_suppkey", ("int64",)),
        ("s_name", ("string", "large_string")),
        ("s_nationkey", ("int32",)),
        ("s_acctbal", ("double",)),
    ],
    "part": [
        ("p_partkey", ("int64",)),
        ("p_name", ("string", "large_string")),
        ("p_brand", ("string", "large_string")),
        ("p_type", ("string", "large_string")),
        ("p_size", ("int32",)),
        ("p_retailprice", ("double",)),
    ],
    "orders": [
        ("o_orderkey", ("int64",)),
        ("o_custkey", ("int64",)),
        ("o_orderstatus", ("string", "large_string")),
        ("o_totalprice", ("double",)),
        ("o_orderdate", ("timestamp[us]", "timestamp[ns]")),
        ("o_orderpriority", ("string", "large_string")),
    ],
    "lineitem": [
        ("l_orderkey", ("int64",)),
        ("l_partkey", ("int64",)),
        ("l_suppkey", ("int64",)),
        ("l_linenumber", ("int32",)),
        ("l_quantity", ("double",)),
        ("l_extendedprice", ("double",)),
        ("l_discount", ("double",)),
        ("l_tax", ("double",)),
        ("l_returnflag", ("string", "large_string")),
        ("l_linestatus", ("string", "large_string")),
        ("l_shipdate", ("timestamp[us]", "timestamp[ns]")),
    ],
    "events": [
        ("event_id", ("int64",)),
        # both layouts the driver has shipped; normalize_event_ts handles each
        ("ts", ("timestamp[us]", "timestamp[ns]", "int64")),
        ("user_id", ("int64",)),
        ("event_type", ("string", "large_string")),
        ("value", ("double",)),
        ("props", ("string", "large_string")),
    ],
    "documents": [
        ("doc_id", ("int64",)),
        ("text", ("string", "large_string")),
        ("lang", ("string", "large_string")),
        ("source", ("string", "large_string")),
        ("n_chars", ("int64",)),
    ],
    "embeddings": [
        ("vec_id", ("int64",)),
        ("embedding", ("list<element: float>", "list<item: float>")),
        ("label", ("int32",)),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(MANIFEST))
def test_table_schema_matches_manifest(sf_dir: str, table: str) -> None:
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    expected = MANIFEST[table]
    actual = [(f.name, str(f.type)) for f in schema]
    assert [n for n, _ in actual] == [n for n, _ in expected], (
        f"{table} column set/order drifted: {actual}"
    )
    for (name, allowed), (_, got) in zip(expected, actual):
        assert got in allowed, (
            f"{table}.{name} dtype drifted to {got!r} (allowed: {allowed}); "
            "if the driver regenerated testdata, audit every reader of this "
            "column (see tables.normalize_event_ts for the events.ts case)"
        )
