"""Delta Lake deletion vectors through the native reader/writer.

Covers the PROTOCOL.md DV shapes: file-backed "u" descriptors written by
delete_where, inline "i" descriptors (padded z85, sizeInBytes truncation),
descriptor REPLACE semantics on stacked deletes, time travel across delete
commits, checkpoint replay with DV adds, and the protocol gate (reader
features beyond deletionVectors still refuse).  Codec: catalog/roaring.py.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from moosestack_spark.catalog.delta_native import DeltaNativeTable
from moosestack_spark.catalog.roaring import (
    bitmap_array_encode,
    z85_encode,
)


def _plant(spark, path, n=100, partition_by=None):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("p"),
    )
    return DeltaNativeTable.write(
        df.repartition(3), path, partition_by=partition_by
    )


def test_delete_where_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 100)
    n = table.delete_where("k % 10 = 7")
    assert n == 10
    got = sorted(r.k for r in table.read().collect())
    assert got == [k for k in range(100) if k % 10 != 7]


def test_stacked_deletes_replace_descriptor(spark, tmp_path):
    """A second delete's DV must contain the union (descriptor replaces)."""
    path = str(tmp_path / "t")
    table = _plant(spark, path, 60)
    table.delete_where("k < 10")
    table.delete_where("k >= 50")
    got = sorted(r.k for r in table.read().collect())
    assert got == list(range(10, 50))


def test_time_travel_before_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 40)
    pre = table.latest_version()
    table.delete_where("k % 2 = 0")
    assert table.read().count() == 20
    assert table.read(version=pre).count() == 40


def test_delete_on_partitioned_table_with_pruned_read(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 80, partition_by="p")
    table.delete_where("k % 5 = 2")
    got = sorted(r.k for r in table.read(partition_filter={"p": "1"}).collect())
    assert got == [k for k in range(80) if k % 4 == 1 and k % 5 != 2]


def test_checkpoint_replays_dv_adds(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 50)
    table.delete_where("k >= 40")
    table.write_checkpoint()
    # delete the JSON prefix the checkpoint should make redundant
    got = sorted(r.k for r in table.read().collect())
    assert got == list(range(40))


def test_inline_dv_descriptor(spark, tmp_path):
    """Hand-commit an inline ("i") DV: unframed bitmap bytes, z85 padded to
    4-byte alignment, sizeInBytes restoring the exact length."""
    path = str(tmp_path / "t")
    table = _plant(spark, path, 30)
    meta, files = table.snapshot()
    rel = sorted(files)[0]
    first_file_rows = (
        spark.read.parquet(os.path.join(path, rel)).count()
    )
    assert first_file_rows >= 3
    data = bitmap_array_encode([0, 2])  # drop rows 0 and 2 of that file
    padded = data + b"\x00" * (-len(data) % 4)
    add = dict(files[rel])
    add["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "offset": 0,
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    add["dataChange"] = True
    version = table.latest_version() + 1
    with open(
        os.path.join(table.log_dir, f"{version:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"remove": {"path": rel, "dataChange": True}}) + "\n")
        fh.write(json.dumps({"add": add}) + "\n")
    assert table.read().count() == 30 - 2


def test_unknown_reader_feature_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 10)
    version = table.latest_version() + 1
    with open(
        os.path.join(table.log_dir, f"{version:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "v2Checkpoint"],
            "writerFeatures": []}}) + "\n")
        fh.write(json.dumps({"commitInfo": {"operation": "UPGRADE"}}) + "\n")
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        table.read()


def test_delete_cap_refuses_unbounded_collect(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 50)
    monkeypatch.setattr(DeltaNativeTable, "DELETE_POSITIONS_CAP", 10)
    with pytest.raises(ValueError, match="cap 10"):
        table.delete_where("k < 20")


def test_delete_nothing_matched_commits_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 10)
    before = table.latest_version()
    assert table.delete_where("k > 999") == 0
    assert table.latest_version() == before


# ---- roaring codec property sweep ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @given(
        st.sets(st.integers(min_value=0, max_value=1 << 20), max_size=600)
        | st.sets(
            st.integers(min_value=0, max_value=(1 << 33)), max_size=60
        )
    )
    @settings(max_examples=80, deadline=None)
    def test_roaring_bitmap_array_roundtrip(values):
        from moosestack_spark.catalog.roaring import (
            bitmap_array_decode,
            bitmap_array_encode,
        )

        assert bitmap_array_decode(bitmap_array_encode(values)) == sorted(
            values
        )

    @given(st.binary(min_size=0, max_size=256).map(lambda b: b + b"\x00" * (-len(b) % 4)))
    @settings(max_examples=60, deadline=None)
    def test_z85_roundtrip(data):
        from moosestack_spark.catalog.roaring import z85_decode, z85_encode

        assert z85_decode(z85_encode(data)) == data

    @given(
        st.integers(min_value=0, max_value=65535),
        st.integers(min_value=0, max_value=5000),
    )
    @settings(max_examples=30, deadline=None)
    def test_roaring_dense_container_boundary(start, span):
        """Cardinalities straddling the 4096 array/bitmap container rule."""
        from moosestack_spark.catalog.roaring import (
            roaring32_decode,
            roaring32_encode,
        )

        vals = set(range(start, min(start + span, 65536)))
        assert roaring32_decode(roaring32_encode(vals)) == sorted(vals)
