"""Native Delta Lake layer: log replay, pruning, overwrite/append,
time travel, checkpoints, honest protocol boundaries."""

from __future__ import annotations

import json
import os

import pytest

from moosestack_spark.catalog.delta_native import DeltaNativeTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS p", "CAST(id * 1.5 AS DOUBLE) AS val"
    )


@pytest.fixture()
def table(spark, tmp_path):
    return DeltaNativeTable.write(
        _df(spark, 0, 90), str(tmp_path / "tbl"), partition_by="p"
    )


def test_read_matches_source_and_reconstructs_partition_col(table, spark):
    got = {(r.id, r.p, r.val) for r in table.read().collect()}
    want = {(r.id, r.p, r.val) for r in _df(spark, 0, 90).collect()}
    assert got == want  # incl. the p column, absent from the data files


def test_partition_pruning_prunes_before_open(table):
    meta, files = table.snapshot()
    assert meta["partitionColumns"] == ["p"]
    pruned = table.read(partition_filter={"p": "2"})
    assert pruned.count() == 30
    assert {r.p for r in pruned.select("p").distinct().collect()} == {"2"}
    with pytest.raises(ValueError, match="not a partition column"):
        table.read(partition_filter={"val": "1"})


def test_append_and_time_travel(table, spark):
    t2 = DeltaNativeTable.write(
        _df(spark, 90, 120), table.path, partition_by="p", mode="append"
    )
    assert t2.read().count() == 120
    assert t2.read(version=0).count() == 90
    assert t2.versions() == [0, 1]


def test_overwrite_emits_removes(table, spark):
    t2 = DeltaNativeTable.write(
        _df(spark, 0, 10), table.path, partition_by="p", mode="overwrite"
    )
    assert t2.read().count() == 10
    assert t2.read(version=0).count() == 90  # history intact
    # the v1 commit carries remove actions for every v0 file
    actions = t2._actions(1)
    assert sum(1 for a in actions if "remove" in a) > 0


def test_checkpoint_replay_equivalence(table, spark):
    DeltaNativeTable.write(
        _df(spark, 90, 110), table.path, partition_by="p", mode="append"
    )
    table.write_checkpoint()
    t3 = DeltaNativeTable.write(
        _df(spark, 110, 125), table.path, partition_by="p", mode="append"
    )
    # checkpoint + JSON tail must equal a pure JSON replay
    assert t3.read().count() == 125
    ckpt = [f for f in os.listdir(t3.log_dir) if f.endswith(".checkpoint.parquet")]
    assert ckpt, "checkpoint file missing"


def test_newer_reader_protocol_raises(table):
    log0 = os.path.join(table.log_dir, f"{0:020d}.json")
    lines = open(log0).read().strip().split("\n")
    out = []
    for line in lines:
        a = json.loads(line)
        if "protocol" in a:
            a["protocol"]["minReaderVersion"] = 3  # deletion vectors era
        out.append(json.dumps(a))
    open(log0, "w").write("\n".join(out) + "\n")
    with pytest.raises(NotImplementedError, match="protocol"):
        table.read()


def test_unknown_version_raises(table):
    with pytest.raises(ValueError, match="version"):
        table.read(version=7)


def test_data_filter_pushes_into_parquet_scan(table):
    """The native reader hands Spark plain parquet files, so Catalyst's
    predicate pushdown must reach the scan (PushedFilters) — the reader
    adds no opaque layer in between."""
    df = table.read().filter("id > 50")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]


def test_delta_clustered_write_narrows_file_stats(spark, tmp_path):
    """cluster_by parity with the Iceberg writer: stat-tight files on both
    clustered columns, identical contents, loud refusal with partition_by."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from moosestack_spark.catalog.delta_native import DeltaNativeTable

    df = spark.range(20000).selectExpr(
        "pmod(id * 2654435761, 4096) AS x",
        "pmod(id * 40503, 4096) AS y",
        "id AS v",
    )
    plain = DeltaNativeTable.write(df.repartition(8), str(tmp_path / "p"))
    clus = DeltaNativeTable.write(
        df, str(tmp_path / "c"), cluster_by=("x", "y"), cluster_files=8
    )

    def mean_span(table, root, col):
        spans = []
        _, live = table.snapshot()
        for rel in live:
            md = pq.read_metadata(f"{root}/{rel}")
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    assert mean_span(clus, str(tmp_path / "c"), "x") < mean_span(
        plain, str(tmp_path / "p"), "x") / 2
    assert mean_span(clus, str(tmp_path / "c"), "y") < mean_span(
        plain, str(tmp_path / "p"), "y") / 2
    got = clus.read().selectExpr("CAST(SUM(v) AS BIGINT)").collect()[0][0]
    assert got == sum(range(20000))
    with _pytest.raises(ValueError, match="unpartitioned"):
        DeltaNativeTable.write(
            df, str(tmp_path / "bad"), partition_by="x", cluster_by=("x", "y")
        )
