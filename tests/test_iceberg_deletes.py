"""Iceberg v2 row-level deletes through the native reader/writer.

Covers the spec's sequence-number application rules (position: >=,
equality: strict >), null-safe equality matching, time travel across
delete snapshots, and the data_files() refusal contract.
Reference: blocks.py:425-478 delegates Iceberg to ClickHouse; semantics
here follow the public Iceberg v2 table spec.
"""

import pytest
from pyspark.sql import functions as F

from moosestack_spark.catalog.iceberg_native import IcebergNativeTable


def _plant(spark, path, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"),
    )
    mode = "append" if lo else "overwrite"
    return IcebergNativeTable.write(df.repartition(3), path, mode=mode)


def test_position_delete_removes_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 100)
    n = table.delete_where("k % 10 = 7")
    assert n == 10
    got = sorted(r.k for r in table.read().collect())
    assert got == [k for k in range(100) if k % 10 != 7]


def test_position_delete_idempotent_restack(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 50)
    table.delete_where("k < 10")
    table.delete_where("k < 20")  # overlaps the first tombstone set
    got = sorted(r.k for r in table.read().collect())
    assert got == list(range(20, 50))


def test_position_delete_nothing_matched_no_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 10)
    before = len(table.snapshots())
    assert table.delete_where("k > 999") == 0
    assert len(table.snapshots()) == before
    assert table.read().count() == 10


def test_equality_delete_null_safe(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "k long, tag string"
    )
    table = IcebergNativeTable.write(df, path)
    table.delete_equality(
        spark.createDataFrame([(None,)], "tag string")
    )
    got = sorted(r.k for r in table.read().collect())
    assert got == [1, 3]  # both NULL-tag rows matched null-safely


def test_equality_delete_strict_sequence_rule(spark, tmp_path):
    """Rows appended AFTER an equality delete survive it (data_seq >
    delete_seq is not matched — the spec's strict < rule)."""
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 30)  # grp = k % 5
    table.delete_equality(spark.createDataFrame([(2,)], "grp long"))
    _plant(spark, path, 100, 110)  # appended later; includes grp==2 rows
    got = sorted(r.k for r in table.read().collect())
    expect = [k for k in range(30) if k % 5 != 2] + list(range(100, 110))
    assert got == expect


def test_position_delete_spans_earlier_and_equal_sequences(spark, tmp_path):
    """A position delete applies to data files with data_seq <= delete_seq
    — i.e. everything currently in the table, across both batches."""
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 20)
    _plant(spark, path, 20, 40)
    table.delete_where("k % 2 = 1")
    got = sorted(r.k for r in table.read().collect())
    assert got == [k for k in range(40) if k % 2 == 0]


def test_time_travel_reads_pre_delete_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 25)
    pre = table.current_snapshot_id()
    table.delete_where("k >= 20")
    assert table.read().count() == 20
    assert table.read(snapshot_id=pre).count() == 25


def test_data_files_refuses_delete_snapshots(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 10)
    assert len(table.data_files()) >= 1
    table.delete_where("k = 0")
    with pytest.raises(NotImplementedError, match="row-level delete"):
        table.data_files()


def test_equality_delete_unknown_column_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    table = _plant(spark, path, 0, 10)
    with pytest.raises(ValueError, match="not in table schema"):
        table.delete_equality(spark.createDataFrame([(1,)], "nope long"))


def test_mixed_deletes_partitioned_table(spark, tmp_path):
    """Deletes on an identity-partitioned table: delete manifests are not
    partition-pruned, and a pruned read still applies them."""
    path = str(tmp_path / "t")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
    )
    table = IcebergNativeTable.write(df, path, partition_by="p")
    table.delete_where("k % 4 = 1")
    table.delete_equality(spark.createDataFrame([(58,)], "k long"))
    got = sorted(
        r.k for r in table.read(partition_filter={"p": "1"}).collect()
    )
    expect = [
        k for k in range(60)
        if k % 3 == 1 and k % 4 != 1 and k != 58
    ]
    assert got == expect
