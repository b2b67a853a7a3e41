"""Lake-format maintenance: compact (delete-materializing OPTIMIZE) and
snapshot expiry / vacuum for the native Iceberg and Delta layers."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from moosestack_spark.catalog.delta_native import DeltaNativeTable
from moosestack_spark.catalog.iceberg_native import IcebergNativeTable


def _df(spark, n=80):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
    )


def _expected(n=80):
    return [k for k in range(n) if k % 7 != 2 and k % 5 != 3]


def _apply_deletes_iceberg(table, spark):
    table.delete_where("k % 7 = 2")
    table.delete_equality(
        table.spark.createDataFrame(
            [(k,) for k in range(80) if k % 5 == 3], "k long"
        )
    )


def test_iceberg_compact_materializes_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    table = IcebergNativeTable.write(_df(spark).repartition(5), path)
    _apply_deletes_iceberg(table, spark)
    pre = sorted(r.k for r in table.read().collect())
    pre_snap = table.current_snapshot_id()
    table.compact(target_partitions=2)
    post = sorted(r.k for r in table.read().collect())
    assert post == pre == _expected()
    # compacted snapshot consults no delete files: data_files() (which
    # refuses delete-bearing snapshots) works again and is smaller
    assert 1 <= len(table.data_files()) <= 2
    # prior snapshot still time-travelable (raw rows, pre-delete)
    assert table.read(snapshot_id=pre_snap).count() == len(_expected())


def test_iceberg_expire_snapshots_removes_orphans(spark, tmp_path):
    path = str(tmp_path / "t")
    table = IcebergNativeTable.write(_df(spark).repartition(5), path)
    _apply_deletes_iceberg(table, spark)
    old_snap = table.current_snapshot_id()
    table.compact()
    n_parquet_before = len(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True)
    )
    dropped, deleted = table.expire_snapshots(keep_last=1)
    assert dropped >= 2 and deleted >= 1
    # current read unaffected; expired snapshot gone
    assert sorted(r.k for r in table.read().collect()) == _expected()
    with pytest.raises(ValueError, match="snapshot"):
        table.read(snapshot_id=old_snap)
    n_parquet_after = len(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True)
    )
    assert n_parquet_after < n_parquet_before


def test_iceberg_expire_keeps_current(spark, tmp_path):
    path = str(tmp_path / "t")
    table = IcebergNativeTable.write(_df(spark), path)
    assert table.expire_snapshots(keep_last=5) == (0, 0)


def test_iceberg_compact_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    table = IcebergNativeTable.write(_df(spark), path, partition_by="p")
    table.delete_where("k % 7 = 2")
    pre = sorted(r.k for r in table.read(partition_filter={"p": "1"}).collect())
    table.compact()
    post = sorted(r.k for r in table.read(partition_filter={"p": "1"}).collect())
    assert post == pre == [k for k in range(80) if k % 3 == 1 and k % 7 != 2]


def test_delta_compact_materializes_dvs(spark, tmp_path):
    path = str(tmp_path / "t")
    table = DeltaNativeTable.write(_df(spark).repartition(5), path)
    table.delete_where("k % 7 = 2")
    pre = sorted(r.k for r in table.read().collect())
    v = table.compact(target_partitions=2)
    post = sorted(r.k for r in table.read().collect())
    assert post == pre == [k for k in range(80) if k % 7 != 2]
    _, files = table.snapshot()
    assert 1 <= len(files) <= 2
    assert not any(a.get("deletionVector") for a in files.values())
    # pre-compact version still time-travelable
    assert table.read(version=v - 1).count() == len(pre)


def test_delta_vacuum_removes_unreferenced(spark, tmp_path):
    path = str(tmp_path / "t")
    table = DeltaNativeTable.write(_df(spark).repartition(5), path)
    table.delete_where("k % 7 = 2")
    pre_delete_version = 1
    table.compact()
    removed = table.vacuum(keep_last=1)
    assert removed >= 1
    # DV file of the superseded version is gone too
    assert not glob.glob(os.path.join(path, "deletion_vector_*.bin"))
    assert sorted(r.k for r in table.read().collect()) == [
        k for k in range(80) if k % 7 != 2
    ]
    # time travel to a vacuumed version now fails at scan time
    with pytest.raises(Exception):
        table.read(version=pre_delete_version).collect()


def test_delta_vacuum_keeps_referenced_dvs(spark, tmp_path):
    """vacuum(keep_last) where the kept version still carries DVs must NOT
    delete the DV file."""
    path = str(tmp_path / "t")
    table = DeltaNativeTable.write(_df(spark), path)
    table.delete_where("k % 7 = 2")
    table.vacuum(keep_last=1)
    assert glob.glob(os.path.join(path, "deletion_vector_*.bin"))
    assert sorted(r.k for r in table.read().collect()) == [
        k for k in range(80) if k % 7 != 2
    ]
