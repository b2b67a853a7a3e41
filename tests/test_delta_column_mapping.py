"""Delta column mapping (reader protocol 2 / the columnMapping feature):
data files carry physical column names; the reader maps them back to
logical names from the schemaString field metadata.  Tables are planted
by hand with protocol-shaped logs (the repo's codec-oracle policy)."""

import json
import os

from pyspark.sql import functions as F

from moosestack_spark.catalog.delta_native import DeltaNativeTable


def _plant_mapped(spark, path, partitioned=False):
    """Physical names col-aaa / col-bbb (+ col-ppp partition) mapped to
    logical k / v (+ p)."""
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
    df = spark.range(0, 50).select(
        F.col("id").alias("col-aaa"),
        (F.col("id") * 2).alias("col-bbb"),
        (F.col("id") % 3).cast("string").alias("col-ppp"),
    )
    adds = []
    if partitioned:
        for pv in ("0", "1", "2"):
            rel = f"col-ppp={pv}/part0"
            df.filter(F.col("`col-ppp`") == pv).drop("col-ppp").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(path, rel))
            for f in sorted(os.listdir(os.path.join(path, rel))):
                if f.endswith(".parquet"):
                    adds.append(
                        {"add": {"path": f"{rel}/{f}",
                                 "partitionValues": {"col-ppp": pv},
                                 "size": 1, "modificationTime": 0,
                                 "dataChange": True}}
                    )
    else:
        df.drop("col-ppp").coalesce(2).write.mode("overwrite").parquet(
            os.path.join(path, "b0")
        )
        for f in sorted(os.listdir(os.path.join(path, "b0"))):
            if f.endswith(".parquet"):
                adds.append(
                    {"add": {"path": f"b0/{f}", "partitionValues": {},
                             "size": 1, "modificationTime": 0,
                             "dataChange": True}}
                )
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-aaa",
                      "delta.columnMapping.id": 1}},
        {"name": "v", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-bbb",
                      "delta.columnMapping.id": 2}},
    ]
    part_cols = []
    if partitioned:
        fields.append(
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-ppp",
                          "delta.columnMapping.id": 3}}
        )
        part_cols = ["p"]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "mapped", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": part_cols,
            "configuration": {"delta.columnMapping.mode": "name"},
        }},
        *adds,
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return DeltaNativeTable(spark, path)


def test_mapped_read_renames_physical_columns(spark, tmp_path):
    table = _plant_mapped(spark, str(tmp_path / "t"))
    got = table.read()
    assert sorted(got.columns) == ["k", "v"]
    rows = {(r.k, r.v) for r in got.collect()}
    assert rows == {(i, 2 * i) for i in range(50)}


def test_mapped_partitioned_prune_on_logical_name(spark, tmp_path):
    table = _plant_mapped(spark, str(tmp_path / "t"), partitioned=True)
    got = table.read(partition_filter={"p": "1"})
    assert sorted(got.columns) == ["k", "p", "v"]
    ks = sorted(r.k for r in got.collect())
    assert ks == [i for i in range(50) if i % 3 == 1]


def test_mapped_delete_where_on_logical_name(spark, tmp_path):
    table = _plant_mapped(spark, str(tmp_path / "t"))
    n = table.delete_where("k % 10 = 4")
    assert n == 5
    ks = sorted(r.k for r in table.read().collect())
    assert ks == [i for i in range(50) if i % 10 != 4]


def test_unknown_mapping_mode_refuses(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    table = _plant_mapped(spark, path)
    log0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log0)]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "weird"
    with open(log0, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="weird"):
        table.read()


def test_mapped_compact_and_vacuum_roundtrip(spark, tmp_path):
    """compact() on a mapped table must rewrite files with PHYSICAL names
    (logical names in fresh files would break the next read's mapping)."""
    table = _plant_mapped(spark, str(tmp_path / "t"))
    table.delete_where("k % 10 = 4")
    table.compact(target_partitions=1)
    got = table.read()
    assert sorted(got.columns) == ["k", "v"]
    ks = sorted(r.k for r in got.collect())
    assert ks == [i for i in range(50) if i % 10 != 4]
    table.vacuum(keep_last=1)
    assert sorted(r.k for r in table.read().collect()) == ks


def test_mapped_table_survives_struct_checkpoint(spark, tmp_path):
    """The typed-struct checkpoint must carry configuration (mapping mode)
    and field metadata through schemaString."""
    table = _plant_mapped(spark, str(tmp_path / "t"))
    table.write_checkpoint()
    got = table.read()
    assert sorted(got.columns) == ["k", "v"]
    assert got.count() == 50
