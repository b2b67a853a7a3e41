"""CDC apply tombstone discipline: a delete op persists as a tombstone in
state, so an out-of-order older upsert arriving in a LATER micro-batch
cannot resurrect the key (the property the gate query's single availableNow
batch cannot exercise)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from moosestack_spark.operators.streaming_ext import upsert_batch


def test_tombstone_outranks_late_upsert(spark):
    table_dir = tempfile.mkdtemp(prefix="cdc_test_")
    try:
        apply_batch = upsert_batch(table_dir, ["user_id"], ["ts", "event_id"])
        cols = ["event_id", "ts", "user_id", "event_type", "value"]
        b1 = spark.createDataFrame(
            [(10, 100, 1, "error", 0.0), (11, 100, 2, "click", 5.0)], cols
        )
        apply_batch(b1, 0)
        # older upsert for the deleted user 1; newer upsert for user 2
        b2 = spark.createDataFrame(
            [(5, 50, 1, "view", 1.0), (12, 200, 2, "purchase", 9.0)], cols
        )
        apply_batch(b2, 1)
        state = spark.read.parquet(os.path.join(table_dir, "current"))
        live = {
            r.user_id: r.event_type
            for r in state.filter(F.col("event_type") != "error").collect()
        }
        # user 1 stays deleted (tombstone won); user 2 took the newer op
        assert live == {2: "purchase"}
        tomb = state.filter(F.col("event_type") == "error").collect()
        assert [(r.user_id, r.event_id) for r in tomb] == [(1, 10)]
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
