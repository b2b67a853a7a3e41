"""Checkpoint-resume semantics: the exactly-once claim the streaming ops
rely on.  An availableNow run with a checkpoint must (a) not reprocess
already-committed files on restart, (b) pick up files added between runs
exactly once, and (c) resume a watermarked aggregation's state across
restarts rather than recomputing windows from scratch."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from moosestack_spark.tables import normalize_event_ts


def _run_passthrough(spark, src_dir, out_dir, ckpt, schema):
    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .select("event_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_exactly_once_across_restarts(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events).schema
    n_total = spark.read.parquet(events).count()

    src = tempfile.mkdtemp(prefix="msk_resume_src_")
    out = tempfile.mkdtemp(prefix="msk_resume_out_")
    ckpt = tempfile.mkdtemp(prefix="msk_resume_ckpt_")
    try:
        os.symlink(os.path.abspath(events), os.path.join(src, "a.parquet"))
        _run_passthrough(spark, src, out, ckpt, schema)
        assert spark.read.parquet(out).count() == n_total

        # restart with NO new input: nothing must be reprocessed
        _run_passthrough(spark, src, out, ckpt, schema)
        assert spark.read.parquet(out).count() == n_total

        # add a second file and restart: exactly the delta lands
        os.symlink(os.path.abspath(events), os.path.join(src, "b.parquet"))
        _run_passthrough(spark, src, out, ckpt, schema)
        assert spark.read.parquet(out).count() == 2 * n_total
        # per-key multiplicity is exactly 2 (once per file), never 3
        mult = (
            spark.read.parquet(out)
            .groupBy("event_id")
            .count()
            .agg(F.min("count").alias("lo"), F.max("count").alias("hi"))
            .collect()[0]
        )
        assert (mult.lo, mult.hi) == (2, 2)
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_windowed_agg_state_resumes(spark, sf_dir):
    """A watermarked tumbling-window aggregation writes each closed window
    once; feeding the same data again in a SECOND run against the same
    checkpoint must emit no duplicate window rows (dedup by state, not by
    luck)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events).schema

    src = tempfile.mkdtemp(prefix="msk_wagg_resume_src_")
    out = tempfile.mkdtemp(prefix="msk_wagg_resume_out_")
    ckpt = tempfile.mkdtemp(prefix="msk_wagg_resume_ckpt_")

    def run():
        stream = (
            normalize_event_ts(spark.readStream.schema(schema).parquet(src))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        os.symlink(os.path.abspath(events), os.path.join(src, "a.parquet"))
        run()
        first = spark.read.parquet(out).count()
        assert first > 0
        run()  # restart, no new data: no window may be re-emitted
        again = spark.read.parquet(out)
        assert again.count() == first
        assert again.groupBy("ws").count().filter("count > 1").count() == 0
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
