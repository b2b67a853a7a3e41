"""Streaming gate queries (SURVEY.md §2.8, FIXTURES.md "Streaming").

events replayed as a bounded Structured-Streaming job through a Stream with
a ZeroOrMany transform; results land in parquet sinks and must equal the
batch-transformed oracle.  Poison records (k out of range — the ingest
validation failure of local_webserver.rs:1601-1620) land in the DLQ with the
reference envelope.

The transform under test (expression flavor — JVM-side):
  - k = JSONExtractInt(props, 'k'); k is NULL or k >= 90  -> DLQ (poison)
  - event_type = 'error'                                  -> dropped (Zero)
  - event_type = 'purchase'                               -> split into two
    half-value records (Many)
  - otherwise                                             -> identity (One)
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.streaming.runner import run_file_stream
from moosestack_spark.streaming.stream import ExpressionTransform, Stream
from moosestack_spark.tables import t

def _poison():
    # Column exprs need an active session — built lazily per query run.
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return k.isNull() | (k >= 90)


def _zero_or_many(df: DataFrame) -> DataFrame:
    half = (F.col("value").cast("decimal(25,4)") / 2).cast("double")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        df.filter(F.col("event_type") != "error")  # Zero
        .withColumn(
            "__copies",
            F.when(
                F.col("event_type") == "purchase",
                F.array(half, half),  # Many: two half-value rows
            ).otherwise(F.array(F.col("value"))),  # One
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.explode("__copies").alias("value"),
            k.alias("k"),
        )
    )


def _transform() -> ExpressionTransform:
    return ExpressionTransform(
        apply=_zero_or_many,
        poison_when=_poison(),
        error_message="k out of range [0, 90)",
        error_type="ValidationError",
    )

_ORACLE_TRANSFORMED = """
SELECT event_id, user_id, event_type, value, k FROM (
  SELECT
    event_id, user_id, event_type,
    CAST(CAST(value AS DECIMAL(25,4)) / 2 AS DOUBLE) AS value,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events, (SELECT 1 UNION ALL SELECT 2)
  WHERE event_type = 'purchase'
    AND CAST(json_extract_string(props, '$.k') AS BIGINT) < 90
  UNION ALL
  SELECT
    event_id, user_id, event_type, value,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE event_type NOT IN ('error', 'purchase')
    AND CAST(json_extract_string(props, '$.k') AS BIGINT) < 90
)
"""


@query("streaming_zero_or_many_transform", oracle=_ORACLE_TRANSFORMED)
def streaming_zero_or_many_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events.parquet as a stream -> transform -> parquet sink; read
    the sink back.  Exactly-once to the sink via checkpoint."""
    # raw parquet schema (ts as nanos-long) — the file stream must read
    # the file as stored; the transform does not use ts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = Stream(name="events").add_transform("processed", _transform())
    out_dir = tempfile.mkdtemp(prefix="msk_stream_out_")
    try:
        paths = run_file_stream(
            spark,
            source_path=f"{sf_dir}/events.parquet",
            source_schema=events_schema,
            stream=stream,
            out_dir=out_dir,
        )
        return spark.read.parquet(paths["processed"]).localCheckpoint()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@query(
    "streaming_dlq_envelope",
    oracle="""
SELECT
  props AS original_record_payload,
  'k out of range [0, 90)' AS error_message,
  'ValidationError' AS error_type,
  'transform' AS source
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
   OR json_extract_string(props, '$.k') IS NULL
""",
)
def streaming_dlq_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison rows land in the DLQ with the DeadLetterModel envelope
    (stream.py:425-448).  failed_at is wall-clock and original_record is the
    full-record JSON; for the deterministic gate we surface the offending
    payload extracted from the envelope plus the static fields."""
    # raw parquet schema (ts as nanos-long) — the file stream must read
    # the file as stored; the transform does not use ts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = Stream(name="events").add_transform("processed", _transform())
    out_dir = tempfile.mkdtemp(prefix="msk_dlq_out_")
    try:
        paths = run_file_stream(
            spark,
            source_path=f"{sf_dir}/events.parquet",
            source_schema=events_schema,
            stream=stream,
            out_dir=out_dir,
        )
        dlq = spark.read.parquet(paths["processed__dlq"])
        return dlq.select(
            F.get_json_object(F.col("original_record"), "$.props").alias(
                "original_record_payload"
            ),
            "error_message",
            "error_type",
            "source",
        ).localCheckpoint()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
