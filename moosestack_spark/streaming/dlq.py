"""Dead-letter-queue envelope (SURVEY.md §2.8).

Port target: the DeadLetterModel of py-moose-lib/moose_lib/dmv2/stream.py:425-448
and the runner's failure wrapping ts-moose-lib/src/streaming-functions/
runner.ts:296-343:

    { original_record: JSON-string, error_message, error_type,
      failed_at: timestamp, source: 'api' | 'transform' | 'table' }

A DLQ is itself a stream/table and can be re-transformed for recovery
(stream.py:451 `as_typed()`).
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

DLQ_SCHEMA = StructType(
    [
        StructField("original_record", StringType(), False),
        StructField("error_message", StringType(), False),
        StructField("error_type", StringType(), False),
        StructField("failed_at", TimestampType(), False),
        StructField("source", StringType(), False),  # api | transform | table
    ]
)

DLQ_SOURCES = ("api", "transform", "table")
