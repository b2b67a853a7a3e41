"""moosestack_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of 514-labs/moosestack.

The reference (studied at /root/reference/) is a code-first analytics framework
delegating OLAP execution to ClickHouse, streaming to Kafka, and orchestration
to Temporal.  This package re-expresses the same semantics Spark-first:

- typed data model (Pydantic -> StructType reflection)       datamodel/
- OlapTable on Parquet with MergeTree-engine read semantics  catalog/
- sql template tag + Query() builder + CH function map       sql/
- semantic query layer (dimensions/metrics/filters/having)   query_layer/
- streaming transforms + DLQ (Structured Streaming)          streaming/
- training-data pipeline ops (dedup, ANN, text analysis)     ops/
- the operator/query suite backing the correctness gate      operators/
"""

__version__ = "0.1.0"

from moosestack_spark.session import get_spark  # noqa: F401
