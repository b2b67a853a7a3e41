"""Query/oracle registry backing __spark_entry__.py.

Each operator module registers its correctness-gate queries with::

    @query("q_name", oracle="SELECT ... ")
    def q_name(spark, sf_dir) -> DataFrame: ...

``oracle`` is the DuckDB-ANSI-SQL equivalent run side-by-side by the driver
(tables pre-registered as views).  Omit it only for genuinely
non-SQL-expressible ops (the driver then records a weaker rows-only check).

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in the Spark code and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def canon_arrays(df: DataFrame, *cols: str) -> DataFrame:
    """Serialize array-typed columns to deterministic ``[a,b,c]`` strings.

    Driver-canon contract: oracled gates must emit only scalar columns —
    the driver's canonicalizer sorts rows with pandas ``sort_values``,
    which raises on list cells.  Gates whose semantics are array-valued
    (the CH array/map dialect families, groupArray) serialize the arrays
    on both the Spark and oracle side; elements are cast to string first,
    so int/bigint/bool representations agree between engines.
    """
    from pyspark.sql import functions as F

    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.concat(
                F.lit("["),
                F.array_join(
                    F.expr(f"transform(`{c}`, v -> cast(v as string))"), ","
                ),
                F.lit("]"),
            ),
        )
    return out

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's CORRECTNESS run checks the first 50 registered queries per
# round.  Rounds 1-7 hard-verified 285 distinct queries (282 latest-green +
# 3 rows-only-by-design); the round-7 window cleared the whole round-6
# backlog.  The round-8 window leads with this round's NEW gates (a first
# driver hash on new code beats re-confirming stable queries), then the two
# gates whose expressions CHANGED this round (vocab_r7b's widened IPv6
# cases, knn_graph's quantized ranking), then the never-driver-sampled
# round-7 backlog in landing order.  The two that do not fit stay in
# _AFTER_WINDOW for round 9.
_WINDOW_PRIORITY = [
    # --- new round-8 gates ---
    "dedup_embedding_cosine_pruned_auto",
    "source_iceberg_multifield_read",
    "multimodal_ogg_metadata",
    "sql_ch_dialect_vocab_r8",
    "text_bm25_retrieval",
    "corpus_stratified_sample",
    "sql_ch_dialect_vocab_r8b",
    "text_keyword_topk",
    "source_iceberg_clustered_read",
    "corpus_export_report",
    "sql_ch_dialect_vocab_r8c",
    "window_nonnegative_derivative",
    "agg_proportions_ztest",
    # --- changed this round: first hash lands on the NEW expression ---
    "sql_ch_dialect_vocab_r7b",
    "similarity_knn_graph",
    # --- never-driver-sampled backlog (rounds 6-7), landing order ---
    "ts_ohlc_daily",
    "agg_quantile_timing_weighted",
    "graph_triangle_count",
    "agg_sparkbar_hours",
    "sql_ch_dialect_vocab_r6c_agg",
    "agg_sequence_match_timed",
    "sql_ch_dialect_numbers",
    "sql_ch_dialect_vocab_r6d",
    "join_interval_overlap",
    "join_fuzzy_blocked",
    "streaming_space_saving_topk",
    "source_iceberg_bucket_read",
    "source_delta_mapped_read",
    "agg_student_ttest",
    "agg_mean_z_test",
    "agg_kruskal_wallis",
    "agg_categorical_iv",
    "agg_sequence_next_node",
    "window_ntile_cume",
    "ts_ewma_smoothing",
    "ts_holt_linear",
    "ts_changepoint_cusum",
    "ts_anomaly_mad",
    "sql_ch_dialect_vocab_r7",
    "cluster_kmeans_embeddings",
    "embedding_random_projection",
    "graph_label_propagation",
    "table_scd2_build",
    "cohort_retention_matrix",
    "attribution_last_touch",
    "basket_pair_lift",
    "agg_gini_revenue",
    "agg_markov_transitions",
    "ts_autocorrelation",
    "ts_seasonal_decompose",
]

# The explicit rotation backlog, pinned to positions 51+: oracled queries
# without a recorded green row that did not fit this round's 50 slots.
# The registry-window meta-test enforces that ONLY names listed here may
# lack both a green row and a window slot.
_AFTER_WINDOW: list[str] = [
    "sql_ch_dialect_vocab_r7c",
    "streaming_scd2_apply",
    "join_nearest_event",
    "profile_psi_drift",
    "sql_ch_dialect_vocab_r7d",
    "funnel_time_to_convert",
    "text_ngram_diversity",
    "mv_incremental_join",
    "ts_seasonal_naive_skill",
    "cohort_churn_weekly",
    "dedup_containment",
    "attribution_linear",
]


def load_all() -> None:
    """Import every operator module (side effect: registration)."""
    from moosestack_spark.operators import (  # noqa: F401
        aggregates,
        aggregates_ext,
        aggregates_stats,
        analytics,
        analytics3,
        analytics_classics,
        bucketed,
        chsql_ext,
        chsql_geo,
        chsql_r7,
        chsql_r8,
        downsample,
        engines,
        filters,
        funnel,
        joins,
        map_aggs,
        mv,
        scalar_funcs,
        semantic,
        setops,
        skew,
        sortlimit,
        stats_tests,
        streaming_ext,
        streaming_ops,
        timeseries,
        windows,
    )
    from moosestack_spark.ops import (  # noqa: F401
        bpe,
        chunking,
        clustering,
        components,
        corpus,
        decontaminate,
        dedup,
        embedding,
        graph,
        layout,
        linedup,
        lm_score,
        mp3,
        multimodal,
        multimodal_ext,
        ogg,
        phash,
        profile,
        retrieval,
        similarity,
        sketches,
        text,
    )

    # Reorder the registry so the driver's 50-query correctness window covers
    # the queries that most need a hard row this round (see _WINDOW_PRIORITY).
    prioritized = [n for n in [*_WINDOW_PRIORITY, *_AFTER_WINDOW] if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    reordered = {n: QUERIES[n] for n in [*prioritized, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)
