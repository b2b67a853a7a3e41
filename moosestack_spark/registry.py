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
# round.  Rounds 1-3 hard-verified 137 distinct queries; the round-4 window
# below rotates onto 50 of the 79 oracled queries that have never received a
# driver row (mostly rounds-4/5 continuous-build additions: the remaining
# TPC-H shapes, the stats-test aggregate family, streaming_ext, and the
# corpus/dedup graph ops).  Queries that don't fit the 50 slots queue in
# _AFTER_WINDOW for the next rotation.
_WINDOW_PRIORITY = [
    # --- TPC-H Q2/Q4/Q9/Q11/Q12/Q13/Q15/Q17/Q19/Q20/Q21 shapes ---
    "analytics_min_cost_supplier",
    "analytics_priority_exists",
    "analytics_nation_profit",
    "analytics_important_parts",
    "analytics_priority_class",
    "analytics_customer_distribution",
    "analytics_top_supplier",
    "analytics_small_quantity_revenue",
    "analytics_disjunctive_predicates",
    "analytics_excess_suppliers",
    "analytics_waiting_suppliers",
    # --- corpus / dedup graph ops ---
    "dedup_connected_components",
    "corpus_curation_pipeline",
    "corpus_temperature_sample",
    "corpus_quality_ensemble",
    "dedup_cross_doc_lines",
    "dedup_cross_doc_lines_clean",
    "dedup_incremental_exact",
    "dedup_image_dhash_pairs",
    "multimodal_image_dhash",
    # --- streaming_ext ---
    "streaming_cdc_apply",
    "streaming_enrich_static",
    "streaming_hll_distinct",
    "streaming_stream_join_outer",
    "streaming_window_topk",
    # --- statistical-test + exact-moment aggregate family ---
    "agg_welch_ttest",
    "agg_mann_whitney_u",
    "agg_ks_test",
    "agg_cramers_v",
    "agg_theils_u",
    "agg_spearman_corr",
    "agg_bounding_ratio",
    "agg_entropy",
    "agg_covar_kurt",
    "agg_interval_length_sum",
    "agg_max_intersections",
    "agg_group_array_sorted",
    "agg_moments_exact",
    "agg_sequence_count",
    "agg_hll_deterministic",
    "agg_if_combinators",
    "agg_array_combinators",
    "agg_linreg_exact",
    "agg_unpivot_stack",
    "agg_with_totals",
    "agg_group_uniq_array",
    "agg_bitmap_cardinalities",
    "funnel_strict_order",
    "ts_gap_fill_interpolate",
    "text_readability",
]

# The explicit rotation backlog, pinned to positions 51+: oracled queries
# without a recorded green row that did not fit this round's 50 slots — the
# 29 remaining never-sampled queries (the construction-based CH-dialect
# families plus text/window/join/source shapes, every one exact-match green
# in the local sf0.01 oracle pytest suite each round), first into next
# round's window.  New round-4 queries are appended as they land.  The
# registry-window meta-test enforces that ONLY names listed here may lack
# both a green row and a window slot.
_AFTER_WINDOW = [
    "text_hashed_classifier",
    "text_unigram_logprob",
    "text_chunk_overlap",
    "text_domain_cap",
    "text_pack_sequences",
    "sessionize_batch",
    "window_moving_avg",
    "window_nth_value",
    "window_last_value_ignore_nulls",
    "sort_distinct_on",
    "sort_limit_by_offset",
    "join_asof_tolerance",
    "join_dict_get",
    "join_paste_positional",
    "source_orc_partitioned_roundtrip",
    "source_schema_evolution_defaults",
    "sql_ch_dialect_array_join_clause",
    "sql_ch_dialect_arrays",
    "sql_ch_dialect_arrays2",
    "sql_ch_dialect_bits_misc",
    "sql_ch_dialect_datetime64",
    "sql_ch_dialect_encoding",
    "sql_ch_dialect_geo",
    "sql_ch_dialect_intervals",
    "sql_ch_dialect_maps_format",
    "sql_ch_dialect_rounding",
    "sql_ch_dialect_search",
    "sql_ch_dialect_url",
    "sql_ch_dialect_vectors",
    # --- new round-4 queries (appended as they land) ---
    "dedup_connected_components_star",
    "sample_hash_mod",
    "dedup_semantic_cluster",
    "similarity_lsh_bucketed",
    "similarity_pq_topk",
    "scalar_json_typed_paths",
    "analytics_forecast_revenue",
    "corpus_dsir_weights",
    "text_dup_ngram_fraction",
    "multimodal_exif_metadata",
    "table_time_travel",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "agg_lttb_downsample",
]


def load_all() -> None:
    """Import every operator module (side effect: registration)."""
    from moosestack_spark.operators import (  # noqa: F401
        aggregates,
        aggregates_ext,
        aggregates_stats,
        analytics,
        analytics3,
        bucketed,
        chsql_ext,
        chsql_geo,
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
        streaming_ext,
        streaming_ops,
        windows,
    )
    from moosestack_spark.ops import (  # noqa: F401
        bpe,
        chunking,
        components,
        corpus,
        decontaminate,
        dedup,
        embedding,
        linedup,
        lm_score,
        multimodal,
        multimodal_ext,
        phash,
        similarity,
        text,
    )

    # Reorder the registry so the driver's 50-query correctness window covers
    # the queries that most need a hard row this round (see _WINDOW_PRIORITY).
    prioritized = [n for n in [*_WINDOW_PRIORITY, *_AFTER_WINDOW] if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    reordered = {n: QUERIES[n] for n in [*prioritized, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)
