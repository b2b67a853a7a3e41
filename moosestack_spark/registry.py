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
# round.  Current window: every query without a recorded green driver row,
# newest work first (the driver's round counter restarted at r3, so the
# rounds-3/4 work below has never been gate-checked), then the r2-pending
# trio + the r2-ERR'd streaming trio.  Queries that don't fit the 50 slots
# queue in _AFTER_WINDOW for the next rotation.
_WINDOW_PRIORITY = [
    # --- new round-4 queries ---
    "analytics_volume_shipping",
    "analytics_market_share",
    "analytics_returned_items",
    "analytics_promo_revenue",
    "analytics_large_orders",
    "analytics_supplier_variety",
    "analytics_idle_customers",
    "agg_sum_map",
    "agg_min_max_map",
    "streaming_hopping_agg",
    "streaming_upsert_latest",
    "corpus_mix_weights",
    "text_bigram_rarity",
    "text_keywords_tfdf",
    "text_top_ngrams",
    "dedup_semantic_cluster",
    "multimodal_resize_features",
    "multimodal_audio_frames",
    "agg_delta_sum",
    "agg_bit_ops",
    "agg_pivot_event_counts",
    "agg_corr_exact",
    "ts_gap_fill_hourly",
    "sort_limit_by_group",
    "agg_histogram_fixed",
    # --- round-3 queries (r3 correctness artifact never landed — re-check) ---
    "multimodal_jpeg_features",
    "multimodal_png_features",
    "streaming_stream_join",
    "similarity_quantized_topk",
    "sample_stratified",
    "text_bpe_train",
    "text_bpe_tokenize",
    "multimodal_mp4_metadata",
    "multimodal_mulaw_audio",
    "multimodal_gif_features",
    "source_csv_jsonl_roundtrip",
    "sql_ch_dialect_extended",
    "embedding_pca_project",
    "dedup_substring_runs",
    "agg_uniq_up_to",
    "agg_quantile_weighted",
    "agg_sequence_match",
    "agg_top_k_weighted",
    "agg_avg_weighted",
    # no recorded green driver row yet: the r2-pending trio and the
    # r2-ERR'd streaming trio
    "agg_top_k",
    "funnel_view_click_purchase",
    "retention_weekly",
    "streaming_windowed_agg",
    "streaming_session_window",
    "streaming_dedup_exact",
]

# The explicit rotation backlog, pinned to positions 51+: oracled queries
# without a recorded green row that did not fit this round's 50 slots.
# These three are the least environment-sensitive of the unconfirmed set
# (pure-JVM text transforms, additionally pinned by the sf0.01 oracle
# pytest suite every round) — first into next round's window.  The
# registry-window meta-test enforces that ONLY names listed here may lack
# both a green row and a window slot.
_AFTER_WINDOW = [
    "text_chunk_overlap",
    "text_pack_sequences",
    "text_domain_cap",
    # late round-4 additions that didn't fit the full window
    "window_moving_avg",
    "sessionize_batch",
    "agg_with_totals",
    "streaming_enrich_static",
    "dedup_incremental_exact",
    "agg_linreg_exact",
    "agg_group_uniq_array",
    "agg_unpivot_stack",
    "window_last_value_ignore_nulls",
    # round-5 additions: the remaining TPC-H shapes (Q2/Q4/Q9/Q11/Q12/Q13/
    # Q15/Q17/Q19/Q20/Q21 adaptations, operators/analytics3.py)
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
    "dedup_connected_components",
    "ts_gap_fill_interpolate",
    "agg_quantile_approx",
    "agg_if_combinators",
    "agg_array_combinators",
    "streaming_cdc_apply",
    "window_nth_value",
    "corpus_curation_pipeline",
    "sql_ch_dialect_url",
    "source_orc_partitioned_roundtrip",
    "agg_moments_exact",
    "join_asof_tolerance",
    "sql_ch_dialect_arrays",
    # round-3 continuous-build additions (this session)
    "dedup_cross_doc_lines",
    "dedup_cross_doc_lines_clean",
    "agg_interval_length_sum",
    "agg_entropy",
    "agg_covar_kurt",
    "sort_limit_by_offset",
    "sort_distinct_on",
    "join_dict_get",
    "sql_ch_dialect_encoding",
    "streaming_stream_join_outer",
    "multimodal_image_dhash",
    "dedup_image_dhash_pairs",
    "agg_lttb_downsample",
    "text_unigram_logprob",
    "join_paste_positional",
    "sql_ch_dialect_vectors",
    "sql_ch_dialect_geo",
    "sql_ch_dialect_rounding",
    "sql_ch_dialect_search",
    "agg_bitmap_cardinalities",
    "text_hashed_classifier",
    "agg_hll_deterministic",
    "streaming_hll_distinct",
    "sql_ch_dialect_intervals",
    "sql_ch_dialect_arrays2",
    "agg_sequence_count",
    "sql_ch_dialect_maps_format",
    "similarity_pq_topk",
    "sql_ch_dialect_bits_misc",
    "agg_max_intersections",
    "source_schema_evolution_defaults",
    "sql_ch_dialect_datetime64",
    "agg_group_array_sorted",
    "funnel_strict_order",
    "dedup_minhash_incremental",
    "agg_welch_ttest",
    "agg_mann_whitney_u",
    "agg_ks_test",
    "agg_cramers_v",
    "corpus_temperature_sample",
    "sql_ch_dialect_array_join_clause",
    "agg_theils_u",
    "streaming_window_topk",
    "agg_bounding_ratio",
    "agg_spearman_corr",
    "text_readability",
    "corpus_quality_ensemble",
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
