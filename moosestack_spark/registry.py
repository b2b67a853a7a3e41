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
# round.  Rounds 1-4 hard-verified 186 distinct queries; the round-5 window
# below rotates onto ALL 45 oracled queries that have never received a green
# driver row: the r4 agg_group_array_sorted ERR retest (driver-canon fix),
# the 8 stale-graduated sketch gates whose last driver row predates their
# r4 hard-oracle graduation, and the 36 never-sampled construction-based
# dialect/text/window/join/source gates (every one exact-match green in the
# local sf0.01 oracle pytest suite each round).  The remaining 5 slots go
# to new round-5 gates.
_WINDOW_PRIORITY = [
    # --- 45 never-green oracled queries (retest + stale-graduated + never-sampled) ---
    "agg_group_array_sorted",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_minhash_incremental",
    "similarity_lsh_bucketed",
    "similarity_pq_topk",
    "dedup_semantic_cluster",
    "sample_hash_mod",
    "dedup_connected_components_star",
    "scalar_json_typed_paths",
    "analytics_forecast_revenue",
    "corpus_dsir_weights",
    "text_dup_ngram_fraction",
    "multimodal_exif_metadata",
    "table_time_travel",
    "agg_lttb_downsample",
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
    # --- new round-5 gates ---
    "agg_quantile_approx",
    "dedup_connected_components_hybrid",
    "profile_table_stats",
    "layout_zorder_index",
    "text_tfidf_retrieval",
]

# The explicit rotation backlog, pinned to positions 51+: oracled queries
# without a recorded green row that did not fit this round's 50 slots.
# Empty at the start of round 5 — the window above covers every never-green
# oracled query; new round-5 queries are appended here when the 5 reserved
# window slots fill up.  The registry-window meta-test enforces that ONLY
# names listed here may lack both a green row and a window slot.
_AFTER_WINDOW: list[str] = [
    "sql_ch_dialect_time_windows",
    "sql_ch_dialect_transform_case",
    "sql_ch_dialect_vocab_r5",
    "sql_ch_dialect_parametric",
    "graph_pagerank_quality",
    "source_gzip_jsonl_roundtrip",
    "text_gopher_rules",
    "dedup_url_canonical",
    "multimodal_flac_features",
    "agg_anova_f",
    "agg_cramers_v_bias_corrected",
    "agg_contingency",
    "window_running_difference",
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
        graph,
        layout,
        linedup,
        lm_score,
        multimodal,
        multimodal_ext,
        phash,
        profile,
        retrieval,
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
