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
# round.  Round 1 covered registry positions 0-49; the names below are the
# queries that have NOT yet received a hard driver-correctness row (plus
# agg_group_array, which errored in r1 on an array-typed output, and most
# queries newly added this round).  They are promoted to the front of the
# registry so round 2's window covers them.  The list is EXACTLY 50 long —
# the three newest round-2 queries (agg_top_k, funnel_view_click_purchase,
# retention_weekly) deliberately wait outside for the round-3 rotation,
# along with the ~45 r1-green queries; rotate next round until every query
# has had a green row.
_WINDOW_PRIORITY = [
    # r1 positions 50-88, never driver-checked
    "setop_intersect_except",
    "setop_all_variants",
    "agg_salted_skew",
    "sort_multikey_limit",
    "sort_paginate",
    "sort_limit_clamp",
    "sample_hash_mod",
    "streaming_zero_or_many_transform",
    "streaming_dlq_envelope",
    "streaming_windowed_agg",
    "streaming_session_window",
    "streaming_stateful_user_stats",
    "streaming_multi_route",
    "etl_extract_transform_load",
    "streaming_dlq_recovery",
    "window_row_number_topk",
    "window_rank_dense",
    "window_lag",
    "window_running_sum",
    "window_first_last",
    "window_lead_distribution",
    "window_range_frame",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "similarity_bruteforce_topk",
    "similarity_lsh_bucketed",
    "similarity_ivf",
    "text_token_stats",
    "text_stopword_ratio",
    "text_fingerprint",
    "text_quality_bucket",
    "text_lang_id",
    "text_rolling_fingerprint",
    # errored in r1 (driver canonicalizer vs array column) — re-check fixed form
    "agg_group_array",
    # new queries this round
    "dedup_embedding_cosine_pruned",
    "agg_uniq_exact",
    "streaming_topic_sync",
    "text_c4_quality_filter",
    "text_pii_redact",
    "decontam_ngram_overlap",
    "text_repetition_signals",
    "text_train_val_test_split",
    "join_bucketed_colocated",
    "streaming_dedup_exact",
]


def load_all() -> None:
    """Import every operator module (side effect: registration)."""
    from moosestack_spark.operators import (  # noqa: F401
        aggregates,
        bucketed,
        engines,
        filters,
        funnel,
        joins,
        mv,
        scalar_funcs,
        semantic,
        setops,
        skew,
        sortlimit,
        streaming_ops,
        windows,
    )
    from moosestack_spark.ops import (  # noqa: F401
        decontaminate,
        dedup,
        multimodal,
        similarity,
        text,
    )

    # Reorder the registry so the driver's 50-query correctness window covers
    # the queries that most need a hard row this round (see _WINDOW_PRIORITY).
    prioritized = [n for n in _WINDOW_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    reordered = {n: QUERIES[n] for n in [*prioritized, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)
