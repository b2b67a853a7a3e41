"""KMV (k-minimum-values) distinct sketches with set operations.

Beyond-reference operator (SURVEY.md §8): the reference exposes CH's
uniq*/HLL family for single-set cardinality; KMV (Bar-Yossef et al. 2002,
Beyer et al. SIGMOD'07 "distinct sampling") is the mergeable sketch that
additionally answers SET-OPERATION cardinalities — union, intersection,
Jaccard — from bounded per-group state: keep the k smallest values of a
uniform hash of the keys; the k-th smallest estimates the density
(distinct ~= (k-1) * H / h_(k) over hash space H), merged sketches
estimate unions, and membership overlap inside the merged k-mins
estimates Jaccard (the same estimator family the MinHash dedup ops use,
lifted to cardinalities).

Determinism/oracle: the hash is the portable murmur3-fmix32 used by the
deterministic HLL (operators/aggregates.py fmix32_expr — same arithmetic
replays in DuckDB), the k-mins are an exact rank-k prefix (window rank ->
filter -> bounded collect, the groupArraySorted discipline: state per
group is k hashes, never the full distinct set), and the estimators are
single IEEE divisions of exact integers — so every gate hash-matches.

Scale shape (100 TB): one (group, key)-distinct shuffle + one group
shuffle; per-group state bounded by k; sketches merge associatively, so
partial aggregation and cross-partition merge both hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes, fmix32_expr
from moosestack_spark.registry import query
from moosestack_spark.tables import t

HASH_SPACE = 4294967296  # 2^32: fmix32 output range


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """-> (group_col, kmins array<bigint> sorted asc, n_kept, kth_hash).

    Exact k-minimum distinct hash values per group.  The rank filter runs
    BEFORE the collect, so driver/executor array state is bounded by k
    regardless of group cardinality."""
    # hash BEFORE the distinct: (group, h32)-distinct both dedups keys and
    # folds hash collisions in ONE shuffle (the oracle's two-step distinct
    # produces the same set — fmix32 is a pure function of the key)
    hashed = df.select(
        group_col,
        F.expr(fmix32_expr(key_col)).cast("bigint").alias("h32"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h32")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h32")).alias("kmins"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("h32").alias("kth_hash"),
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Append ``est_distinct``: exact n_kept when the group has fewer than
    k distinct keys (the sketch IS the set), else (k-1) * H / h_(k)."""
    return sketch.withColumn(
        "est_distinct",
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kth_hash")
        ),
    )


def kmv_set_ops(
    sketch: DataFrame, group_col: str, group_a, group_b, k: int = 64
) -> DataFrame:
    """Union / intersection / Jaccard estimates for two groups from their
    sketches alone: X = k smallest of (A ∪ B) k-mins; jaccard ≈
    |X ∩ A ∩ B| / |X|; union ≈ KMV estimate over X; intersection =
    jaccard * union.  One broadcast-sized two-row join."""
    a = sketch.filter(F.col(group_col) == group_a).select(
        F.col("kmins").alias("ka")
    )
    b = sketch.filter(F.col(group_col) == group_b).select(
        F.col("kmins").alias("kb")
    )
    merged = a.crossJoin(b).select(
        "ka",
        "kb",
        F.expr(f"slice(array_sort(array_union(ka, kb)), 1, {k})").alias("x"),
    )
    return merged.select(
        F.size("x").cast("int").alias("x_size"),
        F.expr(
            "CAST(size(filter(x, h -> array_contains(ka, h) AND "
            "array_contains(kb, h))) AS INT)"
        ).alias("matches"),
        F.expr(
            f"CASE WHEN size(x) < {k} THEN CAST(size(x) AS DOUBLE) "
            f"ELSE {float(k - 1)} * {float(HASH_SPACE)} / element_at(x, -1) END"
        ).alias("union_est"),
    ).select(
        "x_size",
        "matches",
        "union_est",
        (F.col("matches") / F.col("x_size")).alias("jaccard_est"),
        (
            (F.col("matches") / F.col("x_size")) * F.col("union_est")
        ).alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------

_K = 64


def _oracle_kmin_ctes() -> str:
    """Shared DuckDB CTE prefix: per-event-type k-minimum fmix32 hashes of
    distinct user_ids (replays kmv_sketch exactly)."""
    return f"""
WITH dk AS (SELECT DISTINCT event_type, user_id FROM events),
{fmix32_duckdb_ctes("user_id", "event_type", "dk")},
dh AS (SELECT DISTINCT event_type, h32 FROM hashed),
ranked AS (
  SELECT event_type, h32,
         row_number() OVER (PARTITION BY event_type ORDER BY h32) AS rn
  FROM dh
),
kmins AS (
  SELECT event_type, list(h32 ORDER BY h32) AS kmins,
         CAST(COUNT(*) AS INT) AS n_kept, MAX(h32) AS kth_hash
  FROM ranked WHERE rn <= {_K} GROUP BY event_type
)"""


@query(
    "agg_kmv_distinct",
    oracle=_oracle_kmin_ctes()
    + f"""
SELECT event_type, n_kept, kth_hash,
       CASE WHEN n_kept < {_K} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(_K - 1)} * {float(HASH_SPACE)} / kth_hash END
           AS est_distinct
FROM kmins
""",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users via a KMV sketch
    (portable fmix32 k-mins, k=64) — register-exact across engines, so the
    ESTIMATE itself is hash-gated (same policy as agg_hll_deterministic)."""
    ev = t(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "event_type", "user_id", k=_K)
    return kmv_estimate(sk, k=_K).select(
        "event_type", "n_kept", "kth_hash", "est_distinct"
    )


def _oracle_setop_kmin_ctes() -> str:
    """CTE prefix for the set-ops gate: two PARTIALLY overlapping derived
    user sets (evens vs multiples of 3; true Jaccard 1/4) so the
    intersection estimator is exercised away from the 0/1 extremes."""
    return f"""
WITH dk AS (
  SELECT 'evens' AS event_type, user_id
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0)
  UNION ALL
  SELECT 'threes' AS event_type, user_id
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
),
{fmix32_duckdb_ctes("user_id", "event_type", "dk")},
dh AS (SELECT DISTINCT event_type, h32 FROM hashed),
ranked AS (
  SELECT event_type, h32,
         row_number() OVER (PARTITION BY event_type ORDER BY h32) AS rn
  FROM dh
),
kmins AS (
  SELECT event_type, list(h32 ORDER BY h32) AS kmins,
         CAST(COUNT(*) AS INT) AS n_kept, MAX(h32) AS kth_hash
  FROM ranked WHERE rn <= {_K} GROUP BY event_type
)"""


@query(
    "agg_kmv_set_ops",
    oracle=_oracle_setop_kmin_ctes()
    + f"""
, ab AS (
  SELECT (SELECT kmins FROM kmins WHERE event_type = 'evens') AS ka,
         (SELECT kmins FROM kmins WHERE event_type = 'threes') AS kb
),
m AS (
  SELECT ka, kb,
         (list_sort(list_distinct(list_concat(ka, kb))))[1:{_K}] AS x
  FROM ab
)
SELECT CAST(length(x) AS INT) AS x_size,
       CAST(length(list_filter(x, h -> list_contains(ka, h)
            AND list_contains(kb, h))) AS INT) AS matches,
       CASE WHEN length(x) < {_K} THEN CAST(length(x) AS DOUBLE)
            ELSE {float(_K - 1)} * {float(HASH_SPACE)} / x[-1] END AS union_est,
       CAST(length(list_filter(x, h -> list_contains(ka, h)
            AND list_contains(kb, h))) AS DOUBLE) / length(x) AS jaccard_est,
       (CAST(length(list_filter(x, h -> list_contains(ka, h)
            AND list_contains(kb, h))) AS DOUBLE) / length(x)) *
       (CASE WHEN length(x) < {_K} THEN CAST(length(x) AS DOUBLE)
             ELSE {float(_K - 1)} * {float(HASH_SPACE)} / x[-1] END)
           AS inter_est
FROM m
""",
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / intersection / Jaccard cardinality estimates from KMV
    sketches alone — the mergeable set-algebra the plain uniq/HLL family
    cannot answer.  Two partially-overlapping derived user sets (evens vs
    multiples of 3, true Jaccard 1/4) exercise the estimator away from the
    degenerate extremes; all arithmetic replays value-exact in DuckDB."""
    ev = t(spark, sf_dir, "events")
    evens = (
        ev.filter(F.col("user_id") % 2 == 0)
        .select(F.lit("evens").alias("grp"), "user_id")
    )
    threes = (
        ev.filter(F.col("user_id") % 3 == 0)
        .select(F.lit("threes").alias("grp"), "user_id")
    )
    sk = kmv_sketch(evens.unionByName(threes), "grp", "user_id", k=_K)
    return kmv_set_ops(sk, "grp", "evens", "threes", k=_K)


# ---------------------------------------------------------------------------
# bucketized (stochastic-averaging) variant: min-hash per hash-modulo
# bucket.  Unlike the rank-k prefix above, the per-bucket MIN is an
# algebraic aggregate Structured Streaming can maintain incrementally with
# EXACTLY k rows of state per group/window — the streaming-compatible KMV.
# Estimator: MinCount (Lumbroso 2010): n̂ = k(k-1)·H / Σ m_i over exact
# integer minima (empty bucket ⇒ m_i = H), linear counting -k·ln(V/k)
# while V buckets are still empty.  All internals are exact integers; the
# single division / single ln surfaces per the float-determinism policy.
# ---------------------------------------------------------------------------


def kmv_bucket_minima(
    df: DataFrame, group_col, key_col: str, k: int = 256
) -> DataFrame:
    """-> (group..., bucket, m): min fmix32 hash per modulo bucket.  Works
    on batch AND streaming frames (min is an algebraic aggregate)."""
    group_cols = group_col if isinstance(group_col, list) else [group_col]
    hashed = df.select(
        *group_cols,
        F.expr(fmix32_expr(key_col)).cast("bigint").alias("h32"),
    )
    return (
        hashed.withColumn("bucket", (F.col("h32") % k).cast("int"))
        .groupBy(*group_cols, "bucket")
        .agg(F.min("h32").alias("m"))
    )


def mincount_finalize(
    minima: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """(group..., bucket, m) rows -> (group..., used_buckets, est_distinct).

    Exact-integer internals: Σ m_i is a BIGINT sum with empty buckets
    contributing H exactly; only the final division (or ln) is floating."""
    agg = minima.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("used_buckets"),
        F.sum("m").cast("bigint").alias("sum_min_used"),
    )
    sum_min = (
        F.col("sum_min_used")
        + (F.lit(k) - F.col("used_buckets")).cast("bigint") * F.lit(HASH_SPACE)
    )
    est = F.when(
        F.col("used_buckets") < k,
        -F.lit(float(k))
        * F.log((F.lit(k) - F.col("used_buckets")) / F.lit(float(k))),
    ).otherwise(
        F.lit(float(k * (k - 1))) * F.lit(float(HASH_SPACE)) / sum_min
    )
    return agg.select(
        *group_cols,
        "used_buckets",
        est.cast("float").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Space-saving heavy hitters (mergeable summaries)
# ---------------------------------------------------------------------------


def space_saving_summaries(
    df: DataFrame, key_col: str, k: int = 64, prune_factor: int = 4
) -> DataFrame:
    """Per-partition bounded-state heavy-hitter summaries (the mergeable-
    summaries formulation of space-saving, Agarwal et al. PODS'12).

    Each task folds Arrow batches into a count dict; whenever the dict
    exceeds ``prune_factor * k`` keys it is pruned back to ``prune_factor
    * k // 2`` largest, accumulating the partition's error budget ``e_p``
    += max(pruned count).  Guarantees per partition: a kept key's count
    underestimates its true partition count by at most e_p, and any
    dropped key has true partition count <= e_p.  Summaries merge by
    plain SUM over keys, with the global band TRUE_COUNT in
    [sum(cnt), sum(cnt) + sum_p e_p].

    State per task is O(prune_factor * k) — at 100 TB the output is
    (#partitions * k) rows, grouped by key in one tiny shuffle; nothing
    scales with the key cardinality.
    """
    import pandas as pd

    cap = prune_factor * k
    keep = max(cap // 2, k)

    def kernel(batches):
        from pyspark import TaskContext

        counts: dict = {}
        e_p = 0
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            for key, c in vc.items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > cap:
                ordered = sorted(counts.items(), key=lambda kv: -kv[1])
                pruned_max = ordered[keep][1]
                e_p += pruned_max
                counts = dict(ordered[:keep])
        pid = TaskContext.get().partitionId()
        top = sorted(counts.items(), key=lambda kv: -kv[1])[:k]
        if not top:
            return
        yield pd.DataFrame(
            {
                "pid": [pid] * len(top),
                "key": [kv[0] for kv in top],
                "cnt": [kv[1] for kv in top],
                "e_p": [e_p] * len(top),
            }
        )

    # the summary schema declares key:string — cast up front so numeric
    # key columns work instead of failing in Arrow conversion
    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        kernel, "pid int, key string, cnt long, e_p long"
    )


def space_saving_topk(
    df: DataFrame, key_col: str, k: int = 64, top: int = 10
) -> DataFrame:
    """Merged heavy-hitter estimates: (key, est, upper) for the ``top``
    keys by estimated count, where the true count lies in [est, upper]."""
    summaries = space_saving_summaries(df, key_col, k=k).localCheckpoint()
    e_total = summaries.groupBy("pid").agg(F.first("e_p").alias("e")).agg(
        F.coalesce(F.sum("e"), F.lit(0)).alias("e_total")
    )
    merged = (
        summaries.groupBy("key")
        .agg(F.sum("cnt").alias("est"))
        .crossJoin(F.broadcast(e_total))
        .withColumn("upper", F.col("est") + F.col("e_total"))
        .drop("e_total")
    )
    return merged.orderBy(F.desc("est"), "key").limit(top)


_SS_ORACLE = """
WITH keyed AS (
  SELECT CASE WHEN user_id % 10 < 7
              THEN 'hot-' || CAST(user_id % 3 AS VARCHAR)
              ELSE 'cold-' || CAST(user_id % 5000 AS VARCHAR) END AS key
  FROM events
),
exact AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM keyed GROUP BY key
)
SELECT key, exact_cnt, CAST(1 AS INT) AS within_band
FROM exact
ORDER BY exact_cnt DESC, key
LIMIT 3
"""


@query("agg_space_saving_topk", oracle=_SS_ORACLE)
def agg_space_saving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with bounded per-task state: space-saving summaries
    (k=64 per partition) merged by key, with the mergeable-summaries
    error band carried explicitly.  The gate surfaces only partition-
    layout-independent facts: the top-3 hot keys (separation >> total
    error budget by construction, so the sketch's top set equals the
    exact top set under ANY partitioning), their EXACT counts (replayed
    in-plan from a groupBy the oracle repeats), and an in-plan band check
    exact BETWEEN est AND est + sum(e_p) — the same graduation pattern as
    agg_uniq_approx.  CH analogue: topK(N)(col) (approximate heavy
    hitters); reference surface passes it through to ClickHouse."""
    src = t(spark, sf_dir, "events").select(
        F.when(
            F.col("user_id") % 10 < 7,
            F.concat(F.lit("hot-"), (F.col("user_id") % 3).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("cold-"), (F.col("user_id") % 5000).cast("string"))
        )
        .alias("key")
    )
    sketch = space_saving_topk(src, "key", k=64, top=3)
    exact = src.groupBy("key").agg(F.count(F.lit(1)).alias("exact_cnt"))
    out = (
        sketch.join(exact, "key")
        .withColumn(
            "within_band",
            (
                (F.col("exact_cnt") >= F.col("est"))
                & (F.col("exact_cnt") <= F.col("upper"))
            ).cast("int"),
        )
        .select("key", "exact_cnt", "within_band")
        .orderBy(F.desc("exact_cnt"), "key")
    )
    return out.localCheckpoint()
