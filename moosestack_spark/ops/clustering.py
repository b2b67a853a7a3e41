"""Integer-exact distributed clustering + random projection.

Beyond-reference operators (SURVEY.md §8): corpus curation at 100 TB
clusters documents by embedding (SemDeDup cells, topic balancing, IVF
coarse quantizers) and sketches embeddings down before indexing.  The
reference has no vector surface at all; MLlib's KMeans (used for IVF
training in ops/similarity.py) is seeded-deterministic but NOT
cross-engine replayable — its float accumulation order is opaque.  This
module provides the hash-verifiable counterpart:

- ``kmeans_int``: Lloyd's algorithm over ``floor(x * 2^15)`` quantized
  components with EXACT integer arithmetic end-to-end — squared-L2 sums,
  floor-division centroid means, (distance, cid) lexicographic argmin —
  so a fixed iteration count hash-matches a DuckDB replay of the same
  recurrence.  Empty clusters keep their previous centroid (deterministic
  and replayed).
- ``random_project_int``: Achlioptas-style ±1 sign projection to
  ``n_planes`` integer components.  Sign matrices come from the same
  LCG family as ops/similarity.py's hyperplanes and are inlined as
  literals into BOTH engines, so the projection is bit-exact.

Scale design (100 TB): k-means per iteration is one scan for assignment
(centroids are constant-folded literal arrays — a broadcast of k*dim
ints) plus one posexplode + groupBy for the update; the only driver
collects are k init rows and k*dim component sums per iteration —
bounded by the model size, never the data (the MLlib shape).  Train on
``df.sample`` for trillion-row corpora; assignment stays a single
full-scan map.  Random projection is a pure per-row map — zero shuffle.

Overflow bounds: |q| <= 2^15 (unit-ish embedding components), so a
squared diff is <= 2^32 and a dim-64 distance sum <= 2^38; projection
sums are <= dim * 2^15 = 2^21.  All far inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import canon_arrays, query
from moosestack_spark.tables import t

QSCALE = 1 << 15


def _quantize(df: DataFrame, id_col: str, vec: str, qscale: int) -> DataFrame:
    """(id, q: array<bigint>) with q_i = floor(x_i * qscale) — float->double
    widening is exact in both engines, so quantization is deterministic."""
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec}, x -> "
            f"cast(floor(cast(x as double) * {qscale}) as bigint))"
        ).alias("q"),
    )


def _assign(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Argmin over centroid literals via array_min on (dist, cid) structs —
    struct ordering gives the (min distance, then min cid) tie-break the
    oracle replays with ROW_NUMBER ORDER BY d, cid."""
    structs = []
    for cid, c in enumerate(cents):
        arr = "array(" + ",".join(f"{v}L" for v in c) + ")"
        d = (
            f"aggregate(zip_with(q, {arr}, (x, c) -> (x - c) * (x - c)), "
            f"0L, (a, v) -> a + v)"
        )
        structs.append(f"named_struct('d', {d}, 'cid', {cid})")
    expr = f"array_min(array({','.join(structs)})).cid"
    return q.select("id", "q", F.expr(expr).alias("cid"))


def kmeans_int(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    qscale: int = QSCALE,
) -> DataFrame:
    """(id_col, cluster_id) after ``iterations`` exact-integer Lloyd rounds
    seeded with the k smallest ids' vectors as centroids (deterministic
    init both engines construct identically).  The returned assignment is
    against the FINAL updated centroids.

    Centroid means use floor division written as ``(s - pmod(s, n)) div n``
    so Spark's truncating ``div`` and DuckDB's flooring ``//`` agree on
    negative sums."""
    q = _quantize(df, id_col, vec, qscale).localCheckpoint()
    # init: k smallest ids — bounded driver collect (k rows = model size)
    cents = [list(r.q) for r in q.orderBy("id").limit(k).collect()]
    for _ in range(iterations):
        assign = _assign(q, cents)
        upd = (
            assign.select("cid", F.posexplode("q").alias("pos", "qc"))
            .groupBy("cid", "pos")
            .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .withColumn("m", F.expr("(s - pmod(s, cnt)) div cnt"))
            .collect()  # bounded: k*dim component means (model size)
        )
        new = [list(c) for c in cents]  # empty cluster: keep previous
        for r in upd:
            new[r["cid"]][r["pos"]] = r["m"]
        cents = new
    return _assign(q, cents).select(
        F.col("id").alias(id_col), F.col("cid").cast("bigint").alias("cluster_id")
    )


def _kmeans_oracle(k: int = 8, iterations: int = 2, qscale: int = QSCALE) -> str:
    """DuckDB SQL unrolling the same Lloyd recurrence (the graph_pagerank
    technique): exploded components join centroid components per ord,
    integer sums, floor-div means, COALESCE keeps empty-cluster centroids."""
    assign_body = """
  SELECT vec_id, cid FROM (
    SELECT ex.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY ex.vec_id
             ORDER BY SUM((ex.q - c.cq) * (ex.q - c.cq)) ASC, c.cid ASC) AS rn
    FROM ex JOIN {cent} c USING (ord)
    GROUP BY ex.vec_id, c.cid)
  WHERE rn = 1"""
    sql = f"""
WITH ex AS (
  SELECT vec_id, UNNEST(range(1, len(embedding) + 1)) AS ord,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * {qscale}) AS BIGINT) AS q
  FROM embeddings
), init AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
), cent0 AS (
  SELECT i.cid, ex.ord, ex.q AS cq FROM init i JOIN ex USING (vec_id)
)"""
    prev = "cent0"
    for it in range(1, iterations + 1):
        sql += f""", a{it} AS ({assign_body.format(cent=prev)}
), cent{it} AS (
  SELECT p.cid, p.ord, COALESCE(n.m, p.cq) AS cq
  FROM {prev} p LEFT JOIN (
    SELECT a.cid, ex.ord,
           (SUM(ex.q) - (((SUM(ex.q) % COUNT(*)) + COUNT(*)) % COUNT(*)))
             // COUNT(*) AS m
    FROM ex JOIN a{it} a USING (vec_id)
    GROUP BY a.cid, ex.ord) n ON p.cid = n.cid AND p.ord = n.ord
)"""
        prev = f"cent{it}"
    sql += f""", fin AS ({assign_body.format(cent=prev)})
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM fin
"""
    return sql


@query("cluster_kmeans_embeddings", oracle=_kmeans_oracle())
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8, 2 Lloyd rounds of integer-exact k-means on the embeddings
    table; the oracle unrolls the identical recurrence in SQL."""
    return kmeans_int(t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# ±1 random projection (Achlioptas / sign-JL): the cheap dimensionality
# sketch in front of an index build.  Integer-exact, zero-shuffle.
# --------------------------------------------------------------------------

N_PROJ = 16


def _rp_signs(n_planes: int = N_PROJ, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 sign matrix from the ops/similarity.py LCG family
    (balanced, max |cross-correlation| 18/64 measured) — inlined as
    literals into both engines."""
    out = []
    for p in range(n_planes):
        x = (p * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
        row = []
        for _ in range(dim):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
            row.append(1 if ((x >> 16) & 1) == 0 else -1)
        out.append(row)
    return out


def random_project_int(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_planes: int = N_PROJ,
    dim: int = 64,
    qscale: int = QSCALE,
) -> DataFrame:
    """(id_col, proj: array<bigint>) — n_planes signed sums over quantized
    components.  Pure map: no shuffle, no state, constant-folded signs."""
    q = _quantize(df, id_col, vec, qscale)
    projs = []
    for row in _rp_signs(n_planes, dim):
        arr = "array(" + ",".join(str(s) for s in row) + ")"
        projs.append(
            f"aggregate(zip_with(q, {arr}, (x, s) -> x * s), 0L, (a, v) -> a + v)"
        )
    return q.select(
        F.col("id").alias(id_col),
        F.expr(f"array({','.join(projs)})").alias("proj"),
    )


def _rp_oracle(n_planes: int = N_PROJ, dim: int = 64, qscale: int = QSCALE) -> str:
    parts = []
    for row in _rp_signs(n_planes, dim):
        lits = "[" + ", ".join(str(s) for s in row) + "]::INT[]"
        parts.append(
            f"CAST(CAST(list_dot_product(q, {lits}) AS BIGINT) AS VARCHAR)"
        )
    joined = " || ',' || ".join(parts)
    return f"""
WITH e AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x ->
    CAST(FLOOR(CAST(x AS DOUBLE) * {qscale}) AS BIGINT)) AS q
  FROM embeddings
)
SELECT vec_id, '[' || {joined} || ']' AS proj FROM e
"""


@query("embedding_random_projection", oracle=_rp_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-plane ±1 sign projection of the embeddings table, integer-exact;
    proj serialized via canon_arrays (driver-canon contract)."""
    out = random_project_int(t(spark, sf_dir, "embeddings"))
    return canon_arrays(out, "proj")
