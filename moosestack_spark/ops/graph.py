"""Link-graph document scoring: integer-exact PageRank.

Beyond-reference operator (SURVEY.md §8): web-scale training corpora
weight documents by link-graph centrality (the CommonCrawl/RefinedWeb
lineage uses harmonic/PageRank-family scores for quality weighting); the
reference has no graph surface.  This implements power-iteration
PageRank with EXACT integer arithmetic so a fixed iteration count
hash-matches a SQL replay:

- ranks are scaled integers (SCALE = 10^12);
- damping 0.85 is the exact rational 17/20;
- each iteration: contrib(v) = Σ_{(u,v)∈E} r(u) div outdeg(u);
  r'(v) = (SCALE·3) div 20 + (17·contrib(v)) div 20.
  Integer division drops sub-unit mass (standard truncation variant);
  dangling vertices keep the teleport term only — both choices are
  deterministic and replayed identically by the oracle.

Scale design (100 TB): each iteration is the canonical distributed
PageRank shape — one join of the edge list with the rank vector on src
(both hash-partitioned on vertex id; the edge partitioning is reused
across iterations) and one groupBy(dst) sum, with localCheckpoint
truncating the iterated lineage exactly as ops/components.py does.
Iterations are fixed and small (quality weighting needs the coarse
ordering, not convergence to machine epsilon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 17, 20


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """(v, pr) with pr the SCALE-scaled integer PageRank after
    ``iterations`` exact power iterations over the directed edge list."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edge list annotated with the source's out-degree, partitioned once
    ed = e.join(deg, "src").localCheckpoint()
    ranks = verts.withColumn("pr", F.lit(SCALE).cast("bigint"))
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.v)
            .select("dst", F.expr("pr div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            verts.join(contrib, verts.v == contrib.dst, "left")
            .select(
                "v",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(contrib, 0L)) div {DAMP_DEN}"
                    )
                ).cast("bigint").alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks


_PR_ORACLE = f"""
WITH dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM documents
), edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM dense a JOIN dense b ON b.i = (a.i * 7 + 3) % a.n
  UNION ALL
  SELECT a.doc_id, c.doc_id
  FROM dense a JOIN dense c ON c.i = (a.i * 13 + 5) % a.n
), verts AS (
  SELECT DISTINCT v FROM (
    SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), ed AS (
  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)
), r0 AS (
  SELECT v, CAST({SCALE} AS BIGINT) AS pr FROM verts
), r1 AS (
  SELECT verts.v,
    CAST({(SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN} +
         ({DAMP_NUM} * COALESCE(c.contrib, 0)) // {DAMP_DEN} AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM(pr // outdeg) AS BIGINT) AS contrib
    FROM ed JOIN r0 ON ed.src = r0.v GROUP BY dst) c ON verts.v = c.dst
), r2 AS (
  SELECT verts.v,
    CAST({(SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN} +
         ({DAMP_NUM} * COALESCE(c.contrib, 0)) // {DAMP_DEN} AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM(pr // outdeg) AS BIGINT) AS contrib
    FROM ed JOIN r1 ON ed.src = r1.v GROUP BY dst) c ON verts.v = c.dst
), r3 AS (
  SELECT verts.v,
    CAST({(SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN} +
         ({DAMP_NUM} * COALESCE(c.contrib, 0)) // {DAMP_DEN} AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM(pr // outdeg) AS BIGINT) AS contrib
    FROM ed JOIN r2 ON ed.src = r2.v GROUP BY dst) c ON verts.v = c.dst
)
SELECT v AS doc_id, pr FROM r3
"""


@query("graph_pagerank_quality", oracle=_PR_ORACLE)
def graph_pagerank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact 3-iteration PageRank over a deterministic synthetic
    link graph on the documents table (dense-rank ids i, edges
    i -> (7i+3) mod n and i -> (13i+5) mod n — two out-links per doc, a
    fixed expander-ish topology both engines construct identically).
    The oracle unrolls the same three iterations in SQL."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("doc_id")
    w = Window.orderBy("doc_id")
    dense = d.withColumn("i", F.row_number().over(w) - 1).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    a = dense.select(
        F.col("doc_id").alias("s_doc"), "i", "n",
        F.expr("(i * 7 + 3) % n").alias("t1"),
        F.expr("(i * 13 + 5) % n").alias("t2"),
    )
    ids = dense.select(F.col("i").alias("ti"), F.col("doc_id").alias("t_doc"))
    e1 = a.join(ids, a.t1 == ids.ti).select(
        F.col("s_doc").alias("src"), F.col("t_doc").alias("dst")
    )
    e2 = a.join(ids, a.t2 == ids.ti).select(
        F.col("s_doc").alias("src"), F.col("t_doc").alias("dst")
    )
    pr = pagerank_int(e1.union(e2), iterations=3)
    return pr.select(F.col("v").alias("doc_id"), "pr")
