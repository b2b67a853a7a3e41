"""Link-graph document scoring: integer-exact PageRank.

Beyond-reference operator (SURVEY.md §8): web-scale training corpora
weight documents by link-graph centrality (the CommonCrawl/RefinedWeb
lineage uses harmonic/PageRank-family scores for quality weighting); the
reference has no graph surface.  This implements power-iteration
PageRank with EXACT integer arithmetic so a fixed iteration count
hash-matches a SQL replay:

- ranks are scaled integers (default SCALE = 10^12);
- damping 0.85 is the exact rational 17/20, applied PER EDGE:
  c(u→v) = 17 · ((r(u) div outdeg(u)) div 20);
  r'(v) = (SCALE·3) div 20 + Σ c(u→v).
  Per-edge damping keeps every term ≤ r(u), so the only overflow bound
  is the conserved total mass n·SCALE — checked at runtime (n·SCALE must
  stay below 2^62; pass a smaller ``scale`` for billion-vertex graphs).
  Integer division drops sub-unit mass (standard truncation variant);
  dangling vertices keep the teleport term only — all choices are
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
    scale: int = SCALE,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(v, pr) with pr the ``scale``-scaled integer PageRank after
    ``iterations`` exact power iterations over the directed edge list.
    Raises when n_vertices · scale could overflow int64 accumulation —
    pass a smaller ``scale`` for very large graphs (rank resolution
    trades off against headroom).

    ``seeds`` (a one-column DataFrame of vertex ids) switches to
    PERSONALIZED PageRank: rank mass starts on the seeds and the teleport
    term returns mass ONLY to seeds — the trusted-seed importance
    propagation used for seed-based corpus quality scoring (TrustRank /
    Harmonic-seed family).  Same integer arithmetic, same conservation
    bound, so the DuckDB oracle replays it exactly."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n * scale >= 2**62:
        raise ValueError(
            f"pagerank_int: {n} vertices at scale {scale} can overflow "
            f"int64 rank accumulation; use scale <= {2**62 // max(n, 1)}"
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edge list annotated with the source's out-degree, partitioned once
    ed = e.join(deg, "src").localCheckpoint()
    teleport = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    if seeds is not None:
        seed_v = seeds.select(
            F.col(seeds.columns[0]).alias("v")
        ).distinct().withColumn("__seed", F.lit(True))
        verts = verts.join(seed_v, "v", "left").select(
            "v", F.coalesce("__seed", F.lit(False)).alias("__seed")
        ).localCheckpoint()
        ranks = verts.select(
            "v",
            F.when(F.col("__seed"), F.lit(scale))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("pr"),
        )
        teleport_col = F.when(F.col("__seed"), F.lit(teleport)).otherwise(
            F.lit(0)
        )
    else:
        verts = verts.withColumn("__seed", F.lit(True))
        ranks = verts.select("v", F.lit(scale).cast("bigint").alias("pr"))
        teleport_col = F.lit(teleport)
    for _ in range(iterations):
        # damping applied per edge BEFORE the sum: every addend <= r(u),
        # so the accumulator is bounded by the conserved mass n*scale
        contrib = (
            ed.join(ranks, ed.src == ranks.v)
            .select(
                "dst",
                F.expr(
                    f"{DAMP_NUM} * ((pr div outdeg) div {DAMP_DEN})"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            verts.join(contrib, verts.v == contrib.dst, "left")
            .select(
                "v",
                (teleport_col + F.coalesce(F.col("contrib"), F.lit(0)))
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select("v", "pr")


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
         COALESCE(c.contrib, 0) AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM({DAMP_NUM} * ((pr // outdeg) // {DAMP_DEN})) AS BIGINT) AS contrib
    FROM ed JOIN r0 ON ed.src = r0.v GROUP BY dst) c ON verts.v = c.dst
), r2 AS (
  SELECT verts.v,
    CAST({(SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN} +
         COALESCE(c.contrib, 0) AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM({DAMP_NUM} * ((pr // outdeg) // {DAMP_DEN})) AS BIGINT) AS contrib
    FROM ed JOIN r1 ON ed.src = r1.v GROUP BY dst) c ON verts.v = c.dst
), r3 AS (
  SELECT verts.v,
    CAST({(SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN} +
         COALESCE(c.contrib, 0) AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM({DAMP_NUM} * ((pr // outdeg) // {DAMP_DEN})) AS BIGINT) AS contrib
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


_PPR_TELEPORT = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
_PPR_ITER = """r{k} AS (
  SELECT verts.v,
    CAST(CASE WHEN verts.v % 17 = 0 THEN {tp} ELSE 0 END +
         COALESCE(c.contrib, 0) AS BIGINT) AS pr
  FROM verts LEFT JOIN (
    SELECT dst, CAST(SUM({dn} * ((pr // outdeg) // {dd})) AS BIGINT) AS contrib
    FROM ed JOIN r{p} ON ed.src = r{p}.v GROUP BY dst) c ON verts.v = c.dst
)"""
_PPR_ORACLE = (
    f"""
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
  SELECT v, CAST(CASE WHEN v % 17 = 0 THEN {SCALE} ELSE 0 END AS BIGINT) AS pr
  FROM verts
), """
    + ", ".join(
        _PPR_ITER.format(
            k=k, p=k - 1, tp=_PPR_TELEPORT, dn=DAMP_NUM, dd=DAMP_DEN
        )
        for k in (1, 2, 3)
    )
    + """
SELECT v AS doc_id, pr FROM r3
"""
)


@query("graph_pagerank_personalized", oracle=_PPR_ORACLE)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the same synthetic link graph as
    graph_pagerank_quality, seeded on doc_id % 17 == 0: mass starts on
    the seeds and teleports ONLY back to them, so rank measures 3-hop
    proximity to the trusted set — the seed-propagation primitive for
    corpus quality scoring.  Integer-exact; the oracle unrolls the same
    three iterations with the seed-conditional teleport."""
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
    seeds = d.filter(F.col("doc_id") % 17 == 0)
    pr = pagerank_int(e1.union(e2), iterations=3, seeds=seeds)
    return pr.select(F.col("v").alias("doc_id"), "pr")


# --------------------------------------------------------------------------
# Triangle counting (node-iterator on oriented edges): with every edge
# oriented low->high, each triangle a<b<c is found exactly once by joining
# (a,b)x(b,c) and probing (a,c).  Per-node counts measure the clique-ness
# of duplicate clusters (a near-dup cluster that is NOT triangle-dense is a
# chaining artifact worth inspecting).
#
# Scale: two self-joins on the edge key.  For skewed degree distributions
# the standard fix is orienting by (degree, id) instead of id — the
# wedge count drops from sum(d_v^2) to O(m^1.5) (Schank-Wagner / MapReduce
# triangle literature); orient_by_degree=True does exactly that, same
# triangle set, and stays deterministic via the (degree, id) total order.
# The gate uses id-orientation so the DuckDB oracle is a literal replay.
# --------------------------------------------------------------------------


def triangle_counts(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    orient_by_degree: bool = False,
) -> DataFrame:
    """(v, n_triangles) for every vertex on >= 1 triangle; `pairs` holds
    each undirected edge once with a_col < b_col.

    The edge list is checkpointed up front: the wedge join + triangle
    close embed it THREE times (e1, e2, closing probe), and the near-dup
    pair generators feeding this gate carry an expensive upstream plan
    that is no longer always materialized on their side (size-conditional
    checkpoints, r12).  Edges are tiny next to the upstream occurrence
    tables, so the pin is cheap at any scale and bounds the upstream plan
    to one execution."""
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    if orient_by_degree:
        deg = (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        ranked = (
            e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
            .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        )
        lo_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        e = ranked.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("b"),
        )
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = wedge.join(
        e.select(F.col("a").alias("a"), F.col("b").alias("c")),
        ["a", "c"],
    )
    nodes = (
        tri.select(F.col("a").alias("v"))
        .unionByName(tri.select(F.col("b").alias("v")))
        .unionByName(tri.select(F.col("c").alias("v")))
    )
    return nodes.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def _tri_oracle() -> str:
    from moosestack_spark.ops.components import _PAIR_CTES

    return f"""
WITH {_PAIR_CTES},
tri AS (
  SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.doc_a = p1.doc_b
  JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
),
nodes AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY v
"""


@query("graph_triangle_count", oracle=_tri_oracle())
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the n-gram Jaccard near-dup
    graph (same edge CTE as the CC gates) — the clique-ness signal for
    duplicate-cluster quality."""
    from moosestack_spark.ops.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.5)
    return triangle_counts(pairs, "doc_a", "doc_b").select(
        F.col("v").alias("doc_id"), "n_triangles"
    )


# --------------------------------------------------------------------------
# BFS hop distance (multi-source shortest unweighted path, bounded depth).
# Frontier expansion with visited-set pruning: each hop is one join of the
# CURRENT FRONTIER (shrinking) with the edge list partitioned on src, plus
# an anti-join against the visited set — the canonical distributed BFS; a
# scalar isEmpty() per hop is the only driver touch, and localCheckpoint
# truncates the iterated lineage (same discipline as ops/components.py).
# The pruned construction yields min-distance directly, which is what the
# oracle's recursive-CTE MIN(d) computes.
# --------------------------------------------------------------------------


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(v, dist) — minimum hop count from any seed vertex along directed
    edges, vertices beyond ``max_hops`` omitted.  ``seeds`` must have a
    single column ``v``."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    dist = seeds.select("v", F.lit(0).alias("dist")).localCheckpoint()
    frontier = dist.select("v")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["v"] == e["src"])
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(dist.select("v"), "v", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt.select("v")
    return dist


_BFS_ORACLE = """
WITH RECURSIVE dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM documents
), edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM dense a JOIN dense b ON b.i = (a.i * 7 + 3) % a.n
  UNION ALL
  SELECT a.doc_id, c.doc_id
  FROM dense a JOIN dense c ON c.i = (a.i * 13 + 5) % a.n
), bfs(v, d) AS (
  SELECT doc_id, 0 FROM dense WHERE i < 3
  UNION
  SELECT e.dst, b.d + 1
  FROM bfs b JOIN edges e ON e.src = b.v
  WHERE b.d < 4
)
SELECT v AS doc_id, CAST(MIN(d) AS INT) AS dist
FROM bfs GROUP BY v ORDER BY doc_id
"""


@query("graph_bfs_distance", oracle=_BFS_ORACLE)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (<= 4 hops) over the same synthetic
    expander link graph as graph_pagerank_quality, seeded at the 3 lowest
    dense ids.  The oracle is a recursive CTE whose MIN(d) equals the
    pruned-frontier construction's first-visit distance."""
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
    seeds = dense.filter(F.col("i") < 3).select(F.col("doc_id").alias("v"))
    out = bfs_hops(e1.union(e2), seeds, max_hops=4)
    return out.select(
        F.col("v").alias("doc_id"), F.col("dist").cast("int").alias("dist")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# k-core decomposition (iterative peeling): repeatedly drop vertices whose
# degree within the surviving set is < k until a fixpoint.  Peeling SHRINKS
# the vertex set, which recursive SQL cannot express (recursive CTEs grow
# monotonically and bar aggregation over the recursive reference), so the
# oracle is a GENERATED unrolled CTE chain and the Spark side asserts
# convergence within the same unroll depth — a non-converged run raises
# loudly instead of hash-mismatching.  Per iteration: two semi-joins of the
# undirected edge list against the survivors (both hash-partitioned on
# vertex id, partitioning reused) + one groupBy count; localCheckpoint
# truncates the iterated lineage.
# --------------------------------------------------------------------------


def k_core(
    edges: DataFrame,
    k: int,
    max_iters: int = 12,
    u: str = "u",
    v: str = "v",
) -> DataFrame:
    """(v, deg) — vertices of the k-core of the UNDIRECTED simple graph
    ``edges`` with their degree inside the core.  Raises if the peel has
    not reached a fixpoint within ``max_iters``."""
    # Materialize the edge list ONCE, hash-partitioned on u: the input
    # lineage (for the gate, a scan + window + two joins) would otherwise
    # be re-derived on EVERY peel, and each peel's u-side semi-join would
    # re-exchange the big side.  Measured at sf0.1: 17.9 s warm -> 7.9 s.
    ue = (
        edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
        .repartition("u")
        .localCheckpoint()
    )
    alive = (
        ue.select(F.col("u").alias("x"))
        .union(ue.select("v"))
        .distinct()
        .localCheckpoint()
    )
    n_alive = alive.count()
    for it in range(max_iters):
        # Peel on the SHRINKING live edge set: an edge with a dead endpoint
        # can never return (alive shrinks monotonically), so next round's
        # semi-joins run against this round's survivors, not the original
        # list.  Checkpointed because it is read three times (two degree
        # branches + next iteration) and to truncate the iterated lineage;
        # iteration 0 skips the no-op self-semi-join.
        live_e = ue
        if it > 0:
            live_e = (
                ue.join(alive.select(F.col("x").alias("u")), "u", "left_semi")
                .join(alive.select(F.col("x").alias("v")), "v", "left_semi")
                .repartition("u")
                .localCheckpoint()
            )
        deg = (
            live_e.select(F.col("u").alias("x"))
            .union(live_e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        nxt = deg.filter(F.col("deg") >= k).select("x").localCheckpoint()
        n_nxt = nxt.count()
        if n_nxt == n_alive or n_nxt == 0:
            return deg.filter(F.col("deg") >= k).select(
                F.col("x").alias("v"), "deg"
            )
        alive, n_alive, ue = nxt, n_nxt, live_e
    raise RuntimeError(
        f"k-core peel did not converge within {max_iters} iterations"
    )


_KC_EXTRA = "(a.n - a.n % 4)"  # hub links stay on i % 4 == 0 vertices


def _kcore_edges_sql() -> str:
    """Shared synthetic graph: the 2-out expander + three extra links
    among the i%4==0 quarter (degree variance so the 4-core is a proper
    nontrivial subset)."""
    return f"""
dense AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM documents
), de AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM dense a JOIN dense b ON b.i = (a.i * 7 + 3) % a.n
  UNION ALL
  SELECT a.doc_id, c.doc_id
  FROM dense a JOIN dense c ON c.i = (a.i * 13 + 5) % a.n
  UNION ALL
  SELECT a.doc_id, d.doc_id FROM dense a JOIN dense d
    ON a.i % 4 = 0 AND d.i % 4 = 0 AND d.i = (a.i * 3 + 4) % {_KC_EXTRA}
  UNION ALL
  SELECT a.doc_id, e2.doc_id FROM dense a JOIN dense e2
    ON a.i % 4 = 0 AND e2.i % 4 = 0 AND e2.i = (a.i * 5 + 8) % {_KC_EXTRA}
  UNION ALL
  SELECT a.doc_id, f.doc_id FROM dense a JOIN dense f
    ON a.i % 4 = 0 AND f.i % 4 = 0 AND f.i = (a.i * 9 + 12) % {_KC_EXTRA}
), ue AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM de WHERE src <> dst
)"""


def _kcore_oracle(k: int = 4, iters: int = 18) -> str:
    parts = [
        "WITH " + _kcore_edges_sql().lstrip(),
        """, s0 AS MATERIALIZED (
  SELECT DISTINCT x FROM (SELECT u AS x FROM ue UNION ALL SELECT v FROM ue)
)""",
    ]
    prev = "s0"
    for r in range(1, iters + 1):
        parts.append(f""", d{r} AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT e.u AS x FROM ue e
    JOIN {prev} a ON e.u = a.x JOIN {prev} b ON e.v = b.x
    UNION ALL
    SELECT e.v FROM ue e
    JOIN {prev} a ON e.u = a.x JOIN {prev} b ON e.v = b.x
  ) GROUP BY x
), s{r} AS MATERIALIZED (SELECT x FROM d{r} WHERE deg >= {k})""")
        prev = f"s{r}"
    parts.append(
        f"\nSELECT x AS doc_id, deg FROM d{iters} WHERE deg >= {k} "
        "ORDER BY doc_id"
    )
    return "".join(parts)


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the degree-varied synthetic document graph (124 of 500
    vertices survive after 11 peels at sf<=0.01; 1250 of 5000 after 14 at
    sf0.1): iterative peeling with a loud convergence assert.  The oracle
    is an 18-step unrolled CTE chain — iterations past the fixpoint are
    no-ops, so the generous unroll is correct at every gate SF while the
    Spark loop still exits at convergence."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("doc_id")
    w = Window.orderBy("doc_id")
    dense = d.withColumn("i", F.row_number().over(w) - 1).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    ids = dense.select(F.col("i").alias("ti"), F.col("doc_id").alias("t_doc"))

    def link(expr: str, quarter: bool) -> DataFrame:
        a = dense
        if quarter:
            a = a.filter(F.col("i") % 4 == 0)
        a = a.select(F.col("doc_id").alias("s_doc"), F.expr(expr).alias("t"))
        tgt = ids if not quarter else ids.filter(F.col("ti") % 4 == 0)
        return a.join(tgt, a.t == tgt.ti).select(
            F.col("s_doc").alias("src"), F.col("t_doc").alias("dst")
        )

    de = (
        link("(i * 7 + 3) % n", False)
        .union(link("(i * 13 + 5) % n", False))
        .union(link("(i * 3 + 4) % (n - n % 4)", True))
        .union(link("(i * 5 + 8) % (n - n % 4)", True))
        .union(link("(i * 9 + 12) % (n - n % 4)", True))
    )
    ue = (
        de.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    core = k_core(ue, k=4, max_iters=18)
    return core.select(F.col("v").alias("doc_id"), "deg").orderBy("doc_id")


# --------------------------------------------------------------------------
# Label propagation community detection (synchronous, fixed rounds): each
# vertex adopts the most frequent label among its neighbors AND itself,
# ties broken by the smallest label — both choices deterministic, so a
# fixed round count hash-matches a SQL replay.  The self-vote is the
# standard damping against synchronous-LPA oscillation (a bare 2-cycle
# flips labels forever without it; with it, ties resolve toward the
# smaller label and bipartite structures converge).  Per round: one join of the
# neighbor list with the label vector on vertex id + one groupBy argmax —
# both hash-partitioned on vertex id, partitioning reused across rounds,
# localCheckpoint truncating the iterated lineage (the ops/components.py
# discipline).  State is one label per vertex — linear, never quadratic.
# --------------------------------------------------------------------------


def label_propagation(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(v, lbl) after ``iterations`` synchronous label-propagation rounds
    over the undirected simple graph induced by ``edges`` (both directions
    added, self-loops dropped, duplicates ignored).  Isolated vertices —
    and any vertex in a degenerate round — keep their own id as label."""
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = sym.select(F.col("a").alias("v")).distinct().localCheckpoint()
    # self-vote: every vertex is its own neighbor in the ballot
    nbr = sym.union(
        verts.select(F.col("v").alias("a"), F.col("v").alias("b"))
    ).localCheckpoint()
    labels = verts.select("v", F.col("v").alias("lbl"))
    w = Window.partitionBy("a").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(iterations):
        cand = (
            nbr.join(labels.select(F.col("v").alias("b"), "lbl"), "b")
            .groupBy("a", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        new = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("v"), "lbl")
        )
        labels = (
            verts.join(new, "v", "left")
            .select("v", F.coalesce("lbl", F.col("v")).alias("lbl"))
            .localCheckpoint()
        )
    return labels


_LPA_ORACLE = """
WITH dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM documents
), eraw AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM dense a JOIN dense b ON b.i = (a.i * 7 + 3) % a.n
  UNION ALL
  SELECT a.doc_id, c.doc_id
  FROM dense a JOIN dense c ON c.i = (a.i * 13 + 5) % a.n
), sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM eraw
    UNION ALL SELECT dst, src FROM eraw)
  WHERE a != b
), verts AS (
  SELECT DISTINCT a AS v FROM sym
), und AS (
  SELECT a, b FROM sym UNION SELECT v, v FROM verts
), l0 AS (
  SELECT v, v AS lbl FROM verts
), l1 AS (
  SELECT verts.v, COALESCE(nw.lbl, verts.v) AS lbl
  FROM verts LEFT JOIN (
    SELECT v, lbl FROM (
      SELECT u.a AS v, l.lbl,
             ROW_NUMBER() OVER (PARTITION BY u.a
               ORDER BY COUNT(*) DESC, l.lbl ASC) AS rn
      FROM und u JOIN l0 l ON u.b = l.v
      GROUP BY u.a, l.lbl) WHERE rn = 1) nw ON verts.v = nw.v
), l2 AS (
  SELECT verts.v, COALESCE(nw.lbl, verts.v) AS lbl
  FROM verts LEFT JOIN (
    SELECT v, lbl FROM (
      SELECT u.a AS v, l.lbl,
             ROW_NUMBER() OVER (PARTITION BY u.a
               ORDER BY COUNT(*) DESC, l.lbl ASC) AS rn
      FROM und u JOIN l1 l ON u.b = l.v
      GROUP BY u.a, l.lbl) WHERE rn = 1) nw ON verts.v = nw.v
)
SELECT v AS doc_id, CAST(lbl AS BIGINT) AS community FROM l2
"""


@query("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous LPA rounds over the undirected version of the same
    synthetic expander link graph as graph_pagerank_quality; the oracle
    unrolls both rounds with the identical (max count, min label)
    tie-break."""
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
    out = label_propagation(e1.union(e2), iterations=2)
    return out.select(
        F.col("v").alias("doc_id"), F.col("lbl").cast("bigint").alias("community")
    )
