"""Corpus curation ops (ops/corpus.py): mixing quotas, rarity integerness,
and semantic-dedup soundness/recall vs the exact cosine kernel."""

from __future__ import annotations

import pyspark.sql.functions as F

from moosestack_spark.ops.corpus import (
    MIX_TOTAL,
    MIX_WEIGHTS,
    corpus_mix,
    semantic_dedup_pairs,
)
from moosestack_spark.ops.dedup import embedding_cosine_pairs
from moosestack_spark.tables import t


def test_mix_hits_quotas_exactly(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    got = (
        corpus_mix(d, "doc_id", "source", MIX_WEIGHTS, MIX_TOTAL)
        .groupBy("source")
        .count()
        .collect()
    )
    avail = {
        r["source"]: r["count"]
        for r in d.groupBy("source").count().collect()
    }
    for row in got:
        quota = int(round(MIX_WEIGHTS[row["source"]] * MIX_TOTAL))
        assert row["count"] == min(quota, avail[row["source"]])
    assert {r["source"] for r in got} <= set(MIX_WEIGHTS)


def test_mix_is_layout_independent(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    base = {
        r["doc_id"]
        for r in corpus_mix(d, "doc_id", "source", MIX_WEIGHTS, MIX_TOTAL).collect()
    }
    reparted = {
        r["doc_id"]
        for r in corpus_mix(
            d.repartition(13, "doc_id"), "doc_id", "source", MIX_WEIGHTS, MIX_TOTAL
        ).collect()
    }
    assert base == reparted


def test_semantic_dedup_sound_and_recalls(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(e, "vec_id", "embedding", 0.35).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(e, "vec_id", "embedding", 0.35).collect()
    }
    # soundness: every reported pair is a true >=threshold pair (cells
    # only restrict the pair space, never invent similarity)
    assert got <= exact
    # recall: cluster cells keep the bulk of true pairs (SemDeDup's trade);
    # at 0.35 some true pairs straddle cells; the bulk must survive
    if exact:
        assert len(got) >= 0.8 * len(exact)


def test_stratified_sample_exact_quotas(spark):
    """Largest-remainder invariants: total sampled == N div 10 exactly,
    per-stratum counts differ from exact proportion by < 1, and the
    selection is deterministic (same frame twice -> same ids)."""
    from moosestack_spark.ops.corpus import stratified_sample

    df = spark.range(997).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 7 = 0 THEN 'a' WHEN id % 7 < 4 THEN 'b' "
        "ELSE 'c' END AS lang",
    )
    s1 = stratified_sample(df, "doc_id", "lang", denom=10)
    rows = s1.collect()
    assert len(rows) == 997 // 10
    got = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + 1
    n_s = {r.lang: r.cnt for r in df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    T, N = 997 // 10, 997
    for lang, n in n_s.items():
        exact = n * T / N
        assert abs(got.get(lang, 0) - exact) < 1.0, (lang, got.get(lang), exact)
    ids2 = {r.doc_id for r in stratified_sample(
        df, "doc_id", "lang", denom=10).collect()}
    assert ids2 == {r.doc_id for r in rows}
