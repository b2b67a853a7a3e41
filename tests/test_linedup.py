"""Edge cases for cross-document line dedup (ops/linedup.py)."""

from __future__ import annotations

from moosestack_spark.ops.linedup import LINE_WORDS, segment_lines


def test_segment_lines_short_and_partial(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 words -> 2 full 3-word segments, tail dropped
            (2, "x y"),  # shorter than a segment -> no rows
            (3, "p q r"),  # exactly one segment
        ],
        "doc_id long, text string",
    )
    rows = segment_lines(df, "doc_id", "text", LINE_WORDS).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.line_id, r.line))
    assert sorted(by_doc.get(1, [])) == [(0, "a b c"), (1, "d e f")]
    assert 2 not in by_doc
    assert by_doc[3] == [(0, "p q r")]


def test_duplicated_line_counted_across_docs_not_within(spark):
    # the same segment twice WITHIN one doc is not a cross-doc duplicate
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z x y w"), (3, "z z z q r s")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    segs = segment_lines(df, "doc_id", "text", LINE_WORDS)
    dup = (
        segs.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .collect()
    )
    assert [r.line for r in dup] == ["z z z"]
