"""Chunking/packing invariants: the two-phase prefix-sum packing must be
bit-identical to the naive global cumsum regardless of input partitioning,
and chunk windows must tile documents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from moosestack_spark.ops.chunking import chunk_documents, pack_documents


def test_pack_matches_naive_cumsum_any_partitioning(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(500)]
    expected = {}
    cum = 0
    for i, n in rows:  # already in doc_id order
        expected[i] = (n, cum // 128, cum % 128)
        cum += n
    for n_parts in (1, 5, 32):
        df = spark.createDataFrame(rows, "doc_id long, n_tok int").repartition(n_parts)
        got = {
            r.doc_id: (r.n_tok, r.bin_id, r.bin_offset)
            for r in pack_documents(df, seq_len=128).collect()
        }
        assert got == expected, f"n_parts={n_parts}"


def test_chunk_windows_tile_exactly(spark):
    text_12 = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, text_12), (2, "single"), (3, "  a   b  ")],  # messy whitespace
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_size=5, stride=4).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,4,8 -> sizes 5,5,4
    assert [r.n_tok for r in by_doc[1]] == [5, 5, 4]
    assert by_doc[1][0].chunk == "w0 w1 w2 w3 w4"
    assert by_doc[1][2].chunk == "w8 w9 w10 w11"
    # overlap: chunk k starts at token 4k
    assert by_doc[1][1].chunk.split(" ")[0] == "w4"
    # doc 2: one chunk of 1
    assert [(r.chunk, r.n_tok) for r in by_doc[2]] == [("single", 1)]
    # doc 3: whitespace normalized to two tokens
    assert [(r.chunk, r.n_tok) for r in by_doc[3]] == [("a b", 2)]
