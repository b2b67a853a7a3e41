"""Distributed BPE (byte-pair-encoding) tokenizer training.

The training-data-pipeline operator the token-counting family builds
toward: learn a subword merge table from a corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm), distributed the way a 100 TB corpus requires:

- the corpus collapses to a WORD-FREQUENCY table in one shuffle with
  map-side combine; everything after runs on distinct words (vocabulary-
  sized, millions of rows at web scale — not corpus-sized);
- each merge round is one aggregation over that table: explode adjacent
  symbol pairs weighted by word frequency, sum per pair, take the argmax
  (count desc, pair asc — deterministic).  The argmax is a bounded
  1-row collect per round, same category as the IVF centroid collect;
- the winning pair is merged into every word via a JVM-side left fold
  (F.aggregate) — greedy leftmost-non-overlapping, exactly the reference
  algorithm's scan order; no Python UDF anywhere;
- the word table is localCheckpoint'ed each round: iterative plans
  otherwise stack n_merges analysis passes onto one lineage (the standard
  iterative-algorithm hygiene on Spark).

Correctness is pinned against a pure-Python reference implementation in
tests/test_bpe.py (same merge sequence on the same corpus) and the gate
query registers rows-only (merge selection is inherently sequential — not
SQL-expressible; SURVEY.md's weaker-check category).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def words_with_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus -> (syms: array<string>, freq: bigint), one row per distinct
    word; syms is the character sequence plus the end-of-word marker."""
    w = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )
    return w.select(syms.alias("syms"), "freq")


def _adjacent_pairs(syms: Column) -> Column:
    """array<string> -> array<struct<l,r>> of adjacent symbol pairs."""
    return F.transform(
        F.slice(syms, 1, F.size(syms) - 1),
        lambda x, i: F.struct(
            x.alias("l"), F.element_at(syms, i + 2).alias("r")
        ),
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost merge of (left, right) -> left+right via a fold —
    after a merge the new symbol is the fold's last element, so it cannot
    immediately re-merge with the next input (non-overlapping, as in the
    reference implementation)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


SEQUENTIAL_MERGE_LIMIT = 64


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
    allow_sequential: bool = False,
) -> list[tuple[str, str, int]]:
    """Learn up to n_merges BPE merges; returns [(left, right, count)] in
    merge order.  Stops early when no pair reaches min_pair_count.

    Guard: this kernel launches ONE Spark job per merge — exact, and fine
    for small vocabularies, but a 32k-merge call would schedule 32k jobs.
    Above SEQUENTIAL_MERGE_LIMIT it routes to train_bpe_sampled (bounded
    collect + local incremental merge loop, the default/gate path) unless
    the caller explicitly opts into the sequential kernel."""
    if n_merges > SEQUENTIAL_MERGE_LIMIT and not allow_sequential:
        return train_bpe_sampled(
            docs, text_col, n_merges=n_merges, min_pair_count=min_pair_count
        )
    words = words_with_freq(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            words.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq"
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        left, right, n = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        words = words.select(
            _merge_pair(F.col("syms"), left, right).alias("syms"), "freq"
        ).localCheckpoint()
    return merges


def _greedy_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Python twin of _merge_pair's fold: greedy leftmost non-overlapping."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _local_bpe(
    word_freqs: list[tuple[tuple[str, ...], int]],
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str, int]]:
    """In-memory BPE merge loop with INCREMENTAL pair-count maintenance
    (the subword-nmt trick): each merge touches only the words containing
    the winning pair, so 32k merges over a 100k-word table run in seconds
    where a per-merge full recount would be O(merges x corpus-vocabulary).
    Identical argmax rule to the distributed trainer: count desc, then
    (left, right) ascending."""
    from collections import defaultdict

    words = [(list(syms), freq) for syms, freq in word_freqs]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, freq) in enumerate(words):
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += freq
            pair_words[pair].add(wi)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        live = [(p, n) for p, n in pair_counts.items() if n >= min_pair_count]
        if not live:
            break
        (left, right), n = min(live, key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, int(n)))
        for wi in list(pair_words[(left, right)]):
            syms, freq = words[wi]
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= freq
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
            merged = _greedy_merge(syms, left, right)
            words[wi] = (merged, freq)
            for pair in zip(merged, merged[1:]):
                pair_counts[pair] += freq
                pair_words[pair].add(wi)
    return merges


def train_bpe_sampled(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """The SCALE path for BPE training: ONE distributed shuffle builds the
    word-frequency table, the top `max_words` rows by (freq desc, word asc)
    come to the driver (bounded collect — same category as the IVF centroid
    collect), and the vocabulary-sized merge loop runs locally with
    incremental pair counts.  train_bpe's one-Spark-job-per-merge loop is
    exact but pays ~n_merges job launches — unusable at a real 32k-merge
    vocabulary; this path is industry practice (frequency tables saturate
    long before the full corpus is counted) and is EXACT-equivalent to the
    distributed trainer whenever max_words covers the corpus vocabulary
    (pinned in tests/test_bpe.py)."""
    rows = (
        words_with_freq(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("syms"))
        .limit(max_words)
        .collect()
    )
    wf = [(tuple(r.syms), int(r.freq)) for r in rows]
    return _local_bpe(wf, n_merges, min_pair_count)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge table: per document, per word, apply
    the merges in rank order (the BPE inference rule) and count resulting
    subword tokens.  Pure JVM fold chain — the merge table is a compile-time
    constant folded into the plan (at 100 TB the table is KBs; the plan
    broadcast is free)."""
    word = F.explode(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+")
    ).alias("word")
    w = docs.select(id_col, word).filter(F.col("word") != "")
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD)))
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    return (
        w.select(id_col, F.size(syms).alias("n_tok"))
        .groupBy(id_col)
        .agg(F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"))
    )


# The tokenize gate's PINNED merge table: train_bpe_sampled(sf0.001
# documents, n_merges=10, max_words=200_000), frozen so the DuckDB oracle
# can replay the identical greedy merges (VERDICT r11 #5).  Counts are
# training-corpus facts, irrelevant to replay.
GATE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("e", END_OF_WORD),
    ("n", END_OF_WORD),
    ("o", "r"),
    ("t", END_OF_WORD),
    ("er", END_OF_WORD),
    ("o", "w"),
    ("ow", END_OF_WORD),
    ("l", "u"),
    ("i", "n"),
]


def _bpe_tokenize_oracle() -> str:
    """DuckDB SQL replaying apply_bpe under GATE_MERGES exactly.

    Greedy leftmost non-overlapping pair merge == SQL REPLACE, once the
    symbol sequence is spelled as a SPACE-WRAPPED string (every symbol
    carries its own leading+trailing space, so adjacent symbols meet on a
    double space and a merge of (l, r) is REPLACE(s, ' l  r ', ' lr ')):
    REPLACE scans left to right, never rescans inserted text, and the
    wrapping makes cross-symbol false matches impossible (no symbol
    contains a space).  This is the same semantics as _merge_pair's fold —
    a freshly merged symbol cannot immediately re-merge within the same
    pass.  Token count per word = half the remaining space count (each
    symbol contributes exactly its two wrapping spaces, merges included).
    """
    s_expr = (
        "' ' || array_to_string(string_split(word, ''), '  ') "
        "|| '  </w> '"
    )
    merged = s_expr
    for left, right in GATE_MERGES:
        merged = (
            f"REPLACE({merged}, ' {left}  {right} ', ' {left}{right} ')"
        )
    return f"""
WITH words AS (
  SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '[^a-z0-9'']+')) AS word
  FROM documents
), nonempty AS (
  SELECT doc_id, word FROM words WHERE word <> ''
), merged AS (
  SELECT doc_id, {merged} AS s
  FROM nonempty
)
SELECT doc_id,
       CAST(SUM((LENGTH(s) - LENGTH(REPLACE(s, ' ', ''))) / 2) AS BIGINT)
         AS n_bpe_tokens
FROM merged GROUP BY doc_id
"""


def _register_gate_queries() -> None:
    from moosestack_spark.registry import query
    from moosestack_spark.tables import t

    @query("text_bpe_train")  # sequential merge selection: rows-only check
    def text_bpe_train(spark, sf_dir: str) -> DataFrame:
        """Top-10 BPE merges over the documents corpus (rank, left, right,
        count).  Deterministic (count desc, pair asc tiebreak) but not
        SQL-expressible — pinned against the pure-Python reference in
        tests/test_bpe.py instead."""
        d = t(spark, sf_dir, "documents")
        merges = train_bpe(d, n_merges=10)
        rows = [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)]
        return spark.createDataFrame(
            rows, "rank int, left string, right string, pair_count bigint"
        )

    @query("text_bpe_tokenize", oracle=_bpe_tokenize_oracle())
    def text_bpe_tokenize(spark, sf_dir: str) -> DataFrame:
        """Per-document BPE token counts under the PINNED merge table —
        the production tokenization shape (apply a pretrained vocabulary
        to a corpus), and since r12 a HARD-oracled gate: tokenization
        under a fixed merge list is deterministic greedy replay, which
        DuckDB reproduces exactly with nested REPLACE over a
        space-wrapped symbol string (see _bpe_tokenize_oracle).  TRAINING
        stays rows-only by declared contract (text_bpe_train above —
        sequential merge selection is not SQL-expressible); the merge
        table here was trained once by train_bpe_sampled on the sf0.001
        corpus and frozen (GATE_MERGES), so the gate no longer re-trains
        per call and the oracle can replay the identical merges."""
        d = t(spark, sf_dir, "documents")
        return apply_bpe(d, [(l, r, 0) for l, r in GATE_MERGES])


_register_gate_queries()


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 style): pre-tokenize with the public GPT-2 split
# regex, map each pre-token's UTF-8 bytes through the printable
# byte-to-unicode table (Radford et al. 2019 / openai/gpt-2 encoder.py —
# public algorithm), then run the SAME merge machinery over byte symbols.
# No END_OF_WORD marker: whitespace travels inside pre-tokens, which is
# what makes byte-level BPE lossless over arbitrary text.
# ---------------------------------------------------------------------------

# Java-regex flavor of the GPT-2 split pattern (\p{L}/\p{N} are
# unicode-aware in Java by default; the lookahead keeps trailing spaces
# attached to the following token)
GPT2_SPLIT_JAVA = (
    r"(?:'s|'t|'re|'ve|'m|'ll|'d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode mapping: printable
    latin ranges map to themselves, everything else shifts past U+0100."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def _byte_syms_expr(word_col: str) -> Column:
    """array<string>: the word's UTF-8 bytes mapped through
    bytes_to_unicode — a pure JVM walk (binary substring + hex lookup in a
    256-entry map literal), no Python UDF."""
    b2u = bytes_to_unicode()
    entries: list[Column] = []
    for b, ch in b2u.items():
        entries.append(F.lit(f"{b:02X}"))
        entries.append(F.lit(ch))
    m = F.create_map(*entries)
    bin_col = F.encode(F.col(word_col), "UTF-8")
    return F.transform(
        F.sequence(F.lit(1), F.octet_length(F.col(word_col))),
        lambda i: F.element_at(m, F.upper(F.hex(F.substring(bin_col, i, 1)))),
    )


def byte_pretokens_with_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus -> (syms: array<string> of mapped byte chars, freq), one row
    per distinct GPT-2 pre-token.  One shuffle with map-side combine —
    the byte-level twin of words_with_freq."""
    w = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(GPT2_SPLIT_JAVA), 0
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return w.select(_byte_syms_expr("word").alias("syms"), "freq")


def train_bpe_bytes(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Byte-level BPE training on the sampled path (bounded top-max_words
    collect + incremental local merges — exact-equivalent whenever the
    collect covers the pre-token vocabulary, same argument as
    train_bpe_sampled)."""
    rows = (
        byte_pretokens_with_freq(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("syms"))
        .limit(max_words)
        .collect()
    )
    wf = [(tuple(r.syms), int(r.freq)) for r in rows]
    return _local_bpe(wf, n_merges, min_pair_count)


def apply_bpe_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document byte-level BPE token counts with a learned merge table
    (rank-order inference, pure JVM fold chain)."""
    word = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(GPT2_SPLIT_JAVA), 0)
    ).alias("word")
    w = docs.select(id_col, word).filter(F.col("word") != "")
    syms = _byte_syms_expr("word")
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    return (
        w.select(id_col, F.size(syms).alias("n_tok"))
        .groupBy(id_col)
        .agg(F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"))
    )
