"""Text-analysis operators for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

All JVM-side column expressions except the rolling-hash fingerprint,
which is an Arrow-batched pandas UDF (sequential per string, vectorized
across the batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EN_STOPWORDS = ["the", "and", "of", "to", "in"]
DE_STOPWORDS = ["der", "die", "und", "das", "ist"]
FR_STOPWORDS = ["le", "la", "et", "les", "des"]


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count (token_count_bpe is the regex variant;
    both stay JVM-side)."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )


# GPT-2-style pre-tokenizer, lookahead-free: contractions, letter runs,
# digit runs, punctuation runs, lone apostrophes.  (The published GPT-2
# pattern's trailing-space lookahead is dropped -- RE2-class engines
# reject lookarounds, and leading-space variants only matter for byte
# merges, not counts.)  Leftmost-first alternation semantics agree
# between Java regex (Spark) and RE2 (DuckDB) on this pattern.
# Whitespace is an EXPLICIT class, not \s: Java's \s includes vertical
# tab U+000B, RE2's does not, so \s here would silently diverge the
# engines on VT-bearing documents.
BPE_TOKEN_RE = r"'(s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n\x0b\f\r']+|'"


def token_count_bpe(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE-ish token count: pre-tokenizer matches per document, one JVM
    regexp pass (whole-stage codegen), no Python."""
    return df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
        ).alias("n_tokens_bpe"),
    )


def pack_sequences(
    df: DataFrame, id_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Assign documents (processed in id order) to fixed-token-budget
    packs: doc d lands in pack floor(prefix_sum_before(d) / budget) --
    the pretraining shard/packing step.  A boundary-straddling document
    goes to the pack its prefix STARTS in, so per-pack totals overshoot
    by at most one document's tail (the standard streaming-chunker
    semantic; exact bin packing is inherently sequential and would not
    distribute).

    Distribution: range-partition by id (the ONE corpus shuffle), sort
    within partitions (in place), cumsum per partition in a mapInPandas
    pass that carries the running total across Arrow batches -- a
    ``Window.partitionBy(_pid)`` here would RE-SHUFFLE the whole corpus
    by _pid even though rows are already physically placed, so the
    cumsum stays a map stage instead.  Per-partition totals (one row
    per range partition) carry the offsets, broadcast back.
    Deterministic, partitioning-invariant, and exactly replayable as
    ONE ordered window in SQL."""
    from pyspark import TaskContext
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(id_col, tokens_col).schema.fields
    )

    def cum(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            c = pdf[tokens_col].to_numpy().cumsum() + run
            if len(c):
                run = int(c[-1])
            yield pdf.assign(_pid=pid, _cum=c)

    d = (
        df.select(id_col, tokens_col)
        .repartitionByRange(nparts, F.col(id_col).asc())
        .sortWithinPartitions(F.col(id_col).asc())
        .mapInPandas(cum, f"{base_schema}, _pid int, _cum long")
    )
    totals = d.groupBy("_pid").agg(F.sum(tokens_col).alias("_pc"))
    w_off = Window.orderBy(F.col("_pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        "_pid", F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_off")
    )
    return d.join(F.broadcast(offs), "_pid").select(
        id_col,
        F.col(tokens_col),
        F.floor(
            (F.col("_off") + F.col("_cum") - F.col(tokens_col))
            / F.lit(float(budget))
        )
        .cast("long")
        .alias("pack_id"),
    )


def _stopword_hits(text_col, stopwords: list[str]):
    """Occurrences of ' w ' patterns via the length-difference trick
    (exact integer arithmetic, portable to any SQL engine)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    total = None
    for w in stopwords:
        pat = f" {w} "
        hits = (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / len(pat)
        total = hits if total is None else total + hits
    return total.cast("long")


def language_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: stopword hits per candidate
    language; guess = argmax (en/de/fr demo set)."""
    en = _stopword_hits(F.col(text_col), EN_STOPWORDS)
    de = _stopword_hits(F.col(text_col), DE_STOPWORDS)
    fr = _stopword_hits(F.col(text_col), FR_STOPWORDS)
    out = df.select(F.col(id_col), en.alias("en_hits"), de.alias("de_hits"), fr.alias("fr_hits"))
    guess = (
        F.when((F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")), "en")
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
    )
    return out.withColumn("lang_guess", guess)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality heuristics: length, punctuation density, stopword ratio,
    mean token length -- the standard corpus-filter features."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[.,!?;:]", ""))
    n_tokens = F.size(F.split(F.trim(txt), r"\s+"))
    sw = _stopword_hits(txt, EN_STOPWORDS)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_tokens.alias("n_tokens"),
        sw.alias("stopword_hits"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(sw / n_tokens, 6).alias("stopword_ratio"),
    )


_FP_MOD = (1 << 61) - 1  # Mersenne prime: x * 2^k mod p is a 61-bit rotation
_FP_BASE = 257
_MASK30 = np.uint64((1 << 30) - 1)
_MASK31 = np.uint64((1 << 31) - 1)
_MASK32 = np.uint64((1 << 32) - 1)

# 257^j mod p as uint64, extended on demand (once per process)
_FP_POWS = np.array([pow(_FP_BASE, j, _FP_MOD) for j in range(4096)], dtype=np.uint64)


def _fp_pows(n: int) -> np.ndarray:
    global _FP_POWS
    if len(_FP_POWS) < n:
        ext, h = [], int(_FP_POWS[-1])
        for _ in range(len(_FP_POWS), n):
            h = h * _FP_BASE % _FP_MOD
            ext.append(h)
        _FP_POWS = np.concatenate([_FP_POWS, np.array(ext, dtype=np.uint64)])
    return _FP_POWS[:n]


def _fingerprint_bytes(s: str) -> int:
    """hash = sum b_i * 257^(L-1-i) mod (2^61-1), fully vectorized.

    Each term b*pow is computed by splitting pow into 31-bit halves:
    b*pow = (b*hi)*2^31 + b*lo, and (x)*2^31 mod p for x < p is the
    61-bit left-rotation by 31 (Mersenne-prime identity) -- exact in
    uint64, no Python bigints in the per-byte path.  Bit-identical to
    the per-byte Horner fold it replaces (property-tested)."""
    raw = (s or "").encode("utf-8", errors="replace")
    if not raw:
        return 0
    b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    pw = _fp_pows(len(b))[::-1]
    hi = b * (pw >> np.uint64(31))            # < 2^38
    lo = b * (pw & _MASK31)                   # < 2^39
    # rotl61(hi, 31): low 30 bits -> positions 31..60, high bits -> 0..30
    rot = ((hi & _MASK30) << np.uint64(31)) | (hi >> np.uint64(30))
    t = rot + lo                              # < 2^62
    t = (t & np.uint64(_FP_MOD)) + (t >> np.uint64(61))  # fold to < 2^61+1
    # overflow-free sum: accumulate 32-bit halves separately
    s_lo = int((t & _MASK32).sum())
    s_hi = int((t >> np.uint64(32)).sum())
    return ((s_hi << 32) + s_lo) % _FP_MOD


@F.pandas_udf(T.LongType())
def rolling_fingerprint_udf(text: pd.Series) -> pd.Series:
    """Polynomial rolling-hash fingerprint of the whole document
    (mod 2^61-1, base 257), numpy-vectorized per document (the former
    per-byte interpreted-Python Horner loop was O(corpus bytes) in
    Python; this is ~40x faster on long documents, same output)."""
    out = np.zeros(len(text), dtype=np.int64)
    for i, s in enumerate(text):
        out[i] = _fingerprint_bytes(s)
    return pd.Series(out)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), rolling_fingerprint_udf(F.col(text_col)).alias("fingerprint"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, the
    repetition family of quality rules a training-data pipeline gates
    on): per document,

      dup_word_frac    (W - distinct words) / W
      dup_bigram_frac  (B - distinct bigrams) / B
      top_bigram_frac  occurrences of the most frequent bigram / B

    where W = word count and B = W - 1 bigrams.  Everything is pure
    array expressions over the split text -- ZERO shuffles, whole-stage
    codegen, so the op runs as a map over any corpus size; the mode
    count is array_max over per-distinct-bigram filters (O(distinct *
    total) per row, bounded by document length).  Single-word and empty
    documents emit zero fractions."""
    words = F.split(F.trim(F.col(text_col)), " +")
    w = F.size(words)
    dup_word = F.when(
        w > 0, (w - F.size(F.array_distinct(words))) / w
    ).otherwise(F.lit(0.0))
    bi = F.zip_with(
        F.slice(words, 1, F.greatest(w - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(w - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    b = F.size(bi)
    dup_bi = F.when(b > 0, (b - F.size(F.array_distinct(bi))) / b).otherwise(F.lit(0.0))
    top_bi = F.when(
        b > 0,
        F.array_max(
            F.transform(
                F.array_distinct(bi),
                lambda g: F.size(F.filter(bi, lambda x: x == g)),
            )
        )
        / b,
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(dup_word, 9).alias("dup_word_frac"),
        F.round(dup_bi, 9).alias("dup_bigram_frac"),
        F.round(top_bi, 9).alias("top_bigram_frac"),
    )


# PII categories scrubbed by scrub_pii, in application order.  Patterns
# are kept to the Java-regex/RE2 common subset so the DuckDB oracle can
# replay them byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d() -]{7,}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction for training corpora: replace emails, IPv4
    addresses, and international-format phone numbers with typed
    placeholder tokens, and count the hits per category.

    Pure JVM column expressions (regexp_extract_all + chained
    regexp_replace) -- a map-only stage with no shuffle, so it runs at
    corpus scale as a pure scan transform.  Counting happens BEFORE
    replacement (on the original text) per category in PII_PATTERNS
    order; replacement is sequential in the same order, so an email is
    never double-counted as a phone once redacted."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


URL_PATTERN = r"""https?://[^\s"'<>]+"""


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """URL extraction + normalization (the URL-dedup / domain-filter
    front end of a web-corpus pipeline): one row per URL occurrence with

      url   normalized -- fragment stripped, trailing punctuation
            trimmed, scheme+host lowercased (path case preserved)
      host  the lowercased authority (for domain block/allow lists)

    regexp_extract_all + explode: map-side only; the downstream
    `groupBy(url)` or `groupBy(host)` is the caller's one shuffle."""
    raw = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
    ).alias("raw_url")
    out = df.select(F.col(id_col), raw)
    trimmed = F.regexp_replace(
        F.regexp_replace(F.col("raw_url"), r"#[^#]*$", ""), r"[).,;!?]+$", ""
    )
    host = F.lower(F.regexp_extract(trimmed, r"^https?://([^/?#]+)", 1))
    scheme = F.lower(F.regexp_extract(trimmed, r"^(https?)://", 1))
    rest = F.regexp_replace(trimmed, r"^https?://[^/?#]*", "")
    return out.select(
        F.col(id_col),
        F.concat(scheme, F.lit("://"), host, rest).alias("url"),
        host.alias("host"),
    )


def c4_clean(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style corpus cleaning (Raffel et al. 2020 §2.2, the published
    line/document rules a web-scale text pipeline applies before
    training):

      line level  -- keep a (trimmed) line iff it ends in terminal
                     punctuation (. ! ? " '), has >= 5 words, and does
                     not mention 'javascript' (case-insensitive)
      document    -- keep iff the cleaned text has >= 3 sentences
                     (terminal-punctuation marks) and the ORIGINAL text
                     contains neither 'lorem ipsum' nor '{'

    Returns (id, cleaned, n_lines_kept, n_sentences, keep).  Everything
    is higher-order array expressions over the newline split -- a
    map-only stage with zero shuffles, scan-shaped at any corpus size."""
    lines = F.transform(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"), lambda l: F.trim(l)
    )
    kept = F.filter(
        lines,
        lambda l: l.rlike(r"""[.!?"']$""")
        & (F.size(F.split(l, r"\s+")) >= 5)
        & ~F.lower(l).contains("javascript"),
    )
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), F.lit(0)))
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    keep = (
        (n_sent >= 3)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("cleaned"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        keep.alias("keep"),
    )


def lm_bigram_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram-LM fluency scoring (the CCNet/CC-Net-style
    LM quality filter shape, public methodology): train MLE bigram
    probabilities P(w2|w1) = c(w1 w2)/c(w1) on the corpus itself, score
    each document by its mean bigram log-probability.  Low scores mark
    gibberish / boilerplate-shredded text.

    Distributed shape: bigrams and unigrams are zero-shuffle array
    expressions; the two count tables are single groupBys (map-side
    partial aggregation); scoring joins each document bigram to its two
    counts on natural keys (AQE handles hot-bigram skew -- count rows
    are 16 bytes).  No Python anywhere.

    Returns every document: (id, n_bigrams, sum_bigram_count,
    sum_prefix_count, avg_logprob).  The first four are EXACT integers
    (what the oracle value-checks); avg_logprob = mean ln(cb/cu) is the
    user-facing score (pinned against a python reference in tests --
    cross-engine float parity is deliberately not claimed).  Documents
    with < 2 tokens score n_bigrams = 0 and NULL avg_logprob.
    Convention: prefix counts c(w1) count ALL corpus occurrences of w1,
    including document-final positions."""
    toks = df.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"))
    bigrams = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("w"),
                        F.concat_ws(" ", F.slice("_t", i, 2)).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w:string,b:string>>"))
        ).alias("x"),
    ).select(id_col, F.col("x.w").alias("w"), F.col("x.b").alias("b"))
    unigrams = toks.select(F.explode("_t").alias("w"))
    uc = unigrams.groupBy("w").agg(F.count("*").alias("cu"))
    bc = bigrams.groupBy("b").agg(F.count("*").alias("cb"))
    scored = (
        bigrams.join(bc, "b")
        .join(uc, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cb").alias("sum_bigram_count"),
            F.sum("cu").alias("sum_prefix_count"),
            F.avg(F.log(F.col("cb") / F.col("cu"))).alias("avg_logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("sum_bigram_count", F.lit(0)).alias("sum_bigram_count"),
            F.coalesce("sum_prefix_count", F.lit(0)).alias("sum_prefix_count"),
            F.col("avg_logprob"),
        )
    )
