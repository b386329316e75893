"""Deduplication operators for large-scale training-data pipelines
(driver mandate: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Everything is built from JVM-side DataFrame expressions (md5/conv/split/
explode/groupBy) -- no Python in the hot path -- so each stage is one
shuffle on its natural key and scales with executors.

Shared hash: H(s) = first 15 hex chars of md5(s) as int64 (portable to
any engine, used identically by the DuckDB oracles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MOD = 1_000_000_007
# (a, b) parameters of the N_PERM universal hash functions
# h_i(x) = (a_i*x + b_i) mod p.  128 permutations / 16 bands x 8 rows gives
# the standard web-corpus dedup operating point (s-curve threshold
# ~ (1/16)^(1/8) ~ 0.71 Jaccard); the parameters are a fixed deterministic
# sequence so the DuckDB oracle regenerates them identically.
N_PERM = 128
N_BANDS = 16
BAND_ROWS = N_PERM // N_BANDS
MAX_BUCKET = 64  # LSH bucket-size cap: bounds the self-join quadratically
MINHASH_PARAMS = [
    ((i * 2654435761 + 104729) % MOD, (i * 40503 + 7919) % MOD) for i in range(N_PERM)
]
assert all(a != 0 for a, _ in MINHASH_PARAMS)


def _h15(col):
    """Portable 60-bit string hash: first 15 hex chars of md5 -> bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document.

    Built entirely from array expressions over the split token array
    (sequence -> transform -> slice -> concat_ws -> array_distinct):
    ZERO shuffles -- the n-1 positional self-joins of the exploded token
    table this replaces each shuffled the full corpus.  The token array is
    materialized as a column first so the split() subtree is evaluated
    once, not once per lambda element (higher-order-function pitfall)."""
    toks = df.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    grams = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: groups with >1 doc
    (hash-groupBy; the canonical first pass of any corpus dedup)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """N_PERM-permutation MinHash signature per doc over word n-gram
    shingles: one groupBy on doc id with N_PERM JVM-side min aggregates
    (map-side partial aggregation keeps the shuffle at one row per doc)."""
    sh = shingles(df, id_col, text_col, n)
    hashed = sh.select(id_col, (_h15(F.col("shingle")) % MOD).alias("sh"))
    aggs = [
        F.min((F.col("sh") * F.lit(a) + F.lit(b)) % F.lit(MOD)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, bucket) rows: N_BANDS buckets per doc, each keyed by the
    band's BAND_ROWS-value signature slice folded into one int64 --
    h = fold(h*31 + mh mod p), bucket = band*p + h.  Integer keys keep
    the band explode in whole-stage codegen and shuffle 8 bytes/row
    (the string-concat variant cost ~3x here and shuffled ~60B/row)."""
    band_cols = []
    for b in range(N_BANDS):
        h = None
        for r in range(BAND_ROWS):
            mh = F.col(f"mh{b * BAND_ROWS + r}")
            h = mh if h is None else (h * F.lit(31) + mh) % F.lit(MOD)
        band_cols.append(F.lit(b * MOD).cast("long") + h)
    return sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket"))


def lsh_band_keys_arrow(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, bucket) band keys computed in ONE Arrow-vectorized pass:
    shingle hashes gathered per doc (collect_list), then the whole
    128-permutation MinHash + band fold runs as numpy broadcasting.

    Same math as minhash_signatures + lsh_bands (bit-identical buckets),
    but avoids the 128-field JVM aggregate, which exceeds
    spark.sql.codegen.maxFields and drops out of whole-stage codegen
    (measured ~3x slower than this path at sf0.1).  Trade-off: the
    collect_list shuffle carries every shingle hash (no map-side
    combine) -- acceptable because shingle rows are 16 bytes and
    bounded by corpus token count."""
    sh = shingles(df, id_col, text_col, n)
    hashed = sh.select(id_col, (_h15(F.col("shingle")) % MOD).alias("sh"))
    grouped = hashed.groupBy(id_col).agg(F.collect_list("sh").alias("shs"))

    A = np.array([a for a, _ in MINHASH_PARAMS], dtype=np.int64)
    B = np.array([b for _, b in MINHASH_PARAMS], dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bands(shs: pd.Series) -> pd.Series:
        out = []
        for lst in shs:
            s = np.asarray(lst, dtype=np.int64)
            sig = ((s[:, None] * A[None, :]) + B[None, :]) % MOD
            sig = sig.min(axis=0)  # (N_PERM,)
            keys = []
            for b in range(N_BANDS):
                h = int(sig[b * BAND_ROWS])
                for r in range(1, BAND_ROWS):
                    h = (h * 31 + int(sig[b * BAND_ROWS + r])) % MOD
                keys.append(b * MOD + h)
            out.append(keys)
        return pd.Series(out)

    return grouped.select(F.col(id_col), F.explode(_bands(F.col("shs"))).alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_bucket: int = MAX_BUCKET,
    storage=None,
    return_bands: bool = False,
):
    """Candidate near-duplicate pairs via LSH banding: N_BANDS bands x
    BAND_ROWS rows.  A pair collides if any band's signature slice matches
    exactly (shingle -> minhash -> band -> bucket-join; the standard
    web-dedup pipeline as one equi-self-join on the bucket key).

    Buckets larger than `max_bucket` docs are dropped before the
    self-join: a hot bucket (boilerplate-heavy corpora) otherwise costs
    O(bucket^2) pairs; with 16 independent bands, genuinely-similar pairs
    still collide in another band.  The cap bounds the join at
    max_bucket^2 rows per bucket -- the skew guard this operator needs at
    corpus scale.

    Cache lifetime: the bands table is read three times (bucket sizing +
    both self-join sides).  Pass ``storage`` (e.g.
    ``StorageLevel.MEMORY_AND_DISK``) to persist it so the
    shingle->minhash pipeline runs ONCE instead of three times (measured
    2.4x on the sf0.1 bench).  THE CALLER OWNS THE CACHE: the result is
    lazy, so the persist must outlive this call -- pass
    ``return_bands=True`` to get ``(pairs, bands)`` and call
    ``bands.unpersist()`` once the pairs are materialized.  With the
    default ``storage=None`` nothing is pinned and the signature pipeline
    recomputes per consumer (correct, ~2.4x slower)."""
    bands = lsh_band_keys_arrow(df, id_col, text_col, n)
    if storage is not None:
        bands = bands.persist(storage)
    small = (
        bands.groupBy("bucket")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket)
        .select("bucket")
    )
    capped = bands.join(small, "bucket")
    a, b = capped.alias("a"), capped.alias("b")
    out = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    if return_bands:
        return out, bands
    return out


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: sign of per-bit vote sums over word hashes.
    bits<=16 keeps the oracle SQL tractable; the kernel generalizes."""
    w = words(df, id_col, text_col).select(id_col, _h15(F.col("word")).alias("h"))
    votes = [
        F.sum(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{k}")
        for k in range(bits)
    ]
    per_doc = w.groupBy(id_col).agg(*votes)
    fp = None
    for k in range(bits):
        bit = F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        fp = bit if fp is None else (fp + bit)
    return per_doc.select(id_col, fp.cast("long").alias("simhash"))


MAX_SHINGLE_DF = 1000  # document-frequency cap on the shingle join key


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    The shingle equi-self-join IS the candidate generator (pairs with
    zero overlap never materialize); set sizes come from one groupBy.
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.

    Shingles whose document frequency exceeds `max_df` are dropped BEFORE
    both the join and the per-doc size counts (standard prefix/positional
    filtering): a boilerplate trigram shared by 10^6 docs otherwise makes
    the equi-self-join quadratic in that key.  The Jaccard is then exact
    over the FILTERED shingle sets -- internally consistent (numerator
    and denominators use the same sets), and high-frequency shingles
    carry no similarity signal anyway.  The join is bounded at max_df^2
    rows per shingle."""
    raw = shingles(df, id_col, text_col, n)
    rare = (
        raw.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )
    sh = raw.join(rare, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- embedding-cosine near-duplicates (hyperplane LSH bands + exact refine) ---
#
# The vector-space member of the dedup family (driver mandate:
# "embedding-cosine near-dup"): candidate pairs come from random-
# hyperplane LSH banding (SimHash-for-vectors, Charikar 2002), the exact
# cosine is then computed only inside buckets.  Same filter-refine /
# hot-bucket-cap shape as minhash_lsh_pairs, so the same 100TB argument
# applies: never all-pairs, every self-join bounded by EMB_MAX_BUCKET^2
# per bucket, all hot-path math is JVM column expressions.
EMB_BANDS = 4
EMB_ROWS = 8  # planes per band; P(band match) = agree^8, OR over 4 bands
EMB_MAX_BUCKET = 64
_EMB_BUCKET_STRIDE = 4_294_967_296  # band * stride + signature


def emb_plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5).

    Pure int64 arithmetic (no RNG state) so the DuckDB oracle regenerates
    the planes bit-identically: ((p*73856093 + d*19349663) * 1103515245)
    mod (2^31 - 1), scaled.  Max intermediate ~4e18 < int64 max."""
    return ((p * 73856093 + d * 19349663) * 1103515245) % 2147483647 / 2147483647.0 - 0.5


def _emb_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    bands: int = EMB_BANDS,
    rows: int = EMB_ROWS,
    max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b) pairs with exact cosine >= threshold, candidates
    pruned to pairs sharing at least one band signature.

    Stage 1 (pure codegen): bands*rows projections per vector as
    zip_with/aggregate folds, packed into `bands` sign-bit signatures;
    one posexplode emits (id, bucket) rows.  Stage 2: buckets larger
    than max_bucket are dropped (skew guard -- a degenerate region of
    embedding space otherwise costs O(bucket^2)), then one equi-self-join
    on bucket + distinct yields candidates.  Stage 3: two id-equi-joins
    re-attach the vectors and the exact cosine filters.  Recall < 1 by
    construction (a >=threshold pair missed by all bands is dropped);
    with rows=8/bands=4 the miss probability at cos 0.99 is ~1e-3.

    Reference parity: b6 has no embedding operators; this is the
    LLM-data-pipeline mandate member (SimHash-for-vectors per Charikar
    2002, banding per Leskovec et al. MMDS ch.3)."""
    sig_cols = []
    for b in range(bands):
        sig = F.lit(0).cast("long")
        for r in range(rows):
            p = b * rows + r
            plane = F.array(*[F.lit(emb_plane_weight(p, d)) for d in range(dim)])
            proj = _emb_dot(F.col(vec_col), plane)
            sig = sig + F.when(proj > 0, F.lit(1 << r)).otherwise(F.lit(0))
        sig_cols.append(sig.alias(f"_sig{b}"))
    bk = df.select(F.col(id_col), *sig_cols).select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"_sig{b}") for b in range(bands)])).alias(
            "_band", "_sig"
        ),
    ).select(
        F.col(id_col),
        (F.col("_band").cast("long") * _EMB_BUCKET_STRIDE + F.col("_sig")).alias(
            "bucket"
        ),
    )
    small = (
        bk.groupBy("bucket")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket)
        .select("bucket")
    )
    capped = bk.join(small, "bucket")
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = _emb_dot(F.col("_va"), F.col("_vb")) / (
        F.sqrt(_emb_dot(F.col("_va"), F.col("_va")))
        * F.sqrt(_emb_dot(F.col("_vb"), F.col("_vb")))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cos >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )


def apply_dedup(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_k: str = "k",
    label_lbl: str = "lbl",
) -> DataFrame:
    """The corpus AFTER near-dup removal: every duplicate-cluster member
    except the cluster's canonical keeper (its minimum id — the
    component label) is dropped; documents in no cluster pass through
    untouched.  `labels` is connected_components() output over the
    near-dup pair graph.

    One anti-join on the id: the loser side is bounded by the number of
    documents that collided in ANY near-dup pair — tiny relative to the
    corpus — so AQE broadcasts it and the corpus is never shuffled."""
    losers = labels.where(F.col(label_k) != F.col(label_lbl)).select(
        F.col(label_k).alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    `min_hits` distinct word n-grams with any benchmark document -- the
    standard 13-gram test-set-overlap rule used when preparing training
    corpora (GPT-3 appendix C / PaLM-style contamination checks; public
    methodology).

    Distributed shape: both sides shingle with the same zero-shuffle
    array expressions as the dedup family (operators/dedup.shingles);
    the benchmark shingle set is typically tiny next to the corpus, so
    the overlap check is ONE equi-join on the shingle key (broadcast by
    AQE at real benchmark sizes) + one per-document count.  Returns
    (id, contaminated boolean, n_hits) for every corpus document --
    callers anti-join or filter.
    """
    cs = shingles(corpus, id_col, text_col, n)
    bs = shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    hits = cs.join(bs, "shingle").groupBy(id_col).agg(F.count("*").alias("n_hits"))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


# --- exact substring (span-level) dedup -------------------------------------
#
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better" (public methodology): remove every maximal token span that
# occurs more than once in the corpus, rather than dropping whole
# documents.  The suffix-array construction of the paper is replaced by
# the equivalent windowed formulation that distributes: a token is
# duplicated iff some k-token window covering it occurs >= 2 times
# corpus-wide (multiplicity counted across AND within documents), and
# spans are maximal runs of duplicated tokens.

DUP_SPAN_K = 13  # the standard 13-token overlap window


def token_windows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, gram): every k-token window of every document, built
    from zero-shuffle array expressions (same tokenization as
    shingles(): split on whitespace after trim).  pos is 1-based."""
    toks = df.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    wins = F.when(
        F.size("_toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.concat_ws(" ", F.slice("_toks", i, k)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    return toks.select(F.col(id_col), F.explode(wins).alias("w")).select(
        id_col, F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    gram_key: str = "hash",
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start, span_end,
    span_tokens), token positions 1-based inclusive.

    Plan shape at scale: one groupBy on the gram key (map-side partial
    counts -- hot boilerplate grams cost one counter row, never a
    quadratic bucket, unlike pair-producing LSH joins), one shuffle
    join back on the same key, one per-DOCUMENT window for the interval
    merge.  No self-join anywhere.

    gram_key='hash' shuffles 8-byte xxhash64 keys (a 2^-64 collision
    could mark a unique span duplicated -- the standard trade at corpus
    scale); 'text' shuffles the gram strings (bit-exact, ~k times the
    shuffle bytes).  Both orderings produce identical spans on
    collision-free data (pinned in tests)."""
    from pyspark.sql.window import Window

    wins = token_windows(df, id_col, text_col, k)
    key = F.xxhash64("gram") if gram_key == "hash" else F.col("gram")
    keyed = wins.select(id_col, "pos", key.alias("gk"))
    dup_keys = (
        keyed.groupBy("gk").agg(F.count("*").alias("_n")).filter(F.col("_n") >= 2).select("gk")
    )
    dup = keyed.join(dup_keys, "gk").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    # windows sorted by pos: a new span starts when this window no longer
    # overlaps-or-abuts the previous one's [pos, pos+k-1] coverage
    brk = F.coalesce(
        (F.col("pos") > F.lag("pos").over(w) + k).cast("int"), F.lit(1)
    )
    return (
        dup.withColumn("_brk", brk)
        .withColumn("_span", F.sum("_brk").over(w))
        .groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    gram_key: str = "hash",
) -> DataFrame:
    """The corpus AFTER span-level dedup: tokens covered by any
    duplicated span are dropped, survivors re-join with single spaces
    (whitespace normalizes, same as the tokenization).  Documents with
    no duplicated span pass through with the same normalization.

    The span table is tiny next to the corpus (only documents with
    corpus-duplicated text appear), so the join back is broadcast-sized
    at real corpus shapes; the rebuild itself is pure array
    expressions."""
    spans = duplicate_spans(df, id_col, text_col, k, gram_key)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    )
    joined = toks.join(per_doc, id_col, "left")
    indexed = F.transform(
        "_toks", lambda t, i: F.struct((i + 1).cast("int").alias("pos"), t.alias("tok"))
    )
    kept = F.when(F.col("_spans").isNull(), indexed).otherwise(
        F.filter(
            indexed,
            lambda s: ~F.exists(
                "_spans",
                lambda sp: (s["pos"] >= sp["span_start"]) & (s["pos"] <= sp["span_end"]),
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s["tok"])).alias(text_col),
        F.size(kept).alias("n_tokens_after"),
    )
