"""Deduplication operators for large-scale training-data pipelines
(driver mandate: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Everything is built from JVM-side DataFrame expressions (md5/conv/split/
explode/groupBy) -- no Python in the hot path -- so each stage is one
shuffle on its natural key and scales with executors.

Shared hash: H(s) = first 15 hex chars of md5(s) as int64 (portable to
any engine, used identically by the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
# (a, b) parameters of the 4 universal hash functions h_i(x) = (a*x + b) mod p
MINHASH_PARAMS = [(911, 3), (3571, 17), (181, 257), (7919, 29)]


def _h15(col):
    """Portable 60-bit string hash: first 15 hex chars of md5 -> bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document."""
    w = words(df, id_col, text_col)
    joined = w.alias("a")
    for k in range(1, n):
        joined = joined.join(
            w.alias(f"w{k}"),
            (F.col(f"a.{id_col}") == F.col(f"w{k}.{id_col}"))
            & (F.col(f"w{k}.pos") == F.col("a.pos") + k),
        )
    parts = [F.col("a.word")] + [F.col(f"w{k}.word") for k in range(1, n)]
    return joined.select(
        F.col(f"a.{id_col}").alias(id_col),
        F.concat_ws(" ", *parts).alias("shingle"),
    ).distinct()


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
    """4-permutation MinHash signature per doc over word n-gram shingles."""
    sh = shingles(df, id_col, text_col, n)
    hashed = sh.select(id_col, (_h15(F.col("shingle")) % MOD).alias("sh"))
    aggs = [
        F.min((F.col("sh") * F.lit(a) + F.lit(b)) % F.lit(MOD)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: 2 bands x 2 rows.
    A pair collides if either band's signature half matches exactly
    (shingle -> minhash -> band -> bucket-join; the standard web-dedup
    pipeline expressed as two groupBy-free equi-self-joins)."""
    sig = minhash_signatures(df, id_col, text_col, n)
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                F.concat_ws("_", F.lit("b0"), "mh0", "mh1"),
                F.concat_ws("_", F.lit("b1"), "mh2", "mh3"),
            )
        ).alias("bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


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


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    The shingle equi-self-join IS the candidate generator (pairs with
    zero overlap never materialize); set sizes come from one groupBy.
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sh = shingles(df, id_col, text_col, n)
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
