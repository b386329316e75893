"""Dedup operator unit tests: zero-shuffle shingles, MinHash banding,
and the LSH bucket-size cap (the corpus-scale skew guard)."""

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_match_reference_ngrams(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "x  y"), (3, "only two"), (4, " padded  text here ")])
    got = {
        (r["doc_id"], r["shingle"])
        for r in dedup.shingles(df, "doc_id", "text", n=3).collect()
    }
    assert got == {
        (1, "a b c"),
        (1, "b c d"),
        (4, "padded text here"),
    }


def test_shingles_distinct_per_doc(spark):
    df = _docs(spark, [(1, "a b a b a b")])  # "a b a" and "b a b" repeat
    rows = dedup.shingles(df, "doc_id", "text", n=3).collect()
    assert sorted(r["shingle"] for r in rows) == ["a b a", "b a b"]


def test_shingles_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c d")])
    plan = dedup.shingles(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_minhash_identical_docs_collide_in_every_band(spark):
    df = _docs(spark, [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")])
    sig = dedup.minhash_signatures(df, "doc_id", "text").collect()
    s1 = next(r for r in sig if r["doc_id"] == 1)
    s2 = next(r for r in sig if r["doc_id"] == 2)
    assert all(s1[f"mh{i}"] == s2[f"mh{i}"] for i in range(dedup.N_PERM))
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text").collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    # max_bucket+2 identical docs -> every band bucket holds all of them
    # -> capped out -> no candidate pairs survive
    n = 6
    df = _docs(spark, [(i, "same boilerplate text everywhere") for i in range(n)])
    uncapped = dedup.minhash_lsh_pairs(df, "doc_id", "text", max_bucket=dedup.MAX_BUCKET)
    assert uncapped.count() == n * (n - 1) // 2
    capped = dedup.minhash_lsh_pairs(df, "doc_id", "text", max_bucket=n - 1)
    assert capped.count() == 0


def test_lsh_near_dup_still_found_below_cap(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 word differs
            (3, "completely different content with other words entirely"),
        ],
    )
    pairs = {
        (p["doc_a"], p["doc_b"])
        for p in dedup.minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
