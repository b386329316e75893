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


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    # a shingle shared by every doc is dropped once its document
    # frequency exceeds max_df; pairs only sharing hot shingles vanish,
    # pairs sharing rare shingles survive with jaccard over the
    # FILTERED sets (numerator and denominators consistent).
    rows = [(i, f"common shingle here unique{i} tail{i} word{i}") for i in range(5)]
    rows += [(10, "common shingle here alpha beta gamma"),
             (11, "common shingle here alpha beta gamma")]
    df = _docs(spark, rows)
    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01)
    assert uncapped.filter("doc_a = 0 AND doc_b = 1").count() == 1
    capped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01, max_df=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    # docs 0..4 only shared the hot "common shingle here" -> gone
    assert (0, 1) not in got
    # docs 10/11 share 3 rare shingles (alpha..gamma window) -> exact 1.0
    # over the filtered sets (the hot shingle is excluded from both sides)
    assert got[(10, 11)] == pytest.approx(1.0)


def test_ngram_jaccard_capped_join_excludes_hot_key_from_sizes(spark):
    # sizes must be counted over the filtered shingle set: two identical
    # docs keep jaccard == 1.0 regardless of how many shingles were
    # dropped by the cap.
    rows = [(i, "hot hot hot hot rare%d x y" % i) for i in range(4)]
    rows += [(20, "hot hot hot hot shared suffix words"),
             (21, "hot hot hot hot shared suffix words")]
    df = _docs(spark, rows)
    capped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5, max_df=2)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    assert got[(20, 21)] == pytest.approx(1.0)


def test_cache_registry_same_key_keeps_plan_cache():
    """Re-registering the SAME query key must keep the original handle
    (Spark caches match by analyzed plan; unpersisting the old handle
    would drop the shared entry under the new one), while a different
    key releases everything else."""
    from diagonal_b6_spark import catalog

    class H:
        def __init__(self):
            self.released = 0

        def unpersist(self):
            self.released += 1

    catalog.release_caches()
    a, b, c = H(), H(), H()
    catalog._register_cache("k1", a)
    catalog._register_cache("k1", b)  # warm-up -> timed-run repeat
    assert catalog._LIVE_CACHES["k1"] is a and a.released == 0
    catalog._register_cache("k2", c)
    assert a.released == 1 and list(catalog._LIVE_CACHES) == ["k2"]
    catalog.release_caches()
    assert c.released == 1 and not catalog._LIVE_CACHES


# --- embedding-cosine near-dup (hyperplane LSH bands + exact refine) ---


def _vecs(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_embedding_cosine_identical_vectors_pair(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    dim = 16
    base = rng.standard_normal((5, dim))
    rows = [(i, base[i]) for i in range(5)] + [(100 + i, base[i]) for i in range(5)]
    out = dedup.embedding_cosine_pairs(
        _vecs(spark, rows, dim), dim=dim, threshold=0.999
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # identical copies share every band signature and have cosine 1.0
    assert got == {(i, 100 + i) for i in range(5)}


def test_embedding_cosine_threshold_excludes_dissimilar(spark):
    dim = 8
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)  # orthogonal to a
    out = dedup.embedding_cosine_pairs(
        _vecs(spark, [(1, a), (2, a), (3, b)], dim), dim=dim, threshold=0.9
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_embedding_cosine_hot_bucket_cap(spark):
    # 10 identical vectors all land in the same bucket in every band;
    # with max_bucket below the bucket size the self-join must be pruned
    dim = 8
    v = [1.0] * dim
    rows = [(i, v) for i in range(10)]
    out = dedup.embedding_cosine_pairs(
        _vecs(spark, rows, dim), dim=dim, threshold=0.5, max_bucket=5
    )
    assert out.count() == 0


def test_embedding_cosine_plane_weights_deterministic_and_bounded(spark):
    ws = [dedup.emb_plane_weight(p, d) for p in range(32) for d in range(64)]
    assert all(-0.5 <= w < 0.5 for w in ws)
    # regenerating gives identical values (pure arithmetic, no RNG state)
    assert ws == [dedup.emb_plane_weight(p, d) for p in range(32) for d in range(64)]
    # and they are well-spread (not degenerate)
    import numpy as np

    assert abs(float(np.mean(ws))) < 0.05
    assert float(np.std(ws)) > 0.2


def test_decontaminate_closed_form(spark):
    """13-gram (here 3-gram for a compact fixture) overlap flags exactly
    the documents sharing a full n-gram with the benchmark, counting
    distinct shared shingles."""
    from diagonal_b6_spark.operators import dedup as dedup_ops

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shares 'a b c' and 'b c d' with bench
            (2, "x y z w v"),        # clean
            (3, "q a b c q q"),      # shares 'a b c' only
            (4, "c d e f g"),        # 'c d e' present in bench doc
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in dedup_ops.decontaminate(corpus, bench, n=3).collect()
    }
    assert out[1] == (3, True)   # a b c / b c d / c d e
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (1, True)


def test_decontaminate_min_hits_threshold(spark):
    from diagonal_b6_spark.operators import dedup as dedup_ops

    corpus = spark.createDataFrame(
        [(1, "a b c x y"), (2, "a b c d y")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    out = {
        r.doc_id: r.contaminated
        for r in dedup_ops.decontaminate(corpus, bench, n=3, min_hits=2).collect()
    }
    assert out == {1: False, 2: True}  # doc 2 shares 'a b c' AND 'b c d'


def _span_corpus(spark):
    """Closed-form span fixture, k=4: 'A B C D E' repeats in docs 1 and 2
    (one maximal 5-token span each), doc 3 repeats a 4-gram WITHIN
    itself twice (within-doc multiplicity counts), doc 4 is unique."""
    rows = [
        (1, "A B C D E x1 y1 z1 w1"),
        (2, "p2 q2 A B C D E r2 s2"),
        (3, "m n o p GAP1 GAP2 GAP3 m n o p"),
        (4, "u4 v4 w4 x4 y4 z4"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_duplicate_spans_closed_form(spark):
    spans = dedup.duplicate_spans(_span_corpus(spark), k=4).collect()
    got = sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in spans)
    # doc1: A..E at tokens 1-5; doc2: at 3-7; doc3: 'm n o p' at 1-4 and 8-11
    assert got == [(1, 1, 5, 5), (2, 3, 7, 5), (3, 1, 4, 4), (3, 8, 11, 4)]


def test_duplicate_spans_adjacent_windows_merge(spark):
    """Two duplicated windows that abut exactly (pos2 == pos1 + k) form
    ONE contiguous duplicated-token run, not two spans."""
    rows = [
        (1, "a b c d e f x x x"),
        (2, "a b c q1 q2 q3 d e f"),  # duplicates 'a b c' and 'd e f' separately
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, k=3).collect()
    }
    # doc1: windows at pos 1 ('a b c') and pos 4 ('d e f') abut -> one span 1-6
    assert (1, 1, 6) in spans
    assert (2, 1, 3) in spans and (2, 7, 9) in spans


def test_duplicate_spans_hash_and_text_keys_agree(spark):
    df = _span_corpus(spark)
    a = sorted(map(tuple, dedup.duplicate_spans(df, k=4, gram_key="hash").collect()))
    b = sorted(map(tuple, dedup.duplicate_spans(df, k=4, gram_key="text").collect()))
    assert a == b


def test_remove_duplicate_spans_closed_form(spark):
    out = {
        r.doc_id: (r.text, r.n_tokens_after)
        for r in dedup.remove_duplicate_spans(_span_corpus(spark), k=4).collect()
    }
    assert out[1] == ("x1 y1 z1 w1", 4)
    assert out[2] == ("p2 q2 r2 s2", 4)
    assert out[3] == ("GAP1 GAP2 GAP3", 3)
    assert out[4] == ("u4 v4 w4 x4 y4 z4", 6)  # untouched, normalization only


def test_duplicate_spans_no_self_join_plan(spark):
    """The gram-frequency stage must be an aggregate + equi-join back,
    never a gram-table self-join producing pairs: the executed plan has
    no cartesian/nested-loop join, and short docs (< k tokens) produce
    no windows at all."""
    df = _span_corpus(spark)
    plan = dedup.duplicate_spans(df, k=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    tiny = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    assert dedup.token_windows(tiny, "doc_id", "text", 4).count() == 0


def test_duplicate_spans_brute_force_equivalence(spark):
    """Seeded random corpora over a tiny alphabet (forcing heavy window
    collisions) against a python brute-force reference of the stated
    semantics: token duplicated iff covered by a window occurring >= 2
    times corpus-wide; spans = maximal duplicated runs."""
    import numpy as np

    def brute(docs, k):
        from collections import Counter

        toks = {d: t.strip().split() if t.strip() else [""] for d, t in docs}
        wins = Counter()
        for d, ts in toks.items():
            for i in range(len(ts) - k + 1):
                wins[tuple(ts[i : i + k])] += 1
        spans = set()
        for d, ts in toks.items():
            covered = sorted(
                {
                    p
                    for i in range(len(ts) - k + 1)
                    if wins[tuple(ts[i : i + k])] >= 2
                    for p in range(i + 1, i + k + 1)  # 1-based token positions
                }
            )
            run_start = None
            prev = None
            for p in covered + [None]:
                if run_start is None:
                    run_start = p
                elif p is None or p > prev + 1:
                    spans.add((d, run_start, prev, prev - run_start + 1))
                    run_start = p
                prev = p if p is not None else prev
        return spans

    rng = np.random.default_rng(20260821)
    for trial in range(8):
        k = int(rng.integers(2, 5))
        n_docs = int(rng.integers(3, 9))
        docs = []
        for d in range(n_docs):
            n = int(rng.integers(0, 26))
            docs.append((d, " ".join(rng.choice(list("abcd"), size=n))))
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in dedup.duplicate_spans(df, k=k).collect()
        }
        want = brute(docs, k)
        assert got == want, (trial, k, docs, got ^ want)
