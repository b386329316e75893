"""Text operators: the vectorized rolling-hash fingerprint must be
bit-identical to the per-byte Horner fold it replaced (and meaningfully
faster on long documents)."""

import time

from hypothesis import given, settings, strategies as st

from diagonal_b6_spark.operators.text import _FP_MOD, _FP_BASE, _fingerprint_bytes


def _naive(s: str) -> int:
    h = 0
    for b in (s or "").encode("utf-8", errors="replace"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_fingerprint_matches_horner_fold(s):
    assert _fingerprint_bytes(s) == _naive(s)


def test_fingerprint_edge_cases():
    assert _fingerprint_bytes("") == 0
    assert _fingerprint_bytes(None) == 0
    assert _fingerprint_bytes("\x00") == 0
    assert _fingerprint_bytes("\x00a") == ord("a")
    # beyond the initial 4096-entry power table (exercises extension)
    long = "z" * 10_000
    assert _fingerprint_bytes(long) == _naive(long)


def test_fingerprint_speedup_on_long_docs():
    docs = ["word " * 5_000] * 20  # 25k chars each

    def timed(fn):
        # best-of-3: a single run can be inflated arbitrarily by CPU
        # contention from a concurrent Spark suite on the same host
        best = float("inf")
        out = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = [fn(s) for s in docs]
            best = min(best, time.perf_counter() - t0)
        return out, best

    vec, t_vec = timed(_fingerprint_bytes)
    naive, t_naive = timed(_naive)
    assert vec == naive
    assert t_naive / t_vec >= 5.0, f"speedup only {t_naive / t_vec:.1f}x"


def test_pack_sequences_empty_and_single(spark):
    from diagonal_b6_spark.operators import text as text_ops

    empty = spark.createDataFrame([], "doc_id long, n_tokens int")
    assert text_ops.pack_sequences(empty, "doc_id", "n_tokens", 100).count() == 0
    one = spark.createDataFrame([(7, 42)], "doc_id long, n_tokens int")
    rows = text_ops.pack_sequences(one, "doc_id", "n_tokens", 100).collect()
    assert len(rows) == 1 and rows[0]["pack_id"] == 0
