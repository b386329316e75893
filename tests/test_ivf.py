"""IVF similarity search: exactness at nprobe==k, recall at nprobe<k,
k-means structural sanity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog, fixtures
from diagonal_b6_spark.operators import similarity as sim_ops

SF = "/root/testdata/sf0.001"


def _brute(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(catalog.ORACLES["embedding_knn"]).fetchall())


def test_ivf_exact_equals_bruteforce(spark):
    got = sorted(
        tuple(r) for r in catalog.QUERIES["embedding_knn_ivf_exact"](spark, SF).collect()
    )
    assert got == _brute(spark)


def test_ivf_recall_at_nprobe2(spark):
    brute = {(r[0], r[2]) for r in _brute(spark)}
    approx = catalog.QUERIES["embedding_knn_ivf"](spark, SF).collect()
    hits = sum(1 for r in approx if (r["probe_id"], r["vec_id"]) in brute)
    assert hits / len(brute) >= 0.6  # 2-of-8 cells probed


def test_kmeans_structure(spark):
    emb = fixtures.testdata(spark, SF, "embeddings")
    assigned, cents = sim_ops.ivf_index(emb, k=4, iters=2)
    c = cents.collect()
    assert len(c) == 4
    dim = len(emb.first()["embedding"])
    assert all(len(r["centroid"]) == dim for r in c)
    a = assigned.collect()
    assert len(a) == emb.count()  # every vector assigned exactly once
    assert set(r["cent_id"] for r in a) <= {r["cent_id"] for r in c}
