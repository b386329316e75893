"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and sorted values EXACTLY (bit-exact
floats).  If this passes, any sane value-hash comparison passes.

Runs at sf0.001 for speed; test_oracle_parity_sf001 is the smoke tier.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                # exact bits matter, but map -0.0 -> 0.0 and NaN -> sentinel
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(v + 0.0)
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    # align column order by name before comparing values
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    s_sorted = _normalize([tuple(r[i] for i in sidx) for r in srows])
    d_sorted = _normalize([tuple(r[i] for i in didx) for r in drows])
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without oracles must still run and return sane results."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["event_id", "feature_id"]
