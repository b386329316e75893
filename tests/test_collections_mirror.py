"""Direct mirrors of the reference's collection-function tests
(api/functions/collections_test.go) with the reference's exact fixtures
and expected values, driven through operators/agg.py.

TestTopWithMixedValuesGivesAnError has no Spark twin by design: a
DataFrame column carries ONE type, so a mixed int/float collection is
unrepresentable -- the error the reference raises at iteration time is
raised here by the schema system at construction time.
"""

from pyspark.sql import functions as F

from diagonal_b6_spark.operators import agg


def test_take_preserves_collection_order(spark):
    """collections_test.go TestTake: the first n values of a 1000-value
    collection, in collection order."""
    import random

    rng = random.Random(42)
    vals = [rng.random() for _ in range(1000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "key int, value double"
    )
    took = agg.take(df, "key", 100).collect()
    assert len(took) == 100
    assert [r["value"] for r in took] == vals[:100]


def test_top_float_and_int(spark):
    """TestTopFloat / TestTopInt: top 100 of shuffled 0..999 is
    999..900 descending, for both value types."""
    import random

    for typ, cast in (("double", float), ("bigint", int)):
        vals = [cast(i) for i in range(1000)]
        random.Random(42).shuffle(vals)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], f"key int, value {typ}"
        )
        got = [r["value"] for r in agg.top_k(df, "value", 100, "key").collect()]
        assert got == [cast(999 - i) for i in range(100)]


def test_filter_by_limit(spark):
    """TestFilter: values above the 0.5 limit survive, none below."""
    import random

    rng = random.Random(42)
    df = spark.createDataFrame(
        [(i, rng.random()) for i in range(1000)], "key int, value double"
    )
    out = [r["value"] for r in df.filter(F.col("value") > 0.5).collect()]
    assert out and all(v > 0.5 for v in out)


def test_sum_by_key_reference_fixture(spark):
    """TestSumByKey: population:total 100+200, population:children 50."""
    df = spark.createDataFrame(
        [("population:total", 100), ("population:children", 50),
         ("population:total", 200)],
        "key string, value int",
    )
    got = {r["key"]: r["total"] for r in agg.sum_by_key(df, "key", "value").collect()}
    assert got == {"population:total": 300, "population:children": 50}


def test_count_values_reference_fixture(spark):
    """TestCountValues: values [2, 3, 2] -> {2: 2, 3: 1}."""
    df = spark.createDataFrame(
        [("epc:habitablerooms", 2), ("epc:habitablerooms", 3),
         ("epc:habitablerooms", 2)],
        "key string, value int",
    )
    got = {r["value"]: r["n"] for r in agg.count_values(df, "value").collect()}
    assert got == {2: 2, 3: 1}


def test_count_keys_reference_fixture(spark):
    """TestCountKeys: habitablerooms x2, bedrooms x1."""
    df = spark.createDataFrame(
        [("epc:habitablerooms", 2), ("epc:habitablerooms", 3),
         ("epc:bedrooms", 4)],
        "key string, value int",
    )
    got = {r["key"]: r["n"] for r in agg.count_keys(df, "key").collect()}
    assert got == {"epc:habitablerooms": 2, "epc:bedrooms": 1}


def test_count_valid_keys_emits_zero_counts(spark):
    """TestCountValidKeys: a key whose only value is invalid still
    appears, with count 0 -- the zero row must NOT be dropped."""
    o = "area/diagonal.works/test/origin"
    d = "area/diagonal.works/test/destination"
    df = spark.createDataFrame(
        [(f"{o}/0", f"{d}/0", True), (f"{o}/0", f"{d}/1", True),
         (f"{o}/1", "invalid", False)],
        "key string, value string, valid boolean",
    )
    got = {r["key"]: r["n"] for r in agg.count_keys(df, "key", "valid").collect()}
    assert got == {f"{o}/0": 2, f"{o}/1": 0}


def test_flatten_preserves_inner_pairs(spark):
    """TestFlatten: flattening a collection of collections concatenates
    the INNER (key, value) pairs -- keys survive."""
    rows = [
        (0, [("ka", "va"), ("kb", "vb"), ("kc", "vc")]),
        (1, [("kd", "vd"), ("ke", "ve"), ("kf", "vf")]),
    ]
    df = spark.createDataFrame(
        rows, "outer int, inner array<struct<key:string,value:string>>"
    )
    got = {r["key"]: r["value"] for r in agg.flatten(df, "inner").collect()}
    assert got == {
        "ka": "va", "kb": "vb", "kc": "vc",
        "kd": "vd", "ke": "ve", "kf": "vf",
    }
    # scalar arrays keep the bare `value` shape
    plain = spark.createDataFrame([(0, [1, 2]), (1, [3])], "k int, inner array<int>")
    assert sorted(r["value"] for r in agg.flatten(plain, "inner").collect()) == [1, 2, 3]


def test_join_missing_reference_fixture(spark):
    """TestJoinMissing: base {1: Dishoom, 3: Vermuteria} joined with
    {0, 1, 2, 4} -> base wins on key collisions, merged in key order."""
    base = spark.createDataFrame(
        [(1, "point/openstreetmap.org/node/3501612811"),   # Dishoom
         (3, "point/openstreetmap.org/node/4995934414")],  # Vermuteria
        "key int, value string",
    )
    join = spark.createDataFrame(
        [(0, "point/openstreetmap.org/node/1447052073"),   # bridge north end
         (1, "point/openstreetmap.org/node/4966136630"),   # Somers Town gate
         (2, "point/openstreetmap.org/node/1540349979"),   # bridge south end
         (4, "point/openstreetmap.org/node/2329774796")],  # bike parking
        "key int, value string",
    )
    out = agg.join_missing(base, join, "key").orderBy("key").collect()
    assert [r["value"] for r in out] == [
        "point/openstreetmap.org/node/1447052073",
        "point/openstreetmap.org/node/3501612811",   # base wins at key 1
        "point/openstreetmap.org/node/1540349979",
        "point/openstreetmap.org/node/4995934414",
        "point/openstreetmap.org/node/2329774796",
    ]
