"""Query algebra + find surface: b6's WHERE clause as Column predicates.

The reference compiles `tagged/keyed/typed/and/or` queries into inverted-
index iterators with a tuple-level re-check (reference: b6/search.go:21-27,
116-264, 285-441; constructors fn search.go:112-204).  Spark-first: each
query constructor returns a Column predicate; Catalyst turns tag-map
lookups into pushed-down filters, and partitioning the feature table by
feature_type gives the `typed` key-range pruning for free.

Searchability mirrors b6's token rules (b6/search.go:107-114): `#`-keys
are value-searchable, `@`-keys key-only searchable, unprefixed keys stored
but unindexed -- enforced here by `searchable`, which refuses to build
predicates over unindexed keys just as the reference's index never posts
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def searchable(key: str, need_value: bool = False) -> None:
    if key.startswith("#"):
        return
    if key.startswith("@") and not need_value:
        return
    raise ValueError(
        f"tag key {key!r} is not indexed: '#'-keys search by key=value, "
        "'@'-keys by key only (b6/search.go:107-114)"
    )


def all_() -> Column:
    """Token `*` (b6/search.go:82-105)."""
    return F.lit(True)


def empty() -> Column:
    return F.lit(False)


def is_valid() -> Column:
    return F.col("feature_id").isNotNull()


def tagged(key: str, value: str) -> Column:
    """`#key=value` equality (b6/search.go:116-152)."""
    searchable(key, need_value=True)
    return F.col("tags")[key] == value


def keyed(key: str) -> Column:
    """Any value for an indexed key (b6/search.go:162-199)."""
    searchable(key)
    return F.col("tags")[key].isNotNull()


def typed(feature_type: str, q: Column | None = None) -> Column:
    """Restrict to a feature type (b6/search.go:201-264)."""
    t = F.col("feature_type") == feature_type
    return t if q is None else (t & q)


def and_(*qs: Column) -> Column:
    out = qs[0]
    for q in qs[1:]:
        out = out & q
    return out


def or_(*qs: Column) -> Column:
    out = qs[0]
    for q in qs[1:]:
        out = out | q
    return out


def find(features: DataFrame, q: Column) -> DataFrame:
    """Lazy collection of matching features, FeatureID-ordered iteration
    (fn search.go:65-69; order invariant b6/world.go:401-411)."""
    return features.filter(q)


def find_feature(features: DataFrame, feature_id: str) -> DataFrame:
    """Point lookup (fn features.go:17-47)."""
    return features.filter(F.col("feature_id") == feature_id)


def matches(features: DataFrame, feature_id: str, q: Column) -> bool:
    """Feature x Query -> bool (fn features.go:202-207)."""
    return find_feature(features, feature_id).filter(q).count() > 0


def all_tags(features: DataFrame) -> DataFrame:
    """Exploded (feature_id, k, v) rows (fn features.go:193-199)."""
    return features.select(
        "feature_id", F.explode(F.col("tags")).alias("k", "v")
    )


def get_tag(features: DataFrame, key: str, out: str = "value") -> DataFrame:
    """`get`: tag lookup as a projected column (fn features.go:131-174)."""
    return features.select("feature_id", F.col("tags")[key].alias(out))


def tag_token() -> Column:
    """TokenForTag (b6/search.go:107-114) over exploded (k, v) columns:
    `#key` posts `key=value`, `@key` posts `key`, anything else posts
    nothing (NULL here; callers drop the row)."""
    return (
        F.when(F.col("k").startswith("#"), F.concat(F.expr("substring(k, 2)"), F.lit("="), F.col("v")))
        .when(F.col("k").startswith("@"), F.expr("substring(k, 2)"))
        .otherwise(F.lit(None))
    )


# raw two's-complement cell bits from the order-preserving signed encoding
# (kernels/cellmath.id_to_signed flips the top bit)
_RAW_CELL = "(cell ^ CAST(-9223372036854775808 AS BIGINT))"
# S2 token: 16 hex digits (leading zeros kept) with trailing zeros stripped
_TOKEN_OF = "trim(TRAILING '0' FROM lpad(lower(hex({x})), 16, '0'))"


def debug_tokens(features: DataFrame) -> DataFrame:
    """`debug-tokens` / `debug-all-query` (fn debug.go:1-24) with the
    reference's exact TokensForFeature rule (ingest/tokens.go:9-27):

    - a bare-vertex point posts NO tokens at all (the reference tests
      `len(AllTags()) == 1` -- its location is itself a tag, b6.PointTag,
      so one tag means NO user tags; geometry lives in xs/ys here, hence
      the translated test is an EMPTY tag map);
    - every other feature posts the all-token `*` (search/search.go:89);
    - physical features (point/path/area) post `s2:<token>` for each
      covering cell above level 0 plus `a2:<token>` for every distinct
      ancestor up to level 0 (search/spatial.go:85-113, RegionCoverer
      MaxLevel=16 MaxCells=5);
    - tags post per TokenForTag (b6/search.go:107-114): `#k=v` -> `k=v`,
      `@k` -> `k`, unprefixed keys post nothing.

    The ancestor walk is pure codegen: explode the ancestor levels, then
    parent(id, l) = (id & -lsb_l) | lsb_l with lsb_l = 1 << 2*(30-l) on
    the raw cell bits, and the hex token via lpad/rtrim -- no Python in
    the loop.  The a2 branch carries ONE shuffle (the per-feature
    ancestor dedup the reference's set semantics require, only effective
    for multi-cell coverings); it is keyed by feature_id with a bounded
    fan-in (<= 5 cells x <= 16 levels), so no skew at corpus scale.
    Ancestor-token parity is pinned bit-for-bit on the reference's own
    search/spatial_test.go fixture in tests."""
    from . import geo_fn

    posting = features.filter(
        ~((F.col("feature_type") == "point") & (F.size("tags") == 0))
    )
    all_tok = posting.select("feature_id", F.lit("*").alias("token"))
    tags = (
        posting.select("feature_id", F.explode("tags").alias("k", "v"))
        .select("feature_id", tag_token().alias("token"))
        .filter(F.col("token").isNotNull())
    )
    physical = posting.filter(F.col("feature_type").isin("point", "path", "area"))
    cov = geo_fn.s2_covering(physical).select(
        "feature_id", F.expr(_RAW_CELL).alias("raw"), "level"
    )
    s2 = cov.filter(F.col("level") > 0).select(
        "feature_id",
        F.concat(F.lit("s2:"), F.expr(_TOKEN_OF.format(x="raw"))).alias("token"),
    )
    anc = (
        cov.filter(F.col("level") > 0)
        .select(
            "feature_id",
            "raw",
            F.explode(F.sequence(F.lit(0), F.col("level") - 1)).alias("plvl"),
        )
        .withColumn("plsb", F.expr("shiftleft(CAST(1 AS BIGINT), 60 - 2 * plvl)"))
        .select(
            "feature_id",
            F.concat(
                F.lit("a2:"),
                F.expr(_TOKEN_OF.format(x="((raw & -plsb) | plsb)")),
            ).alias("token"),
        )
        .distinct()
    )
    return all_tok.unionByName(tags).unionByName(s2).unionByName(anc)


def count_tag_value(features: DataFrame, key: str) -> DataFrame:
    """`count-tag-value` (fn features.go:177-189): one (key, value, 1)
    row per feature carrying the tag -- features without it contribute
    nothing (the reference returns an empty collection)."""
    return features.filter(F.col("tags")[key].isNotNull()).select(
        "feature_id",
        F.lit(key).alias("k"),
        F.col("tags")[key].alias("v"),
        F.lit(1).alias("n"),
    )


def id_to_relation_id(ns, osm_id) -> Column:
    """`id-to-relation-id` (fn features.go registry): rebase a namespaced
    id into the relation id space -- in the tabular model, the canonical
    'relation/<ns>/<id>' feature_id string."""
    return F.concat_ws("/", F.lit("relation"), ns, osm_id.cast("string"))


def find_relations_by_feature(features: DataFrame, target_id: str) -> DataFrame:
    """World.FindRelationsByFeature (b6/world.go relation index;
    behavior pinned by ingest/mutable_test.go:353-392
    ValidateUpdateRelationsByFeatureWhenChangingRelations): relation
    features whose member list references `target_id`.  Members live as
    member:<i> tag entries in the packed schema, so membership is one
    map scan -- a pure column predicate, no index structure to maintain:
    replacing the relation row IS the index update."""
    is_member = F.exists(
        F.map_entries(F.col("tags")),
        lambda e: e["key"].startswith("member:") & (e["value"] == target_id),
    )
    return features.filter(
        (F.col("feature_type") == "relation") & is_member
    )
