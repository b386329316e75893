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


def debug_tokens(features: DataFrame) -> DataFrame:
    """`debug-tokens` / `debug-all-query` (fn debug.go:1-24): the search
    tokens a feature posts under -- tag tokens (k=v) plus its s2 covering
    cell tokens, i.e. exactly what the cover/tag indexes key on."""
    from . import geo_fn

    tags = features.select(
        "feature_id", F.explode("tags").alias("k", "v")
    ).select("feature_id", F.concat_ws("=", "k", "v").alias("token"))
    cells = geo_fn.s2_covering(features).select(
        "feature_id", F.concat(F.lit("s2:"), F.col("token")).alias("token")
    )
    return tags.unionByName(cells)


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
