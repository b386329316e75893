"""OSM-shaped ingest: way / relation -> feature assembly.

Reference surface: b6 ingests OSM PBF (b6/osm/pbf.go) and assembles ways
and multipolygon relations into areas (b6/osm/polygons.go:11-140 -- ring
assembly stitches member ways end-to-end, closed ways with area tags
become polygons).  This module implements the ASSEMBLY stage against
PBF-shaped DataFrames -- the three tables sources/pbf.py's wire-format
reader (or any OSM parquet export) produces:

    nodes(id long, lat double, lon double, tags map<string,string>)
    ways(id long, refs array<long>, tags map<string,string>)
    relations(id long, members array<struct<type:string, ref:long,
              role:string>>, tags map<string,string>)

Spark-first shapes:
  * ways_to_features: refs explode -> ONE equi-join against nodes ->
    ordered re-assembly per way (collect_list of (pos, lat, lon) sorted
    in the aggregate).  Classification: ANY closed ring -> 'area'
    (closing vertex dropped, packed layout), else 'path' -- the
    reference's exact rule, no tag allowlist.
  * relations_to_areas: member ways gathered per relation, ring
    stitching (endpoint matching, the polygons.go algorithm) runs in an
    Arrow-batched kernel per relation -- rings are small; the heavy
    node join is the same distributed explode/join as ways.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference's exact OSM -> searchable-token key mapping
# (ingest/osm.go:136-157 osmTagMapping): '#'-keys are value-searchable,
# '@'-keys key-only searchable, everything else stored unindexed.
OSM_TAG_MAPPING = {
    "amenity": "#amenity",
    "barrier": "#barrier",
    "boundary": "#boundary",
    "bridge": "#bridge",
    "building": "#building",
    "highway": "#highway",
    "landuse": "#landuse",
    "leisure": "#leisure",
    "natural": "#natural",
    "network": "#network",
    "place": "#place",
    "railway": "#railway",
    "route": "#route",
    "shop": "#shop",
    "tourism": "#tourism",
    "water": "#water",
    "waterway": "#waterway",
    "fhrs:id": "@fhrs:id",
    "wikidata": "@wikidata",
    "wikipedia": "@wikipedia",
}


def _mapping_lit():
    pairs = []
    for k, v in OSM_TAG_MAPPING.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def fill_tags_from_osm(tags: "F.Column"):
    """Column expression: raw OSM tag map -> b6 searchable tag map
    (ingest/osm.go:165-174 FillTagsFromOSM).  Pure codegen --
    transform_keys with a literal-map lookup, no UDF."""
    m = _mapping_lit()
    return F.transform_keys(
        tags, lambda k, _: F.coalesce(F.element_at(m, k), k)
    )


def nodes_to_points(nodes: DataFrame, tagged_only: bool = False) -> DataFrame:
    """OSM nodes -> point features with mapped tags (the reference emits
    EVERY node as a point feature, ingest/osm.go:345-348; pass
    tagged_only=True to keep just the ones carrying tags -- the usual
    analytical subset)."""
    out = nodes
    if tagged_only:
        out = out.filter(F.size("tags") > 0)
    return out.select(
        F.concat(F.lit("point/osm/"), F.col("id")).alias("feature_id"),
        F.lit("point").alias("feature_type"),
        F.lit("osm").alias("ns"),
        fill_tags_from_osm(F.col("tags")).alias("tags"),
        F.array(F.col("lon")).alias("xs"),
        F.array(F.col("lat")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )


def _way_geometry(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """(way id, tags, n_refs, closed, xs, ys) via one refs->nodes join."""
    refs = ways.select(
        F.col("id").alias("way_id"),
        "tags",
        F.size("refs").alias("n_refs"),
        (F.col("refs")[0] == F.element_at("refs", -1)).alias("closed"),
        F.posexplode("refs").alias("pos", "node_id"),
    )
    locs = nodes.select(F.col("id").alias("node_id"), "lat", "lon")
    joined = refs.join(locs, "node_id")
    return (
        joined.groupBy("way_id", "tags", "n_refs", "closed")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "lon", "lat"))).alias("v"))
        .select(
            "way_id", "tags", "n_refs", "closed",
            F.col("v.lon").alias("xs"), F.col("v.lat").alias("ys"),
        )
    )


def ways_to_features(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """OSM ways -> packed features: EVERY closed way becomes an 'area'
    row (closing vertex dropped), every open way a 'path' -- the
    reference's exact rule (ingest/osm.go:214-216 isWayClosed,
    osm.go:357: any closed way fills an AreaFeature, no tag check).
    A closed barrier/fence loop is therefore an area, matching the
    reference's feature counts on its own extracts."""
    g = _way_geometry(nodes, ways)
    is_area = F.col("closed")
    return g.select(
        F.when(is_area, F.concat(F.lit("area/osm/"), F.col("way_id"))).otherwise(
            F.concat(F.lit("path/osm/"), F.col("way_id"))
        ).alias("feature_id"),
        F.when(is_area, F.lit("area")).otherwise(F.lit("path")).alias("feature_type"),
        F.lit("osm").alias("ns"),
        "tags",
        F.when(is_area, F.slice(F.col("xs"), 1, F.size("xs") - 1)).otherwise(F.col("xs")).alias("xs"),
        F.when(is_area, F.slice(F.col("ys"), 1, F.size("ys") - 1)).otherwise(F.col("ys")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )


def _stitch_rings(segments: list) -> list:
    """Chain open way segments into closed rings by endpoint matching
    (b6/osm/polygons.go:62-140's RingBuilder).  segments: list of
    (xs, ys) arrays.  Returns a list of closed rings (closing vertex
    dropped); unclosable chains are discarded."""
    segs = [
        (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
        for x, y in segments
        if len(x) >= 2
    ]
    rings = []
    while segs:
        cx, cy = segs.pop(0)
        cx, cy = list(cx), list(cy)
        progress = True
        while progress and not (cx[0] == cx[-1] and cy[0] == cy[-1]):
            progress = False
            for i, (sx, sy) in enumerate(segs):
                if sx[0] == cx[-1] and sy[0] == cy[-1]:
                    cx.extend(sx[1:]); cy.extend(sy[1:])
                elif sx[-1] == cx[-1] and sy[-1] == cy[-1]:
                    cx.extend(sx[-2::-1]); cy.extend(sy[-2::-1])
                else:
                    continue
                segs.pop(i)
                progress = True
                break
        if len(cx) >= 4 and cx[0] == cx[-1] and cy[0] == cy[-1]:
            rings.append((cx[:-1], cy[:-1]))
    return rings


def relations_to_areas(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame
) -> DataFrame:
    """OSM multipolygon relations -> packed multi-ring area features.

    Member ways (role outer/inner) are resolved to geometry through the
    same distributed node join, gathered per relation, and stitched into
    rings in an Arrow-batched kernel.  Outer rings come first in the
    packed layout; inner rings follow (holes subtract downstream)."""
    members = relations.filter(
        F.col("tags")["type"] == "multipolygon"
    ).select(
        F.col("id").alias("rel_id"),
        "tags",
        F.explode("members").alias("m"),
    ).filter(
        (F.col("m.type") == "way") & F.col("m.role").isin("outer", "inner")
    ).select("rel_id", "tags", F.col("m.ref").alias("way_id"), F.col("m.role").alias("role"))

    geom = _way_geometry(nodes, ways).select("way_id", "xs", "ys")
    with_geom = members.join(geom, "way_id")
    gathered = with_geom.groupBy("rel_id").agg(
        F.first("tags").alias("rel_tags"),
        F.collect_list(F.struct("role", "xs", "ys")).alias("parts"),
    )

    schema = (
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>"
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                outers, inners = [], []
                for part in r.parts:
                    seg = (part["xs"], part["ys"])
                    (outers if part["role"] == "outer" else inners).append(seg)
                o_rings = _stitch_rings(outers)
                i_rings = _stitch_rings(inners)
                if not o_rings:
                    continue
                xs: list[float] = []
                ys: list[float] = []
                offs: list[int] = []
                for rx, ry in o_rings + i_rings:
                    offs.append(len(xs))
                    xs.extend(float(v) for v in rx)
                    ys.extend(float(v) for v in ry)
                out.append(
                    (f"area/osm/r{r.rel_id}", "area", "osm", dict(r.rel_tags), xs, ys, offs)
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "feature_id", "feature_type", "ns", "tags", "xs", "ys", "ring_offsets",
                    ],
                )

    return gathered.mapInPandas(assemble, schema)


def relations_to_relation_features(relations: DataFrame) -> DataFrame:
    """Non-multipolygon OSM relations -> relation features.

    ingest/osm.go:361-391: isRelationArea (type=multipolygon) relations
    become areas; every OTHER relation becomes a RelationFeature carrying
    its members with roles (route relations like the Jubilee Greenway,
    networks, restrictions).  In the engine's packed schema the members
    live in tags as member:<i> feature-id entries plus member_role:<i>
    when the role is non-empty -- the same composite-feature convention
    add-relation writes and list-feature reads back.  Member node ids
    map to point ids and way ids to path ids (the reference's effective
    mapping: its areaWays promotion test at osm.go:378 checks the
    RELATION's id rather than the member's and so never fires).
    Pure column expressions -- no UDF, no driver work."""
    rels = relations.filter(
        F.col("tags")["type"].isNull() | (F.col("tags")["type"] != "multipolygon")
    )
    member_entries = F.transform(
        F.col("members"),
        lambda m, i: F.struct(
            F.concat(F.lit("member:"), i.cast("string")).alias("key"),
            F.concat(
                F.when(m["type"] == "node", F.lit("point"))
                .when(m["type"] == "way", F.lit("path"))
                .otherwise(F.lit("relation")),
                F.lit("/osm/"),
                m["ref"].cast("string"),
            ).alias("value"),
        ),
    )
    role_entries = F.filter(
        F.transform(
            F.col("members"),
            lambda m, i: F.struct(
                F.concat(F.lit("member_role:"), i.cast("string")).alias("key"),
                m["role"].alias("value"),
            ),
        ),
        lambda e: e["value"].isNotNull() & (e["value"] != ""),
    )
    tags = F.map_concat(
        F.col("tags"), F.map_from_entries(F.concat(member_entries, role_entries))
    )
    return rels.select(
        F.concat(F.lit("relation/osm/"), F.col("id")).alias("feature_id"),
        F.lit("relation").alias("feature_type"),
        F.lit("osm").alias("ns"),
        tags.alias("tags"),
        F.array().cast("array<double>").alias("xs"),
        F.array().cast("array<double>").alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )


def relations_to_polygons(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    relation_ids: list[int] | None = None,
) -> DataFrame:
    """Role-free relation -> polygon assembly mirroring the reference's
    osm.RelationToPolygon (b6/osm/polygons.go:11-134).

    Unlike relations_to_areas (which keys on type=multipolygon and
    outer/inner member roles), the reference kernel stitches EVERY way
    member of the relation into closed loops by shared end nodes,
    ignoring the relation's type tag and the member roles entirely --
    real-world boundary relations (e.g. Greater London, relation 65606
    in the reference's own london-boundaries.osm.pbf fixture) carry
    empty roles, so a role filter would drop them.  Ring outer/hole
    classification is recovered structurally instead: even-odd nesting
    depth of each stitched ring's first vertex inside the other rings
    (the reference delegates the same decision to s2.PolygonFromLoops).

    Parity with the reference's error contract (polygons_test.go:134-197):
    a relation whose member ways are missing, whose way refs miss nodes,
    or whose chains do not close assembles to NOTHING here (the Go
    kernel returns an error; its callers skip the relation).

    Output packs outer rings first (ring_depths aligned with
    ring_offsets): depth is the nesting parity, even = additive ring,
    odd = hole, so spherical area = sum(even) - sum(odd).
    """
    rels = relations
    if relation_ids is not None:
        rels = rels.filter(F.col("id").isin([int(i) for i in relation_ids]))
    members = rels.select(
        F.col("id").alias("rel_id"),
        "tags",
        F.explode("members").alias("m"),
    ).filter(F.col("m.type") == "way").select(
        "rel_id", "tags", F.col("m.ref").alias("way_id")
    )

    geom = _way_geometry(nodes, ways).select("way_id", "n_refs", "xs", "ys")
    # Left join so missing member ways are observable (null xs): the
    # reference errors on them, we drop the whole relation below.
    with_geom = members.join(geom, "way_id", "left")
    gathered = with_geom.groupBy("rel_id").agg(
        F.first("tags").alias("rel_tags"),
        F.collect_list(F.struct("n_refs", "xs", "ys")).alias("parts"),
        F.count(F.lit(1)).alias("n_members"),
        F.count("xs").alias("n_resolved"),
    )

    schema = (
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>, "
        "ring_depths array<int>"
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.geom import points_in_polygon

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.n_resolved < r.n_members:
                    continue  # missing member way (reference: error)
                segs = []
                ok = True
                total_in = 0
                for part in r.parts:
                    if len(part["xs"]) != part["n_refs"]:
                        ok = False  # a way ref missed the node table
                        break
                    segs.append((part["xs"], part["ys"]))
                    total_in += len(part["xs"])
                if not ok or not segs:
                    continue
                rings = _stitch_rings(segs)
                if not rings:
                    continue
                # Unclosable-chain parity check: every input vertex must
                # have been consumed.  A ring of k ways has k duplicate
                # joint vertices dropped (k-1 interior joins + the
                # closing vertex), so consumed = sum(len(ring)) + joins.
                consumed = sum(len(rx) for rx, _ in rings)
                # Each segment costs exactly one dropped vertex when fully
                # consumed (one shared joint per stitch, plus the closing
                # vertex of each ring), so any extra drop means an
                # unclosable leftover chain was discarded.
                if total_in - consumed != len(segs):
                    continue
                # Nesting depth of each ring's first vertex in the others.
                depths = []
                for i, (rx, ry) in enumerate(rings):
                    d = 0
                    for j, (ox, oy) in enumerate(rings):
                        if i == j:
                            continue
                        if points_in_polygon(
                            np.asarray([rx[0]]), np.asarray([ry[0]]),
                            np.asarray(ox), np.asarray(oy), [0],
                        )[0]:
                            d += 1
                    depths.append(d)
                order = sorted(range(len(rings)), key=lambda i: (depths[i] % 2, i))
                xs: list[float] = []
                ys: list[float] = []
                offs: list[int] = []
                deps: list[int] = []
                for i in order:
                    offs.append(len(xs))
                    deps.append(depths[i])
                    xs.extend(float(v) for v in rings[i][0])
                    ys.extend(float(v) for v in rings[i][1])
                out.append(
                    (
                        f"area/osm/r{r.rel_id}", "area", "osm",
                        dict(r.rel_tags) if r.rel_tags is not None else {},
                        xs, ys, offs, deps,
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "feature_id", "feature_type", "ns", "tags",
                        "xs", "ys", "ring_offsets", "ring_depths",
                    ],
                )

    return gathered.mapInPandas(assemble, schema)


def world_from_pbf(
    spark, path: str, tagged_points_only: bool = False
) -> DataFrame:
    """ingest.NewWorldFromPBFFile analogue: one call from a .osm.pbf
    file to the engine's packed world-feature contract.

      * every node -> a point feature (pass tagged_points_only=True for
        the analytical subset),
      * every way -> a path, or an area when closed (the reference's
        isWayClosed rule),
      * every type=multipolygon relation -> a stitched multi-ring area,

    with the reference's OSM -> searchable tag mapping
    (ingest/osm.go osmTagMapping: building -> #building, ...) applied to
    EVERY feature, so find(keyed("#building")) etc. match the counts the
    reference's own Granary Square tests pin (test/camden/camden.go).
    The decode is the distributed blob reader (sources/pbf.py); assembly
    is the distributed join/stitch above -- nothing on the driver."""
    from .pbf import read_pbf

    t = read_pbf(spark, path)
    pts = nodes_to_points(t["nodes"], tagged_only=tagged_points_only)
    ways = ways_to_features(t["nodes"], t["ways"]).withColumn(
        "tags", fill_tags_from_osm(F.col("tags"))
    )
    rels = relations_to_areas(t["nodes"], t["ways"], t["relations"]).withColumn(
        "tags", fill_tags_from_osm(F.col("tags"))
    )
    rel_feats = relations_to_relation_features(t["relations"]).withColumn(
        "tags", fill_tags_from_osm(F.col("tags"))
    )
    return (
        pts.unionByName(ways, allowMissingColumns=True)
        .unionByName(rels, allowMissingColumns=True)
        .unionByName(rel_feats, allowMissingColumns=True)
    )


# --- incremental world maintenance (b6/ingest/mutable.go) ---------------------


def _override_by_id(base: DataFrame, patch: DataFrame, inherit: list[str]) -> DataFrame:
    """Replace base rows by id with patch rows; columns listed in
    `inherit` that are absent from (or null in) the patch carry over
    from the shadowed base row -- the reference's modify-in-place
    semantics where a relocated point keeps its tags
    (ingest/mutable.go AddFeature on an existing id)."""
    old = base.select(
        "id", *[F.col(c).alias(f"_old_{c}") for c in inherit]
    )
    p = patch
    for c in inherit:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None))
    p = p.join(old, "id", "left")
    for c in inherit:
        p = p.withColumn(c, F.coalesce(F.col(c), F.col(f"_old_{c}"))).drop(f"_old_{c}")
    p = p.select(*base.columns)
    keep = base.join(p.select("id"), "id", "left_anti")
    return keep.unionByName(p)


def invalid_area_rings(features: DataFrame) -> DataFrame:
    """(feature_id) of area features whose rings properly self-intersect
    -- the geometry the reference's MutableWorld.AddFeature REJECTS
    (s2.Loop validation; fixtures ingest/mutable_test.go:521-574).
    Arrow-batched over the candidate rows; lazy until acted on."""
    import pandas as pd

    from ..kernels import geom as _geom

    area = features.filter(F.col("feature_type") == "area").select(
        "feature_id", "xs", "ys", "ring_offsets"
    )

    def check(batches):
        for pdf in batches:
            bad = []
            for r in pdf.itertuples(index=False):
                offs = list(r.ring_offsets) + [len(r.xs)]
                for a, b in zip(offs[:-1], offs[1:]):
                    if _geom.ring_self_intersects(r.xs[a:b], r.ys[a:b]):
                        bad.append(r.feature_id)
                        break
            yield pd.DataFrame({"feature_id": bad}, dtype="object")

    return area.mapInPandas(check, schema="feature_id string")


def apply_osm_mutations(
    world: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    node_moves: DataFrame | None = None,
    way_rewrites: DataFrame | None = None,
    tagged_points_only: bool = False,
    validate: bool = False,
):
    """Incremental view maintenance for a packed world snapshot -- the
    Spark-first twin of the reference's mutable overlay worlds
    (b6/ingest/mutable.go; fixtures mirrored from mutable_test.go:818-1034
    TestModifyPathInExistingWorld / TestModifyPointsOnPath[OnClosedPath] /
    TestModifyPathWithIntersections).

    The reference stores paths as lists of point-feature REFERENCES, so
    relocating a point or swapping a path's reference list implicitly
    re-geometries every dependent feature and re-indexes it spatially.
    Our packed world materializes geometry, so a change recomputes the
    DIRTY subset only:

      * ``node_moves`` (id, lat, lon[, tags]) relocates point features;
      * ``way_rewrites`` (id, refs[, tags]) replaces vertex lists;
      * dirty ways = ways referencing a moved node, plus rewritten ways
        (one exploded-refs semi-join);
      * those ways re-run the normal assembly (a closed rewrite flips a
        path back to an area exactly like a fresh ingest would);
      * the new snapshot drops every stale version by SOURCE id -- not
        feature_id, since a rewrite may change the feature's TYPE -- and
        unions the rebuilt rows.

    At scale this is the operation that matters: a small change against
    a planet-sized world touches one broadcastable id set and rebuilds a
    bounded subset, instead of re-assembling 10^11 features.

    Returns ``(world', nodes', ways')`` -- the updated snapshot plus the
    updated raw tables (the source of truth for later changes)."""
    moved_ids = None
    if node_moves is not None:
        nodes = _override_by_id(nodes, node_moves, inherit=["tags"])
        moved_ids = node_moves.select("id").distinct()
    if way_rewrites is not None:
        ways = _override_by_id(ways, way_rewrites, inherit=["tags"])

    dirty = None
    if moved_ids is not None:
        ref_hits = (
            ways.select("id", F.explode("refs").alias("nid"))
            .join(F.broadcast(moved_ids.withColumnRenamed("id", "nid")), "nid", "semi")
            .select("id")
        )
        dirty = ref_hits
    if way_rewrites is not None:
        rw = way_rewrites.select("id")
        dirty = rw if dirty is None else dirty.unionByName(rw)
    if dirty is None:
        return world, nodes, ways
    dirty = dirty.distinct()

    rebuilt = ways_to_features(
        nodes, ways.join(F.broadcast(dirty), "id", "semi")
    ).withColumn("tags", fill_tags_from_osm(F.col("tags")))
    if validate:
        # the reference validates EAGERLY inside AddFeature and fails the
        # mutation (mutable_test.go:521-574); Spark plans are lazy, so
        # validation is opt-in: one bounded action over the dirty subset
        bad = [r["feature_id"] for r in invalid_area_rings(rebuilt).take(5)]
        if bad:
            raise ValueError(
                "mutation invalidates area(s) -- self-intersecting ring: "
                + ", ".join(sorted(bad))
            )
    if moved_ids is not None:
        moved_pts = nodes_to_points(
            nodes.join(F.broadcast(moved_ids), "id", "semi"),
            tagged_only=tagged_points_only,
        )
        rebuilt = rebuilt.unionByName(moved_pts)

    # stale removal by SOURCE id: way-derived rows are path/osm/<id> or
    # area/osm/<id>, point rows point/osm/<id> (relation areas carry an
    # r-prefix and never collide).  The stale set is exploded to explicit
    # (_val, _kind) pairs so the anti-join is a broadcast HASH join on
    # both keys -- a non-equi array_contains form here degrades to a
    # nested-loop join over the whole world
    val = F.element_at(F.split("feature_id", "/"), -1).try_cast("long")
    kind = F.element_at(F.split("feature_id", "/"), 1)
    stale = dirty.select(
        F.col("id").alias("_val"),
        F.explode(F.array(F.lit("path"), F.lit("area"))).alias("_kind"),
    )
    if moved_ids is not None:
        stale = stale.unionByName(
            moved_ids.select(
                F.col("id").alias("_val"), F.lit("point").alias("_kind")
            )
        )
    marked = world.withColumn("_val", val).withColumn("_kind", kind)
    keep = marked.join(F.broadcast(stale), ["_val", "_kind"], "left_anti")
    world2 = keep.drop("_val", "_kind").unionByName(rebuilt, allowMissingColumns=True)
    return world2, nodes, ways
