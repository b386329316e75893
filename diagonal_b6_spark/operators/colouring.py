"""Area adjacency colouring (the reference's ColourAreas).

Reference behavior being reproduced: b6/ingest/colouring.go:183-260 --
every vertex of every area feature is snapped to its level-21 S2 cell
(~3 m sides, colouringS2Level); areas whose vertices share a cell
become graph neighbours (all pairs within the cell); the neighbour
graph is coloured with DSATUR and each area gets a ``b6:colour`` tag
holding the decimal colour index, while areas that never shared a cell
get ``"0"`` (colouring.go:246-253).  Pinned contract from the
reference's own test (ingest/colouring_test.go): neighbouring areas
get different colours; disconnected areas get "0".

Spark-first shape (vs the reference's in-memory map + gonum):

  vertices   posexplode of the packed (xs, ys) arrays -- no shuffle.
  cell key   PURE column expressions.  Sharing a level-L S2 cell is
             exactly equality of (face, i >> (30-L), j >> (30-L)):
             a cell at level L is an axis-aligned square in (face,i,j)
             leaf space, so the Hilbert position step is NOT needed
             for bucketing.  The whole key stays in whole-stage
             codegen and replays verbatim in DuckDB SQL for the
             oracle (catalog.sql_geo_colour_adjacency).
  adjacency  distinct (cell, fid) -> groupBy cell -> pair explode.
             All-pairs within one ~3 m cell is the reference's rule
             (colouring.go:222-227); cells that small hold a handful
             of features, and MAX_CELL_FEATURES is a loud scale guard
             against degenerate inputs (mirrored in the oracle).
  components large-star/small-star (operators/components.py),
             O(log n) shuffle rounds at any graph diameter.
  colours    cogrouped applyInPandas per component running
             deterministic Brelaz DSATUR (max saturation, then max
             degree, then smallest feature id).  Per-component DSATUR
             equals global DSATUR restricted to that component: the
             choice among a component's vertices depends only on that
             component's own saturations/degrees, so the global pick
             order interleaves components but never reorders within
             one.  Components of a vertex-sharing graph are city-block
             sized; MAX_COMPONENT guards the degenerate case.

gonum's coloring.Dsatur (the reference's engine) leaves tie order
implementation-defined; the reference's test pins only properness and
the "0" default, which hold under any tie-break.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .components import connected_components

COLOURING_LEVEL = 21  # ~3 m cell sides (colouring.go:181)
MAX_LEVEL = 30
# loud scale guards, not tuning knobs: a single 3 m cell with more
# vertices-of-distinct-areas than this, or a connected blob of more
# areas than this, means the input is degenerate (stacked duplicate
# geometry), not that the plan should quietly do an n^2 blow-up.
MAX_CELL_FEATURES = 256
MAX_COMPONENT = 200_000


def s2_bucket_col(lat: Column, lng: Column, level: int = COLOURING_LEVEL) -> Column:
    """Level-`level` S2 cell identity as ONE bigint column expression:
    face * 4^level + (i >> shift) * 2^level + (j >> shift).

    Equality of this key is exactly "same level-`level` S2 cell"
    (kernels/cellmath.py computes full Hilbert ids; bucketing only
    needs the (face, i, j) prefix, which is plain scalar math).
    """
    latr = F.radians(lat)
    lngr = F.radians(lng)
    clat = F.cos(latr)
    x = clat * F.cos(lngr)
    y = clat * F.sin(lngr)
    z = F.sin(latr)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    # axis/face selection mirrors kernels/cellmath.xyz_to_face_uv
    axis = F.when((ax >= ay) & (ax >= az), F.lit(0)).otherwise(
        F.when((ax < ay) & (ay >= az), F.lit(1)).otherwise(F.lit(2))
    )
    major = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = F.when(major >= 0, axis).otherwise(axis + 3)
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )

    def st(w: Column) -> Column:  # published quadratic uv->st transform
        return F.when(w >= 0, 0.5 * F.sqrt(1 + 3 * w)).otherwise(
            1 - 0.5 * F.sqrt(1 - 3 * w)
        )

    def ij(s: Column) -> Column:
        raw = F.floor(s * F.lit(float(1 << MAX_LEVEL))).cast("long")
        return F.greatest(F.lit(0), F.least(raw, F.lit((1 << MAX_LEVEL) - 1)))

    shift = MAX_LEVEL - level
    ci = F.floor(ij(st(u)) / F.lit(1 << shift)).cast("long")
    cj = F.floor(ij(st(v)) / F.lit(1 << shift)).cast("long")
    return (
        face.cast("long") * F.lit(1 << (2 * level)) + ci * F.lit(1 << level) + cj
    ).alias("cell")


def area_vertex_cells(features: DataFrame, level: int = COLOURING_LEVEL) -> DataFrame:
    """Distinct (feature_id, cell) over every vertex of every area ring."""
    verts = (
        features.filter(F.col("feature_type") == "area")
        .select(
            "feature_id",
            F.explode(F.arrays_zip(F.col("ys").alias("lat"), F.col("xs").alias("lng"))).alias("p"),
        )
        .select("feature_id", F.col("p.lat").alias("lat"), F.col("p.lng").alias("lng"))
    )
    return verts.select(
        "feature_id", s2_bucket_col(F.col("lat"), F.col("lng"), level)
    ).distinct()


def area_adjacency(
    features: DataFrame,
    level: int = COLOURING_LEVEL,
    max_cell_features: int = MAX_CELL_FEATURES,
) -> DataFrame:
    """Distinct neighbour pairs (a < b) of areas sharing a level-`level`
    cell (colouring.go:222-227's per-cell all-pairs, distributed)."""
    cells = area_vertex_cells(features, level)
    grouped = cells.groupBy("cell").agg(
        F.sort_array(F.collect_set("feature_id")).alias("fids")
    )
    guarded = grouped.withColumn(
        "fids",
        F.when(F.size("fids") <= max_cell_features, F.col("fids")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"colouring: >{max_cell_features} distinct areas share one "),
                    F.lit(f"level-{level} cell ("),
                    F.size("fids").cast("string"),
                    F.lit(") -- degenerate stacked geometry"),
                )
            )
        ),
    ).filter(F.size("fids") >= 2)
    pairs = guarded.select(
        F.explode(
            F.expr(
                "flatten(transform(fids, (x, i) -> "
                "transform(slice(fids, i + 2, size(fids) - i - 1), y -> struct(x as a, y as b))))"
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return pairs.distinct()


def _dsatur(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic Brelaz DSATUR over one component's edge list."""
    adj: dict[str, set[str]] = {}
    for a, b in zip(pdf["a"], pdf["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if len(adj) > MAX_COMPONENT:
        raise ValueError(
            f"colouring: component of {len(adj)} areas exceeds {MAX_COMPONENT}"
        )
    colours: dict[str, int] = {}
    neigh_colours: dict[str, set[int]] = {n: set() for n in adj}
    uncoloured = set(adj)
    while uncoloured:
        n = min(
            uncoloured,
            key=lambda m: (-len(neigh_colours[m]), -len(adj[m]), m),
        )
        used = neigh_colours[n]
        c = 0
        while c in used:
            c += 1
        colours[n] = c
        for m in adj[n]:
            neigh_colours[m].add(c)
        uncoloured.discard(n)
    return pd.DataFrame(
        {"feature_id": list(colours), "colour": [colours[n] for n in colours]}
    )


def area_colours(adjacency: DataFrame) -> DataFrame:
    """(feature_id, colour int) for every area in the adjacency graph."""
    labels = connected_components(adjacency, a="a", b="b").select(
        F.col("k").alias("a"), F.col("lbl").alias("comp")
    )
    edges = adjacency.join(labels, "a")
    return edges.groupBy("comp").applyInPandas(
        lambda pdf: _dsatur(pdf), schema="feature_id string, colour int"
    )


def colour_areas(features: DataFrame, level: int = COLOURING_LEVEL) -> DataFrame:
    """The reference's colour-areas source wrapper: every area feature
    gains a b6:colour tag (decimal DSATUR colour; "0" when the area
    shares no cell with any other area); non-area features pass through
    untouched (colouring.go:246-258)."""
    colours = area_colours(area_adjacency(features, level))
    out = features.join(colours, "feature_id", "left")
    tagged = F.when(
        F.col("feature_type") == "area",
        F.map_concat(
            F.col("tags"),
            F.create_map(
                F.lit("b6:colour"),
                F.coalesce(F.col("colour").cast("string"), F.lit("0")),
            ),
        ),
    ).otherwise(F.col("tags"))
    return out.withColumn("tags", tagged).drop("colour")
