"""YAML change-file interchange (reference: b6/ingest/yaml.go).

The reference exports world modifications as a multi-document YAML
stream (`changes-to-file`) and replays them (`changes-from-file`):

* one document per feature whose TAGS changed:
      id: <feature id>
      add:                 # b6.Tag list (omitted when empty)
      - key: "#amenity"
        value: bench
      remove: [<keys>]     # omitted when empty
* one document per ADDED feature, geometry keyed by type
  (yaml.go exportedYAML): `point: "lat, lng"` (the reference's %f
  6-decimal LatLng form), `path:` as a lat-lng string list, and
  `area:` as the reference's NESTED form (features.go
  AreaFeature.MarshalYAML): a list of POLYGONS, each polygon a list
  of LOOPS, each loop a list of "lat, lng" strings -- or, in the
  reference's alternate variant, a polygon may be a list of path-ID
  strings (yaml.go newAreaFromYAML:145-157); we reject that variant
  explicitly since our feature rows carry coordinates, not path refs.
  Plus its `tags:`.

Change deltas are SMALL relative to the world (they are edits), so the
export collects them driver-side by design -- the snapshot tables the
changes apply to never leave the cluster; applying an imported change
is the ordinary distributed join/union in operators/change.py.  A
row-count guard fails loudly if a corpus-sized DataFrame is fed in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:
    import yaml
except ImportError:  # pragma: no cover - baked into this environment
    yaml = None

_FEATURE_SCHEMA = (
    "feature_id string, feature_type string, ns string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)


def _latlng(lat: float, lng: float) -> str:
    return f"{lat:f}, {lng:f}"  # yaml.go LatLngYAML MarshalYAML ("%f, %f")


def _tag_list(tags: dict) -> list[dict]:
    return [{"key": k, "value": v} for k, v in sorted(tags.items())]


# Change files describe EDITS, not worlds: anything past this cap is a
# corpus being funneled through the driver by mistake.
MAX_DELTA_ROWS = 100_000


def _guard_delta_size(df: DataFrame, what: str, max_rows: int) -> None:
    if df.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"changes_to_yaml: {what} exceeds {max_rows} rows -- change files "
            "are driver-collected edit deltas, not a distributed sink; write "
            "a corpus-sized table to parquet instead (or raise max_rows "
            "explicitly if this really is one huge edit)"
        )


def export_changes_yaml(
    path: str,
    tag_adds: DataFrame | None = None,
    tag_removes: DataFrame | None = None,
    added: DataFrame | None = None,
    max_rows: int = MAX_DELTA_ROWS,
) -> None:
    """`changes-to-file`: write the change set as the reference's
    multi-document YAML stream.

    tag_adds: (feature_id, k, v); tag_removes: (feature_id, k);
    added: full feature rows (the FEATURE_SCHEMA shape).
    """
    if yaml is None:
        raise NotImplementedError("pyyaml not available in this environment")
    docs: list[dict] = []
    per_feature: dict[str, dict] = {}
    for name, d in (("tag_adds", tag_adds), ("tag_removes", tag_removes), ("added", added)):
        if d is not None:
            _guard_delta_size(d, name, max_rows)
    if tag_adds is not None:
        for r in tag_adds.select("feature_id", "k", "v").collect():
            d = per_feature.setdefault(r["feature_id"], {"id": r["feature_id"]})
            d.setdefault("add", []).append({"key": r["k"], "value": r["v"]})
    if tag_removes is not None:
        for r in tag_removes.select("feature_id", "k").collect():
            d = per_feature.setdefault(r["feature_id"], {"id": r["feature_id"]})
            d.setdefault("remove", []).append(r["k"])
    docs.extend(per_feature[k] for k in sorted(per_feature))
    if added is not None:
        for r in added.collect():
            doc: dict = {"id": r["feature_id"]}
            pts = [_latlng(la, ln) for la, ln in zip(r["ys"], r["xs"])]
            if r["feature_type"] == "point":
                doc["point"] = pts[0]
            elif r["feature_type"] == "path":
                doc["path"] = pts
            else:
                # reference nesting (features.go AreaFeature.MarshalYAML):
                # area = [polygon]; polygon = [loop...]; loop = [pt...].
                # Our feature row is one polygon whose loops are the
                # ring_offsets slices (outer ring + holes) -- preserved,
                # not concatenated.
                offs = list(r["ring_offsets"] or [0]) + [len(pts)]
                loops = [pts[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]
                doc["area"] = [loops]
            if r["tags"]:
                doc["tags"] = _tag_list(dict(r["tags"]))
            docs.append(doc)
    with open(path, "w") as f:
        yaml.dump_all(docs, f, sort_keys=False, default_flow_style=False)


def import_changes_yaml(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """`changes-from-file`: parse the YAML stream back into the delta
    DataFrames consumed by operators/change.py.

    Returns {"tag_adds", "tag_removes", "added"} (each possibly empty)."""
    if yaml is None:
        raise NotImplementedError("pyyaml not available in this environment")
    with open(path) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    adds, removes, feats = [], [], []
    for d in docs:
        fid = d["id"]
        for t in d.get("add", []):
            adds.append((fid, str(t["key"]), str(t["value"])))
        for k in d.get("remove", []):
            removes.append((fid, str(k)))
        geom_key = next((g for g in ("point", "path", "area") if g in d), None)
        if geom_key is None:
            continue
        ys, xs = [], []
        ring_offsets = [0]
        if geom_key == "area":
            # reference nesting (features.go AreaFeature.MarshalYAML):
            # area = [polygon]; polygon = [loop...]; loop = ["lat, lng"...].
            # The alternate loop form is a list of path-ID strings
            # (yaml.go newAreaFromYAML) -- our feature rows carry
            # coordinates, not path refs, so reject that variant loudly.
            polygons = list(d["area"])
            if len(polygons) != 1:
                raise ValueError(
                    f"changes_from_yaml: feature {fid} carries "
                    f"{len(polygons)} polygons; multi-polygon area rows "
                    "are one row per polygon in this engine -- split the "
                    "document"
                )
            for loop in polygons[0]:
                if not isinstance(loop, list):
                    raise ValueError(
                        f"changes_from_yaml: feature {fid} area loop is a "
                        f"path reference ({loop!r}); the reference's "
                        "path-ID loop variant is unsupported -- export "
                        "with coordinate loops"
                    )
                for s in loop:
                    la, ln = (float(v.strip()) for v in str(s).split(","))
                    ys.append(la)
                    xs.append(ln)
                ring_offsets.append(len(ys))
            ring_offsets.pop()  # offsets mark ring STARTS; drop end sentinel
        else:
            raw = [d[geom_key]] if geom_key == "point" else list(d[geom_key])
            for s in raw:
                la, ln = (float(v.strip()) for v in str(s).split(","))
                ys.append(la)
                xs.append(ln)
        tags = {t["key"]: str(t["value"]) for t in d.get("tags", [])}
        ns = fid.split("/")[1] if fid.count("/") >= 2 else ""
        feats.append((fid, geom_key if geom_key != "point" else "point",
                      ns, tags, xs, ys, ring_offsets))
    return {
        "tag_adds": spark.createDataFrame(adds, "feature_id string, k string, v string"),
        "tag_removes": spark.createDataFrame(removes, "feature_id string, k string"),
        "added": spark.createDataFrame(feats, _FEATURE_SCHEMA),
    }
