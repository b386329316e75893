"""YAML change-file interchange (reference: b6/ingest/yaml.go).

The reference exports world modifications as a multi-document YAML
stream (`changes-to-file`) and replays them (`changes-from-file`):

* one document per feature whose TAGS changed:
      id: /<feature id>        # FeatureID.MarshalYAML is "/" + String()
      add:                     # b6.Tag list (omitted when empty)
      - key: "#amenity"
        value: bench
      remove: [<keys>]         # omitted when empty
* one document per ADDED feature, in the feature's own MarshalYAML
  form (ingest/features.go):
    - generic (point / path) features carry geometry IN TAGS: a
      `point` tag whose value is the "%f, %f" lat-lng string
      (b6.PointTag), or a `path` tag whose value is the
      ";"-delimited Expressions.String() list where each element is
      either a lat-lng string or a feature-ID string (vertex
      reference, expression.go:1521-1530);
    - `area:` is the NESTED form (features.go AreaFeature.MarshalYAML):
      a list of POLYGONS, each polygon either a list of LOOPS (each
      loop a list of "lat, lng" strings) or a list of path-ID strings
      (yaml.go newAreaFromYAML:145-157);
    - `relation:` is the member list ([{id: /<fid>, role: <role>}]);
    - `collection:` is the [[key, value], ...] literal-pair list
      (expression.go CollectionExpression.MarshalYAML), feature-id
      literals as {id: /<fid>} choice maps (omitempty name/begin/end);
    - `expression:` features carry their expression (our engine stores
      shell strings in the b6:expression tag; a reference-exported
      structured tree is preserved verbatim under b6:expression:yaml
      so the round trip is lossless either way);
  plus the feature's remaining `tags:`.

Feature-ID references inside paths and areas resolve the way the
reference resolves them: referenced features are exported FIRST
(yaml.go ExportChangesAsYAML uses FeedReferencesFirst), so the importer
resolves against features seen earlier in the SAME stream, then against
the optional ``world`` features table, and fails loudly naming any id
it cannot resolve.

Change deltas are SMALL relative to the world (they are edits), so the
export collects them driver-side by design -- the snapshot tables the
changes apply to never leave the cluster; applying an imported change
is the ordinary distributed join/union in operators/change.py.  A
row-count guard fails loudly if a corpus-sized DataFrame is fed in.
World lookups for external references filter the features table down
to the referenced ids (bounded by the delta size) before collecting.
"""

from __future__ import annotations

import re

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

# feature-id strings: <type>/<namespace...>/<value> (world.go FeatureIDFromString)
_FID_RE = re.compile(
    r"^(point|path|area|relation|collection|expression)/.+/\d+$"
)

_LATLNG_RE = re.compile(r"^\s*-?\d+(\.\d+)?\s*,\s*-?\d+(\.\d+)?\s*$")

EXPR_TAG = "b6:expression"          # operators/expression.py EXPR_KEY
EXPR_YAML_TAG = "b6:expression:yaml"  # lossless carry of reference trees


def _latlng(lat: float, lng: float) -> str:
    return f"{lat:f}, {lng:f}"  # yaml.go LatLngYAML MarshalYAML ("%f, %f")


def _fid_out(fid: str) -> str:
    return "/" + fid  # world.go FeatureID.MarshalYAML


def _fid_in(s: str) -> str:
    # world.go FeatureID.UnmarshalYAML strips the leading "/"; accept
    # our own older non-prefixed files too
    return s[1:] if s.startswith("/") else s


def _tag_list(tags: dict) -> list[dict]:
    return [{"key": k, "value": v} for k, v in sorted(tags.items())]


def _member_tags(tags: dict) -> tuple[dict[int, dict], dict]:
    """Split member:<i> / member_role:<i> / member_key:<i> tag entries
    from a feature's tags.  Returns ({i: {id|role|key: ...}}, rest)."""
    members: dict[int, dict] = {}
    rest = {}
    for k, v in tags.items():
        m = re.match(r"^member(_role|_key)?:(\d+)$", k)
        if m is None:
            rest[k] = v
            continue
        slot = {None: "id", "_role": "role", "_key": "key"}[m.group(1)]
        members.setdefault(int(m.group(2)), {})[slot] = v
    return members, rest


def _collection_literal_out(v: str):
    """Literal YAML form (expression.go Literal.MarshalYAML): feature ids
    marshal as the {id: /<fid>} choice map; everything else we store as
    strings, which fast-track to raw scalars."""
    if _FID_RE.match(v):
        return {"id": _fid_out(v)}
    return v


def _collection_literal_in(v) -> str:
    if isinstance(v, dict) and "id" in v:
        return _fid_in(str(v["id"]))
    return str(v)


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


def _added_doc(r) -> dict:
    """One added-feature document in the reference's per-type MarshalYAML
    form (ingest/features.go)."""
    doc: dict = {"id": _fid_out(r["feature_id"])}
    tags = dict(r["tags"] or {})
    ftype = r["feature_type"]
    pts = [_latlng(la, ln) for la, ln in zip(r["ys"] or [], r["xs"] or [])]
    if ftype == "point":
        # GenericFeature: geometry is the b6.PointTag tag
        tags = {"point": pts[0], **tags}
        doc["tags"] = _tag_list(tags)
        return doc
    if ftype == "path":
        # GenericFeature: b6.PathTag, Expressions.String() ";" join
        tags = {"path": ";".join(pts), **tags}
        doc["tags"] = _tag_list(tags)
        return doc
    if ftype == "relation":
        members, rest = _member_tags(tags)
        doc["relation"] = [
            {"id": _fid_out(members[i].get("id", "")), "role": members[i].get("role", "")}
            for i in sorted(members)
        ]
        if rest:
            doc["tags"] = _tag_list(rest)
        return doc
    if ftype == "collection":
        members, rest = _member_tags(tags)
        doc["collection"] = [
            [
                _collection_literal_out(members[i].get("key", str(i))),
                _collection_literal_out(members[i].get("id", "")),
            ]
            for i in sorted(members)
        ]
        if rest:
            doc["tags"] = _tag_list(rest)
        return doc
    if ftype == "expression" or EXPR_TAG in tags or EXPR_YAML_TAG in tags:
        if EXPR_YAML_TAG in tags:
            # a reference tree imported earlier: re-emit it verbatim
            doc["expression"] = yaml.safe_load(tags.pop(EXPR_YAML_TAG))
        else:
            doc["expression"] = tags.pop(EXPR_TAG, "")
        if tags:
            doc["tags"] = _tag_list(tags)
        return doc
    # area: reference nesting (features.go AreaFeature.MarshalYAML):
    # area = [polygon]; polygon = [loop...]; loop = [pt...].  Our feature
    # row is one polygon whose loops are the ring_offsets slices (outer
    # ring + holes) -- preserved, not concatenated.
    offs = list(r["ring_offsets"] or [0]) + [len(pts)]
    loops = [pts[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]
    doc["area"] = [loops]
    if tags:
        doc["tags"] = _tag_list(tags)
    return doc


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
            d = per_feature.setdefault(r["feature_id"], {"id": _fid_out(r["feature_id"])})
            d.setdefault("add", []).append({"key": r["k"], "value": r["v"]})
    if tag_removes is not None:
        for r in tag_removes.select("feature_id", "k").collect():
            d = per_feature.setdefault(r["feature_id"], {"id": _fid_out(r["feature_id"])})
            d.setdefault("remove", []).append(r["k"])
    docs.extend(per_feature[k] for k in sorted(per_feature))
    if added is not None:
        rows = added.collect()
        # FeedReferencesFirst (yaml.go:82): points and paths precede the
        # features that may reference them
        order = {"point": 0, "path": 1}
        rows.sort(key=lambda r: (order.get(r["feature_type"], 2), r["feature_id"]))
        docs.extend(_added_doc(r) for r in rows)
    with open(path, "w") as f:
        yaml.dump_all(docs, f, sort_keys=False, default_flow_style=False)


class _Resolver:
    """Vertex-reference resolution: in-stream features first (the
    reference feeds references first), then the optional world table,
    collected ONLY for the referenced ids (bounded by the delta size)."""

    def __init__(self, world: DataFrame | None):
        self.world = world
        self.points: dict[str, tuple[float, float]] = {}
        self.paths: dict[str, list[tuple[float, float]]] = {}
        self._world_cache: dict[str, tuple[str, list[tuple[float, float]]]] | None = None

    def saw(self, fid: str, ftype: str, ys: list, xs: list) -> None:
        if ftype == "point" and ys:
            self.points[fid] = (ys[0], xs[0])
        elif ftype == "path":
            self.paths[fid] = list(zip(ys, xs))

    def _load_world(self, ids: set[str]) -> None:
        if self.world is None or not ids:
            self._world_cache = self._world_cache or {}
            return
        rows = (
            self.world.filter(F.col("feature_id").isin(list(ids)))
            .select("feature_id", "feature_type", "xs", "ys")
            .collect()
        )
        self._world_cache = {
            r["feature_id"]: (
                r["feature_type"],
                list(zip(r["ys"] or [], r["xs"] or [])),
            )
            for r in rows
        }

    def preload(self, all_refs: set[str]) -> None:
        """One bounded world lookup for every id the stream itself does
        not define (stream-internal refs resolve in document order)."""
        self._load_world(all_refs - set(self.points) - set(self.paths))

    def resolve(self, rid: str) -> list[tuple[float, float]]:
        """ref id -> vertex list ([(lat, lng)]; one entry for points).
        In-stream features defined EARLIER win (FeedReferencesFirst);
        otherwise the preloaded world."""
        if rid in self.points:
            return [self.points[rid]]
        if rid in self.paths:
            return self.paths[rid]
        if self._world_cache and rid in self._world_cache:
            return self._world_cache[rid][1]
        raise ValueError(
            "changes_from_yaml: unresolved feature references "
            f"['{rid}'] -- referenced features must appear earlier in "
            "the stream (the reference exports references first) or "
            "pass world= to resolve against a features table"
        )


def _parse_latlng(s: str) -> tuple[float, float]:
    la, ln = (float(v.strip()) for v in str(s).split(","))
    return la, ln


def _geometry_from_doc(d: dict, tags: dict):
    """(kind, payload, tags-without-geometry).  payload: latlng for
    point; element list (latlng tuples | ref-id strings) for path;
    loop list for area (each loop: list of latlng tuples | a ref-id)."""
    # current reference form: geometry lives in the point/path tags
    if "point" in tags:
        ll = _parse_latlng(tags.pop("point"))
        return "point", ll, tags
    if "path" in tags:
        els: list = []
        for part in str(tags.pop("path")).split(";"):
            part = part.strip()
            if _LATLNG_RE.match(part):
                els.append(_parse_latlng(part))
            else:
                els.append(_fid_in(part))
        return "path", els, tags
    # legacy / explicit top-level keys (exportedYAML.Point/.Path/.Area)
    if "point" in d:
        return "point", _parse_latlng(d["point"]), tags
    if "path" in d:
        els = []
        for s in d["path"]:
            s = str(s).strip()
            if _LATLNG_RE.match(s):
                els.append(_parse_latlng(s))
            else:
                els.append(_fid_in(s))
        return "path", els, tags
    if "area" in d:
        polygons = list(d["area"])
        if len(polygons) != 1:
            raise ValueError(
                f"changes_from_yaml: feature {d.get('id')} carries "
                f"{len(polygons)} polygons; multi-polygon area rows "
                "are one row per polygon in this engine -- split the "
                "document"
            )
        loops: list = []
        for loop in polygons[0]:
            if isinstance(loop, list):
                loops.append([_parse_latlng(s) for s in loop])
            else:
                # the path-ID loop variant (yaml.go newAreaFromYAML):
                # each loop is a reference to a path feature
                loops.append(_fid_in(str(loop)))
        return "area", loops, tags
    return None, None, tags


def import_changes_yaml(
    spark: SparkSession, path: str, world: DataFrame | None = None
) -> dict[str, DataFrame]:
    """`changes-from-file`: parse the YAML stream back into the delta
    DataFrames consumed by operators/change.py.

    ``world``: optional features table (FEATURE_SCHEMA) used to resolve
    vertex references that are not defined earlier in the stream.

    Returns {"tag_adds", "tag_removes", "added"} (each possibly empty)."""
    if yaml is None:
        raise NotImplementedError("pyyaml not available in this environment")
    with open(path) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    adds, removes = [], []
    staged = []  # (fid, kind, payload, tags) pending reference resolution
    resolver = _Resolver(world)
    all_refs: set[str] = set()
    for d in docs:
        fid = _fid_in(str(d["id"]))
        for t in d.get("add", []):
            adds.append((fid, str(t["key"]), str(t["value"])))
        for k in d.get("remove", []):
            removes.append((fid, str(k)))
        tags = {str(t["key"]): str(t["value"]) for t in d.get("tags", [])}
        if "relation" in d:
            for i, m in enumerate(d["relation"] or []):
                tags[f"member:{i}"] = _fid_in(str(m["id"]))
                if m.get("role"):
                    tags[f"member_role:{i}"] = str(m["role"])
            staged.append((fid, "relation", None, tags))
            continue
        if "collection" in d:
            for i, pair in enumerate(d["collection"] or []):
                k, v = pair
                tags[f"member_key:{i}"] = _collection_literal_in(k)
                tags[f"member:{i}"] = _collection_literal_in(v)
            staged.append((fid, "collection", None, tags))
            continue
        if "expression" in d:
            e = d["expression"]
            if isinstance(e, str):
                tags[EXPR_TAG] = e
            else:
                # a reference-structured tree: preserve losslessly
                tags[EXPR_YAML_TAG] = yaml.safe_dump(e)
            staged.append((fid, "expression", None, tags))
            continue
        kind, payload, tags = _geometry_from_doc(d, tags)
        if kind is None:
            if tags:  # tags-only generic feature (newGenericFeatureFromYAML)
                staged.append((fid, "point", None, tags))
            continue
        if kind == "path":
            all_refs.update(e for e in payload if isinstance(e, str))
        elif kind == "area":
            all_refs.update(l for l in payload if isinstance(l, str))
        staged.append((fid, kind, payload, tags))
    resolver.preload(all_refs)

    # walk in document order so each doc sees only EARLIER stream
    # features (FeedReferencesFirst) plus the preloaded world
    feats = []
    for fid, kind, payload, tags in staged:
        ys: list[float] = []
        xs: list[float] = []
        ring_offsets = [0]
        if kind == "point" and payload is not None:
            ys, xs = [payload[0]], [payload[1]]
        elif kind == "path" and payload is not None:
            for e in payload:
                vs = resolver.resolve(e) if isinstance(e, str) else [e]
                for la, ln in vs:
                    ys.append(la)
                    xs.append(ln)
        elif kind == "area":
            for loop in payload:
                vs = resolver.resolve(loop) if isinstance(loop, str) else loop
                if isinstance(loop, str) and len(vs) > 1 and vs[0] == vs[-1]:
                    vs = vs[:-1]  # referenced boundary paths close explicitly
                for la, ln in vs:
                    ys.append(la)
                    xs.append(ln)
                ring_offsets.append(len(ys))
            ring_offsets.pop()  # offsets mark ring STARTS; drop end sentinel
        if kind in ("relation", "collection", "expression"):
            ring_offsets = []  # no geometry: match the fixture convention
        ns = fid.split("/")[1] if fid.count("/") >= 2 else ""
        resolver.saw(fid, kind, ys, xs)
        feats.append((fid, kind, ns, tags, xs, ys, ring_offsets))
    return {
        "tag_adds": spark.createDataFrame(adds, "feature_id string, k string, v string"),
        "tag_removes": spark.createDataFrame(removes, "feature_id string, k string"),
        "added": spark.createDataFrame(feats, _FEATURE_SCHEMA),
    }
