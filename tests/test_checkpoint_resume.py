"""Kill/resume contract (FIXTURES.md §5, BASELINE.json north_rule):
delete half the checkpointed partitions, re-run, assert identical final
output and zero recomputation for surviving partitions."""

import os
import shutil

import pytest

from diagonal_b6_spark import checkpoint as ckpt


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "ckpt")


def _run(spark, root, keys, log):
    def compute(key):
        log.append(key)
        base = spark.range(0, 100)
        return base.selectExpr(f"id * {int(key) + 1} as v", f"'{key}' as k")

    return ckpt.checkpointed_run(spark, root, keys, compute, provenance="test")


def test_checkpointed_run_and_resume(spark, tmp_root):
    keys = [str(k) for k in range(6)]
    log1 = []
    df1, m1 = _run(spark, tmp_root, keys, log1)
    rows1 = sorted((r["k"], r["v"]) for r in df1.collect())
    assert sorted(log1) == keys  # everything computed once
    assert all(m1.partitions[k]["status"] == "complete" for k in keys)
    assert all(m1.partitions[k]["recomputed"] for k in keys)
    assert all(m1.partitions[k]["rows"] == 100 for k in keys)

    # simulate a kill that lost partitions 0..2 (data + manifest entries)
    m = ckpt.Manifest.load(tmp_root)
    for k in keys[:3]:
        shutil.rmtree(os.path.join(tmp_root, f"part={k}"))
        del m.partitions[k]
    m.commit()

    log2 = []
    df2, m2 = _run(spark, tmp_root, keys, log2)
    rows2 = sorted((r["k"], r["v"]) for r in df2.collect())
    assert rows2 == rows1  # identical final output
    assert sorted(log2) == keys[:3]  # only the lost partitions recomputed
    assert all(m2.partitions[k]["recomputed"] for k in keys[:3])
    assert all(not m2.partitions[k]["recomputed"] for k in keys[3:])
    assert m2.parent_id == m.snapshot_id  # lineage chain


def test_manifest_atomic_commit(spark, tmp_root):
    keys = ["7"]
    df, m = _run(spark, tmp_root, keys, [])
    # no stray tmp files after commit
    leftovers = [f for f in os.listdir(tmp_root) if ".tmp." in f]
    assert leftovers == []
    loaded = ckpt.Manifest.load(tmp_root)
    assert loaded.snapshot_id == m.snapshot_id
    assert loaded.partitions["7"]["rows"] == 100


def test_write_snapshot_counters(spark, tmp_path):
    root = str(tmp_path / "snap")
    df = spark.range(0, 1000).selectExpr("id", "cast(id % 4 as int) as zoom")
    m = ckpt.write_snapshot(df, root, "zoom", provenance="snap-test")
    assert sum(p["rows"] for p in m.partitions.values()) == 1000
    assert set(m.partitions) == {"0", "1", "2", "3"}
    assert all(p["bytes"] > 0 for p in m.partitions.values())
    # second write chains lineage
    m2 = ckpt.write_snapshot(df, root, "zoom")
    assert m2.parent_id == m.snapshot_id


def test_snapshot_read_prunes_partitions(spark, tmp_path):
    """A zoom filter over a snapshot read must reach the scan as a
    PARTITION filter (directory pruning), not a post-scan predicate --
    the property that makes per-zoom serving reads O(zoom subset), not
    O(snapshot), at 10^12-row scale."""
    root = str(tmp_path / "snap_prune")
    df = spark.range(0, 1000).selectExpr("id", "cast(id % 4 as int) as zoom")
    ckpt.write_snapshot(df, root, "zoom", provenance="prune-test")
    rd = spark.read.parquet(os.path.join(root, "data")).filter("zoom = 2")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the zoom predicate must appear inside PartitionFilters, and the
    # scan must not fall back to an empty partition-filter list
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "zoom" in pf
    assert rd.count() == 250


def test_clustered_snapshot_layout_and_pruning(spark, tmp_path):
    """write_clustered_snapshot lays rows out in Hilbert (S2 cell16)
    order: per-file cell ranges are pairwise disjoint, the manifest
    records them, and files_for_cell_range prunes to the right subset
    without touching parquet footers."""
    import numpy as np

    root = str(tmp_path / "clustered")
    rng = np.random.default_rng(7)
    n = 4000
    rows = [
        (int(i), float(lat), float(lng))
        for i, (lat, lng) in enumerate(
            zip(rng.uniform(40, 60, n), rng.uniform(-10, 10, n))
        )
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    m = ckpt.write_clustered_snapshot(df, root, n_files=8, provenance="layout")

    parts = sorted(m.partitions.values(), key=lambda p: p["cell_min"])
    assert sum(p["rows"] for p in parts) == n
    assert len(parts) >= 4
    # Hilbert layout: file cell ranges never interleave
    for a, b in zip(parts, parts[1:]):
        assert a["cell_max"] <= b["cell_min"]

    # manifest-level pruning: one mid-file's range maps back to just the
    # files intersecting it, and reading that subset yields exactly the
    # rows in range
    probe = parts[len(parts) // 2]
    files = ckpt.files_for_cell_range(m, probe["cell_min"], probe["cell_max"])
    assert probe["path"] in files and len(files) <= 3
    got = (
        spark.read.parquet(*files)
        .filter(
            (ckpt.F.col("cell16") >= probe["cell_min"])
            & (ckpt.F.col("cell16") <= probe["cell_max"])
        )
        .count()
    )
    full = ckpt.read_snapshot(spark, root)
    want = full.filter(
        (ckpt.F.col("cell16") >= probe["cell_min"])
        & (ckpt.F.col("cell16") <= probe["cell_max"])
    ).count()
    assert got == want and got >= probe["rows"]


def _grid_df(spark, n, start=0):
    """Deterministic point grid: id -> (lat, lng) spread over ~20 deg."""
    return spark.range(start, start + n).selectExpr(
        "id",
        "40.0 + (id % 97) * 0.2 as lat",
        "-10.0 + ((id * 7) % 101) * 0.2 as lng",
    )


def test_snapshot_append_time_travel_incremental(spark, tmp_path):
    """Appends create child snapshots with immutable parents: time travel
    reads the old row set, the incremental scan reads exactly the
    appended rows, and the log walks the chain oldest-first."""
    root = str(tmp_path / "life")
    m1 = ckpt.write_clustered_snapshot(_grid_df(spark, 500), root, n_files=4)
    m2 = ckpt.append_clustered_snapshot(_grid_df(spark, 300, start=500), root, n_files=4)

    assert m2.parent_id == m1.snapshot_id
    chain = ckpt.snapshot_log(root)
    assert [m.snapshot_id for m in chain] == [m1.snapshot_id, m2.snapshot_id]

    assert ckpt.read_snapshot(spark, root).count() == 800
    old = ckpt.read_snapshot(spark, root, as_of=m1.snapshot_id)
    assert old.count() == 500
    assert old.agg({"id": "max"}).collect()[0][0] == 499

    inc = ckpt.read_incremental(spark, root, m1.snapshot_id)
    ids = sorted(r.id for r in inc.select("id").collect())
    assert ids == list(range(500, 800))
    # parent entries carried over are marked not-recomputed lineage
    carried = [e for k, e in m2.partitions.items() if k in m1.partitions]
    assert carried and all(not e["recomputed"] for e in carried)


def test_snapshot_compact_restores_disjoint_layout(spark, tmp_path):
    """After appends the per-file cell ranges of different generations
    overlap; compaction rewrites one disjoint snapshot with identical
    rows, and manifest-level pruning still matches a brute filter."""
    root = str(tmp_path / "compact")
    ckpt.write_clustered_snapshot(_grid_df(spark, 400), root, n_files=4)
    ckpt.append_clustered_snapshot(_grid_df(spark, 400, start=400), root, n_files=4)

    def overlaps(m):
        parts = sorted(m.partitions.values(), key=lambda p: p["cell_min"])
        return sum(1 for a, b in zip(parts, parts[1:]) if a["cell_max"] > b["cell_min"])

    assert overlaps(ckpt.Manifest.load(root)) > 0  # the append interleaves
    m3 = ckpt.compact_snapshot(spark, root, n_files=4)
    assert overlaps(m3) == 0

    full = ckpt.read_snapshot(spark, root)
    assert full.count() == 800
    assert sorted(r.id for r in full.select("id").collect()) == list(range(800))

    parts = sorted(m3.partitions.values(), key=lambda p: p["cell_min"])
    probe = parts[len(parts) // 2]
    files = ckpt.files_for_cell_range(m3, probe["cell_min"], probe["cell_max"])
    got = (
        spark.read.parquet(*files)
        .filter(
            (ckpt.F.col("cell16") >= probe["cell_min"])
            & (ckpt.F.col("cell16") <= probe["cell_max"])
        )
        .count()
    )
    want = full.filter(
        (ckpt.F.col("cell16") >= probe["cell_min"])
        & (ckpt.F.col("cell16") <= probe["cell_max"])
    ).count()
    assert got == want and probe["path"] in files


def test_snapshot_expire_drops_unreferenced_files(spark, tmp_path):
    """Expiry keeps the newest `keep` snapshots, removes older manifests
    and any data dir none of the keepers reference; the current read is
    untouched and expired time travel fails loudly."""
    root = str(tmp_path / "expire")
    m1 = ckpt.write_clustered_snapshot(_grid_df(spark, 300), root, n_files=2)
    m2 = ckpt.append_clustered_snapshot(_grid_df(spark, 200, start=300), root, n_files=2)
    m3 = ckpt.compact_snapshot(spark, root, n_files=2)

    removed = ckpt.expire_snapshots(root, keep=1)
    # m1+m2 manifests go; both pre-compaction data dirs are unreferenced
    assert os.path.join(root, f"manifest-{m1.snapshot_id}.json") in removed
    assert os.path.join(root, f"data-{m1.snapshot_id}") in removed
    assert os.path.join(root, f"data-{m2.snapshot_id}") in removed
    assert os.path.isdir(os.path.join(root, f"data-{m3.snapshot_id}"))

    assert ckpt.read_snapshot(spark, root).count() == 500
    assert ckpt.snapshot_log(root)[-1].snapshot_id == m3.snapshot_id
    with pytest.raises(FileNotFoundError):
        ckpt.read_snapshot(spark, root, as_of=m1.snapshot_id)


def test_snapshot_schema_evolution(spark, tmp_path):
    """An appended generation may add a column: merged reads surface NULL
    for pre-evolution rows (Iceberg add-column semantics), time travel
    still sees the old schema, and compaction rewrites one unified
    schema."""
    root = str(tmp_path / "evolve")
    m1 = ckpt.write_clustered_snapshot(_grid_df(spark, 200), root, n_files=2)
    evolved = _grid_df(spark, 100, start=200).selectExpr("*", "id * 2 as score")
    ckpt.append_clustered_snapshot(evolved, root, n_files=2)

    cur = ckpt.read_snapshot(spark, root)
    assert "score" in cur.columns
    assert cur.count() == 300
    assert cur.filter("score IS NULL").count() == 200  # pre-evolution rows
    assert cur.filter("score = id * 2").count() == 100

    old = ckpt.read_snapshot(spark, root, as_of=m1.snapshot_id)
    assert "score" not in old.columns  # time travel keeps the old schema

    m3 = ckpt.compact_snapshot(spark, root, n_files=2)
    compacted = ckpt.read_snapshot(spark, root)
    assert compacted.count() == 300 and "score" in compacted.columns
    # one generation again: ranges disjoint after the rewrite
    parts = sorted(m3.partitions.values(), key=lambda p: p["cell_min"])
    assert all(a["cell_max"] <= b["cell_min"] for a, b in zip(parts, parts[1:]))


def test_snapshot_random_lifecycle_sequences(spark, tmp_path):
    """Randomized op sequences (append / compact / expire) against a
    model of the table contents: after every op the current read equals
    the model row set, the manifest chain parents link correctly, and
    every manifest entry's file exists on disk."""
    import numpy as np

    rng = np.random.default_rng(42)
    for trial in range(3):
        root = str(tmp_path / f"rand{trial}")
        next_id = 0

        def take(n):
            nonlocal next_id
            df = _grid_df(spark, n, start=next_id)
            next_id += n
            return df

        model = set()
        n0 = int(rng.integers(50, 200))
        ckpt.write_clustered_snapshot(take(n0), root, n_files=3)
        model |= set(range(n0))
        for _ in range(5):
            op = rng.choice(["append", "compact", "expire"])
            if op == "append":
                start = next_id
                n = int(rng.integers(20, 120))
                ckpt.append_clustered_snapshot(take(n), root, n_files=3)
                model |= set(range(start, start + n))
            elif op == "compact":
                ckpt.compact_snapshot(spark, root, n_files=3)
            else:
                ckpt.expire_snapshots(root, keep=int(rng.integers(1, 3)))
            got = {r.id for r in ckpt.read_snapshot(spark, root).select("id").collect()}
            assert got == model, (trial, op, len(got), len(model))
            chain = ckpt.snapshot_log(root)
            for parent, child in zip(chain, chain[1:]):
                assert child.parent_id == parent.snapshot_id
            cur = chain[-1]
            assert all(os.path.isfile(e["path"]) for e in cur.partitions.values())


def test_read_incremental_refuses_non_append_history(spark, tmp_path):
    """Incremental scans across a compaction (file replacement) or from a
    non-ancestor must raise, never silently return the whole table."""
    root = str(tmp_path / "guard")
    m1 = ckpt.write_clustered_snapshot(_grid_df(spark, 100), root, n_files=2)
    m2 = ckpt.append_clustered_snapshot(_grid_df(spark, 50, start=100), root, n_files=2)
    m3 = ckpt.compact_snapshot(spark, root, n_files=2)

    with pytest.raises(ValueError, match="append-only"):
        ckpt.read_incremental(spark, root, m2.snapshot_id, m3.snapshot_id)
    with pytest.raises(ValueError, match="not an ancestor"):
        ckpt.read_incremental(spark, root, m3.snapshot_id, m1.snapshot_id)
    # empty diff keeps the table schema, zero rows
    same = ckpt.read_incremental(spark, root, m3.snapshot_id, m3.snapshot_id)
    assert same.count() == 0 and "id" in same.columns


def test_expire_sweeps_orphan_history_manifests(spark, tmp_path):
    """A history manifest whose snapshot never became current (crashed
    commit) is swept by expire along with its data dir."""
    import json

    root = str(tmp_path / "orphan")
    ckpt.write_clustered_snapshot(_grid_df(spark, 100), root, n_files=2)
    orphan = os.path.join(root, "manifest-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump({"snapshot_id": "deadbeef", "parent_id": None, "partitions": {}}, f)
    os.makedirs(os.path.join(root, "data-deadbeef"))
    removed = ckpt.expire_snapshots(root, keep=1)
    assert orphan in removed
    assert os.path.join(root, "data-deadbeef") in removed
    assert ckpt.read_snapshot(spark, root).count() == 100


def test_plain_checkpoint_layouts_keep_no_history(spark, tmp_root, tmp_path):
    """checkpointed_run / write_snapshot overwrite data in place -- they
    must not accumulate manifest-<id>.json history files."""
    _run(spark, tmp_root, ["1", "2"], [])
    _run(spark, tmp_root, ["1", "2"], [])
    assert [f for f in os.listdir(tmp_root) if f.startswith("manifest-")] == []
    snap_root = str(tmp_path / "plain_snap")
    df = spark.range(0, 100).selectExpr("id", "cast(id % 2 as int) as zoom")
    ckpt.write_snapshot(df, snap_root, "zoom")
    ckpt.write_snapshot(df, snap_root, "zoom")
    assert [f for f in os.listdir(snap_root) if f.startswith("manifest-")] == []


def test_spacetime_snapshot_two_dimensional_pruning(spark, tmp_path):
    """Z-order layout: a (cell range x time range) box prunes files on
    BOTH dimensions -- strictly more than either dimension alone on
    space-time-uncorrelated data -- and reading the pruned subset plus
    the filter equals a brute filter over the whole table."""
    import numpy as np

    root = str(tmp_path / "spacetime")
    rng = np.random.default_rng(11)
    n = 6000
    rows = [
        (int(i), float(lat), float(lng), int(t))
        for i, (lat, lng, t) in enumerate(
            zip(
                rng.uniform(40, 60, n),
                rng.uniform(-10, 10, n),
                rng.integers(1_600_000_000, 1_600_000_000 + 400 * 3600, n),
            )
        )
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lng double, ts long")
    m = ckpt.write_spacetime_snapshot(df, root, ts="ts", n_files=16)

    parts = list(m.partitions.values())
    assert all("ts_min" in p and "ts_max" in p for p in parts)
    full = ckpt.read_snapshot(spark, root)
    assert full.count() == n

    probe = parts[len(parts) // 2]
    c_lo = probe["cell_min"]
    c_hi = probe["cell_max"]
    t_lo = probe["ts_min"]
    t_hi = (probe["ts_min"] + probe["ts_max"]) // 2
    boxed = ckpt.files_for_box(m, c_lo, c_hi, t_lo, t_hi)
    cell_only = [
        p["path"] for p in parts if not (p["cell_max"] < c_lo or p["cell_min"] > c_hi)
    ]
    time_only = [
        p["path"] for p in parts if not (p["ts_max"] < t_lo or p["ts_min"] > t_hi)
    ]
    assert set(boxed) <= set(cell_only) and set(boxed) <= set(time_only)
    assert len(boxed) < len(parts)  # pruning actually drops files

    cond = (
        (ckpt.F.col("cell16") >= c_lo) & (ckpt.F.col("cell16") <= c_hi)
        & (ckpt.F.col("ts") >= t_lo) & (ckpt.F.col("ts") <= t_hi)
    )
    want = full.filter(cond).count()
    got = spark.read.parquet(*boxed).filter(cond).count() if boxed else 0
    assert got == want and want > 0

    # wrong-layout rejection: cell-only manifest has no ts stats
    root2 = str(tmp_path / "plainclustered")
    m2 = ckpt.write_clustered_snapshot(_grid_df(spark, 100), root2, n_files=2)
    with pytest.raises(ValueError, match="spacetime"):
        ckpt.files_for_box(m2, 0, 1, 0, 1)


def test_maybe_compact_policy(spark, tmp_path):
    """Auto-compaction fires only past the degradation threshold: a
    fresh layout is left alone (None), an append-degraded layout is
    rewritten to overlap 0.0."""
    root = str(tmp_path / "policy")
    ckpt.write_clustered_snapshot(_grid_df(spark, 300), root, n_files=4)
    assert ckpt.overlap_fraction(ckpt.Manifest.load(root)) == 0.0
    assert ckpt.maybe_compact(spark, root, threshold=0.25) is None

    ckpt.append_clustered_snapshot(_grid_df(spark, 300, start=300), root, n_files=4)
    assert ckpt.overlap_fraction(ckpt.Manifest.load(root)) > 0.25
    m = ckpt.maybe_compact(spark, root, threshold=0.25, n_files=4)
    assert m is not None and ckpt.overlap_fraction(m) == 0.0
    assert ckpt.read_snapshot(spark, root).count() == 600
    assert ckpt.maybe_compact(spark, root, threshold=0.25) is None  # tight again


def test_spacetime_maintenance_preserves_layout(spark, tmp_path):
    """Append + auto-compaction on a spacetime table must preserve the
    Z-order layout: appended and compacted manifests keep ts/zv stats,
    files_for_box still works, and overlap_fraction measures the
    Z-value (a fresh spacetime layout scores 0.0, not perma-degraded)."""
    import numpy as np

    root = str(tmp_path / "st_maint")
    rng = np.random.default_rng(5)

    def pts(n, start=0):
        rows = [
            (int(start + i), float(a), float(b), int(t))
            for i, (a, b, t) in enumerate(
                zip(
                    rng.uniform(40, 60, n),
                    rng.uniform(-10, 10, n),
                    rng.integers(1_600_000_000, 1_600_000_000 + 400 * 3600, n),
                )
            )
        ]
        return spark.createDataFrame(rows, "id long, lat double, lng double, ts long")

    m1 = ckpt.write_spacetime_snapshot(pts(1500), root, ts="ts", n_files=6)
    assert m1.layout == {"kind": "spacetime", "ts": "ts", "space_bits": 24}
    assert ckpt.overlap_fraction(m1) == 0.0  # fresh Z-order is tight in zv

    m2 = ckpt.append_clustered_snapshot(pts(1500, start=1500), root, n_files=6)
    assert m2.layout["kind"] == "spacetime"
    assert all("ts_min" in e and "zv_min" in e for e in m2.partitions.values())
    assert ckpt.overlap_fraction(m2) > 0.0

    m3 = ckpt.maybe_compact(spark, root, threshold=0.0, n_files=6)
    assert m3 is not None and m3.layout["kind"] == "spacetime"
    assert all("ts_min" in e and "zv_min" in e for e in m3.partitions.values())
    assert ckpt.overlap_fraction(m3) == 0.0
    probe = sorted(m3.partitions.values(), key=lambda p: p["cell_min"])[2]
    files = ckpt.files_for_box(
        m3, probe["cell_min"], probe["cell_max"], probe["ts_min"], probe["ts_max"]
    )
    assert probe["path"] in files
    assert ckpt.read_snapshot(spark, root).count() == 3000


def test_lifecycle_guards_raise_explicitly(spark, tmp_path):
    """Null-ts rows (even mixed into non-null files), plain-layout
    manifests under overlap_fraction, and zoom-domain mismatches in
    tile_pyramid_apply_delta all raise with explicit messages."""
    from diagonal_b6_spark.pipeline import (
        tile_assignments,
        tile_pyramid_apply_delta,
        tile_pyramid_rollup,
    )

    root = str(tmp_path / "nullts")
    df = spark.range(100).selectExpr(
        "id", "45.0 + id * 0.1 as lat", "0.1 * id as lng",
        "CASE WHEN id = 7 THEN NULL ELSE 1600000000 + id END as ts",
    )
    with pytest.raises(ValueError, match="null ts"):
        ckpt.write_spacetime_snapshot(df, root, ts="ts", n_files=2)

    snap = str(tmp_path / "plain")
    m = ckpt.write_snapshot(
        spark.range(10).selectExpr("id", "cast(id % 2 as int) as zoom"), snap, "zoom"
    )
    with pytest.raises(ValueError, match="clustering-key"):
        ckpt.overlap_fraction(m)

    p = spark.range(30).select(
        ckpt.F.col("id").alias("image_id"),
        (ckpt.F.lit(51.0) + ckpt.F.col("id") * 0.01).alias("lat"),
        (ckpt.F.lit(-0.2) + ckpt.F.col("id") * 0.01).alias("lng"),
    )
    pyr = tile_pyramid_rollup(tile_assignments(p, zooms=(12,)), 12, 10)
    bad = tile_pyramid_apply_delta(pyr, p.limit(0), p.limit(0), 12, 11)  # domain mismatch
    with pytest.raises(Exception, match="outside"):
        bad.collect()


def test_empty_manifest_and_schema_persistence(spark, tmp_path):
    """Round-5 ADVICE regressions: (a) overlap_fraction of a
    zero-partition manifest is 0.0 (not the layout-guard error) and
    maybe_compact on it is a no-op; (b) read_snapshot of an empty
    snapshot presents the table's REAL persisted schema; (c) a
    pre-schema_json manifest raises explicitly instead of inventing a
    schema; (d) boundary-sharing adjacent files count as overlapping
    (inclusive >=, matching files_for_cell_range)."""
    root = str(tmp_path / "emptiness")
    m = ckpt.write_clustered_snapshot(_grid_df(spark, 200), root, n_files=3)
    schema = ckpt.read_snapshot(spark, root).schema
    # (a) + (b): synthesize the empty-table state with the real schema kept
    m.partitions = {}
    m.commit()
    cur = ckpt.Manifest.load(root)
    assert ckpt.overlap_fraction(cur) == 0.0
    assert ckpt.maybe_compact(spark, root, threshold=0.25) is None
    empty = ckpt.read_snapshot(spark, root)
    assert empty.schema == schema and empty.count() == 0
    # (c): legacy manifest without schema_json
    cur.schema_json = None
    cur.commit()
    with pytest.raises(ValueError, match="schema"):
        ckpt.read_snapshot(spark, root)
    # (d): adjacent files sharing one boundary key value overlap
    m2 = ckpt.Manifest(root=str(tmp_path / "fake"))
    m2.partitions = {
        "a": {"path": "a", "cell_min": 0, "cell_max": 10},
        "b": {"path": "b", "cell_min": 10, "cell_max": 20},
        "c": {"path": "c", "cell_min": 21, "cell_max": 30},
    }
    assert ckpt.overlap_fraction(m2) == 0.5


def test_expire_snapshots_grace_period(spark, tmp_path):
    """expire_snapshots with grace_s leaves young unreferenced
    manifests and data dirs alone (a concurrent in-flight commit is
    indistinguishable from a crash orphan), while grace_s=0 sweeps
    them (single-writer default)."""
    root = str(tmp_path / "grace")
    m1 = ckpt.write_clustered_snapshot(_grid_df(spark, 200), root, n_files=2)
    ckpt.append_clustered_snapshot(_grid_df(spark, 200, start=200), root, n_files=2)
    # everything here was written milliseconds ago: with a 1-hour grace
    # nothing may be deleted even though keep=1 would drop m1
    assert ckpt.expire_snapshots(root, keep=1, grace_s=3600.0) == []
    assert ckpt.read_snapshot(spark, root, as_of=m1.snapshot_id).count() == 200
    # default grace (0.0) sweeps as before
    removed = ckpt.expire_snapshots(root, keep=1)
    assert removed and ckpt.read_snapshot(spark, root).count() == 400


def test_zorder_bits_density_parameterization(spark, tmp_path):
    """r5: per-table-density Z-order allocation.  (a) the symmetric
    default is bit-identical to the pre-parameterization key (equal-bits
    regression); (b) suggest_zorder_bits gives time exactly enough bits
    for the realized hour span; (c) a snapshot written with an
    asymmetric allocation records it in the layout, appends/compactions
    preserve it, and files_for_box pruning stays correct."""
    import numpy as np

    from diagonal_b6_spark.operators import cover as cover_ops

    rng = np.random.default_rng(11)

    def pts(n, start=0):
        rows = [
            (int(start + i), float(a), float(b), int(t))
            for i, (a, b, t) in enumerate(
                zip(
                    rng.uniform(40, 60, n),
                    rng.uniform(-10, 10, n),
                    # ~400 distinct hours -> suggested time_bits ~ 10
                    rng.integers(1_600_000_000, 1_600_000_000 + 400 * 3600, n),
                )
            )
        ]
        return spark.createDataFrame(rows, "id long, lat double, lng double, ts long")

    df = cover_ops.with_point_cells(pts(1200))
    # (a) equal-bits path: time_bits=None == time_bits=bits == old form
    a = df.select(
        cover_ops.spacetime_zvalue_col(ckpt.F.col("cell16"), ckpt.F.col("ts")).alias("z")
    ).collect()
    b = df.select(
        cover_ops.spacetime_zvalue_col(
            ckpt.F.col("cell16"), ckpt.F.col("ts"), bits=24, time_bits=24
        ).alias("z")
    ).collect()
    assert [r["z"] for r in a] == [r["z"] for r in b]

    # (b) suggestion: 400-hour SPAN -> ceil(log2(span+1))+1 = 10, rebased
    # at the table's min hour (span-based sizing: a sparse table spanning
    # the same range gets the same bits, no aliasing)
    sb, tb, h0 = cover_ops.suggest_zorder_bits(pts(1200), "ts")
    assert sb == 24 and 9 <= tb <= 11
    assert 0 <= h0 - 1_600_000_000 // 3600 <= 2  # rebased at the table min
    # a sparse table (one hour per week kept, ~3 distinct hours) keeps
    # span-sized bits: distinct-count sizing would give ~3 bits and
    # alias weeks-apart times onto one rank
    sparse = pts(1200).filter(ckpt.F.col("ts") % (7 * 24 * 3600) < 3600)
    _, tb_sparse, _ = cover_ops.suggest_zorder_bits(sparse, "ts")
    assert tb_sparse >= 9  # sized by the surviving ~2-week span

    # (c) asymmetric snapshot: layout carries bits + origin through the
    # lifecycle and pruning stays correct
    root = str(tmp_path / "zbits")
    m1 = ckpt.write_spacetime_snapshot(
        pts(1500), root, ts="ts", n_files=6,
        space_bits=sb, time_bits=tb, time_origin_h=h0,
    )
    assert m1.layout["space_bits"] == sb and m1.layout["time_bits"] == tb
    assert m1.layout["time_origin_h"] == h0
    assert ckpt.overlap_fraction(m1) == 0.0
    m2 = ckpt.append_clustered_snapshot(pts(1500, start=1500), root, n_files=6)
    assert m2.layout["space_bits"] == sb and m2.layout["time_bits"] == tb
    m3 = ckpt.maybe_compact(spark, root, threshold=0.0, n_files=6)
    assert m3 is not None and m3.layout["time_bits"] == tb
    assert ckpt.overlap_fraction(m3) == 0.0
    probe = sorted(m3.partitions.values(), key=lambda p: p["cell_min"])[1]
    files = ckpt.files_for_box(
        m3, probe["cell_min"], probe["cell_max"], probe["ts_min"], probe["ts_max"]
    )
    assert probe["path"] in files
    assert ckpt.read_snapshot(spark, root).count() == 3000
