"""GB UPRN ingest (sources/uprn.py) vs the reference's
ingest/gb/uprn/source.go + source_test.go."""

import gzip
import os

from pyspark.sql import functions as F

from diagonal_b6_spark.sources import uprn


def _write_uprn_csv(tmp_path, gz=True):
    # BOM on the first header cell, shuffled column order (the reference
    # locates columns by trimmed name, source.go:63-72)
    body = (
        "﻿LATITUDE,UPRN,LONGITUDE\n"
        "51.5349035,5150460,-0.1257194\n"
        "51.5349035,5150461,-0.1257194\n"
        "51.536685,5158495,-0.127258\n"
    )
    p = os.path.join(str(tmp_path), "uprn.csv.gz" if gz else "uprn.csv")
    if gz:
        with gzip.open(p, "wt", encoding="utf-8") as f:
            f.write(body)
    else:
        with open(p, "w", encoding="utf-8") as f:
            f.write(body)
    return p


def test_read_uprn_gzip_bom_and_tags(spark, tmp_path):
    path = _write_uprn_csv(tmp_path)
    out = uprn.read_uprn(spark, path).collect()
    assert len(out) == 3
    byid = {r.feature_id: r for r in out}
    r = byid["point/gb/uprn/5150460"]
    assert r.tags == {"#place": "uprn"}
    assert r.xs == [-0.1257194] and r.ys == [51.5349035]
    assert r.ns == "gb/uprn"


def test_join_tags(spark, tmp_path):
    path = _write_uprn_csv(tmp_path)
    jt = os.path.join(str(tmp_path), "join.csv")
    with open(jt, "w") as f:
        f.write("uprn,building,entrance\n5150460,yes,main\n5150461,,side\n")
    tags = uprn.join_tags_from_csv(spark, jt)
    out = {r.feature_id: r.tags for r in uprn.read_uprn(spark, path, tags).collect()}
    assert out["point/gb/uprn/5150460"] == {
        "#place": "uprn", "building": "yes", "entrance": "main",
    }
    # empty value skipped (join.go:79-81)
    assert out["point/gb/uprn/5150461"] == {"#place": "uprn", "entrance": "side"}
    assert out["point/gb/uprn/5158495"] == {"#place": "uprn"}


def test_uprn_clusters_reference_fixture(spark, tmp_path):
    """Mirrors source_test.go:15-52 TestUPRNClusters exactly: the two
    co-located UPRNs share a level-25 cell (size 2), the third clusters
    alone -- with the reference's own pinned cell ids as feature ids."""
    path = _write_uprn_csv(tmp_path)
    pts = uprn.read_uprn(spark, path)
    clusters = {r.cell_id: r for r in uprn.uprn_clusters(pts).collect()}
    sizes = {cid: int(r.tags["uprn_cluster:size"]) for cid, r in clusters.items()}
    assert sizes == {5221390606888338432: 1, 5221390769366334464: 2}
    for r in clusters.values():
        assert r.tags["#place"] == "uprn_cluster"
        assert r.feature_id.startswith("point/diagonal/uprn_cluster/")
        # cluster location is the cell CENTER, within ~30 cm of members
        assert abs(r.ys[0] - 51.535) < 0.005


def test_missing_column_raises(spark, tmp_path):
    p = os.path.join(str(tmp_path), "bad.csv")
    with open(p, "w") as f:
        f.write("UPRN,LAT,LON\n1,51.5,-0.1\n")
    import pytest

    with pytest.raises(ValueError, match="missing column"):
        uprn.read_uprn(spark, p)
