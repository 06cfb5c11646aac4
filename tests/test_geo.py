"""LatLonPoint analog: quantized box / distance queries vs a pure-Python
control, plus scan-pushdown of the coarse pre-filter.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.geo import (
    EARTH_MEAN_RADIUS_METERS,
    LAT_DECODE,
    LON_DECODE,
    distance_bounding_box,
    geo_box_predicate,
    geo_distance_meters,
    geo_distance_predicate,
)


def _py_quant(v, step):
    return math.floor(v / step) * step


def _py_haversin(lat1, lon1, lat2, lon2):
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi, dlam = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    h = math.sin(dphi / 2) ** 2 + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2
    return 2 * EARTH_MEAN_RADIUS_METERS * math.asin(min(1.0, math.sqrt(h)))


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "id": np.arange(4000),
            "lat": rng.uniform(-90, 90, 4000),
            "lon": rng.uniform(-180, 180, 4000),
        }
    )
    return spark.createDataFrame(pdf).persist(), pdf


def test_known_distance():
    # SF (37.7749, -122.4194) to LA (34.0522, -118.2437) ~ 559 km
    d = _py_haversin(37.7749, -122.4194, 34.0522, -118.2437)
    assert 556_000 < d < 562_000


def test_distance_query_matches_python(points):
    df, pdf = points
    lat0, lon0, r = 37.77, -122.42, 4_000_000.0
    got = sorted(
        r_["id"] for r_ in df.filter(geo_distance_predicate(F.col("lat"), F.col("lon"), lat0, lon0, r)).collect()
    )
    want = sorted(
        int(i)
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
        if _py_haversin(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), lat0, lon0) <= r
    )
    assert got == want and len(got) > 50


def test_box_query_matches_python(points):
    df, pdf = points
    b = (-10.0, 35.5, 20.25, 140.0)
    got = sorted(
        r_["id"]
        for r_ in df.filter(geo_box_predicate(F.col("lat"), F.col("lon"), b[0], b[1], b[2], b[3])).collect()
    )
    want = sorted(
        int(i)
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
        if b[0] <= _py_quant(la, LAT_DECODE) <= b[1] and b[2] <= _py_quant(lo, LON_DECODE) <= b[3]
    )
    assert got == want and len(got) > 50


def test_distance_sort_matches_python(points):
    df, pdf = points
    lat0, lon0 = 48.85, 2.35
    got = [
        r_["id"]
        for r_ in df.withColumn("d", geo_distance_meters(F.col("lat"), F.col("lon"), lat0, lon0))
        .orderBy("d", "id")
        .limit(20)
        .collect()
    ]
    dist = [
        (_py_haversin(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), lat0, lon0), int(i))
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
    ]
    want = [i for _, i in sorted(dist)[:20]]
    assert got == want


def test_bounding_box_never_prunes_matches(points):
    df, pdf = points
    lat0, lon0, r = 80.0, 170.0, 2_000_000.0  # near pole + antimeridian
    box = distance_bounding_box(lat0, lon0, r)
    assert box[2] == -180.0 and box[3] == 180.0  # wraps -> full lon range
    got = sorted(
        r_["id"] for r_ in df.filter(geo_distance_predicate(F.col("lat"), F.col("lon"), lat0, lon0, r)).collect()
    )
    want = sorted(
        int(i)
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
        if _py_haversin(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), lat0, lon0) <= r
    )
    assert got == want and want


def test_coarse_filter_pushes_to_scan(spark, tmp_path, points):
    _, pdf = points
    path = str(tmp_path / "pts")
    spark.createDataFrame(pdf).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        df.filter(geo_distance_predicate(F.col("lat"), F.col("lon"), 10.0, 10.0, 500_000.0))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan
    # the plan string elides long filter lists; the lat range bound leading
    # the list proves the coarse conjuncts reached the scan
    assert "GreaterThanOrEqual(lat" in plan


def test_heatmap_counts_match_python_binning(points):
    from lucene_solr_spark.functions.geo import heatmap_counts

    df, pdf = points
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in heatmap_counts(df, "lat", "lon", -60.0, 60.0, -120.0, 120.0, 6, 8).collect()
    }
    want = {}
    for la, lo in zip(pdf["lat"], pdf["lon"]):
        qla, qlo = _py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE)
        if not (-60.0 <= qla <= 60.0 and -120.0 <= qlo <= 120.0):
            continue
        cell = (min(int((qla + 60.0) // 20.0), 5), min(int((qlo + 120.0) // 30.0), 7))
        want[cell] = want.get(cell, 0) + 1
    assert got == want and sum(want.values()) > 1000


def _py_pnpoly(qlat, qlon, lats, lons):
    """Brute-force pnpoly with the exact reference term order."""
    lats, lons = list(lats) + [lats[0]], list(lons) + [lons[0]]
    bbox = min(lats) <= qlat <= max(lats) and min(lons) <= qlon <= max(lons)
    c = 0
    for i in range(len(lats) - 1):
        lat1, lon1, lat2, lon2 = lats[i], lons[i], lats[i + 1], lons[i + 1]
        if (lat1 > qlat) != (lat2 > qlat) and qlon < (lon1 - lon2) * (qlat - lat2) / (lat1 - lat2) + lon2:
            c += 1
    return bbox and c % 2 == 1


def test_polygon_matches_brute_force_with_hole(points):
    from lucene_solr_spark.functions.geo import geo_polygon_predicate

    df, pdf = points
    lats = [-50.0, 60.0, -10.0, 60.0, -50.0]
    lons = [-120.0, -80.0, 0.0, 80.0, 120.0]
    hole = ([-30.0, -10.0, -10.0, -30.0], [-20.0, -20.0, 20.0, 20.0])
    got = sorted(
        r["id"]
        for r in df.filter(
            geo_polygon_predicate(F.col("lat"), F.col("lon"), lats, lons, holes=[hole])
        ).collect()
    )
    want = sorted(
        int(i)
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
        if _py_pnpoly(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), lats, lons)
        and not _py_pnpoly(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), hole[0], hole[1])
    )
    assert got == want and len(want) > 100
    # the hole actually excludes points
    full = df.filter(geo_polygon_predicate(F.col("lat"), F.col("lon"), lats, lons)).count()
    assert full > len(want)


def test_polygon_coarse_prefilter_pushes_to_scan(spark, tmp_path, points):
    from lucene_solr_spark.functions.geo import geo_polygon_predicate

    _, pdf = points
    path = str(tmp_path / "pts_poly")
    spark.createDataFrame(pdf).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        df.filter(geo_polygon_predicate(F.col("lat"), F.col("lon"), [0.0, 20.0, 10.0], [0.0, 0.0, 15.0]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lat" in plan


def test_distance_feature_score_float32(points):
    from lucene_solr_spark.functions.geo import distance_feature_score

    df, pdf = points
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id",
            distance_feature_score(F.col("lat"), F.col("lon"), 10.0, 20.0, 500_000.0, weight=3.0).alias("s"),
        ).collect()
    }
    for i, la, lo in list(zip(pdf["id"], pdf["lat"], pdf["lon"]))[:500]:
        d = _py_haversin(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), 10.0, 20.0)
        want = np.float32(3.0 * (500_000.0 / (500_000.0 + d)))
        assert got[int(i)] == pytest.approx(float(want), abs=2e-7)
        assert 0.0 < got[int(i)] <= 3.0


def test_nearest_neighbors_matches_python(points):
    from lucene_solr_spark.functions.geo import nearest_neighbors

    df, pdf = points
    lat0, lon0, k = 37.77, -122.42, 25
    got = [
        (r["id"], math.floor(r["dist_m"]))
        for r in nearest_neighbors(df, F.col("lat"), F.col("lon"), lat0, lon0, k, id_cols=("id",)).collect()
    ]
    want = sorted(
        (
            _py_haversin(_py_quant(la, LAT_DECODE), _py_quant(lo, LON_DECODE), lat0, lon0),
            int(i),
        )
        for i, la, lo in zip(pdf["id"], pdf["lat"], pdf["lon"])
    )[:k]
    assert got == [(i, math.floor(d)) for d, i in want]


def test_nearest_neighbors_prefilter_same_topk(points):
    from lucene_solr_spark.functions.geo import nearest_neighbors

    df, _ = points
    args = (df, F.col("lat"), F.col("lon"), 37.77, -122.42, 10)
    full = [r["id"] for r in nearest_neighbors(*args, id_cols=("id",)).collect()]
    pre = [
        r["id"]
        for r in nearest_neighbors(*args, id_cols=("id",), prefilter_radius_m=5_000_000.0).collect()
    ]
    assert full == pre
