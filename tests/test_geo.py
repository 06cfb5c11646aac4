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
