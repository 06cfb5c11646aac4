"""Geo-spatial point queries — ``lucene/core geo`` + ``document/LatLonPoint``
analog.

Reference semantics:

- coordinates quantize to 32 bits before matching:
  ``encoded = floor(deg / DECODE)``, ``decoded = encoded * DECODE`` with
  ``DECODE = 180/2^32`` for latitude and ``360/2^32`` for longitude
  (``geo/GeoEncodingUtils.java:38-44,60-66,90-96,119-122,140-143``) — all
  plain IEEE-double ops, bitwise identical across engines;
- ``LatLonPoint.newBoxQuery`` matches decoded points inside the box
  (``document/LatLonPoint.java:176``);
- ``LatLonPoint.newDistanceQuery`` matches decoded points with haversine
  distance <= radius, ``haversinMeters`` on the mean earth radius
  6_371_008.7714 m (``util/SloppyMath.java:50-60,203``,
  ``document/LatLonPoint.java:241``).

Spark-first plan shape: the BKD tree's role (coarse spatial pruning before
the exact per-point check) is played by a *bounding-box pre-filter on the raw
columns* — plain comparisons that push down to the parquet/Iceberg scan and
prune row groups via min/max stats; the exact quantize+haversine predicate
then runs JVM-side inside whole-stage codegen.  No UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

__all__ = [
    "LAT_DECODE",
    "LON_DECODE",
    "EARTH_MEAN_RADIUS_METERS",
    "quantize_lat",
    "quantize_lon",
    "haversin_meters",
    "distance_bounding_box",
    "geo_box_predicate",
    "geo_distance_predicate",
    "geo_distance_meters",
]

LAT_DECODE = 180.0 / 4294967296.0  # GeoEncodingUtils.LAT_DECODE
LON_DECODE = 360.0 / 4294967296.0  # GeoEncodingUtils.LON_DECODE
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714  # GeoUtils.java:57


def quantize_lat(col: Column) -> Column:
    """decode(encode(lat)) — the value the reference actually matches on."""
    return F.floor(col / F.lit(LAT_DECODE)) * F.lit(LAT_DECODE)


def quantize_lon(col: Column) -> Column:
    return F.floor(col / F.lit(LON_DECODE)) * F.lit(LON_DECODE)


def haversin_meters(lat1: Column, lon1: Column, lat2, lon2) -> Column:
    """SloppyMath.haversinMeters (:50-60): 2R·asin(min(1, sqrt(sortKey/2)))
    with sortKey = 2·(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2))."""
    lat2 = F.lit(lat2) if not isinstance(lat2, Column) else lat2
    lon2 = F.lit(lon2) if not isinstance(lon2, Column) else lon2
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi, dlam = F.radians(lat2 - lat1), F.radians(lon2 - lon1)
    s1, s2 = F.sin(dphi / 2), F.sin(dlam / 2)
    h = s1 * s1 + F.cos(phi1) * F.cos(phi2) * s2 * s2
    return (
        F.lit(2.0 * EARTH_MEAN_RADIUS_METERS)
        * F.asin(F.least(F.lit(1.0), F.sqrt(h)))
    )


def distance_bounding_box(lat: float, lon: float, radius_m: float) -> tuple:
    """(min_lat, max_lat, min_lon, max_lon) enclosing the distance circle —
    the coarse pruning stage (GeoUtils.boundingBox shape).  Padded by one
    quantization step so the pre-filter can never drop a true match; poles /
    antimeridian degenerate to the full range."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat, max_lat = lat - dlat - LAT_DECODE, lat + dlat + LAT_DECODE
    if min_lat <= -90.0 or max_lat >= 90.0:
        return (-90.0, 90.0, -180.0, 180.0)
    # widest longitude delta occurs at the latitude extreme closest to a pole
    max_abs_lat = math.radians(min(90.0, max(abs(min_lat), abs(max_lat))))
    cosl = math.cos(max_abs_lat)
    if cosl <= 0:
        return (min_lat, max_lat, -180.0, 180.0)
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_METERS * cosl))
    if dlon >= 180.0:
        return (min_lat, max_lat, -180.0, 180.0)
    min_lon, max_lon = lon - dlon - LON_DECODE, lon + dlon + LON_DECODE
    if min_lon < -180.0 or max_lon > 180.0:
        # antimeridian wrap: fall back to the full longitude range (the
        # exact predicate still decides) rather than a disjunctive box
        return (min_lat, max_lat, -180.0, 180.0)
    return (min_lat, max_lat, min_lon, max_lon)


def geo_box_predicate(lat_col: Column, lon_col: Column, min_lat: float, max_lat: float, min_lon: float, max_lon: float) -> Column:
    """LatLonPoint.newBoxQuery analog on quantized coordinates.  The raw-
    column range test rides in front so Catalyst pushes it to the scan; the
    quantized test decides (a raw value just below min can quantize into the
    box only from above... floor() only moves values down, so raw >= min is
    implied by quantized >= min minus one step — pad accordingly)."""
    coarse = (
        (lat_col >= F.lit(min_lat - LAT_DECODE))
        & (lat_col <= F.lit(max_lat + LAT_DECODE))
        & (lon_col >= F.lit(min_lon - LON_DECODE))
        & (lon_col <= F.lit(max_lon + LON_DECODE))
    )
    qlat, qlon = quantize_lat(lat_col), quantize_lon(lon_col)
    exact = (
        (qlat >= F.lit(min_lat)) & (qlat <= F.lit(max_lat))
        & (qlon >= F.lit(min_lon)) & (qlon <= F.lit(max_lon))
    )
    return coarse & exact


def geo_distance_meters(lat_col: Column, lon_col: Column, lat: float, lon: float) -> Column:
    """Distance from each (quantized) point to (lat, lon) — the sort key of
    LatLonDocValuesField.newDistanceSort."""
    return haversin_meters(quantize_lat(lat_col), quantize_lon(lon_col), lat, lon)


def geo_distance_predicate(lat_col: Column, lon_col: Column, lat: float, lon: float, radius_m: float) -> Column:
    """LatLonPoint.newDistanceQuery analog: scan-prunable bounding box AND
    exact haversine on quantized coordinates."""
    min_lat, max_lat, min_lon, max_lon = distance_bounding_box(lat, lon, radius_m)
    coarse = (
        (lat_col >= F.lit(min_lat)) & (lat_col <= F.lit(max_lat))
        & (lon_col >= F.lit(min_lon)) & (lon_col <= F.lit(max_lon))
    )
    return coarse & (geo_distance_meters(lat_col, lon_col, lat, lon) <= F.lit(radius_m))
