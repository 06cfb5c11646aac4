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
    "geo_polygon_predicate",
    "polygon_predicate_sql",
    "distance_feature_score",
    "nearest_neighbors",
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


def nearest_neighbors(
    df,
    lat_col: Column,
    lon_col: Column,
    lat: float,
    lon: float,
    k: int,
    id_cols=("c_custkey",),
    prefilter_radius_m: float = None,
):
    """LatLonPointPrototypeQueries.nearest analog (``reference lucene/
    sandbox/.../search/NearestNeighbor.java``, ``LatLonPointPrototypeQueries.
    java``): the k points closest to (lat, lon) by haversine over quantized
    coordinates, ties broken by the id columns ascending (the reference's
    NearestHit comparator: distance asc, docID asc).

    The reference prunes BKD cells whose minimum possible distance exceeds
    the current kth hit; here Catalyst's TakeOrderedAndProject gives the same
    shape for free — a per-partition k-heap and a k-row merge, never a full
    sort.  For a bounded search radius pass ``prefilter_radius_m``: the
    bounding-box predicate pushes into the scan (parquet/Iceberg min/max
    pruning — the cell-level BKD skip analog).
    """
    dist = geo_distance_meters(lat_col, lon_col, lat, lon)
    out = df
    if prefilter_radius_m is not None:
        min_lat, max_lat, min_lon, max_lon = distance_bounding_box(lat, lon, prefilter_radius_m)
        out = out.filter(
            (lat_col >= F.lit(min_lat)) & (lat_col <= F.lit(max_lat))
            & (lon_col >= F.lit(min_lon)) & (lon_col <= F.lit(max_lon))
        )
    out = out.withColumn("dist_m", dist)
    return out.orderBy(F.asc("dist_m"), *[F.asc(c) for c in id_cols]).limit(int(k))


def geo_distance_predicate(lat_col: Column, lon_col: Column, lat: float, lon: float, radius_m: float) -> Column:
    """LatLonPoint.newDistanceQuery analog: scan-prunable bounding box AND
    exact haversine on quantized coordinates."""
    min_lat, max_lat, min_lon, max_lon = distance_bounding_box(lat, lon, radius_m)
    coarse = (
        (lat_col >= F.lit(min_lat)) & (lat_col <= F.lit(max_lat))
        & (lon_col >= F.lit(min_lon)) & (lon_col <= F.lit(max_lon))
    )
    return coarse & (geo_distance_meters(lat_col, lon_col, lat, lon) <= F.lit(radius_m))


def heatmap_counts(
    points,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    rows: int,
    cols: int,
):
    """Spatial heatmap faceting (``reference lucene/spatial-extras/src/java/
    org/apache/lucene/spatial/prefix/HeatmapFacetCounter.java`` via Solr
    ``facet.heatmap``, SpatialHeatmapFacets): count points per cell of a
    rows×cols grid over the bounding box, matching on quantized coordinates
    like every LatLonPoint query.

    Deviation (documented): the reference emits a dense ``counts_ints2D``
    array per region; we emit the sparse non-empty cells ``(row, col, cnt)``
    — at 100 TB the dense grid is a driver-side reshape of this exact result,
    and empty cells carry no information.  Cell addressing matches the
    reference: row 0 at ``min_lat``, col 0 at ``min_lon``, upper edges
    clamped into the last cell.
    """
    cell_h = (max_lat - min_lat) / rows
    cell_w = (max_lon - min_lon) / cols
    qlat, qlon = quantize_lat(F.col(lat_col)), quantize_lon(F.col(lon_col))
    inside = (
        (qlat >= F.lit(min_lat)) & (qlat <= F.lit(max_lat))
        & (qlon >= F.lit(min_lon)) & (qlon <= F.lit(max_lon))
    )
    row = F.least(F.floor((qlat - F.lit(min_lat)) / F.lit(cell_h)), F.lit(rows - 1)).cast("int")
    col = F.least(F.floor((qlon - F.lit(min_lon)) / F.lit(cell_w)), F.lit(cols - 1)).cast("int")
    return (
        points.where(inside)
        .groupBy(row.alias("row"), col.alias("col"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _close_ring(lats, lons):
    lats, lons = list(map(float, lats)), list(map(float, lons))
    if lats[0] != lats[-1] or lons[0] != lons[-1]:
        lats.append(lats[0])
        lons.append(lons[0])
    return lats, lons


def _pnpoly_edges(lats, lons):
    """Edges of a closed ring, horizontal ones dropped — a horizontal edge
    can never satisfy the crossing guard ``lat1 > y != lat2 > y``, and
    dropping it keeps the (constant) divisor nonzero under ANSI SQL."""
    lats, lons = _close_ring(lats, lons)
    return [
        (lats[i], lons[i], lats[i + 1], lons[i + 1])
        for i in range(len(lats) - 1)
        if lats[i] != lats[i + 1]
    ]


def _ring_contains(qlat: Column, qlon: Column, lats, lons) -> Column:
    """pnpoly crossing parity over one ring (``reference lucene/core/src/
    java/org/apache/lucene/geo/Polygon2D.java:215-233``): for each edge,
    crossing iff ``lat1 > y != lat2 > y`` and
    ``x < (lon1-lon2)·(y-lat2)/(lat1-lat2) + lon2`` — identical IEEE-double
    term order here; odd total = inside.  Plus the component bounding-box
    gate (``componentContains``, :66-79).  The edge kd-tree is a pruning
    structure only; evaluating all edges computes the same parity, and the
    whole unrolled expression is constant-folded codegen — no UDF."""
    crossings = None
    for lat1, lon1, lat2, lon2 in _pnpoly_edges(lats, lons):
        guard = (F.lit(lat1) > qlat) != (F.lit(lat2) > qlat)
        xline = F.lit(lon1 - lon2) * (qlat - F.lit(lat2)) / F.lit(lat1 - lat2) + F.lit(lon2)
        c = F.when(guard & (qlon < xline), 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    bbox = (
        (qlat >= F.lit(min(lats))) & (qlat <= F.lit(max(lats)))
        & (qlon >= F.lit(min(lons))) & (qlon <= F.lit(max(lons)))
    )
    return bbox & (crossings % 2 == 1)


def geo_polygon_predicate(lat_col: Column, lon_col: Column, lats, lons, holes=()) -> Column:
    """LatLonPoint.newPolygonQuery analog (``reference lucene/core/src/java/
    org/apache/lucene/document/LatLonPoint.java:253``, matching semantics
    ``geo/Polygon2D.java:47-79``): quantized point inside the ring by
    odd-even crossings, and not inside any hole.  A raw-column bounding-box
    pre-filter (padded one quantization step, cf. geo_box_predicate) rides
    in front so Catalyst pushes it to the scan — the BKD coarse stage."""
    lats_c, lons_c = _close_ring(lats, lons)
    coarse = (
        (lat_col >= F.lit(min(lats_c) - LAT_DECODE))
        & (lat_col <= F.lit(max(lats_c) + LAT_DECODE))
        & (lon_col >= F.lit(min(lons_c) - LON_DECODE))
        & (lon_col <= F.lit(max(lons_c) + LON_DECODE))
    )
    qlat, qlon = quantize_lat(lat_col), quantize_lon(lon_col)
    inside = _ring_contains(qlat, qlon, lats, lons)
    for hlats, hlons in holes:
        inside = inside & ~_ring_contains(qlat, qlon, hlats, hlons)
    return coarse & inside


def polygon_predicate_sql(qlat_expr: str, qlon_expr: str, lats, lons, holes=()) -> str:
    """The identical pnpoly expression as ANSI SQL over quantized-coordinate
    expressions — oracle generator, emitted from the SAME vertex constants
    and term order as :func:`geo_polygon_predicate` so both engines run the
    same IEEE-double program."""

    def ring(lats_, lons_):
        terms = []
        for lat1, lon1, lat2, lon2 in _pnpoly_edges(lats_, lons_):
            terms.append(
                f"(CASE WHEN (({lat1!r} > {qlat_expr}) <> ({lat2!r} > {qlat_expr})) "
                f"AND ({qlon_expr} < {lon1 - lon2!r} * ({qlat_expr} - {lat2!r}) / {lat1 - lat2!r} + {lon2!r}) "
                "THEN 1 ELSE 0 END)"
            )
        lats_c, lons_c = _close_ring(lats_, lons_)
        bbox = (
            f"{qlat_expr} >= {min(lats_c)!r} AND {qlat_expr} <= {max(lats_c)!r} "
            f"AND {qlon_expr} >= {min(lons_c)!r} AND {qlon_expr} <= {max(lons_c)!r}"
        )
        return f"({bbox} AND ({' + '.join(terms)}) % 2 = 1)"

    out = ring(lats, lons)
    for hlats, hlons in holes:
        out += f" AND NOT {ring(hlats, hlons)}"
    return f"({out})"


def distance_feature_score(
    lat_col: Column, lon_col: Column, lat: float, lon: float, pivot_m: float, weight: float = 1.0
) -> Column:
    """LatLonPoint.newDistanceFeatureQuery analog (``reference lucene/core/
    src/java/org/apache/lucene/document/LatLonPointDistanceFeatureQuery.
    java:274-276``): ``score = (float)(boost · pivot/(pivot + distance))``
    over the haversine distance on quantized coordinates — a monotone
    distance-decay ranking signal, double arithmetic cast to float32 exactly
    as the reference scorer."""
    import numpy as np

    w = float(np.float32(weight))  # boost is float in the reference
    d = geo_distance_meters(lat_col, lon_col, lat, lon)
    return (F.lit(w) * (F.lit(float(pivot_m)) / (F.lit(float(pivot_m)) + d))).cast("float")
