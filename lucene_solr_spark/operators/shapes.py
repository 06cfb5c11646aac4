"""Shape indexing + shape queries — the ``LatLonShape`` analog.

Reference semantics (``lucene/sandbox``):

- ``document/LatLonShape.java:71-96``: polygons are decomposed into a
  triangular mesh (``geo/Tessellator.java``, an earcut port that operates on
  the *encoded* 32-bit coordinates); each triangle is indexed as one
  multi-value point; lines become "flat" triangles ``(a, b, a)``; points
  become degenerate triangles ``(a, a, a)``.
- ``geo/GeoEncodingUtils.java:60-113``: vertices quantize with
  ``floor(deg / DECODE)`` (and query-box *minimums* with ``ceil``) before any
  geometry runs — all tests below happen in encoded integer space.
- ``geo/Rectangle2D.java:111-260``: a triangle INTERSECTS a box iff any
  vertex is inside, or (bboxes overlap and (any box corner is inside the
  triangle, or any triangle edge crosses any box edge)); WITHIN iff all three
  vertices are inside; orientation tests use plain double arithmetic
  (``geo/GeoUtils.java:185-195`` — deliberately not exact, and we mirror that
  bit-for-bit so decisions match the reference).
- ``document/LatLonShapeBoundingBoxQuery.java:47-63``: WITHIN relation
  requires *every* triangle of the shape contained; INTERSECTS requires any;
  DISJOINT requires none.

Spark-first plan shape
----------------------
Tessellation is an *index-time* transformation: one ``mapInPandas`` pass per
shape partition (the per-shape earcut loop is the same per-document work the
reference does in ``createIndexableFields``), emitting a **triangle table**
``(shape keys, ay ax by bx cy cx, tmin_y tmax_y tmin_x tmax_x)``.  The table
is range-partitioned + sorted on ``(tmin_y, tmin_x)`` so parquet row-group
min/max statistics prune box queries — the role the BKD tree plays in the
reference.  Query time is pure Catalyst: a pushdown-friendly bbox pre-filter
followed by the exact Rectangle2D boolean tree inside whole-stage codegen —
no UDFs, no shuffle except the final per-shape ``distinct``/``bool_and``.

At 100 TB: the triangle table is larger than the shape table by the mesh
fan-out (n-2 triangles per n-gon) but carries only 10 small numeric columns;
queries scan only row groups whose (tmin/tmax) ranges touch the query box,
match triangles with codegen comparisons, and shuffle only the *matching*
shape ids (one exchange).  WITHIN/DISJOINT aggregate per shape id — also one
id-keyed exchange, never the corpus.

Any valid triangulation yields identical query answers (the tests are exact
on the shared encoded vertices and the mesh covers the polygon exactly), so
this module does not replicate the reference's ear-clipping *order* — only
its coordinate quantization and its relation semantics.

Reference-parity note: the box path keeps Rectangle2D's exact decision
procedure INCLUDING its degenerate-triangle quirk (``pointInTriangle`` has
no extent check, so a box corner collinear with a flat line-triangle whose
bbox overlaps the box reports INTERSECTS — Rectangle2D.java:138-147 does the
same).  The polygon/line query paths, which have no reference-exact
counterpart at this granularity, bound every point-in-triangle and
edge-crossing test by the participating bboxes instead, so collinear-but-
disjoint geometry never false-positives there.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.geo import LAT_DECODE, LON_DECODE

__all__ = [
    "encode_lat",
    "encode_lon",
    "encode_lat_ceil",
    "encode_lon_ceil",
    "tessellate",
    "shape_triangles",
    "line_triangles",
    "point_triangles",
    "write_shape_index",
    "triangle_intersects_box",
    "triangle_within_box",
    "shape_box_query",
    "shape_polygon_query",
    "shape_line_query",
]

_MIN_LON_ENC = -2147483648
_MAX_LON_ENC = 2147483647


# ---------------------------------------------------------------------------
# GeoEncodingUtils (floor for vertices, ceil for query minimums)
# ---------------------------------------------------------------------------


def encode_lat(lat: float) -> int:
    """``GeoEncodingUtils.encodeLatitude`` (floor; 90.0 nudged down)."""
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.floor(lat / LAT_DECODE))


def encode_lon(lon: float) -> int:
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.floor(lon / LON_DECODE))


def encode_lat_ceil(lat: float) -> int:
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.ceil(lat / LAT_DECODE))


def encode_lon_ceil(lon: float) -> int:
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.ceil(lon / LON_DECODE))


# ---------------------------------------------------------------------------
# Tessellator: earcut on encoded integer coordinates
# ---------------------------------------------------------------------------


def _signed_area2(pts: list) -> int:
    """Twice the signed shoelace area, exact on python ints."""
    s = 0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _orient_int(ax, ay, bx, by, cx, cy) -> int:
    """Exact integer orientation (used only inside the tessellator, where
    exactness keeps ear tests robust; the *query* predicates use the
    reference's double orient so decisions match it)."""
    v = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    return (v > 0) - (v < 0)


def _point_in_tri_int(px, py, ax, ay, bx, by, cx, cy) -> bool:
    a = _orient_int(px, py, ax, ay, bx, by)
    b = _orient_int(px, py, bx, by, cx, cy)
    if a == 0 or b == 0 or (a < 0) == (b < 0):
        c = _orient_int(px, py, cx, cy, ax, ay)
        return c == 0 or ((c < 0) == (b < 0 or a < 0))
    return False


def _dedupe_ring(pts: list) -> list:
    """Drop consecutive duplicates and collinear midpoints (the reference's
    ``filterPoints``)."""
    out = list(pts)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    changed = True
    while changed and len(out) > 3:
        changed = False
        i = 0
        while i < len(out) and len(out) > 3:
            p0 = out[i - 1]
            p1 = out[i]
            p2 = out[(i + 1) % len(out)]
            if p1 == p0 or _orient_int(*p0, *p1, *p2) == 0:
                out.pop(i)
                changed = True
            else:
                i += 1
    return out


def _is_ear(ring: list, i: int) -> bool:
    n = len(ring)
    a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
    if _orient_int(*a, *b, *c) <= 0:  # reflex or degenerate corner
        return False
    for j in range(n):
        p = ring[j]
        if p in (a, b, c):
            continue
        # only reflex vertices can invalidate an ear, but testing all is
        # O(n) anyway and shapes are small
        if _point_in_tri_int(p[0], p[1], *a, *b, *c):
            return False
    return True


def _eliminate_hole(outer: list, hole: list) -> list:
    """Splice a hole into the outer ring with a bridge from the hole's
    rightmost vertex to a visible outer vertex (the standard earcut
    hole-elimination the reference also performs)."""
    hi = max(range(len(hole)), key=lambda k: (hole[k][0], hole[k][1]))
    hx, hy = hole[hi]
    # candidate outer vertices at or right of the hole's rightmost vertex
    # first (a leftward bridge from the rightmost hole vertex necessarily
    # re-enters the hole), nearest first; visible = the bridge crosses no
    # outer-ring edge AND no edge of the hole itself (a concave hole's own
    # boundary can block its rightmost vertex's line of sight)
    order = sorted(
        range(len(outer)),
        key=lambda k: (
            outer[k][0] < hx,
            (outer[k][0] - hx) ** 2 + (outer[k][1] - hy) ** 2,
        ),
    )
    nh = len(hole)
    for oi in order:
        ox, oy = outer[oi]
        visible = True
        n = len(outer)
        for j in range(n):
            p1, p2 = outer[j], outer[(j + 1) % n]
            if oi in (j, (j + 1) % n):
                continue
            if _segments_cross(hx, hy, ox, oy, *p1, *p2):
                visible = False
                break
        if visible:
            for j in range(nh):
                if j == hi or (j + 1) % nh == hi:
                    continue
                if _segments_cross(hx, hy, ox, oy, *hole[j], *hole[(j + 1) % nh]):
                    visible = False
                    break
        if visible:
            rotated_hole = hole[hi:] + hole[:hi]
            return (
                outer[: oi + 1]
                + rotated_hole
                + [rotated_hole[0], outer[oi]]
                + outer[oi + 1 :]
            )
    # fallback: nearest vertex even if the crossing test was inconclusive
    oi = order[0]
    rotated_hole = hole[hi:] + hole[:hi]
    return outer[: oi + 1] + rotated_hole + [rotated_hole[0], outer[oi]] + outer[oi + 1 :]


def _segments_cross(a1x, a1y, b1x, b1y, a2x, a2y, b2x, b2y) -> bool:
    """Proper crossing (shared endpoints excluded), exact ints."""
    if (a1x, a1y) in ((a2x, a2y), (b2x, b2y)) or (b1x, b1y) in ((a2x, a2y), (b2x, b2y)):
        return False
    d1 = _orient_int(a2x, a2y, b2x, b2y, a1x, a1y)
    d2 = _orient_int(a2x, a2y, b2x, b2y, b1x, b1y)
    d3 = _orient_int(a1x, a1y, b1x, b1y, a2x, a2y)
    d4 = _orient_int(a1x, a1y, b1x, b1y, b2x, b2y)
    return d1 * d2 <= 0 and d3 * d4 <= 0 and not (d1 == 0 and d2 == 0)


def tessellate(
    lats: Sequence[float],
    lons: Sequence[float],
    holes: Iterable[tuple] = (),
) -> list:
    """Tessellate one simple polygon (optionally with holes) into triangles
    on the **encoded** integer grid, like ``Tessellator.tessellate``
    (``geo/Tessellator.java:93-133`` encodes every vertex before linking).

    Returns ``[(ax, ay, bx, by, cx, cy), ...]`` with x = encoded longitude,
    y = encoded latitude, each triangle counter-clockwise.
    """
    ring = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    ring = _dedupe_ring(ring)
    if _signed_area2(ring) < 0:  # outer ring must wind CCW
        ring.reverse()
    for h_lats, h_lons in holes:
        h = [(encode_lon(x), encode_lat(y)) for y, x in zip(h_lats, h_lons)]
        h = _dedupe_ring(h)
        if _signed_area2(h) > 0:  # holes wind CW before splicing
            h.reverse()
        ring = _eliminate_hole(ring, h)
    tris = []
    guard = 0
    while len(ring) > 3:
        n = len(ring)
        clipped = False
        for i in range(n):
            if _is_ear(ring, i):
                a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
                tris.append((a[0], a[1], b[0], b[1], c[0], c[1]))
                ring.pop(i)
                clipped = True
                break
        if not clipped:
            # degenerate remainder (reference splitEarcut fallback):
            # fan from vertex 0, skipping zero-area slivers
            for i in range(1, len(ring) - 1):
                a, b, c = ring[0], ring[i], ring[i + 1]
                if _orient_int(*a, *b, *c) != 0:
                    tris.append((a[0], a[1], b[0], b[1], c[0], c[1]))
            ring = []  # fan covered the remainder; nothing left to emit
            break
        guard += 1
        if guard > 100000:
            raise ValueError("tessellation did not converge")
    if len(ring) == 3 and _orient_int(*ring[0], *ring[1], *ring[2]) != 0:
        a, b, c = ring
        tris.append((a[0], a[1], b[0], b[1], c[0], c[1]))
    return tris


_TRI_COLS = "ax ay bx by cx cy tmin_x tmax_x tmin_y tmax_y".split()


def _tri_schema(df: DataFrame, key_cols: Sequence[str]) -> str:
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    return key_schema + ", " + ", ".join(f"{c} long" for c in _TRI_COLS)


def shape_triangles(
    df: DataFrame,
    key_cols: Sequence[str],
    lats_col: str = "lats",
    lons_col: str = "lons",
    holes_col: str | None = None,
) -> DataFrame:
    """``LatLonShape.createIndexableFields(polygon)`` over a DataFrame of
    polygons (``lats``/``lons`` = ``array<double>`` outer ring, optional
    ``holes`` = ``array<struct<lats,lons>>``): one Arrow pass, one output
    row per mesh triangle, with the triangle bbox materialized for pruning.
    """
    key_cols = list(key_cols)
    cols = key_cols + [lats_col, lons_col] + ([holes_col] if holes_col else [])
    # single-file sources arrive as ONE scan partition; tessellation is
    # per-row Python and every downstream relate predicate inherits the
    # mesh's partitioning through persist — widen to the session's
    # parallelism first (no-op on well-partitioned production tables)
    from ..session import spread_partitions

    src = spread_partitions(df.select(*cols))
    schema = _tri_schema(df, key_cols)

    def gen(batches):
        for pdf in batches:
            out_keys: dict = {k: [] for k in key_cols}
            tri_out: dict = {c: [] for c in _TRI_COLS}
            for row in pdf.itertuples(index=False):
                rec = row._asdict()
                holes = []
                if holes_col and rec.get(holes_col) is not None:
                    holes = [(h["lats"], h["lons"]) for h in rec[holes_col]]
                for t in tessellate(rec[lats_col], rec[lons_col], holes):
                    ax, ay, bx, by, cx, cy = t
                    for k in key_cols:
                        out_keys[k].append(rec[k])
                    tri_out["ax"].append(ax)
                    tri_out["ay"].append(ay)
                    tri_out["bx"].append(bx)
                    tri_out["by"].append(by)
                    tri_out["cx"].append(cx)
                    tri_out["cy"].append(cy)
                    tri_out["tmin_x"].append(min(ax, bx, cx))
                    tri_out["tmax_x"].append(max(ax, bx, cx))
                    tri_out["tmin_y"].append(min(ay, by, cy))
                    tri_out["tmax_y"].append(max(ay, by, cy))
            if out_keys[key_cols[0]]:
                yield pd.DataFrame({**out_keys, **tri_out})

    return src.mapInPandas(gen, schema)


def _enc_lat_col(col: Column) -> Column:
    return F.floor(col / F.lit(LAT_DECODE)).cast("long")


def _enc_lon_col(col: Column) -> Column:
    return F.floor(col / F.lit(LON_DECODE)).cast("long")


def line_triangles(
    df: DataFrame,
    key_cols: Sequence[str],
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """``LatLonShape.createIndexableFields(line)``
    (``LatLonShape.java:83-91``): each polyline segment becomes the flat
    triangle ``(p_i, p_{i+1}, p_i)``.  Pure Catalyst — zip consecutive
    vertices, posexplode, encode.

    Query the result through ``write_shape_index`` + a parquet read (the
    production path), or ``.persist()`` it first when querying inline:
    otherwise filter pushdown inlines this projection into every vertex
    reference of the Rectangle2D predicate tree and the generated method
    can exceed janino's 64 KB limit (whole-stage codegen then falls back
    to interpreted eval).
    """
    key_cols = list(key_cols)
    from ..session import spread_partitions

    df = spread_partitions(df)
    n = F.size(lats_col)
    seg = F.expr(
        f"transform(sequence(0, size({lats_col}) - 2), i -> "
        f"struct({lats_col}[i] as alat, {lons_col}[i] as alon, "
        f"{lats_col}[i+1] as blat, {lons_col}[i+1] as blon))"
    )
    out = (
        df.filter(n >= 2)
        .select(*key_cols, F.explode(seg).alias("s"))
        .select(
            *key_cols,
            _enc_lon_col(F.col("s.alon")).alias("ax"),
            _enc_lat_col(F.col("s.alat")).alias("ay"),
            _enc_lon_col(F.col("s.blon")).alias("bx"),
            _enc_lat_col(F.col("s.blat")).alias("by"),
            _enc_lon_col(F.col("s.alon")).alias("cx"),
            _enc_lat_col(F.col("s.alat")).alias("cy"),
        )
    )
    return out.select(
        *key_cols,
        *[F.col(c) for c in ("ax", "ay", "bx", "by", "cx", "cy")],
        F.least("ax", "bx", "cx").alias("tmin_x"),
        F.greatest("ax", "bx", "cx").alias("tmax_x"),
        F.least("ay", "by", "cy").alias("tmin_y"),
        F.greatest("ay", "by", "cy").alias("tmax_y"),
    )


def point_triangles(
    df: DataFrame,
    key_cols: Sequence[str],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """``LatLonShape.createIndexableFields(lat, lon)``: the degenerate
    triangle ``(p, p, p)``."""
    x = _enc_lon_col(F.col(lon_col))
    y = _enc_lat_col(F.col(lat_col))
    out = df.select(*key_cols, x.alias("ax"), y.alias("ay"))
    return out.select(
        *key_cols,
        "ax",
        "ay",
        F.col("ax").alias("bx"),
        F.col("ay").alias("by"),
        F.col("ax").alias("cx"),
        F.col("ay").alias("cy"),
        F.col("ax").alias("tmin_x"),
        F.col("ax").alias("tmax_x"),
        F.col("ay").alias("tmin_y"),
        F.col("ay").alias("tmax_y"),
    )


def write_shape_index(tris: DataFrame, path: str, n_partitions: int = 32) -> None:
    """Persist the triangle table range-partitioned + sorted on
    ``(tmin_y, tmin_x)`` so every box query prunes parquet row groups via
    min/max stats — the BKD inner-node role."""
    (
        tris.repartitionByRange(n_partitions, "tmin_y", "tmin_x")
        .sortWithinPartitions("tmin_y", "tmin_x")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Rectangle2D / Polygon2D relation predicates as Catalyst column trees
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy) -> Column:
    """``GeoUtils.orient``'s double cross product, same IEEE ops as the
    reference (GeoUtils.java:185-195) — returned RAW, not signum'd: every
    test below only needs sign comparisons, and on encoded-int inputs the
    cross product is integer-valued (|v| >= 1 or v == 0, no subnormals) and
    < 2^128 (no overflow), so products/comparisons of raw values decide
    signs exactly while generating far less code than signum() chains (the
    predicate tree must stay under the JVM's 64 KB per-method codegen
    limit)."""
    ax, ay, bx, by, cx, cy = [
        v.cast("double") if isinstance(v, Column) else F.lit(float(v)) for v in (ax, ay, bx, by, cx, cy)
    ]
    return (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)


def _point_in_triangle(px, py, ax, ay, bx, by, cx, cy) -> Column:
    """``Tessellator.pointInTriangle`` (Tessellator.java:725-733)."""
    a = _orient(px, py, ax, ay, bx, by)
    b = _orient(px, py, bx, by, cx, cy)
    c = _orient(px, py, cx, cy, ax, ay)
    first = (a == 0) | (b == 0) | ((a < 0) == (b < 0))
    second = (c == 0) | ((c < 0) == ((b < 0) | (a < 0)))
    return first & second


def _bbox_contains_point(x, y, min_x, max_x, min_y, max_y) -> Column:
    return (x >= F.lit(min_x)) & (x <= F.lit(max_x)) & (y >= F.lit(min_y)) & (y <= F.lit(max_y))


def _edge_crosses_edge(ax, ay, bx, by, q1x, q1y, q2x, q2y) -> Column:
    """One box-side crossing test from ``Rectangle2D.edgeIntersectsBox``:
    ``orient(edge, s1)·orient(edge, s2) <= 0 && orient(side, e1)·orient(side,
    e2) <= 0`` — raw-value products share the sign of the signum products
    (see `_orient`: each orient is 0 or >= 1 in magnitude and < ~2^67, so
    the product is exactly 0.0 or has the true sign — no underflow to a
    signed zero, no overflow)."""
    return (
        _orient(ax, ay, bx, by, q1x, q1y) * _orient(ax, ay, bx, by, q2x, q2y) <= 0
    ) & (
        _orient(q1x, q1y, q2x, q2y, ax, ay) * _orient(q1x, q1y, q2x, q2y, bx, by) <= 0
    )


def _seg_crosses_literal_edge(ax, ay, bx, by, x1, y1, x2, y2) -> Column:
    """Column-edge vs literal-edge crossing with a bbox-overlap guard: the
    raw ``orient·orient <= 0`` form reports collinear-but-disjoint segments
    (all four orients zero) as crossing, so only run it when the segment
    bounding boxes overlap — collinear segments with overlapping bboxes
    really do touch."""
    bbox_overlap = (
        (F.greatest(ax, bx) >= F.lit(min(x1, x2)))
        & (F.least(ax, bx) <= F.lit(max(x1, x2)))
        & (F.greatest(ay, by) >= F.lit(min(y1, y2)))
        & (F.least(ay, by) <= F.lit(max(y1, y2)))
    )
    return bbox_overlap & _edge_crosses_edge(ax, ay, bx, by, x1, y1, x2, y2)


def _point_in_triangle_bounded(px, py, ax, ay, bx, by, cx, cy) -> Column:
    """`_point_in_triangle` for a *literal* point, additionally bounded by
    the triangle bbox columns: the orient-only form reports any point
    collinear with a degenerate (flat/point) triangle as inside, with no
    extent check — the bbox conjunct restores the extent."""
    return (
        (F.lit(px) >= F.col("tmin_x"))
        & (F.lit(px) <= F.col("tmax_x"))
        & (F.lit(py) >= F.col("tmin_y"))
        & (F.lit(py) <= F.col("tmax_y"))
        & _point_in_triangle(px, py, ax, ay, bx, by, cx, cy)
    )


def _edge_intersects_box(ax, ay, bx, by, min_x, max_x, min_y, max_y) -> Column:
    point_edge = (ax == bx) & (ay == by)
    endpoint_in = _bbox_contains_point(ax, ay, min_x, max_x, min_y, max_y) | _bbox_contains_point(
        bx, by, min_x, max_x, min_y, max_y
    )
    disjoint = (
        (F.greatest(ax, bx) < F.lit(min_x))
        | (F.least(ax, bx) > F.lit(max_x))
        | (F.greatest(ay, by) < F.lit(min_y))
        | (F.least(ay, by) > F.lit(max_y))
    )
    crossings = (
        _edge_crosses_edge(ax, ay, bx, by, min_x, max_y, max_x, max_y)  # top
        | _edge_crosses_edge(ax, ay, bx, by, max_x, max_y, max_x, min_y)  # right
        | _edge_crosses_edge(ax, ay, bx, by, max_x, min_y, min_x, min_y)  # bottom
        | _edge_crosses_edge(ax, ay, bx, by, min_x, min_y, min_x, max_y)  # left
    )
    return F.when(point_edge, endpoint_in).otherwise(
        endpoint_in | (~disjoint & crossings)
    )


def _tri_cols():
    return (F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"), F.col("cx"), F.col("cy"))


def _intersects_one_box(min_x: int, max_x: int, min_y: int, max_y: int) -> Column:
    ax, ay, bx, by, cx, cy = _tri_cols()
    vertex_in = (
        _bbox_contains_point(ax, ay, min_x, max_x, min_y, max_y)
        | _bbox_contains_point(bx, by, min_x, max_x, min_y, max_y)
        | _bbox_contains_point(cx, cy, min_x, max_x, min_y, max_y)
    )
    bbox_disjoint = (
        (F.col("tmax_x") < F.lit(min_x))
        | (F.col("tmin_x") > F.lit(max_x))
        | (F.col("tmin_y") > F.lit(max_y))
        | (F.col("tmax_y") < F.lit(min_y))
    )
    corner_in_tri = (
        _point_in_triangle(min_x, min_y, ax, ay, bx, by, cx, cy)
        | _point_in_triangle(max_x, min_y, ax, ay, bx, by, cx, cy)
        | _point_in_triangle(max_x, max_y, ax, ay, bx, by, cx, cy)
        | _point_in_triangle(min_x, max_y, ax, ay, bx, by, cx, cy)
    )
    edge_hits = (
        _edge_intersects_box(ax, ay, bx, by, min_x, max_x, min_y, max_y)
        | _edge_intersects_box(bx, by, cx, cy, min_x, max_x, min_y, max_y)
        | _edge_intersects_box(cx, cy, ax, ay, min_x, max_x, min_y, max_y)
    )
    return vertex_in | (~bbox_disjoint & (corner_in_tri | edge_hits))


def _encode_box(min_lat, max_lat, min_lon, max_lon):
    """Rectangle2D's encode: ceil for minimums, floor for maximums, dateline
    split when min_lon > max_lon (Rectangle2D.java:51-79)."""
    min_y = min(encode_lat_ceil(min_lat), encode_lat(max_lat))
    max_y = encode_lat(max_lat)
    min_x = encode_lon_ceil(min_lon)
    max_x = encode_lon(max_lon)
    if min_lon > max_lon:  # dateline crossing: east + west boxes
        return [(min_x, _MAX_LON_ENC, min_y, max_y), (_MIN_LON_ENC, max_x, min_y, max_y)]
    if min_x > max_x:
        min_x = max_x
    return [(min_x, max_x, min_y, max_y)]


def triangle_intersects_box(min_lat, max_lat, min_lon, max_lon) -> Column:
    """``Rectangle2D.intersectsTriangle`` over the triangle-table columns."""
    boxes = _encode_box(min_lat, max_lat, min_lon, max_lon)
    pred = _intersects_one_box(*boxes[0])
    for b in boxes[1:]:
        pred = pred | _intersects_one_box(*b)
    return pred


def triangle_within_box(min_lat, max_lat, min_lon, max_lon) -> Column:
    """``Rectangle2D.containsTriangle``: all three vertices inside."""
    ax, ay, bx, by, cx, cy = _tri_cols()
    boxes = _encode_box(min_lat, max_lat, min_lon, max_lon)
    preds = []
    for (min_x, max_x, min_y, max_y) in boxes:
        preds.append(
            _bbox_contains_point(ax, ay, min_x, max_x, min_y, max_y)
            & _bbox_contains_point(bx, by, min_x, max_x, min_y, max_y)
            & _bbox_contains_point(cx, cy, min_x, max_x, min_y, max_y)
        )
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p
    return pred


def _box_prefilter(min_lat, max_lat, min_lon, max_lon) -> Column:
    """Row-group-prunable bbox overlap test on the materialized tmin/tmax
    columns (plain comparisons → parquet min/max stats)."""
    preds = []
    for (min_x, max_x, min_y, max_y) in _encode_box(min_lat, max_lat, min_lon, max_lon):
        preds.append(
            (F.col("tmax_x") >= F.lit(min_x))
            & (F.col("tmin_x") <= F.lit(max_x))
            & (F.col("tmax_y") >= F.lit(min_y))
            & (F.col("tmin_y") <= F.lit(max_y))
        )
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p
    return pred


def _finalize(tris: DataFrame, key_cols: Sequence[str], per_tri: Column, relation: str) -> DataFrame:
    """Fold the per-triangle relation into the per-shape answer
    (``LatLonShapeQuery``: INTERSECTS = any, WITHIN = all, DISJOINT = none).
    """
    keys = [F.col(k) for k in key_cols]
    if relation == "INTERSECTS":
        return tris.filter(per_tri).select(*keys).distinct()
    if relation == "WITHIN":
        return (
            tris.groupBy(*keys)
            .agg(F.min(per_tri.cast("int")).alias("_all"))
            .filter(F.col("_all") == 1)
            .select(*keys)
        )
    if relation == "DISJOINT":
        hit = tris.filter(per_tri).select(*keys).distinct()
        return tris.select(*keys).distinct().join(hit, list(key_cols), "left_anti")
    raise ValueError(f"unknown relation {relation!r}")


def shape_box_query(
    tris: DataFrame,
    key_cols: Sequence[str],
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    relation: str = "INTERSECTS",
) -> DataFrame:
    """``LatLonShape.newBoxQuery`` — shape ids whose mesh INTERSECTS /
    is WITHIN / is DISJOINT from the box.  INTERSECTS applies the prunable
    bbox pre-filter before the exact test; WITHIN/DISJOINT must see every
    triangle of every shape, so they fold over the full table (one id-keyed
    exchange)."""
    if relation == "INTERSECTS":
        pre = tris.filter(_box_prefilter(min_lat, max_lat, min_lon, max_lon))
        return _finalize(pre, key_cols, triangle_intersects_box(min_lat, max_lat, min_lon, max_lon), relation)
    if relation == "WITHIN":
        per = triangle_within_box(min_lat, max_lat, min_lon, max_lon)
    else:
        per = triangle_intersects_box(min_lat, max_lat, min_lon, max_lon)
    return _finalize(tris, key_cols, per, relation)


def _encode_ring(lats: Sequence[float], lons: Sequence[float]) -> list:
    ring = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring.pop()
    return ring


def _ring_contains_col(px: Column, py: Column, ring: list) -> Column:
    """pnpoly crossing count with literal ring vertices over point columns
    (Polygon2D's contains, on encoded ints in double arithmetic)."""
    pred = F.lit(False)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cond = ((F.lit(float(y1)) > py.cast("double")) != (F.lit(float(y2)) > py.cast("double"))) & (
            px.cast("double")
            < (F.lit(float(x2 - x1))) * (py.cast("double") - F.lit(float(y1))) / F.lit(float(y2 - y1) if y2 != y1 else 1.0)
            + F.lit(float(x1))
        )
        pred = F.when(cond, ~pred).otherwise(pred)
    return pred


def shape_polygon_query(
    tris: DataFrame,
    key_cols: Sequence[str],
    lats: Sequence[float],
    lons: Sequence[float],
    relation: str = "INTERSECTS",
) -> DataFrame:
    """``LatLonShape.newPolygonQuery`` (Polygon2D.relateTriangle): a triangle
    relates to the query polygon iff any triangle vertex lies inside it, any
    polygon vertex lies inside the triangle, or any edge pair crosses."""
    ring = _encode_ring(lats, lons)
    ax, ay, bx, by, cx, cy = _tri_cols()
    vertex_in_poly = (
        _ring_contains_col(ax, ay, ring)
        | _ring_contains_col(bx, by, ring)
        | _ring_contains_col(cx, cy, ring)
    )
    poly_vertex_in_tri = F.lit(False)
    for (px, py) in ring:
        poly_vertex_in_tri = poly_vertex_in_tri | _point_in_triangle_bounded(
            px, py, ax, ay, bx, by, cx, cy
        )
    edge_cross = F.lit(False)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        for (e1x, e1y, e2x, e2y) in ((ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay)):
            edge_cross = edge_cross | (
                ~((e1x == e2x) & (e1y == e2y))
                & _seg_crosses_literal_edge(e1x, e1y, e2x, e2y, x1, y1, x2, y2)
            )
    intersects = vertex_in_poly | poly_vertex_in_tri | edge_cross
    if relation == "WITHIN":
        within = (
            _ring_contains_col(ax, ay, ring)
            & _ring_contains_col(bx, by, ring)
            & _ring_contains_col(cx, cy, ring)
            & ~edge_cross
        )
        return _finalize(tris, key_cols, within, "WITHIN")
    # prunable pre-filter from the polygon's bbox for INTERSECTS
    if relation == "INTERSECTS":
        min_x = min(p[0] for p in ring)
        max_x = max(p[0] for p in ring)
        min_y = min(p[1] for p in ring)
        max_y = max(p[1] for p in ring)
        pre = tris.filter(
            (F.col("tmax_x") >= F.lit(min_x))
            & (F.col("tmin_x") <= F.lit(max_x))
            & (F.col("tmax_y") >= F.lit(min_y))
            & (F.col("tmin_y") <= F.lit(max_y))
        )
        return _finalize(pre, key_cols, intersects, "INTERSECTS")
    return _finalize(tris, key_cols, intersects, relation)


def shape_line_query(
    tris: DataFrame,
    key_cols: Sequence[str],
    lats: Sequence[float],
    lons: Sequence[float],
    relation: str = "INTERSECTS",
) -> DataFrame:
    """``LatLonShape.newLineQuery`` (LatLonShapeLineQuery): shapes whose mesh
    touches any segment of the query polyline — segment endpoint inside the
    triangle, or segment crosses a triangle edge.  WITHIN is not meaningful
    for an area query against a zero-area line and is not supported."""
    if relation == "WITHIN":
        raise ValueError("line queries support INTERSECTS/DISJOINT only")
    pts = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    ax, ay, bx, by, cx, cy = _tri_cols()
    hit = F.lit(False)
    for i in range(len(pts) - 1):
        x1, y1 = pts[i]
        x2, y2 = pts[i + 1]
        endpoint_in = _point_in_triangle_bounded(
            x1, y1, ax, ay, bx, by, cx, cy
        ) | _point_in_triangle_bounded(x2, y2, ax, ay, bx, by, cx, cy)
        seg_cross = F.lit(False)
        for (e1x, e1y, e2x, e2y) in ((ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay)):
            seg_cross = seg_cross | (
                ~((e1x == e2x) & (e1y == e2y))
                & _seg_crosses_literal_edge(e1x, e1y, e2x, e2y, x1, y1, x2, y2)
            )
        # touch-only contacts (a triangle vertex on the segment with both
        # adjacent edges on one side) and degenerate point/flat triangles:
        # vertex-on-segment orientation + extent test, all three vertices
        on_seg = F.lit(False)
        for (vx, vy) in ((ax, ay), (bx, by), (cx, cy)):
            on_seg = on_seg | (
                (_orient(x1, y1, x2, y2, vx, vy) == 0)
                & (F.least(F.lit(x1), F.lit(x2)) <= vx)
                & (vx <= F.greatest(F.lit(x1), F.lit(x2)))
                & (F.least(F.lit(y1), F.lit(y2)) <= vy)
                & (vy <= F.greatest(F.lit(y1), F.lit(y2)))
            )
        hit = hit | endpoint_in | seg_cross | on_seg
    if relation == "INTERSECTS":
        min_x = min(p[0] for p in pts)
        max_x = max(p[0] for p in pts)
        min_y = min(p[1] for p in pts)
        max_y = max(p[1] for p in pts)
        pre = tris.filter(
            (F.col("tmax_x") >= F.lit(min_x))
            & (F.col("tmin_x") <= F.lit(max_x))
            & (F.col("tmax_y") >= F.lit(min_y))
            & (F.col("tmin_y") <= F.lit(max_y))
        )
        return _finalize(pre, key_cols, hit, "INTERSECTS")
    return _finalize(tris, key_cols, hit, relation)
