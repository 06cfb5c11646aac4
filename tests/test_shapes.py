"""Shape indexing (LatLonShape analog) — tessellator properties, the
Rectangle2D predicate tree vs an independent exact-integer geometric oracle,
and end-to-end box/polygon/line queries."""

import math
import random

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.shapes import (
    _intersects_one_box,
    _signed_area2,
    encode_lat,
    encode_lat_ceil,
    encode_lon,
    line_triangles,
    point_triangles,
    shape_box_query,
    shape_line_query,
    shape_polygon_query,
    shape_triangles,
    tessellate,
    triangle_within_box,
)


# ---------------------------------------------------------------------------
# independent exact-integer oracle (geometric first principles, not the
# reference's decomposition): point-in-box, point-in-triangle with boundary,
# segment intersection with touching + collinear overlap
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy):
    v = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    return (v > 0) - (v < 0)


def _on_segment(px, py, ax, ay, bx, by):
    return (
        _orient(ax, ay, bx, by, px, py) == 0
        and min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
    )


def _segs_intersect(a, b, c, d):
    d1 = _orient(*c, *d, *a)
    d2 = _orient(*c, *d, *b)
    d3 = _orient(*a, *b, *c)
    d4 = _orient(*a, *b, *d)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    return (
        (d1 == 0 and _on_segment(*a, *c, *d))
        or (d2 == 0 and _on_segment(*b, *c, *d))
        or (d3 == 0 and _on_segment(*c, *a, *b))
        or (d4 == 0 and _on_segment(*d, *a, *b))
    )


def _pt_in_tri(px, py, ax, ay, bx, by, cx, cy):
    o1 = _orient(ax, ay, bx, by, px, py)
    o2 = _orient(bx, by, cx, cy, px, py)
    o3 = _orient(cx, cy, ax, ay, px, py)
    return (o1 >= 0 and o2 >= 0 and o3 >= 0) or (o1 <= 0 and o2 <= 0 and o3 <= 0)


def brute_tri_box_intersects(tri, min_x, max_x, min_y, max_y):
    ax, ay, bx, by, cx, cy = tri
    verts = [(ax, ay), (bx, by), (cx, cy)]
    if any(min_x <= x <= max_x and min_y <= y <= max_y for x, y in verts):
        return True
    # degenerate point triangle: only the vertex test applies
    if len(set(verts)) == 1:
        return False
    corners = [(min_x, min_y), (max_x, min_y), (max_x, max_y), (min_x, max_y)]
    if len(set(verts)) == 3 and _orient(ax, ay, bx, by, cx, cy) != 0:
        if any(_pt_in_tri(x, y, *tri) for x, y in corners):
            return True
    box_edges = [
        (corners[0], corners[1]),
        (corners[1], corners[2]),
        (corners[2], corners[3]),
        (corners[3], corners[0]),
    ]
    tri_edges = [(verts[0], verts[1]), (verts[1], verts[2]), (verts[2], verts[0])]
    for e1, e2 in tri_edges:
        if e1 == e2:
            continue
        for b1, b2 in box_edges:
            if _segs_intersect(e1, e2, b1, b2):
                return True
    return False


def _area2(t):
    return abs((t[2] - t[0]) * (t[5] - t[1]) - (t[4] - t[0]) * (t[3] - t[1]))


# ---------------------------------------------------------------------------
# tessellator
# ---------------------------------------------------------------------------


def test_tessellate_concave_area_and_count():
    lats = [0.0, 4.0, 2.0, 4.0, 0.0]
    lons = [0.0, 0.0, 2.0, 4.0, 4.0]
    tris = tessellate(lats, lons)
    assert len(tris) == 3  # n - 2
    ring = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    assert sum(_area2(t) for t in tris) == abs(_signed_area2(ring))


def test_tessellate_star_polygons_exact_area():
    rnd = random.Random(11)
    for _ in range(60):
        n = rnd.randint(3, 14)
        rad = [rnd.uniform(0.5, 40.0) for _ in range(n)]
        lats = [r * math.sin(2 * math.pi * i / n) for i, r in enumerate(rad)]
        lons = [r * math.cos(2 * math.pi * i / n) for i, r in enumerate(rad)]
        tris = tessellate(lats, lons)
        ring = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
        assert sum(_area2(t) for t in tris) == abs(_signed_area2(ring))
        assert all(_area2(t) > 0 for t in tris)


def test_tessellate_hole_subtracts_area_and_coverage():
    lats = [0.0, 10.0, 10.0, 0.0]
    lons = [0.0, 0.0, 10.0, 10.0]
    hole = ([3.0, 6.0, 6.0, 3.0], [3.0, 3.0, 6.0, 6.0])
    tris = tessellate(lats, lons, holes=[hole])
    outer = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    hring = [(encode_lon(x), encode_lat(y)) for y, x in zip(*hole)]
    assert sum(_area2(t) for t in tris) == abs(_signed_area2(outer)) - abs(
        _signed_area2(hring)
    )
    # a point inside the hole is covered by no triangle; a point in the
    # annulus is covered by at least one
    in_hole = (encode_lon(4.5), encode_lat(4.5))
    in_ring = (encode_lon(1.0), encode_lat(1.0))
    assert not any(_pt_in_tri(*in_hole, *t) for t in tris)
    assert any(_pt_in_tri(*in_ring, *t) for t in tris)


def test_tessellate_interior_coverage_sampled():
    lats = [0.0, 4.0, 2.0, 4.0, 0.0]
    lons = [0.0, 0.0, 2.0, 4.0, 4.0]
    tris = tessellate(lats, lons)
    rnd = random.Random(3)
    ring = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]

    def in_poly(px, py):
        # exact integer crossing count
        n = len(ring)
        cnt = 0
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                # px < x1 + (x2-x1)(py-y1)/(y2-y1), exact via cross-mult
                lhs = (px - x1) * (y2 - y1)
                rhs = (x2 - x1) * (py - y1)
                if (y2 - y1 > 0 and lhs < rhs) or (y2 - y1 < 0 and lhs > rhs):
                    cnt += 1
        return cnt % 2 == 1

    for _ in range(300):
        px = rnd.randint(min(p[0] for p in ring), max(p[0] for p in ring))
        py = rnd.randint(min(p[1] for p in ring), max(p[1] for p in ring))
        covered = any(_pt_in_tri(px, py, *t) for t in tris)
        if in_poly(px, py):
            assert covered, (px, py)
        # boundary points may differ either way; strict exterior must not
        elif not covered:
            pass


# ---------------------------------------------------------------------------
# Catalyst predicate tree vs the independent oracle (pure integer grid —
# coordinates small enough that the double orient math is exact)
# ---------------------------------------------------------------------------


def _tri_df(spark, tris):
    rows = []
    for i, t in enumerate(tris):
        ax, ay, bx, by, cx, cy = t
        rows.append(
            (
                i,
                ax,
                ay,
                bx,
                by,
                cx,
                cy,
                min(ax, bx, cx),
                max(ax, bx, cx),
                min(ay, by, cy),
                max(ay, by, cy),
            )
        )
    return spark.createDataFrame(
        rows,
        "shape_id long, ax long, ay long, bx long, by long, cx long, cy long, "
        "tmin_x long, tmax_x long, tmin_y long, tmax_y long",
    )


def test_intersects_predicate_matches_exact_oracle(spark):
    rnd = random.Random(17)
    tris = []
    # general, flat (line), and point triangles on a small grid
    for _ in range(120):
        ax, ay, bx, by, cx, cy = [rnd.randint(0, 60) for _ in range(6)]
        tris.append((ax, ay, bx, by, cx, cy))
    for _ in range(40):
        ax, ay, bx, by = [rnd.randint(0, 60) for _ in range(4)]
        tris.append((ax, ay, bx, by, ax, ay))  # flat
    for _ in range(20):
        ax, ay = [rnd.randint(0, 60) for _ in range(2)]
        tris.append((ax, ay, ax, ay, ax, ay))  # point
    df = _tri_df(spark, tris)
    boxes = [(10, 30, 10, 30), (0, 5, 0, 5), (25, 60, 0, 20), (31, 33, 31, 33)]
    for (min_x, max_x, min_y, max_y) in boxes:
        got = {
            r.shape_id
            for r in df.filter(_intersects_one_box(min_x, max_x, min_y, max_y)).collect()
        }
        want = {
            i
            for i, t in enumerate(tris)
            if brute_tri_box_intersects(t, min_x, max_x, min_y, max_y)
        }
        assert got == want, (min_x, max_x, min_y, max_y, got ^ want)


def test_relations_partition_consistently(spark):
    """WITHIN ⊆ INTERSECTS and DISJOINT = complement of INTERSECTS, per
    shape, on tessellated random polygons."""
    rnd = random.Random(23)
    shapes = []
    for sid in range(25):
        n = rnd.randint(3, 9)
        clat = rnd.uniform(-20, 20)
        clon = rnd.uniform(-20, 20)
        rad = [rnd.uniform(0.5, 6.0) for _ in range(n)]
        lats = [clat + r * math.sin(2 * math.pi * i / n) for i, r in enumerate(rad)]
        lons = [clon + r * math.cos(2 * math.pi * i / n) for i, r in enumerate(rad)]
        shapes.append((sid, lats, lons))
    df = spark.createDataFrame(
        shapes, "shape_id long, lats array<double>, lons array<double>"
    )
    tris = shape_triangles(df, ["shape_id"]).cache()
    box = (-8.0, 8.0, -8.0, 8.0)
    inter = {r.shape_id for r in shape_box_query(tris, ["shape_id"], *box).collect()}
    within = {
        r.shape_id
        for r in shape_box_query(tris, ["shape_id"], *box, relation="WITHIN").collect()
    }
    disjoint = {
        r.shape_id
        for r in shape_box_query(tris, ["shape_id"], *box, relation="DISJOINT").collect()
    }
    all_ids = set(range(25))
    assert within <= inter
    assert disjoint == all_ids - inter
    # shapes whose every vertex is strictly inside the box must be WITHIN
    for sid, lats, lons in shapes:
        if all(-8 < la < 8 for la in lats) and all(-8 < lo < 8 for lo in lons):
            assert sid in within
    tris.unpersist()


def test_box_query_end_to_end_vs_geometry(spark):
    """Axis-aligned rectangles: intersection is interval overlap — an
    independent closed form the mesh query must reproduce exactly."""
    rows = []
    rnd = random.Random(5)
    for sid in range(80):
        lat0 = rnd.uniform(-60, 55)
        lon0 = rnd.uniform(-170, 165)
        dlat = rnd.uniform(0.5, 5.0)
        dlon = rnd.uniform(0.5, 5.0)
        rows.append(
            (
                sid,
                [lat0, lat0 + dlat, lat0 + dlat, lat0],
                [lon0, lon0, lon0 + dlon, lon0 + dlon],
                lat0,
                lat0 + dlat,
                lon0,
                lon0 + dlon,
            )
        )
    df = spark.createDataFrame(
        rows,
        "shape_id long, lats array<double>, lons array<double>, "
        "lat0 double, lat1 double, lon0 double, lon1 double",
    )
    tris = shape_triangles(df, ["shape_id"])
    box = (-10.0, 20.0, -30.0, 40.0)
    got = {r.shape_id for r in shape_box_query(tris, ["shape_id"], *box).collect()}
    want = {
        sid
        for sid, lats, lons, lat0, lat1, lon0, lon1 in rows
        if lat1 >= box[0] and lat0 <= box[1] and lon1 >= box[2] and lon0 <= box[3]
    }
    assert got == want


def test_polygon_query_diamonds_l1_oracle(spark):
    """Diamonds (weighted-L1 balls) against a diamond query polygon with the
    same weights: intersects ⇔ weighted-L1 center distance ≤ r1 + r2."""
    rows = []
    rnd = random.Random(9)
    for sid in range(60):
        clat = rnd.uniform(-40, 40)
        clon = rnd.uniform(-80, 80)
        r = rnd.uniform(0.5, 4.0)
        rows.append(
            (
                sid,
                [clat + r, clat, clat - r, clat],
                [clon, clon + 2 * r, clon, clon - 2 * r],
                clat,
                clon,
                r,
            )
        )
    df = spark.createDataFrame(
        rows,
        "shape_id long, lats array<double>, lons array<double>, "
        "clat double, clon double, r double",
    )
    tris = shape_triangles(df, ["shape_id"])
    qlat, qlon, qr = 3.123, -7.456, 9.0
    q_lats = [qlat + qr, qlat, qlat - qr, qlat]
    q_lons = [qlon, qlon + 2 * qr, qlon, qlon - 2 * qr]
    got = {
        r_.shape_id
        for r_ in shape_polygon_query(tris, ["shape_id"], q_lats, q_lons).collect()
    }
    want = set()
    for sid, lats, lons, clat, clon, r in rows:
        d = abs(clat - qlat) + abs(clon - qlon) / 2.0
        margin = d - (r + qr)
        if abs(margin) < 1e-6:
            continue  # skip knife-edge cases (quantization may flip them)
        if margin < 0:
            want.add(sid)
            assert sid in got, sid
        else:
            assert sid not in got, sid
    assert want <= got


def test_line_fields_and_line_query(spark):
    # indexed lines: vertical segments, box query = interval overlap
    rows = []
    rnd = random.Random(13)
    for sid in range(50):
        lat0 = rnd.uniform(-50, 40)
        lon = rnd.uniform(-100, 100)
        length = rnd.uniform(1.0, 10.0)
        rows.append((sid, [lat0, lat0 + length], [lon, lon], lat0, lat0 + length, lon))
    df = spark.createDataFrame(
        rows,
        "shape_id long, lats array<double>, lons array<double>, "
        "lat0 double, lat1 double, lon double",
    )
    tris = line_triangles(df, ["shape_id"])
    assert tris.filter((F.col("ax") != F.col("cx")) | (F.col("ay") != F.col("cy"))).count() == 0
    box = (-10.0, 15.0, -40.0, 50.0)
    got = {r.shape_id for r in shape_box_query(tris, ["shape_id"], *box).collect()}
    want = {
        sid
        for sid, lats, lons, lat0, lat1, lon in rows
        if lat1 >= box[0] and lat0 <= box[1] and box[2] <= lon <= box[3]
    }
    assert got == want

    # query-side line against diamond shapes: horizontal segment oracle
    drows = []
    for sid in range(40):
        clat = rnd.uniform(-30, 30)
        clon = rnd.uniform(-60, 60)
        r = rnd.uniform(0.5, 3.0)
        drows.append(
            (
                sid,
                [clat + r, clat, clat - r, clat],
                [clon, clon + 2 * r, clon, clon - 2 * r],
                clat,
                clon,
                r,
            )
        )
    ddf = spark.createDataFrame(
        drows,
        "shape_id long, lats array<double>, lons array<double>, "
        "clat double, clon double, r double",
    )
    dtris = shape_triangles(ddf, ["shape_id"])
    qlat, qlon0, qlon1 = 1.234, -20.0, 25.0
    got2 = {
        r_.shape_id
        for r_ in shape_line_query(dtris, ["shape_id"], [qlat, qlat], [qlon0, qlon1]).collect()
    }
    for sid, lats, lons, clat, clon, r in drows:
        dlon = max(0.0, max(qlon0 - clon, clon - qlon1))
        d = abs(clat - qlat) + dlon / 2.0
        if abs(d - r) < 1e-6:
            continue
        assert (sid in got2) == (d < r), (sid, d, r)


def test_point_triangles_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 6.0), (2, -5.0, -6.0)], "shape_id long, lat double, lon double"
    )
    tris = point_triangles(df, ["shape_id"], "lat", "lon")
    got = {r.shape_id for r in shape_box_query(tris, ["shape_id"], 0.0, 10.0, 0.0, 10.0).collect()}
    assert got == {1}


def test_encode_ceil_floor_box_semantics():
    # a box thinner than one quantum still matches points exactly on it
    assert encode_lat_ceil(10.0) >= encode_lat(10.0)
    assert encode_lat(90.0) == encode_lat(math.nextafter(90.0, 0.0))


def test_shape_query_plan_has_pushdown_prefilter(spark):
    """The INTERSECTS pre-filter must reach the parquet scan as pushed
    filters on tmin/tmax — the BKD-pruning analog."""
    import tempfile, os

    rows = [(1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])]
    df = spark.createDataFrame(rows, "shape_id long, lats array<double>, lons array<double>")
    tris = shape_triangles(df, ["shape_id"])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tris")
        from lucene_solr_spark.operators.shapes import write_shape_index

        write_shape_index(tris, path, n_partitions=2)
        stored = spark.read.parquet(path)
        q = shape_box_query(stored, ["shape_id"], 0.2, 0.8, 0.2, 0.8)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "tmax_x" in plan and "tmin_y" in plan
        assert q.count() == 1


def test_tessellate_concave_hole_bridge():
    """A U-shaped hole whose rightmost vertex's line of sight is blocked by
    its own boundary: the bridge must not cut through the hole interior."""
    lats = [0.0, 20.0, 20.0, 0.0]
    lons = [0.0, 0.0, 20.0, 20.0]
    h_lats = [4.0, 12.0, 12.0, 6.0, 6.0, 12.0, 12.0, 4.0]
    h_lons = [4.0, 4.0, 6.0, 6.0, 10.0, 10.0, 12.0, 12.0]
    tris = tessellate(lats, lons, holes=[(h_lats, h_lons)])
    assert len(tris) == len(set(tris))  # no duplicate triangles
    outer = [(encode_lon(x), encode_lat(y)) for y, x in zip(lats, lons)]
    hring = [(encode_lon(x), encode_lat(y)) for y, x in zip(h_lats, h_lons)]
    assert sum(_area2(t) for t in tris) == abs(_signed_area2(outer)) - abs(
        _signed_area2(hring)
    )
    cases = [
        (8.0, 5.0, False),  # hole arm
        (5.0, 8.0, False),  # hole bottom bar
        (8.0, 11.0, False),  # hole arm
        (8.0, 8.0, True),  # the U's cavity is solid polygon
        (2.0, 2.0, True),
    ]
    for la, lo, expect in cases:
        p = (encode_lon(lo), encode_lat(la))
        assert any(_pt_in_tri(*p, *t) for t in tris) == expect, (la, lo)


def test_polygon_query_collinear_disjoint_edges(spark):
    """A shape edge collinear with a query-polygon edge but disjoint in
    extent must NOT count as crossing (all-zero orient products)."""
    # shape: thin triangle with a vertical edge at lon=10, lat in [0, 1]
    rows = [(1, [0.0, 1.0, 0.5], [10.0, 10.0, 11.0])]
    df = spark.createDataFrame(rows, "shape_id long, lats array<double>, lons array<double>")
    tris = shape_triangles(df, ["shape_id"])
    # query polygon has a vertical edge on the same lon=10 line, lat [5, 9]
    got = shape_polygon_query(
        tris, ["shape_id"], [5.0, 9.0, 9.0, 5.0], [10.0, 10.0, 14.0, 14.0]
    ).collect()
    assert got == []
    # and a triangle genuinely inside the polygon stays WITHIN
    rows2 = [(2, [6.0, 7.0, 6.5], [11.0, 11.0, 12.0])]
    df2 = spark.createDataFrame(rows2, "shape_id long, lats array<double>, lons array<double>")
    tris2 = shape_triangles(df2, ["shape_id"])
    got2 = shape_polygon_query(
        tris2, ["shape_id"], [5.0, 9.0, 9.0, 5.0], [10.0, 10.0, 14.0, 14.0],
        relation="WITHIN",
    ).collect()
    assert [r.shape_id for r in got2] == [2]


def test_degenerate_line_shape_vs_far_collinear_query(spark):
    """A line shape (flat triangles) must not match a query polygon whose
    vertex is collinear with the segment's line but beyond its extent."""
    rows = [(1, [0.0, 10.0], [0.0, 10.0])]  # segment along lat=lon diag
    df = spark.createDataFrame(rows, "shape_id long, lats array<double>, lons array<double>")
    tris = line_triangles(df, ["shape_id"]).persist()
    # polygon around (50, 50): its vertex (50, 50) is on the y=x line but
    # far past the segment; bboxes of polygon and segment are disjoint in
    # fact, so make them overlap via a long skinny polygon reaching back
    q_lats = [50.0, 50.0, 5.0, 5.0]
    q_lons = [49.0, 52.0, 52.0, 49.0]
    got = shape_polygon_query(tris, ["shape_id"], q_lats, q_lons).collect()
    assert got == []
    # line query against the same shape: far collinear query segment
    got2 = shape_line_query(tris, ["shape_id"], [20.0, 30.0], [20.0, 30.0]).collect()
    assert got2 == []
    tris.unpersist()
