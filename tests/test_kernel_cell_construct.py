"""Cell-index and constructive-op kernel tests."""

import numpy as np
import duckdb

from spark_geo.kernel import cell, construct as C, measure as M, predicates as P, wkt
from spark_geo.kernel.geom import Geom


def test_cell_roundtrip_bounds():
    lon = np.array([-180.0, 0.0, 12.5, 179.9])
    lat = np.array([-90.0, 0.0, 51.2, 89.9])
    for res in (0, 3, 8, 15):
        c = cell.cell_of(lon, lat, res)
        xmin, ymin, xmax, ymax = cell.cell_bounds(c)
        assert np.all(xmin <= lon) and np.all(lon <= xmax)
        assert np.all(ymin <= lat) and np.all(lat <= ymax)


def test_cell_nan():
    c = cell.cell_of([np.nan], [0.0], 5)
    assert c[0] == -1


def test_cell_parent_contains_child():
    c = cell.cell_of([12.5], [51.2], 10)
    p = cell.cell_parent(c, 4)
    pxmin, pymin, pxmax, pymax = cell.cell_bounds(p)
    cxmin, cymin, cxmax, cymax = cell.cell_bounds(c)
    assert pxmin <= cxmin and cxmax <= pxmax
    assert pymin <= cymin and cymax <= pymax


def test_cell_sql_expr_matches_kernel():
    # the DuckDB oracle formula must equal the NumPy kernel exactly
    rng = np.random.RandomState(42)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (4, 9, 12):
        ours = cell.cell_of(lon, lat, res)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
        sql = cell.cell_sql_expr("lon", "lat", res)
        theirs = con.execute(f"SELECT {sql} AS c FROM t").df()["c"].to_numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_k_ring():
    c = int(cell.cell_of([0.0], [0.0], 5)[0])
    r1 = cell.k_ring(c, 1)
    assert len(r1) == 9 and c in r1.tolist()
    assert len(cell.ring_shell(c, 1)) == 8
    assert cell.ring_shell(c, 0).tolist() == [c]


def test_k_ring_lon_wrap_lat_clamp():
    res = 4
    n = 1 << res
    west = int(cell.cell_of([-179.9], [0.0], res)[0])
    ring = cell.k_ring(west, 1)
    assert len(ring) == 9  # wraps across the antimeridian
    pole = int(cell.cell_of([0.0], [89.9], res)[0])
    ring = cell.k_ring(pole, 1)
    assert len(ring) == 6  # clamped at the pole


def test_k_ring_batch_matches_scalar():
    """r4: the vectorized batch k-ring equals the scalar k_ring for
    random cells (incl. wrap/clamp edges) and per-row radii."""
    rng = np.random.default_rng(11)
    lons = np.concatenate([rng.uniform(-180, 180, 40),
                           [-179.95, 179.95, 0.0]])
    lats = np.concatenate([rng.uniform(-90, 90, 40),
                           [89.9, -89.9, 0.0]])
    for res in (3, 5, 9):
        cells = cell.cell_of(lons, lats, res)
        for k in (0, 1, 3):
            got = cell.k_ring_lists(cells, k)
            for i, c in enumerate(cells):
                np.testing.assert_array_equal(
                    got[i], cell.k_ring(int(c), k), err_msg=f"{res},{k},{i}")
        # per-row k
        ks = rng.integers(0, 4, len(cells))
        out, valid = cell.k_ring_batch(cells, int(ks.max()), k_per_row=ks)
        for i, c in enumerate(cells):
            np.testing.assert_array_equal(
                np.unique(out[i][valid[i]]), cell.k_ring(int(c), int(ks[i])))
    # invalid cell -> empty
    out, valid = cell.k_ring_batch(np.array([-1], np.int64), 2)
    assert not valid.any()


def test_cover_box():
    res = 6
    g = Geom.box(0.1, 0.1, 11.0, 6.0)
    cells = cell.cover(g, res)
    assert len(cells) > 0
    # every point of the box must land in a covered cell
    for lon, lat in [(0.2, 0.2), (10.9, 5.9), (5.0, 3.0)]:
        assert int(cell.cell_of([lon], [lat], res)[0]) in set(cells.tolist())


def test_cover_respects_shape():
    # L-shaped polygon: cells in the notch must be excluded
    g = wkt.from_wkt("POLYGON ((0 0, 40 0, 40 10, 10 10, 10 40, 0 40, 0 0))")
    res = 5  # 11.25 x 5.625 degree cells
    cells = set(cell.cover(g, res).tolist())
    inside = int(cell.cell_of([35.0], [3.0], res)[0])
    notch = int(cell.cell_of([35.0], [35.0], res)[0])
    assert inside in cells
    assert notch not in cells


# -- constructive -------------------------------------------------------

def test_centroid():
    c = C.centroid(Geom.box(0, 0, 2, 2))
    np.testing.assert_allclose(c.coords[0], [1, 1])
    c = C.centroid(Geom.linestring([(0, 0), (2, 0)]))
    np.testing.assert_allclose(c.coords[0], [1, 0])
    c = C.centroid(wkt.from_wkt("MULTIPOINT (0 0, 2 2)"))
    np.testing.assert_allclose(c.coords[0], [1, 1])
    assert C.centroid(None) is None
    assert C.centroid(wkt.from_wkt("POINT EMPTY")).is_empty


def test_centroid_with_hole():
    g = wkt.from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (0 0, 0 5, 5 5, 5 0, 0 0))")
    c = C.centroid(g)
    # 100 - 25 area; removed quadrant pulls centroid toward (10,10) side
    assert c.coords[0, 0] > 5 and c.coords[0, 1] > 5


def test_envelope():
    e = C.envelope(Geom.linestring([(0, 0), (3, 4)]))
    assert e.bounds() == (0, 0, 3, 4)
    assert M.area(e) == 12.0
    p = C.envelope(Geom.point(1, 2))
    assert p.type_id == 0 and tuple(p.coords[0]) == (1, 2)


def test_convex_hull():
    g = wkt.from_wkt("MULTIPOINT (0 0, 2 0, 2 2, 0 2, 1 1)")
    h = C.convex_hull(g)
    assert M.area(h) == 4.0
    assert h.num_coordinates() == 5  # interior point dropped


def test_buffer_point_area():
    # regular 4*quadsegs-gon inscribed in circle: area = n/2 r^2 sin(2π/n)
    r, q = 2.0, 8
    b = C.buffer(Geom.point(0, 0), r, quadsegs=q)
    n = 4 * q
    expected = 0.5 * n * r * r * np.sin(2 * np.pi / n)
    np.testing.assert_allclose(M.area(b), expected)
    assert P.contains(b, Geom.point(0, 0))


def test_buffer_adjacent_circles_touch_rule():
    # the reference's poly_tree construction: radius sqrt(2)/2 + 1e-9
    r = np.sqrt(2) / 2 + 1e-9
    b0 = C.buffer(Geom.point(0, 0), r, quadsegs=32)
    b1 = C.buffer(Geom.point(1, 1), r, quadsegs=32)
    b2 = C.buffer(Geom.point(2, 2), r, quadsegs=32)
    assert P.intersects(b0, b1)
    assert not P.intersects(b0, b2)


def test_clip_by_rect():
    g = Geom.box(0, 0, 10, 10)
    c = C.clip_by_rect(g, 2, 2, 4, 4)
    assert M.area(c) == 4.0
    line = Geom.linestring([(0, 3), (10, 3)])
    cl = C.clip_by_rect(line, 2, 2, 4, 4)
    assert M.length(cl) == 2.0
    out = C.clip_by_rect(Geom.point(20, 20), 0, 0, 1, 1)
    assert out.is_empty


def test_clip_by_rect_with_hole():
    g = wkt.from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))")
    c = C.clip_by_rect(g, 3, 3, 7, 7)
    assert abs(M.area(c) - (16.0 - 4.0)) < 1e-9


def test_simplify():
    line = Geom.linestring([(0, 0), (1, 0.01), (2, 0)])
    s = C.simplify(line, 0.1)
    assert len(s.coords) == 2
    s2 = C.simplify(line, 0.001)
    assert len(s2.coords) == 3


def test_boundary():
    b = C.boundary(Geom.box(0, 0, 1, 1))
    assert b.type_id == 1 and M.length(b) == 4.0
    lb = C.boundary(Geom.linestring([(0, 0), (1, 1)]))
    assert lb.type_id == 4 and len(lb.parts) == 2
    assert C.boundary(Geom.point(0, 0)).is_empty


def test_reverse_segmentize_unique_points():
    line = Geom.linestring([(0, 0), (1, 1)])
    assert tuple(C.reverse(line).coords[0]) == (1, 1)
    d = C.segmentize(line, 0.5)
    assert len(d.coords) == 4  # sqrt(2)/0.5 -> 3 segments
    up = C.extract_unique_points(wkt.from_wkt("MULTIPOINT (0 0, 0 0, 1 1)"))
    assert len(up.parts) == 2


def test_point_on_surface():
    g = Geom.box(0, 0, 2, 2)
    pos = C.point_on_surface(g)
    assert P.covers(g, pos)
    # concave: centroid outside
    u = wkt.from_wkt("POLYGON ((0 0, 10 0, 10 1, 1 1, 1 9, 10 9, 10 10, 0 10, 0 0))")
    pos = C.point_on_surface(u)
    assert P.covers(u, pos)


def test_normalize_equal_forms():
    from spark_geo.kernel import wkb
    a = C.normalize(Geom.box(0, 0, 1, 1, ccw=True))
    b = C.normalize(Geom.box(0, 0, 1, 1, ccw=False))
    assert wkb.dumps(a) == wkb.dumps(b)


def test_collect_and_union_all():
    parts = [Geom.box(0, 0, 1, 1), Geom.box(2, 2, 3, 3), None]
    u = C.union_all(parts)
    assert u.type_id == 6 and M.area(u) == 2.0
    assert C.union_all([None, None]) is None
    cov = C.coverage_union_all([Geom.box(0, 0, 1, 1), Geom.box(1, 0, 2, 1)])
    assert M.area(cov) == 2.0
