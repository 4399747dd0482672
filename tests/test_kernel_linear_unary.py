"""Linear referencing + accessor/unary-predicate kernel tests
(reference test_linear.py / test_geometry.py semantics)."""

import numpy as np
import pytest

from spark_geo.kernel import construct as C
from spark_geo.kernel import linear as L
from spark_geo.kernel import measure as M
from spark_geo.kernel import unary as U
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom


LINE = Geom.linestring([(0, 0), (10, 0)])
BENT = Geom.linestring([(0, 0), (1, 0), (1, 1)])


def test_line_interpolate_point():
    p = L.line_interpolate_point(LINE, 2.5)
    assert tuple(p.coords[0]) == (2.5, 0.0)
    p = L.line_interpolate_point(LINE, 0.5, normalized=True)
    assert tuple(p.coords[0]) == (5.0, 0.0)
    p = L.line_interpolate_point(LINE, -2.0)  # from the end
    assert tuple(p.coords[0]) == (8.0, 0.0)
    p = L.line_interpolate_point(LINE, 99.0)  # clamped
    assert tuple(p.coords[0]) == (10.0, 0.0)
    p = L.line_interpolate_point(BENT, 1.5)
    assert tuple(p.coords[0]) == (1.0, 0.5)
    assert L.line_interpolate_point(None, 1.0) is None


def test_line_locate_point():
    assert L.line_locate_point(LINE, Geom.point(3, 5)) == 3.0
    assert L.line_locate_point(LINE, Geom.point(3, 5), normalized=True) == 0.3
    assert L.line_locate_point(BENT, Geom.point(2, 0.5)) == 1.5
    assert np.isnan(L.line_locate_point(None, Geom.point(0, 0)))


def test_line_merge():
    g = wkt.from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))")
    m = L.line_merge(g)
    assert m.type_id == 1 and len(m.coords) == 3
    g2 = wkt.from_wkt("MULTILINESTRING ((0 0, 1 1), (5 5, 6 6))")
    m2 = L.line_merge(g2)
    assert m2.type_id == 5 and len(m2.parts) == 2
    # reversed orientation still merges
    g3 = wkt.from_wkt("MULTILINESTRING ((1 1, 0 0), (1 1, 2 2))")
    assert L.line_merge(g3).type_id == 1


def test_shortest_line():
    s = L.shortest_line(Geom.point(0, 5), LINE)
    assert M.length(s) == 5.0
    np.testing.assert_array_equal(s.coords, [[0, 5], [0, 0]])
    s = L.shortest_line(Geom.box(0, 0, 1, 1), Geom.box(3, 0, 4, 1))
    assert M.length(s) == 2.0
    assert L.shortest_line(None, LINE) is None


def test_is_closed_ring_ccw():
    assert not U.is_closed(LINE)
    ring = wkt.from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)")
    assert U.is_closed(ring)
    assert U.is_ring(ring)
    assert U.is_ccw(ring)
    cw = wkt.from_wkt("LINESTRING (0 0, 0 1, 1 1, 0 0)")
    assert not U.is_ccw(cw)
    assert not U.is_closed(None)


def test_is_simple():
    assert U.is_simple(LINE)
    bowtie = wkt.from_wkt("LINESTRING (0 0, 2 2, 2 0, 0 2)")
    assert not U.is_simple(bowtie)
    assert not U.is_simple(None)
    assert U.is_simple(Geom.point(0, 0))
    dup_mp = wkt.from_wkt("MULTIPOINT (0 0, 0 0)")
    assert not U.is_simple(dup_mp)


def test_is_valid():
    assert U.is_valid(Geom.box(0, 0, 1, 1))
    assert U.is_valid_reason(Geom.box(0, 0, 1, 1)) == "Valid Geometry"
    bowtie_poly = Geom(3, rings=[np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)])
    assert not U.is_valid(bowtie_poly)
    assert U.is_valid_reason(bowtie_poly) == "Self-intersection"
    hole_out = Geom.polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
                            holes=[[(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]])
    assert U.is_valid_reason(hole_out) == "Hole lies outside shell"
    assert U.is_valid_reason(None) is None


def test_accessors():
    poly = wkt.from_wkt(
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    assert U.get_num_interior_rings(poly) == 1
    ext = U.get_exterior_ring(poly)
    assert ext.type_id == 2 and len(ext.coords) == 5
    hole = U.get_interior_ring(poly, 0)
    assert M.length(hole) == 8.0
    assert U.get_interior_ring(poly, 1) is None
    assert U.get_interior_ring(poly, -1) is not None
    mp = wkt.from_wkt("MULTIPOINT (0 0, 1 2)")
    assert tuple(U.get_geometry(mp, 1).coords[0]) == (1.0, 2.0)
    assert tuple(U.get_geometry(mp, -1).coords[0]) == (1.0, 2.0)
    assert U.get_geometry(mp, 5) is None
    assert U.get_geometry(Geom.point(7, 8), 0).type_id == 0
    assert U.get_point(BENT, 1).coords[0].tolist() == [1, 0]
    assert U.get_point(BENT, -1).coords[0].tolist() == [1, 1]
    assert U.get_num_points(BENT) == 3
    assert U.get_num_points(Geom.point(0, 0)) == 0
    assert len(U.get_rings(poly)) == 2
    assert len(U.get_parts(mp)) == 2
    assert U.get_dimensions(poly) == 2 and U.get_dimensions(None) == -1


def test_set_precision_force3d():
    g = Geom.point(1.234, 5.678)
    s = U.set_precision(g, 0.1)
    np.testing.assert_allclose(s.coords[0], [1.2, 5.7])
    f = U.force_3d(g, 9.0)
    assert f.has_z and f.zs[0] == 9.0


def test_frechet_and_radius():
    a = Geom.linestring([(0, 0), (10, 0)])
    b = Geom.linestring([(0, 1), (10, 1)])
    assert M.frechet_distance(a, b) == 1.0
    assert np.isnan(M.frechet_distance(None, b))
    r = M.minimum_bounding_radius(Geom.box(0, 0, 2, 2))
    np.testing.assert_allclose(r, np.sqrt(2))
    assert M.minimum_bounding_radius(Geom.point(5, 5)) == 0.0


def test_intersection_convex():
    a = Geom.box(0, 0, 4, 4)
    b = Geom.box(2, 2, 6, 6)
    got = C.intersection(a, b)
    assert M.area(got) == 4.0
    assert got.bounds() == (2, 2, 4, 4)
    # disjoint -> empty
    assert C.intersection(a, Geom.box(10, 10, 11, 11)).is_empty
    # contained -> inner
    assert C.intersection(a, Geom.box(1, 1, 2, 2)).bounds() == (1, 1, 2, 2)
    # convex clip of a concave subject
    concave = wkt.from_wkt("POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))")
    tri = C.intersection(concave, Geom.box(0, 0, 4, 1))
    assert abs(M.area(tri) - 4.0) < 1e-9
    # None propagation
    assert C.intersection(None, a) is None


def test_difference_fast_paths():
    a = Geom.box(0, 0, 1, 1)
    assert C.difference(a, Geom.box(5, 5, 6, 6)) == a
    assert C.difference(a, Geom.box(-1, -1, 2, 2)).is_empty
    # partial overlap now routes through the general GH overlay
    d = C.difference(a, Geom.box(0.5, 0.5, 2, 2))
    assert M.area(d) == 0.75


# -- set_precision modes + inferred get_precision (reference
#    geometry.py:658-791) ---------------------------------------------------

def test_set_precision_modes():
    import numpy as np
    from spark_geo.kernel.geom import Geom
    from spark_geo.kernel import unary as U, measure as M
    sliver = Geom(3, rings=[np.array([[0, 0], [0.2, 0], [0.2, 0.1], [0, 0]], float)])
    assert U.set_precision(sliver, 1.0, "valid_output").is_empty
    kept = U.set_precision(sliver, 1.0, "keep_collapsed")
    assert kept.type_id == 0  # collapsed to its point
    pw = U.set_precision(sliver, 1.0, "pointwise")
    assert len(pw.rings[0]) == 4  # raw snap keeps the degenerate ring
    snapped = U.set_precision(Geom.box(0.1, 0.1, 9.9, 4.9), 1.0)
    assert M.area(snapped) == 50.0
    seg = Geom.linestring(np.array([[0.1, 0.1], [0.2, 0.2]]))
    assert U.set_precision(seg, 1.0).is_empty
    assert U.set_precision(seg, 1.0, "keep_collapsed").type_id == 0


def test_get_precision_inferred():
    import numpy as np
    from spark_geo.kernel.geom import Geom
    from spark_geo.kernel import unary as U
    assert U.get_precision(Geom.box(0, 0, 70, 34)) == 1.0
    assert U.get_precision(Geom.point(1.25, 3.5)) == 0.01
    assert U.get_precision(Geom.point(np.pi, 1.0)) == 0.0
    assert U.get_precision(None) is None
    # set_precision then get_precision round-trips the grid
    g = U.set_precision(Geom.point(1.2345678, 2.7182818), 0.01, "pointwise")
    assert U.get_precision(g) == 0.01


def test_simplify_preserve_topology():
    import numpy as np
    from spark_geo.kernel.geom import Geom
    from spark_geo.kernel import construct as C, measure as M
    # a thin Z-shaped ring that plain DP would collapse at tol 10
    ring = np.array([[0, 0], [4, 0], [4, 1], [0, 1], [0, 0]], float)
    g = Geom(3, rings=[ring])
    plain = C.simplify(g, 10.0)
    kept = C.simplify(g, 10.0, preserve_topology=True)
    assert plain.is_empty or M.area(plain) == 0.0
    assert M.area(kept) == 4.0  # original ring retained
    # gentle tolerance behaves like plain DP
    dense = C.segmentize(Geom.linestring(np.array([[0., 0.], [8., 0.]])), 1.0)
    s = C.simplify(dense, 0.5, preserve_topology=True)
    assert len(s.coords) == 2


def test_is_valid_nesting_rules():
    """OGC nesting rules (reference predicates.py is_valid_reason):
    nested holes invalid, nested shells invalid, overlapping shells
    invalid, but a shell inside another polygon's HOLE is valid."""
    import numpy as np
    from spark_geo.kernel.geom import Geom, MULTIPOLYGON
    from spark_geo.kernel import unary as U
    box = Geom.box
    nested_holes = Geom(3, rings=[box(0, 0, 10, 10).rings[0],
                                  box(2, 2, 8, 8).rings[0],
                                  box(3, 3, 5, 5).rings[0]])
    assert U.is_valid_reason(nested_holes) == "Holes are nested"
    ok_holes = Geom(3, rings=[box(0, 0, 10, 10).rings[0],
                              box(1, 1, 3, 3).rings[0],
                              box(5, 5, 7, 7).rings[0]])
    assert U.is_valid_reason(ok_holes) == "Valid Geometry"
    assert U.is_valid_reason(
        Geom(MULTIPOLYGON, parts=[box(0, 0, 10, 10), box(2, 2, 4, 4)])) \
        == "Nested shells"
    assert U.is_valid_reason(
        Geom(MULTIPOLYGON, parts=[box(0, 0, 4, 4), box(2, 2, 6, 6)])) \
        == "Self-intersection"
    holed = Geom(3, rings=[box(0, 0, 10, 10).rings[0], box(2, 2, 8, 8).rings[0]])
    island = box(4, 4, 6, 6)
    assert U.is_valid_reason(Geom(MULTIPOLYGON, parts=[holed, island])) \
        == "Valid Geometry"


def test_is_valid_connected_interior():
    """r4 (VERDICT r3 item 5): OGC connected-interior — a hole (or
    chain of touching holes) linking two shell contacts disconnects
    the interior; single-point contacts, even many rings at one point,
    stay valid.  Reference: GEOSisValid semantics via
    predicates.py:359-391."""
    from spark_geo.kernel.wkt import from_wkt

    shell = "(0 0, 10 0, 10 10, 0 10, 0 0)"
    # hole touching the shell at ONE point: valid
    one = from_wkt(f"POLYGON ({shell}, (5 0, 3 3, 5 6, 7 3, 5 0))")
    assert U.is_valid_reason(one) == "Valid Geometry"
    # hole touching the shell at TWO points: splits the interior
    two = from_wkt(f"POLYGON ({shell}, (5 0, 2 5, 5 10, 8 5, 5 0))")
    assert U.is_valid_reason(two) == "Interior is disconnected"
    assert not U.is_valid(two)
    # chain: hole A on shell, hole B on shell, A touches B
    chain = from_wkt(
        f"POLYGON ({shell},"
        " (5 0, 4 2, 5 4, 6 2, 5 0),"
        " (5 10, 4 7, 5 4, 6 7, 5 10))")
    assert U.is_valid_reason(chain) == "Interior is disconnected"
    # two holes + shell all through ONE point: still connected
    star = from_wkt(
        f"POLYGON ({shell},"
        " (5 0, 3 2, 4 4, 5 0),"
        " (5 0, 7 2, 6 4, 5 0))")
    assert U.is_valid_reason(star) == "Valid Geometry"
    # two holes touching each other at TWO points: pocket between them
    pocket = from_wkt(
        f"POLYGON ({shell},"
        " (4 4, 6 3, 8 4, 6 3.5, 4 4),"
        " (4 4, 6 4.5, 8 4, 6 5, 4 4))")
    assert U.is_valid_reason(pocket) == "Interior is disconnected"
    # plain donut unaffected
    donut = from_wkt(f"POLYGON ({shell}, (2 2, 8 2, 8 8, 2 8, 2 2))")
    assert U.is_valid_reason(donut) == "Valid Geometry"
