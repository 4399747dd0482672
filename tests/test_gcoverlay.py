"""Mixed-dimension GEOMETRYCOLLECTION overlay (kernel.gcoverlay).

The reference refuses GeometryCollection operands in set ops (GEOS
raises — reference set_operations.py:79-131); spark_geo dispatches
per-dimension instead (ADVICE r4: the old NULL/line_overlay routing
silently dropped polygonal content)."""

import math

import pytest

from spark_geo.kernel import construct as C
from spark_geo.kernel import measure as M
from spark_geo.kernel.gcoverlay import gc_overlay, split_by_dim
from spark_geo.kernel.wkt import from_wkt, to_wkt

GC_MIX = ("GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,0 0)),"
          "LINESTRING(0 -5,20 -5))")
BOX2 = "POLYGON((5 5,15 5,15 15,5 15,5 5))"


def area(g):
    return M.area(g)


def length(g):
    return M.length(g)


def test_split_by_dim():
    g = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,1 0,1 1,0 0)),"
                 "LINESTRING(0 0,1 1),POINT(3 3),"
                 "GEOMETRYCOLLECTION(POINT(4 4)))")
    p, l, pt = split_by_dim(g)
    assert p.type_id is not None and area(p) == pytest.approx(0.5)
    assert length(l) == pytest.approx(math.sqrt(2))
    assert pt.type_id is not None and len(pt.parts) == 2


def test_intersection_keeps_polygonal_content():
    # ADVICE r4 scenario: old code returned EMPTY GC here
    gc, box2 = from_wkt(GC_MIX), from_wkt(BOX2)
    r = C.intersection(gc, box2)
    assert area(r) == pytest.approx(25.0)
    assert length(r) == pytest.approx(20.0)  # 5x5 square perimeter


def test_difference_keeps_polygon_and_line():
    gc, box2 = from_wkt(GC_MIX), from_wkt(BOX2)
    r = C.difference(gc, box2)
    assert area(r) == pytest.approx(75.0)
    # the line at y=-5 is untouched by box2
    segs_len = sum(length(p) for p in r.parts if p.dimensions() == 1)
    assert segs_len == pytest.approx(20.0)


def test_union_merges_polys_and_keeps_line():
    gc, box2 = from_wkt(GC_MIX), from_wkt(BOX2)
    r = C.union(gc, box2)
    assert area(r) == pytest.approx(100 + 100 - 25)
    lin = sum(length(p) for p in r.parts if p.dimensions() == 1)
    assert lin == pytest.approx(20.0)


def test_symmetric_difference():
    gc, box2 = from_wkt(GC_MIX), from_wkt(BOX2)
    r = C.symmetric_difference(gc, box2)
    assert area(r) == pytest.approx(75 + 75)
    lin = sum(length(p) for p in r.parts if p.dimensions() == 1)
    assert lin == pytest.approx(20.0)


def test_line_vs_polygonal_gc_both_orders():
    gc2 = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,"
                   "0 0)),POINT(20 20))")
    line = from_wkt("LINESTRING(-5 5,15 5)")
    for a, b in ((gc2, line), (line, gc2)):
        r = C.intersection(a, b)
        assert r.dimensions() == 1
        assert length(r) == pytest.approx(10.0)


def test_dimensional_collapse_interior_line_absorbed():
    # a lineal part lying inside the polygonal intersection is absorbed
    gc3 = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,"
                   "0 0)),LINESTRING(6 6,9 9))")
    r = C.intersection(gc3, from_wkt(BOX2))
    assert r.type_id == from_wkt(BOX2).type_id  # plain POLYGON
    assert area(r) == pytest.approx(25.0)


def test_point_in_poly_part_collapsed():
    gc = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,"
                  "0 0)),POINT(7 7),POINT(-3 -3))")
    r = C.intersection(gc, from_wkt(BOX2))
    # POINT(7 7) is inside the 5x5 overlap -> absorbed; (-3,-3) gone
    assert area(r) == pytest.approx(25.0)
    assert all(p.dimensions() == 2 for p in ([r] if not r.parts or
               r.dimensions() == 2 else r.parts))


def test_difference_line_operand_from_mixed_gc():
    # lineal minuend vs mixed GC subtrahend (polygon eats the middle)
    line = from_wkt("LINESTRING(-5 5,15 5)")
    gc2 = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,"
                   "0 0)),POINT(20 20))")
    r = C.difference(line, gc2)
    assert length(r) == pytest.approx(10.0)  # two 5-long stubs


def test_pure_lower_dim_gc_still_uses_lineoverlay():
    # no 2-dim content anywhere: routing unchanged (line_overlay path)
    gc = from_wkt("GEOMETRYCOLLECTION(LINESTRING(0 0,10 0),POINT(5 5))")
    r = C.intersection(gc, from_wkt("LINESTRING(5 -5,5 5)"))
    assert to_wkt(r) == "MULTIPOINT ((5 0), (5 5))"


def test_overlay_guard_replaced_no_raise():
    # the old NotImplementedError guards must be gone
    mp = from_wkt("GEOMETRYCOLLECTION(POLYGON((0 0,4 0,4 4,0 4,0 0)),"
                  "LINESTRING(0 6,4 6))")
    r = gc_overlay(mp, from_wkt("POLYGON((2 2,6 2,6 8,2 8,2 2))"),
                   "intersection")
    assert area(r) == pytest.approx(4.0)
    lin = sum(length(p) for p in (r.parts or [r]) if p.dimensions() == 1)
    assert lin == pytest.approx(2.0)


def test_mixed_gc_points_covered_blind_spot():
    # ADVICE r4 predicates.py:212: points ON the lineal part of a
    # poly+line GC must classify as covered
    from spark_geo.kernel import predicates as P
    import numpy as np
    gc = from_wkt(GC_MIX)
    pts = np.array([[5.0, -5.0],   # on the line part
                    [5.0, 5.0],    # in the polygon part
                    [50.0, 50.0]])  # outside everything
    cov = P._points_covered(pts, gc)
    assert cov.tolist() == [True, True, False]
