"""All-types ✕ all-operators sweep (the reference's parametrized test
strategy, test_predicates.py:20-106: every predicate/measurement runs
on every geometry type without crashing, with None/empty rules held).

Fixture set = FIXTURES.md §4 (one canonical geometry per type)."""

import numpy as np
import pytest

from spark_geo.kernel import construct as C
from spark_geo.kernel import measure as M
from spark_geo.kernel import predicates as P
from spark_geo.kernel import unary as U
from spark_geo.kernel import wkb, wkt
from spark_geo.kernel.geom import Geom

ALL_TYPES = {
    "point": "POINT (2 3)",
    "line_string": "LINESTRING (0 0, 1 0, 1 1)",
    "linear_ring": "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
    "polygon": "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "multi_point": "MULTIPOINT (0 0, 1 2)",
    "multi_line_string": "MULTILINESTRING ((0 0, 1 2))",
    "multi_polygon": ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                      "((2.1 2.1, 2.2 2.1, 2.2 2.2, 2.1 2.2, 2.1 2.1)))"),
    "geometry_collection": "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
    "polygon_with_hole": ("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), "
                          "(2 2, 2 4, 4 4, 4 2, 2 2))"),
    "empty_point": "POINT EMPTY",
    "empty_line": "LINESTRING EMPTY",
    "empty_polygon": "POLYGON EMPTY",
    "empty_collection": "GEOMETRYCOLLECTION EMPTY",
}

GEOMS = {k: wkt.from_wkt(v) for k, v in ALL_TYPES.items()}
BOX = Geom.box(-1, -1, 60, 60)

BINARY_PREDICATES = [P.intersects, P.disjoint, P.contains, P.within,
                     P.covers, P.covered_by, P.touches, P.crosses,
                     P.overlaps, P.equals]
UNARY_PREDICATES = [U.is_closed, U.is_ring, U.is_ccw, U.is_simple,
                    U.is_valid, U.has_z]


@pytest.mark.parametrize("name", list(ALL_TYPES))
def test_wkb_roundtrip_all_types(name):
    g = GEOMS[name]
    g2 = wkb.loads(wkb.dumps(g))
    # rings degrade to linestrings through WKB (no WKB ring type)
    if name == "linear_ring":
        assert g2.type_id == 1 and np.array_equal(g2.coords, g.coords)
    else:
        assert wkt.to_wkt(g2) == wkt.to_wkt(g)


@pytest.mark.parametrize("name", list(ALL_TYPES))
@pytest.mark.parametrize("fn", BINARY_PREDICATES,
                         ids=lambda f: f.__name__)
def test_binary_predicates_run_on_all_types(name, fn):
    g = GEOMS[name]
    r1, r2 = fn(g, BOX), fn(BOX, g)
    assert isinstance(r1, (bool, np.bool_)) and isinstance(r2, (bool, np.bool_))
    if name.startswith("empty"):
        if fn is P.disjoint:
            assert r1 and r2  # empties are disjoint from everything
        else:
            assert not r1 and not r2
    # non-empty fixtures all sit inside the big box
    if not name.startswith("empty") and fn is P.intersects:
        assert r1 and r2
    if not name.startswith("empty") and fn is P.covers:
        assert r2  # box covers every fixture


@pytest.mark.parametrize("name", list(ALL_TYPES))
@pytest.mark.parametrize("fn", UNARY_PREDICATES, ids=lambda f: f.__name__)
def test_unary_predicates_run_on_all_types(name, fn):
    out = fn(GEOMS[name])
    assert isinstance(out, (bool, np.bool_))
    assert fn(None) is False


@pytest.mark.parametrize("name", list(ALL_TYPES))
def test_measures_run_on_all_types(name):
    g = GEOMS[name]
    a, l = M.area(g), M.length(g)
    assert a >= 0 and l >= 0
    b = g.bounds()
    if name.startswith("empty"):
        assert all(np.isnan(v) for v in b)
    else:
        assert b[0] <= b[2] and b[1] <= b[3]
        d = M.distance(g, Geom.point(100, 100))
        assert d > 0


@pytest.mark.parametrize("name", list(ALL_TYPES))
def test_constructives_run_on_all_types(name):
    g = GEOMS[name]
    for fn in (C.envelope, C.centroid, C.convex_hull, C.boundary,
               C.reverse, C.normalize, C.extract_unique_points):
        out = fn(g)
        assert out is None or isinstance(out, Geom)
    s = C.simplify(g, 0.01)
    assert isinstance(s, Geom)
    cl = C.clip_by_rect(g, -0.5, -0.5, 5, 5)
    assert isinstance(cl, Geom)


def test_known_values_from_reference_fixtures():
    # area/length of the canonical fixtures (worked by hand)
    assert M.area(GEOMS["polygon"]) == 4.0
    assert M.area(GEOMS["polygon_with_hole"]) == 96.0
    assert M.length(GEOMS["line_string"]) == 2.0
    assert M.length(GEOMS["linear_ring"]) == 4.0
    assert M.area(GEOMS["multi_polygon"]) == pytest.approx(1.0 + 0.01)
    assert GEOMS["geometry_collection"].bounds() == (49, -1, 52, 2)
    # dimensions ladder
    assert U.get_dimensions(GEOMS["point"]) == 0
    assert U.get_dimensions(GEOMS["multi_line_string"]) == 1
    assert U.get_dimensions(GEOMS["multi_polygon"]) == 2
    assert U.get_dimensions(GEOMS["geometry_collection"]) == 1
    assert U.get_dimensions(GEOMS["empty_collection"]) == -1
