"""STRtree kernel tests — ports the reference's golden fixtures:

- point_tree: POINT (i i), i=0..9
- line_tree: LINESTRING (i i, i+1 i+1), i=0..9
- poly_tree: buffer(POINT (i i), 0.7071067811865476 + 1e-9, quadsegs=32)
(reference pygeos/tests/test_strtree.py:26-48) and the documented
query expectations (strtree.py docstrings :41-55, :100-107, :183-196).
"""

import numpy as np
import pytest

from spark_geo.kernel import construct as C
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom
from spark_geo.kernel.strtree import STRtree

HALF_DIAG = np.sqrt(2) / 2 + 1e-9

point_tree = STRtree([Geom.point(i, i) for i in range(10)])
line_tree = STRtree([Geom.linestring([(i, i), (i + 1, i + 1)]) for i in range(10)])
poly_tree = STRtree([C.buffer(Geom.point(i, i), HALF_DIAG, quadsegs=32) for i in range(10)])


def test_len_drops_none_and_empty():
    t = STRtree([Geom.point(0, 0), None, wkt.from_wkt("POINT EMPTY"), Geom.point(1, 1)])
    assert len(t) == 2
    # indices of original positions preserved (strtree.c:182-201)
    assert t.query(Geom.box(-1, -1, 2, 2)).tolist() == [0, 3]


def test_query_box_no_predicate():
    # reference strtree.py:41-55 doctest: query(box(2,2,4,4)) -> [2,3,4]
    assert point_tree.query(Geom.box(2, 2, 4, 4)).tolist() == [2, 3, 4]


def test_query_box_contains():
    # with predicate='contains' -> [3] (points 2,2 / 4,4 on boundary)
    assert point_tree.query(Geom.box(2, 2, 4, 4), predicate="contains").tolist() == [3]


def test_query_none_and_empty_input():
    assert len(point_tree.query(None)) == 0
    assert len(point_tree.query(wkt.from_wkt("POINT EMPTY"))) == 0


def test_query_bulk_inner_join():
    # reference strtree.py:183-196 doctest
    got = point_tree.query_bulk([Geom.box(2, 2, 4, 4), Geom.box(5, 5, 6, 6)])
    assert got.tolist() == [[0, 0, 0, 1, 1], [2, 3, 4, 5, 6]]


def test_query_bulk_drops_none_left():
    got = point_tree.query_bulk([None, Geom.box(2, 2, 4, 4)])
    assert got.tolist() == [[1, 1, 1], [2, 3, 4]]


def test_query_dwithin():
    # reference strtree.py:100-107 doctest:
    # query(POINT(0.5 0.5), dwithin, 1.0) -> [0, 1]
    got = point_tree.query(Geom.point(0.5, 0.5), predicate="dwithin", distance=1.0)
    assert got.tolist() == [0, 1]


def test_query_dwithin_requires_distance():
    with pytest.raises(ValueError):
        point_tree.query(Geom.point(0, 0), predicate="dwithin")


def test_line_tree_intersects():
    # box(2,2,4,4) spans segments 1..4 envelopes; exact intersects:
    # segment (1,1)-(2,2) touches at corner, (4,4)-(5,5) touches at corner
    got = line_tree.query(Geom.box(2, 2, 4, 4), predicate="intersects")
    assert got.tolist() == [1, 2, 3, 4]


def test_poly_tree_adjacent_circles_overlap():
    # adjacent buffered circles (radius = half diagonal + 1e-9) overlap
    assert poly_tree.query(poly_tree._geoms[3], predicate="intersects").tolist() == [2, 3, 4]


def test_poly_tree_contains_point():
    got = poly_tree.query(Geom.point(3, 3), predicate="within")
    assert got.tolist() == [3]


def test_nearest_all_basic():
    pairs = point_tree.nearest_all([Geom.point(1.1, 1.1)])
    assert pairs.tolist() == [[0], [1]]


def test_nearest_all_ties():
    # midpoint between points 0 and 1 -> both are nearest
    pairs, dist = point_tree.nearest_all([Geom.point(0.5, 0.5)], return_distance=True)
    assert pairs.tolist() == [[0, 0], [0, 1]]
    np.testing.assert_allclose(dist, np.sqrt(2) / 2)


def test_nearest_all_max_distance():
    pairs = point_tree.nearest_all([Geom.point(0.5, 0.5)], max_distance=0.1)
    assert pairs.shape == (2, 0)
    pairs = point_tree.nearest_all([Geom.point(0.5, 0.5)], max_distance=1.0)
    assert pairs.tolist() == [[0, 0], [0, 1]]


def test_nearest_deterministic():
    got = point_tree.nearest([Geom.point(0.5, 0.5), Geom.point(7.1, 7.1)])
    assert got.tolist() == [[0, 1], [0, 7]]  # lowest-index tie-break


def test_nearest_all_skips_none_empty():
    pairs = point_tree.nearest_all([None, wkt.from_wkt("POINT EMPTY"), Geom.point(2, 2)])
    assert pairs.tolist() == [[2], [2]]


def test_grid_equidistant_four_neighbors():
    # FIXTURES.md §5: 45x45 integer grid probed at +0.5 offsets ->
    # exactly 4 equidistant nearest at distance sqrt(2)/2
    grid = [Geom.point(x, y) for y in range(10) for x in range(10)]
    tree = STRtree(grid)
    pairs, dist = tree.nearest_all([Geom.point(4.5, 4.5)], return_distance=True)
    assert pairs.shape[1] == 4
    np.testing.assert_allclose(dist, np.sqrt(2) / 2)


def test_large_tree_query_matches_bruteforce():
    rng = np.random.RandomState(7)
    pts = rng.uniform(0, 100, size=(3000, 2))
    tree = STRtree([Geom.point(x, y) for x, y in pts])
    box = Geom.box(20, 30, 40, 55)
    expected = np.nonzero((pts[:, 0] >= 20) & (pts[:, 0] <= 40)
                          & (pts[:, 1] >= 30) & (pts[:, 1] <= 55))[0]
    got = tree.query(box)
    np.testing.assert_array_equal(got, expected)
