"""Golden predicate ✕ fixture-tree expectation tables.

Mirrors the reference's STRtree correctness strategy
(test_strtree.py:132-1228 sweeps (probe, predicate) -> exact index
lists over three fixture trees).  Expectations here are derived
independently from the documented DE-9IM semantics of each predicate
on the fixture geometry (worked out geometrically, cited per case) —
the join-output oracle the graft must match (BASELINE.json metric).

Fixtures (FIXTURES.md §3):
- point_tree: POINT (i i), i = 0..9
- line_tree:  LINESTRING (i i, i+1 i+1), i = 0..9
- poly_tree:  buffer(POINT (i i), sqrt(2)/2 + 1e-9, quadsegs=32)
"""

import numpy as np
import pytest

from spark_geo.kernel import construct as C
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom
from spark_geo.kernel.strtree import STRtree

R = np.sqrt(2) / 2 + 1e-9
point_tree = STRtree([Geom.point(i, i) for i in range(10)])
line_tree = STRtree([Geom.linestring([(i, i), (i + 1, i + 1)]) for i in range(10)])
poly_tree = STRtree([C.buffer(Geom.point(i, i), R, quadsegs=32) for i in range(10)])

BOX = Geom.box(2, 2, 4, 4)
DIAG = Geom.linestring([(0, 0), (2, 2)])

# (tree, probe, predicate) -> expected indices
CASES = [
    # --- point tree ✕ box probe -----------------------------------------
    # envelope only: points 2,3,4 fall in [2,4]^2
    (point_tree, BOX, None, [2, 3, 4]),
    (point_tree, BOX, "intersects", [2, 3, 4]),
    # contains: interior only — (2,2) and (4,4) sit on the boundary
    (point_tree, BOX, "contains", [3]),
    (point_tree, BOX, "contains_properly", [3]),
    # covers: boundary counts
    (point_tree, BOX, "covers", [2, 3, 4]),
    # a box is never within/covered_by a point
    (point_tree, BOX, "within", []),
    (point_tree, BOX, "covered_by", []),
    # touches: boundary-only contact = the two corner points
    (point_tree, BOX, "touches", [2, 4]),
    # crosses/overlaps impossible for polygon ✕ point
    (point_tree, BOX, "crosses", []),
    (point_tree, BOX, "overlaps", []),
    # --- point tree ✕ point probe ----------------------------------------
    (point_tree, Geom.point(2, 2), "intersects", [2]),
    (point_tree, Geom.point(2, 2), "within", [2]),
    (point_tree, Geom.point(2, 2), "contains", [2]),
    (point_tree, Geom.point(2, 2), "touches", []),
    (point_tree, Geom.point(2.5, 2.5), "intersects", []),
    # --- point tree ✕ diagonal line probe --------------------------------
    (point_tree, DIAG, "intersects", [0, 1, 2]),
    # line contains point only in its interior: endpoints 0 and 2 excluded
    (point_tree, DIAG, "contains", [1]),
    (point_tree, DIAG, "covers", [0, 1, 2]),
    (point_tree, DIAG, "touches", [0, 2]),
    # --- line tree ✕ box probe --------------------------------------------
    # segments 1..4 touch/cross [2,4]^2 (segment 1 and 4 at corners only)
    (line_tree, BOX, "intersects", [1, 2, 3, 4]),
    # segments 2 and 3 lie inside (endpoints on the boundary allowed)
    (line_tree, BOX, "contains", [2, 3]),
    (line_tree, BOX, "covers", [2, 3]),
    # strict interior: every segment touches the boundary somewhere
    (line_tree, BOX, "contains_properly", []),
    (line_tree, BOX, "touches", [1, 4]),
    # --- line tree ✕ point probe -------------------------------------------
    # (2,2) is the shared junction = an endpoint of segments 1 and 2
    (line_tree, Geom.point(2, 2), "intersects", [1, 2]),
    # point at segment endpoint: interiors disjoint, boundary contact
    (line_tree, Geom.point(2, 2), "touches", [1, 2]),
    (line_tree, Geom.point(2.5, 2.5), "intersects", [2]),
    (line_tree, Geom.point(2.5, 2.5), "within", [2]),
    # --- poly tree ✕ box probe ----------------------------------------------
    # circle i spans [i-0.707, i+0.707]^2: envelopes of 2,3,4 overlap the box
    (poly_tree, BOX, "intersects", [2, 3, 4]),
    # only circle 3 fits fully inside [2,4]^2
    (poly_tree, BOX, "contains", [3]),
    (poly_tree, BOX, "covers", [3]),
    (poly_tree, BOX, "contains_properly", [3]),
    # partial same-dimension overlap with circles 2 and 4
    (poly_tree, BOX, "overlaps", [2, 4]),
    (poly_tree, BOX, "within", []),
    (poly_tree, BOX, "touches", []),
    # --- poly tree ✕ point probe ----------------------------------------------
    (poly_tree, Geom.point(3, 3), "within", [3]),
    (poly_tree, Geom.point(3, 3), "intersects", [3]),
    # midpoint between centers: inside both adjacent circles (r > sqrt2/2)
    (poly_tree, Geom.point(0.5, 0.5), "intersects", [0, 1]),
    (poly_tree, Geom.point(0.5, 0.5), "within", [0, 1]),
]


@pytest.mark.parametrize("tree,probe,predicate,expected",
                         CASES,
                         ids=[f"{i}:{c[2]}" for i, c in enumerate(CASES)])
def test_golden_query(tree, probe, predicate, expected):
    got = tree.query(probe, predicate=predicate).tolist()
    assert got == expected


def test_point_touches_segment_endpoints():
    from spark_geo.kernel import predicates as P
    seg1 = Geom.linestring([(1, 1), (2, 2)])
    assert P.touches(Geom.point(2, 2), seg1)
    assert not P.touches(Geom.point(1.5, 1.5), seg1)


# --- nearest golden cases -----------------------------------------------

def test_nearest_all_goldens():
    pairs = point_tree.nearest_all([Geom.point(4.4, 4.4)])
    assert pairs.tolist() == [[0], [4]]
    pairs = point_tree.nearest_all([Geom.point(4.5, 4.5)])
    assert pairs.tolist() == [[0, 0], [4, 5]]
    # junction point is at distance 0 of both adjacent segments
    pairs = line_tree.nearest_all([Geom.point(3.0, 3.0)])
    assert pairs.tolist() == [[0, 0], [2, 3]]
    # inside a circle: distance 0 (strtree.py:293)
    pairs, d = poly_tree.nearest_all([Geom.point(9.2, 9.2)], return_distance=True)
    assert pairs.tolist() == [[0], [9]] and d[0] == 0.0
    # far probe
    pairs = poly_tree.nearest_all([Geom.point(19, 19)])
    assert pairs.tolist() == [[0], [9]]


def test_nearest_all_max_distance_prescreen():
    pairs = point_tree.nearest_all([Geom.point(20, 20)], max_distance=1.0)
    assert pairs.shape == (2, 0)
    pairs = point_tree.nearest_all([Geom.point(9.5, 9.5)], max_distance=1.0)
    assert pairs.tolist() == [[0], [9]]
