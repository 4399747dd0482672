"""Property-based kernel tests (hypothesis) — the reference's own test
strategy (pygeos/tests use parametrized sweeps over generated inputs);
these pin down algebraic invariants no golden table can cover.

Kernel-only: no SparkSession, runs in milliseconds per example.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from spark_geo.kernel import construct as C
from spark_geo.kernel import measure as M
from spark_geo.kernel import predicates as P
from spark_geo.kernel import relate as R
from spark_geo.kernel import wkb as K_wkb
from spark_geo.kernel import wkt as K_wkt
from spark_geo.kernel import cell as K_cell
from spark_geo.kernel.geom import Geom
from spark_geo.kernel.strtree import STRtree

coord = st.floats(min_value=-170.0, max_value=170.0, width=32)
size = st.floats(min_value=0.125, max_value=20.0, width=32)


def _box(x, y, w, h):
    return Geom.box(x, y, x + w, y + h)


@given(coord, coord, size, size)
@settings(max_examples=60, deadline=None)
def test_wkb_roundtrip_box(x, y, w, h):
    g = _box(x, y, w, h)
    back = K_wkb.loads(K_wkb.dumps(g))
    assert P.equals_exact(g, back, 0.0)
    # same coordinates; summation order may differ by array layout
    np.testing.assert_allclose(M.area(back), M.area(g), rtol=1e-9)


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_wkt_roundtrip_full_precision(pts):
    g = Geom.linestring(np.asarray(pts, dtype=np.float64)) if len(pts) > 1 \
        else Geom.point(*pts[0])
    back = K_wkt.from_wkt(K_wkt.to_wkt(g, -1))
    assert P.equals_exact(g, back, 0.0)


@given(coord, coord, size, size, coord, coord, size, size)
@settings(max_examples=60, deadline=None)
def test_box_intersection_matches_interval_math(x1, y1, w1, h1, x2, y2, w2, h2):
    a, b = _box(x1, y1, w1, h1), _box(x2, y2, w2, h2)
    inter = C.intersection(a, b)
    iw = max(0.0, min(x1 + w1, x2 + w2) - max(x1, x2))
    ih = max(0.0, min(y1 + h1, y2 + h2) - max(y1, y2))
    np.testing.assert_allclose(M.area(inter), iw * ih, atol=1e-9)


@given(coord, coord, size, size, st.floats(min_value=0.125, max_value=5.0, width=32))
@settings(max_examples=60, deadline=None)
def test_buffer_erode_roundtrip_box(x, y, w, h, r):
    g = _box(x, y, w, h)
    grown = C.buffer(g, r, join_style="mitre")
    assert M.area(grown) >= M.area(g)
    back = C.buffer(grown, -r, join_style="mitre")
    np.testing.assert_allclose(M.area(back), M.area(g), rtol=1e-9)


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=20))
@settings(max_examples=60, deadline=None)
def test_convex_hull_covers_inputs(pts):
    g = Geom(4, parts=[Geom.point(x, y) for x, y in pts])
    hull = C.convex_hull(g)
    for x, y in pts:
        assert P.covers(hull, Geom.point(x, y)) or \
            M.points_to_geom_dist(np.array([x]), np.array([y]), hull)[0] < 1e-9
    hull2 = C.convex_hull(hull)
    np.testing.assert_allclose(M.area(hull2), M.area(hull), atol=1e-9)


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=15),
       st.floats(min_value=0.03125, max_value=10.0, width=32))
@settings(max_examples=60, deadline=None)
def test_simplify_reduces(pts, tol):
    line = Geom.linestring(np.asarray(pts, dtype=np.float64))
    s = C.simplify(line, tol)
    assert len(s.coords) <= len(line.coords)
    assert M.length(s) <= M.length(line) + 1e-9
    assert np.array_equal(s.coords[0], line.coords[0])
    assert np.array_equal(s.coords[-1], line.coords[-1])


@given(coord, coord, st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_cell_parent_consistency(lon, lat, res):
    child = int(K_cell.cell_of(np.array([lon]), np.array([lat]), res)[0])
    direct = int(K_cell.cell_of(np.array([lon]), np.array([lat]), res - 1)[0])
    assert K_cell.cell_parent(child, res - 1) == direct


@given(st.lists(st.tuples(coord, coord, size, size), min_size=1, max_size=12),
       coord, coord, size, size)
@settings(max_examples=40, deadline=None)
def test_strtree_query_matches_bruteforce(boxes, qx, qy, qw, qh):
    items = [_box(*b) for b in boxes]
    tree = STRtree(items)
    probe = _box(qx, qy, qw, qh)
    got = sorted(int(i) for i in tree.query(probe))
    want = sorted(i for i, g in enumerate(items)
                  if not P._bbox_disjoint(g, probe))
    assert got == want


@given(coord, coord, size, size, coord, coord, size, size)
@settings(max_examples=60, deadline=None)
def test_predicate_consistency(x1, y1, w1, h1, x2, y2, w2, h2):
    a, b = _box(x1, y1, w1, h1), _box(x2, y2, w2, h2)
    if P.covers(a, b):
        assert P.intersects(a, b)
    if P.contains(a, b):
        assert P.covers(a, b)
    assert P.intersects(a, b) == P.intersects(b, a)
    assert P.intersects(a, b) != P.disjoint(a, b)
    assert abs(M.distance(a, b) - M.distance(b, a)) < 1e-12


@given(coord, coord, size, size, coord, coord, size, size)
@settings(max_examples=40, deadline=None)
def test_relate_transpose(x1, y1, w1, h1, x2, y2, w2, h2):
    a, b = _box(x1, y1, w1, h1), _box(x2, y2, w2, h2)
    m_ab, m_ba = R.relate(a, b), R.relate(b, a)
    # DE-9IM transpose: swapping operands transposes the 3x3 matrix
    t = "".join(m_ab[3 * (i % 3) + i // 3] for i in range(9))
    assert m_ba == t
