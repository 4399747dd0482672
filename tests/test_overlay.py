"""General polygon overlay (Greiner–Hormann) tests — the reference's
binary set ops (set_operations.py §2.7) on convex, concave, holed and
degenerate inputs, with hand-computed expected areas."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_geo.kernel import construct as C
from spark_geo.kernel import measure as M
from spark_geo.kernel import overlay as O
from spark_geo.kernel import predicates as P
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom

A = Geom.box(0, 0, 4, 4)
B = Geom.box(2, 2, 6, 6)
U_SHAPE = wkt.from_wkt(
    "POLYGON ((0 0, 6 0, 6 5, 4 5, 4 2, 2 2, 2 5, 0 5, 0 0))")  # area 24


@pytest.mark.parametrize("op,expected_area", [
    ("intersection", 4.0), ("union", 28.0),
    ("difference", 12.0), ("symmetric_difference", 24.0)])
def test_overlapping_boxes(op, expected_area):
    g = O.overlay(A, B, op)
    assert M.area(g) == pytest.approx(expected_area, abs=1e-9)


def test_concave_overlay():
    box = Geom.box(1, 1, 5, 4)
    inter = O.overlay(U_SHAPE, box, "intersection")
    assert M.area(inter) == pytest.approx(8.0, abs=1e-9)
    diff = O.overlay(U_SHAPE, box, "difference")
    assert M.area(diff) == pytest.approx(16.0, abs=1e-9)
    uni = O.overlay(U_SHAPE, box, "union")
    assert M.area(uni) == pytest.approx(24.0 + 12.0 - 8.0, abs=1e-9)
    # conservation: A = (A∩B) + (A−B)
    assert M.area(inter) + M.area(diff) == pytest.approx(M.area(U_SHAPE), abs=1e-9)


def test_disjoint_and_containment():
    far = Geom.box(10, 10, 11, 11)
    assert M.area(O.overlay(A, far, "union")) == pytest.approx(17.0)
    assert O.overlay(A, far, "intersection").is_empty
    assert O.overlay(A, far, "difference") == A
    inner = Geom.box(1, 1, 2, 2)
    assert O.overlay(A, inner, "intersection") == inner
    d = O.overlay(A, inner, "difference")
    assert M.area(d) == pytest.approx(15.0)  # hole attached
    assert not P.intersects(Geom.point(1.5, 1.5), d)


def test_degenerate_shared_edge():
    right = Geom.box(4, 0, 8, 4)
    # boundary-only contact: intersection has zero area (GEOS would
    # return a LINESTRING; our perturbation yields empty/zero-area)
    g = O.overlay(A, right, "intersection")
    assert M.area(g) <= 1e-6
    u = O.overlay(A, right, "union")
    assert M.area(u) == pytest.approx(32.0, rel=1e-6)


def test_kernel_dispatch():
    # construct.intersection/difference route concave pairs through GH
    box = Geom.box(1, 1, 5, 4)
    assert M.area(C.intersection(U_SHAPE, box)) == pytest.approx(8.0, abs=1e-9)
    assert M.area(C.difference(U_SHAPE, box)) == pytest.approx(16.0, abs=1e-9)
    assert M.area(C.symmetric_difference(A, B)) == pytest.approx(24.0, abs=1e-9)
    assert M.area(C.union(A, B)) == pytest.approx(28.0, abs=1e-9)
    assert C.union(None, A) is None


def test_multipolygon_operand():
    mp = Geom(6, parts=[Geom.box(0, 0, 1, 1), Geom.box(3, 3, 4, 4)])
    inter = C.intersection(mp, Geom.box(0, 0, 3.5, 3.5))
    assert M.area(inter) == pytest.approx(1.0 + 0.25, abs=1e-9)


def test_spark_overlay_udfs(spark):
    from spark_geo import functions as SG
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")],
        "a string, b string")
    ga, gb = SG.st_from_wkt("a"), SG.st_from_wkt("b")
    r = df.select(
        SG.st_area(SG.st_intersection(ga, gb)).alias("i"),
        SG.st_area(SG.st_union(ga, gb)).alias("u"),
        SG.st_area(SG.st_difference(ga, gb)).alias("d"),
        SG.st_area(SG.st_symmetric_difference(ga, gb)).alias("s"),
    ).first()
    assert (r["i"], r["u"], r["d"], r["s"]) == (4.0, 28.0, 12.0, 24.0)


def test_union_all_dissolves_overlaps():
    geoms = [Geom.box(0, 0, 2, 2), Geom.box(1, 1, 3, 3), Geom.box(10, 10, 11, 11)]
    u = C.union_all(geoms)
    # 4 + 4 - 1 overlap + 1 disjoint = 8
    assert M.area(u) == pytest.approx(8.0, abs=1e-9)
    # non-overlapping stays a cheap collect
    u2 = C.union_all([Geom.box(0, 0, 1, 1), Geom.box(5, 5, 6, 6)])
    assert M.area(u2) == pytest.approx(2.0)
    assert C.union_all([None, None]) is None


def test_offset_curve():
    line = Geom.linestring([(0, 0), (10, 0)])
    off = C.offset_curve(line, 2.0)
    np.testing.assert_allclose(off.coords, [[0, 2], [10, 2]])
    neg = C.offset_curve(line, -2.0)
    np.testing.assert_allclose(neg.coords, [[0, -2], [10, -2]])
    bent = Geom.linestring([(0, 0), (5, 0), (5, 5)])
    offb = C.offset_curve(bent, 1.0)
    # offset of an L going right then up, left side: starts at (0,1),
    # miter at (4,1), ends at (4,5)
    np.testing.assert_allclose(offb.coords[0], [0, 1])
    np.testing.assert_allclose(offb.coords[-1], [4, 5])
    assert C.offset_curve(None, 1.0) is None


def test_build_area():
    rings = wkt.from_wkt(
        "MULTILINESTRING ((0 0, 4 0), (4 0, 4 4), (4 4, 0 0))")
    g = C.build_area(rings)
    assert g.type_id == 3 and M.area(g) == 8.0
    # areal passthrough
    assert C.build_area(A) == A
