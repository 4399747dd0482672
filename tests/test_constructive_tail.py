"""Constructive-tail kernel + Spark tests: oriented envelope, minimum
bounding circle, make_valid, snap, polygonize, geojson/relate UDFs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_geo.kernel import construct as C
from spark_geo.kernel import measure as M
from spark_geo.kernel import predicates as P
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom


def test_oriented_envelope():
    # a 45-degree-rotated rectangle of points: OBB area << AABB area
    pts = [(0, 0), (2, 2), (3, 1), (1, -1)]
    g = Geom(4, parts=[Geom.point(x, y) for x, y in pts])
    obb = C.oriented_envelope(g)
    assert obb.type_id == 3
    np.testing.assert_allclose(M.area(obb), np.sqrt(8) * np.sqrt(2), rtol=1e-9)
    aabb = C.envelope(g)
    assert M.area(obb) < M.area(aabb)
    for x, y in pts:
        assert P.covers(obb, Geom.point(x, y))
    assert C.oriented_envelope(None) is None


def test_minimum_bounding_circle():
    g = Geom.box(0, 0, 2, 2)
    mbc = C.minimum_bounding_circle(g, quadsegs=32)
    # circumscribes the box: covers all corners
    for x, y in [(0, 0), (2, 0), (2, 2), (0, 2)]:
        assert P.covers(mbc, Geom.point(x, y))
    # area close to pi * r^2 with r = sqrt(2)
    np.testing.assert_allclose(M.area(mbc), np.pi * 2, rtol=2e-3)
    p = C.minimum_bounding_circle(Geom.point(3, 4))
    assert p.type_id == 0


def test_make_valid():
    unclosed = Geom(3, rings=[np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)])
    v = C.make_valid(unclosed)
    assert M.area(v) == 4.0 and np.array_equal(v.rings[0][0], v.rings[0][-1])
    degenerate_hole = Geom(3, rings=[
        np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
        np.array([[1, 1], [2, 2], [1, 1]], float)])  # 2-point hole
    v = C.make_valid(degenerate_hole)
    assert len(v.rings) == 1 and M.area(v) == 16.0
    assert C.make_valid(None) is None


def test_snap():
    line = Geom.linestring([(0.05, 0.02), (1.01, 0.98)])
    ref = Geom.box(0, 0, 1, 1)
    s = C.snap(line, ref, 0.1)
    np.testing.assert_array_equal(s.coords, [[0, 0], [1, 1]])
    # outside tolerance: unchanged
    s2 = C.snap(line, ref, 0.001)
    np.testing.assert_array_equal(s2.coords, line.coords)


def test_polygonize():
    lines = [Geom.linestring([(0, 0), (1, 0)]),
             Geom.linestring([(1, 0), (1, 1)]),
             Geom.linestring([(1, 1), (0, 0)])]
    p = C.polygonize(lines)
    assert p.type_id == 3 and M.area(p) == 0.5
    # open chain -> empty
    assert C.polygonize(lines[:2]).is_empty


def test_spark_geojson_relate(spark):
    from spark_geo import functions as SG
    df = spark.createDataFrame(
        [('{"type": "Point", "coordinates": [2, 3]}', "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")],
        "gj string, wkt string")
    r = df.select(
        SG.st_as_wkt(SG.st_from_geojson("gj")).alias("w"),
        SG.st_as_geojson(SG.st_from_wkt(F.lit("POINT (1 2)"))).alias("out_gj"),
        SG.st_relate(SG.st_from_geojson("gj"), SG.st_from_wkt("wkt")).alias("m"),
        SG.st_relate_pattern(SG.st_from_geojson("gj"), SG.st_from_wkt("wkt"),
                             "T*F**F***").alias("within"),
    ).first()
    assert r["w"] == "POINT (2 3)"
    import json
    assert json.loads(r["out_gj"]) == {"type": "Point", "coordinates": [1, 2]}
    assert r["m"] == "0FFFFF212"
    assert r["within"] is True


def test_spark_constructive_tail(spark):
    from spark_geo import functions as SG
    df = spark.createDataFrame([("MULTIPOINT (0 0, 2 2, 3 1, 1 -1)",)], "wkt string") \
        .withColumn("g", SG.st_from_wkt("wkt"))
    r = df.select(
        SG.st_area(SG.st_oriented_envelope("g")).alias("obb_area"),
        SG.st_area(SG.st_minimum_bounding_circle("g", quadsegs=32)).alias("mbc_area"),
        SG.st_as_wkt(SG.st_make_valid(SG.st_from_wkt(F.lit(
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))).alias("mv"),
    ).first()
    np.testing.assert_allclose(r["obb_area"], 4.0, rtol=1e-9)
    assert r["mbc_area"] > 4.0
    assert r["mv"].startswith("POLYGON")


# -- buffer styles (reference constructive.py:37-46, 82-186;
#    parametrized like reference tests/test_constructive.py) ----------------

import pytest
from spark_geo.kernel.geom import Geom
from spark_geo.kernel import construct as KC, measure as KM


SEG = Geom.linestring(np.array([[0.0, 0.0], [8.0, 0.0]]))
Q = 8
DISC = 0.5 * 4 * Q * np.sin(np.pi / (2 * Q))  # unit-radius n-gon area


@pytest.mark.parametrize("cap,expected", [
    ("flat", 32.0),
    ("square", 48.0),
    ("round", 32.0 + 4.0 * DISC),
])
def test_buffer_cap_styles_segment(cap, expected):
    b = KC.buffer(SEG, 2.0, Q, cap_style=cap)
    np.testing.assert_allclose(KM.area(b), expected, rtol=1e-12)


@pytest.mark.parametrize("join,expected", [
    ("mitre", 74.0 * 38.0),
    ("round", 70 * 34 + 2 * 2.0 * 104 + 4.0 * DISC),
    ("bevel", 74.0 * 38.0 - 4 * (4.0 / 2)),  # four corners each lose r^2/2
])
def test_buffer_join_styles_box(join, expected):
    b = KC.buffer(Geom.box(0, 0, 70, 34), 2.0, Q, join_style=join)
    np.testing.assert_allclose(KM.area(b), expected, rtol=1e-12)


def test_buffer_negative_polygon():
    b = KC.buffer(Geom.box(0, 0, 70, 34), -2.0, Q, join_style="mitre")
    np.testing.assert_allclose(KM.area(b), 66.0 * 30.0, rtol=1e-12)
    collapsed = KC.buffer(Geom.box(0, 0, 70, 34), -17.0, Q, join_style="mitre")
    assert collapsed.is_empty
    # negative buffer on a line/point is empty (reference semantics)
    assert KC.buffer(SEG, -1.0, Q).is_empty
    assert KC.buffer(Geom.point(1, 1), -1.0, Q).is_empty


def test_buffer_single_sided():
    left = KC.buffer(SEG, 2.0, Q, single_sided=True)
    right = KC.buffer(SEG, -2.0, Q, single_sided=True)
    np.testing.assert_allclose(KM.area(left), 16.0, rtol=1e-12)
    np.testing.assert_allclose(KM.area(right), 16.0, rtol=1e-12)
    # left buffer lies above the segment, right below
    assert left.bounds()[3] == 2.0 and left.bounds()[1] == 0.0
    assert right.bounds()[1] == -2.0 and right.bounds()[3] == 0.0


def test_buffer_point_styles():
    p = Geom.point(3, 4)
    assert KC.buffer(p, 2.0, Q, cap_style="flat").is_empty
    sq = KC.buffer(p, 2.0, Q, cap_style="square")
    np.testing.assert_allclose(KM.area(sq), 16.0, rtol=1e-12)
    rd = KC.buffer(p, 2.0, Q)
    np.testing.assert_allclose(KM.area(rd), 4.0 * DISC, rtol=1e-12)


def test_buffer_mitre_limit_degrades_to_bevel():
    # a sharp spike: mitre point would be far beyond the limit
    spike = Geom.linestring(np.array([[0.0, 0.0], [10.0, 0.2], [0.0, 0.4]]))
    lim = KC.buffer(spike, 1.0, Q, cap_style="flat", join_style="mitre",
                    mitre_limit=1.5)
    unlim = KC.buffer(spike, 1.0, Q, cap_style="flat", join_style="mitre",
                      mitre_limit=1000.0)
    assert KM.area(unlim) > KM.area(lim)  # clipped mitre is smaller


def test_buffer_holed_polygon_shrinks_hole():
    holed = Geom(3, rings=[Geom.box(0, 0, 70, 34).rings[0],
                           Geom.box(30, 10, 40, 20).rings[0]])
    b = KC.buffer(holed, 1.0, Q, join_style="mitre")
    np.testing.assert_allclose(KM.area(b), 72 * 36 - 8 * 8, rtol=1e-12)


# -- polygonize_full (reference constructive.py:582-640) --------------------

def _ls(*pts):
    return Geom.linestring(np.asarray(pts, dtype=float))


_SQ = [_ls((0, 0), (4, 0)), _ls((4, 0), (4, 4)),
       _ls((4, 4), (0, 4)), _ls((0, 4), (0, 0))]


def test_polygonize_full_square_and_dangle():
    p, c, d, inv = KC.polygonize_full(_SQ + [_ls((4, 4), (7, 7))])
    np.testing.assert_allclose(KM.area(p), 16.0)
    assert c.is_empty and inv.is_empty
    np.testing.assert_allclose(KM.length(d), np.hypot(3, 3))


def test_polygonize_nodes_crossing_lines():
    # un-noded diagonals through the square -> four triangles
    p = KC.polygonize(_SQ + [_ls((0, 0), (4, 4)), _ls((4, 0), (0, 4))])
    assert len(p.parts) == 4
    np.testing.assert_allclose(KM.area(p), 16.0)


def test_polygonize_hole_assignment():
    inner = [_ls((1, 1), (2, 1)), _ls((2, 1), (2, 2)),
             _ls((2, 2), (1, 2)), _ls((1, 2), (1, 1))]
    p = KC.polygonize(_SQ + inner)
    areas = sorted(KM.area(q) for q in p.parts)
    np.testing.assert_allclose(areas, [1.0, 15.0])  # inner + outer-with-hole


def test_polygonize_full_cut_edge():
    right = [_ls((6, 0), (10, 0)), _ls((10, 0), (10, 4)),
             _ls((10, 4), (6, 4)), _ls((6, 4), (6, 0))]
    bridge = [_ls((4, 2), (6, 2))]
    p, c, d, inv = KC.polygonize_full(_SQ + right + bridge)
    np.testing.assert_allclose(KM.area(p), 32.0)
    np.testing.assert_allclose(KM.length(c), 2.0)  # the bridge is a cut
    assert d.is_empty


def test_spark_polygonize_full(spark):
    from pyspark.sql import functions as F
    from spark_geo import functions as SG
    wkts = ["LINESTRING (0 0, 4 0)", "LINESTRING (4 0, 4 4)",
            "LINESTRING (4 4, 0 4)", "LINESTRING (0 4, 0 0)",
            "LINESTRING (4 4, 7 7)"]
    df = spark.createDataFrame([(1, wkts)], "id int, wkts array<string>")
    geoms_df = (df.select("id", F.explode("wkts").alias("w"))
                .select("id", SG.st_from_wkt("w").alias("g"))
                .groupBy("id").agg(F.collect_list("g").alias("geoms")))
    r = geoms_df.select(SG.st_polygonize_full("geoms").alias("pf")).select(
        SG.st_area("pf.polygons").alias("a"),
        SG.st_length("pf.dangles").alias("dl"),
        SG.st_is_empty("pf.cuts").alias("ce")).first()
    np.testing.assert_allclose(r["a"], 16.0)
    np.testing.assert_allclose(r["dl"], np.hypot(3, 3))
    assert r["ce"] is True


def test_make_valid_bowtie_rebuild():
    """Self-crossing ring (signed area 0) rebuilds into the valid
    two-triangle multipolygon via noding+polygonize (reference GEOS
    MakeValid linework strategy)."""
    from spark_geo.kernel import unary as KU
    bow = Geom(3, rings=[np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)])
    assert not KU.is_valid(bow)
    v = KC.make_valid(bow)
    assert v.type_id == 6 and len(v.parts) == 2
    np.testing.assert_allclose(KM.area(v), 2.0)
    assert all(KU.is_valid(p) for p in v.parts)


def test_snap_to_segment():
    """Full GEOSSnap semantics: a vertex beyond any reference vertex's
    tolerance but within a reference SEGMENT's tolerance projects onto
    the segment; vertex snapping wins when both are in range."""
    ref = Geom.linestring(np.array([[0., 0.], [10., 0.]]))
    s = KC.snap(Geom.point(5.0, 0.3), ref, 0.5)
    np.testing.assert_array_equal(s.coords, [[5.0, 0.0]])
    v = KC.snap(Geom.point(0.2, 0.2), ref, 0.5)
    np.testing.assert_array_equal(v.coords, [[0.0, 0.0]])
    u = KC.snap(Geom.point(5.0, 2.0), ref, 0.5)
    np.testing.assert_array_equal(u.coords, [[5.0, 2.0]])
