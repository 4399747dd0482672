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
