"""Delaunay / Voronoi kernel tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_geo.kernel import measure as M
from spark_geo.kernel import predicates as P
from spark_geo.kernel import triangulate as TR
from spark_geo.kernel import wkt
from spark_geo.kernel.geom import Geom


def test_delaunay_square():
    g = wkt.from_wkt("MULTIPOINT (0 0, 1 0, 1 1, 0 1)")
    d = TR.delaunay_triangles(g)
    assert d.type_id == 7 and len(d.parts) == 2
    assert sum(M.area(t) for t in d.parts) == pytest.approx(1.0)
    e = TR.delaunay_triangles(g, only_edges=True)
    assert e.type_id == 5 and len(e.parts) == 5  # 4 hull + 1 diagonal


def test_delaunay_property_empty_circumcircle():
    rng = np.random.RandomState(5)
    pts = rng.uniform(0, 10, (25, 2))
    tris = TR.delaunay(pts)
    assert len(tris) > 0
    # Delaunay property: no point strictly inside any circumcircle
    for t in tris:
        cc = TR._circumcircle(*pts[list(t)])
        assert cc is not None
        for i in range(len(pts)):
            if i in t:
                continue
            d2 = (pts[i, 0] - cc[0]) ** 2 + (pts[i, 1] - cc[1]) ** 2
            assert d2 >= cc[2] * (1 - 1e-9)
    # total triangulated area == convex hull area
    from spark_geo.kernel import construct as C
    hull = C.convex_hull(Geom(4, parts=[Geom.point(x, y) for x, y in pts]))
    total = sum(abs(M.ring_area(np.vstack([pts[list(t)], pts[[t[0]]]]))) for t in tris)
    assert total == pytest.approx(M.area(hull), rel=1e-9)


def test_voronoi_grid():
    sites = [(x, y) for x in (0.0, 2.0, 4.0) for y in (0.0, 2.0)]
    g = Geom(4, parts=[Geom.point(x, y) for x, y in sites])
    v = TR.voronoi_polygons(g)
    assert v.type_id == 7 and len(v.parts) == 6
    # each cell covers its own site and no other
    for cell in v.parts:
        inside = [s for s in sites if P.covers(cell, Geom.point(*s))]
        assert len(inside) >= 1
    # cells partition the clip window: total area == window area
    total = sum(M.area(c) for c in v.parts)
    # window = bbox expanded by (dx, dy) = (4+8) x (2+4)
    assert total == pytest.approx(12.0 * 6.0, rel=1e-9)
    # nearest-site property at a probe point
    probe = (1.9, 0.1)
    d = [np.hypot(probe[0] - s[0], probe[1] - s[1]) for s in sites]
    covering = [i for i, c in enumerate(v.parts)
                if P.covers(c, Geom.point(*probe))]
    assert len(covering) == 1


def test_voronoi_degenerate():
    assert TR.voronoi_polygons(Geom.point(1, 1)).is_empty
    assert TR.voronoi_polygons(None) is None
    assert TR.delaunay_triangles(Geom.point(1, 1)).is_empty


def test_spark_triangulate(spark):
    from spark_geo import functions as SG
    df = spark.createDataFrame([("MULTIPOINT (0 0, 1 0, 1 1, 0 1)",)], "wkt string") \
        .withColumn("g", SG.st_from_wkt("wkt"))
    r = df.select(
        SG.st_area(SG.st_delaunay_triangles("g")).alias("da"),
        SG.st_num_geometries(SG.st_voronoi_polygons("g")).alias("nv"),
    ).first()
    assert r["da"] == pytest.approx(1.0)
    assert r["nv"] == 4
