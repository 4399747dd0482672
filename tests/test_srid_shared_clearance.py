"""SRID (EWKB), shared_paths, minimum_clearance tests."""

import numpy as np
from pyspark.sql import functions as F

from spark_geo.kernel import linear as L
from spark_geo.kernel import measure as M
from spark_geo.kernel import wkb, wkt
from spark_geo.kernel.geom import Geom


def test_srid_roundtrip_kernel():
    g = Geom.point(13.4, 52.5)
    g.srid = 4326
    b = wkb.dumps(g)
    g2 = wkb.loads(b)
    assert g2.srid == 4326
    assert tuple(g2.coords[0]) == (13.4, 52.5)
    # unset srid adds no EWKB header bytes
    g3 = Geom.point(1, 2)
    assert len(wkb.dumps(g3)) == 21


def test_shared_paths():
    a = Geom.linestring([(0, 0), (10, 0)])
    b = Geom.linestring([(2, 0), (5, 0), (5, 5)])
    sp = L.shared_paths(a, b)
    assert sp.type_id == 7 and len(sp.parts) == 2
    same, opposite = sp.parts
    assert M.length(same) == 3.0  # shared [2,5] along x
    assert M.length(opposite) == 0.0
    # reversed second line -> opposite-direction bucket
    b_rev = Geom.linestring([(5, 0), (2, 0)])
    sp2 = L.shared_paths(a, b_rev)
    assert M.length(sp2.parts[0]) == 0.0 and M.length(sp2.parts[1]) == 3.0
    assert L.shared_paths(None, a) is None
    # disjoint lines share nothing
    sp3 = L.shared_paths(a, Geom.linestring([(0, 5), (1, 5)]))
    assert M.length(sp3.parts[0]) == 0.0 and M.length(sp3.parts[1]) == 0.0


def test_minimum_clearance():
    # unit box: closest vertex pair at distance 1
    assert M.minimum_clearance(Geom.box(0, 0, 1, 1)) == 1.0
    # thin sliver: clearance is the small height
    sliver = wkt.from_wkt("POLYGON ((0 0, 10 0, 10 0.25, 0 0.25, 0 0))")
    assert M.minimum_clearance(sliver) == 0.25
    assert M.minimum_clearance(Geom.point(1, 1)) == np.inf
    assert np.isnan(M.minimum_clearance(None))


def test_spark_srid_shared_clearance(spark):
    from spark_geo import functions as SG
    df = spark.createDataFrame([("POINT (13.4 52.5)",)], "wkt string") \
        .withColumn("g", SG.st_from_wkt("wkt"))
    r = df.select(
        SG.st_srid("g").alias("s0"),
        SG.st_srid(SG.st_set_srid("g", 4326)).alias("s1"),
        SG.st_x(SG.st_set_srid("g", 4326)).alias("x"),
        SG.st_minimum_clearance(SG.st_from_wkt(F.lit(
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))).alias("mc"),
        SG.st_length(SG.st_shared_paths(
            SG.st_from_wkt(F.lit("LINESTRING (0 0, 10 0)")),
            SG.st_from_wkt(F.lit("LINESTRING (2 0, 5 0)")))).alias("sp_len"),
    ).first()
    assert r["s0"] == 0 and r["s1"] == 4326
    assert r["x"] == 13.4  # srid-tagged WKB still decodes coordinates
    assert r["mc"] == 1.0
    assert r["sp_len"] == 3.0

def test_sql_registration(spark):
    from spark_geo import functions as SG
    names = SG.register_sql_functions(spark)
    assert len(names) > 50
    df = spark.createDataFrame([("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",)], "wkt string")
    df.createOrReplaceTempView("shapes")
    r = spark.sql("""
        SELECT st_area(st_from_wkt(wkt)) AS a,
               st_geom_type(st_from_wkt(wkt)) AS t,
               st_as_wkt(st_centroid(st_from_wkt(wkt))) AS c,
               st_contains(st_from_wkt(wkt), st_point(1.0D, 1.0D)) AS inside
        FROM shapes
    """).first()
    assert r["a"] == 4.0 and r["t"] == "POLYGON"
    assert r["c"] == "POINT (1 1)" and r["inside"] is True
