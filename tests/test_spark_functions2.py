"""Spark tests for the extended st_* surface (accessors, linear
referencing, coordinates, overlay)."""

import numpy as np
from pyspark.sql import functions as F

from spark_geo import functions as SG


def _df1(spark, wkt_str):
    return spark.createDataFrame([(wkt_str,)], "wkt string") \
        .withColumn("g", SG.st_from_wkt("wkt"))


def test_unary_predicates(spark):
    df = spark.createDataFrame([
        ("LINESTRING (0 0, 1 0, 1 1, 0 0)",),
        ("LINESTRING (0 0, 2 2, 2 0, 0 2)",),
        (None,)], "wkt string").withColumn("g", SG.st_from_wkt("wkt"))
    got = df.select(SG.st_is_closed("g").alias("c"),
                    SG.st_is_ring("g").alias("r"),
                    SG.st_is_simple("g").alias("s"),
                    SG.st_is_valid("g").alias("v")).collect()
    assert (got[0]["c"], got[0]["r"], got[0]["s"]) == (True, True, True)
    assert (got[1]["c"], got[1]["s"]) == (False, False)
    assert (got[2]["c"], got[2]["r"], got[2]["s"]) == (False, False, False)


def test_accessor_columns(spark):
    df = _df1(spark, "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    r = df.select(
        SG.st_num_interior_rings("g").alias("nir"),
        SG.st_dimensions("g").alias("dim"),
        SG.st_as_wkt(SG.st_exterior_ring("g")).alias("ext"),
        SG.st_length(SG.st_interior_ring("g", 0)).alias("hole_len"),
    ).first()
    assert r["nir"] == 1 and r["dim"] == 2
    # rings degrade to LINESTRING through WKB storage — same as the
    # reference's to_wkb (WKB has no LINEARRING type)
    assert r["ext"] == "LINESTRING (0 0, 0 10, 10 10, 10 0, 0 0)"
    assert r["hole_len"] == 8.0


def test_point_n_and_coords_explode(spark):
    df = _df1(spark, "LINESTRING (0 0, 1 0, 1 1)")
    r = df.select(SG.st_as_wkt(SG.st_point_n("g", -1)).alias("last"),
                  SG.st_num_points("g").alias("n")).first()
    assert r["last"] == "POINT (1 1)" and r["n"] == 3
    ex = df.select(F.posexplode(SG.st_coords("g")).alias("i", "c")) \
        .select("i", "c.x", "c.y").collect()
    assert [(r["i"], r["x"], r["y"]) for r in ex] == [(0, 0, 0), (1, 1, 0), (2, 1, 1)]


def test_transform_coords(spark):
    # the reference's apply() surface: shift all coordinates by (10, 20)
    df = _df1(spark, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    shifted = df.select(SG.st_as_wkt(
        SG.st_transform_coords("g", lambda c: c + np.array([10.0, 20.0]))).alias("w")).first()
    assert shifted["w"] == "POLYGON ((10 20, 11 20, 11 21, 10 21, 10 20))"


def test_linear_referencing(spark):
    df = _df1(spark, "LINESTRING (0 0, 10 0)")
    r = df.select(
        SG.st_as_wkt(SG.st_line_interpolate_point("g", 2.5)).alias("p"),
        SG.st_line_locate_point("g", SG.st_from_wkt(F.lit("POINT (3 5)"))).alias("loc"),
    ).first()
    assert r["p"] == "POINT (2.5 0)" and r["loc"] == 3.0


def test_shortest_line_and_merge(spark):
    df = spark.createDataFrame(
        [("POINT (0 5)", "LINESTRING (0 0, 10 0)")], "a string, b string")
    r = df.select(SG.st_length(SG.st_shortest_line(
        SG.st_from_wkt("a"), SG.st_from_wkt("b"))).alias("d")).first()
    assert r["d"] == 5.0
    m = _df1(spark, "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))") \
        .select(SG.st_geom_type(SG.st_line_merge("g")).alias("t")).first()
    assert m["t"] == "LINESTRING"


def test_overlay_and_distances(spark):
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")],
        "a string, b string")
    r = df.select(
        SG.st_area(SG.st_intersection(SG.st_from_wkt("a"), SG.st_from_wkt("b"))).alias("ia"),
        SG.st_hausdorff_distance(SG.st_from_wkt("a"), SG.st_from_wkt("b")).alias("h"),
        SG.st_minimum_bounding_radius(SG.st_from_wkt("a")).alias("r"),
        SG.st_equals_exact(SG.st_from_wkt("a"), SG.st_from_wkt("a")).alias("eq"),
    ).first()
    assert r["ia"] == 4.0
    assert abs(r["h"] - np.hypot(2, 2)) < 1e-12
    assert abs(r["r"] - np.hypot(2, 2)) < 1e-12
    assert r["eq"] is True


def test_rings_explode(spark):
    df = _df1(spark, "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    n = df.select(F.explode(SG.st_rings("g"))).count()
    assert n == 2


def test_malformed_wkb_fuzz(spark):
    """Poisoned binary rows must surface as NULL/False/NaN, never kill
    the job (100 TB robustness: one bad row of 10^12 cannot fail the
    stage)."""
    import random
    random.seed(42)
    rows = [(bytes([random.randrange(256) for _ in range(random.randrange(0, 40))]),)
            for _ in range(50)] + [(None,), (b"",), (b"\x01\x01\x00\x00\x00",)]
    df = spark.createDataFrame(rows, "g binary")
    got = df.select(
        SG.st_area("g").alias("a"),
        SG.st_geom_type("g").alias("t"),
        SG.st_is_empty("g").alias("e"),
        SG.st_x("g").alias("x"),
        SG.st_as_wkt("g").alias("w"),
        SG.st_intersects("g", "g").alias("i"),
        SG.st_relate("g", "g").alias("m"),
    ).collect()
    assert len(got) == 53  # every row survived
    # at least the obviously-junk rows are NULL/False
    for r in got:
        assert r["a"] is None or isinstance(r["a"], float)


def test_null_empty_poisoned_sweep(spark):
    """Every fixed-signature st_* function must survive NULL, EMPTY,
    and MALFORMED binary rows without failing the task (the 10^12-row
    poisoned-row invariant).  Unary functions run over all three rows;
    binary ones over their cross-pairs."""
    import inspect
    from pyspark.sql import functions as F
    from spark_geo import functions as SG
    from spark_geo.kernel import wkb as K_wkb
    from spark_geo.kernel.geom import Geom

    rows = [(0, None),
            (1, K_wkb.dumps(Geom(3))),                   # POLYGON EMPTY
            (2, b"\x01\x99\x00\x00garbage"),             # malformed
            (3, K_wkb.dumps(Geom.box(0, 0, 2, 2)))]
    df = spark.createDataFrame(rows, "id long, g binary")
    names = SG.register_sql_functions(spark)
    non_geom_input = {"st_point", "st_from_wkt", "st_from_geojson",
                      "st_cell_boundary"}
    checked = 0
    for name in names:
        if name in non_geom_input:
            continue
        fn = getattr(SG, name)
        try:
            n_args = len(inspect.signature(fn.func).parameters)
        except (AttributeError, ValueError, TypeError):
            continue
        try:
            if n_args == 1:
                df.select(fn(F.col("g")).alias("r")).collect()
            elif n_args == 2 and name not in ("st_point",):
                df.crossJoin(df.select(F.col("g").alias("g2"))) \
                  .select(fn(F.col("g"), F.col("g2")).alias("r")).collect()
            else:
                continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(f"{name} failed on poisoned rows: {e}") from e
        checked += 1
    assert checked >= 50, f"only {checked} functions swept"
