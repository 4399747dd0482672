"""Spatial-join tests through Spark: the reference's query_bulk golden
outputs driven as DataFrame joins (SURVEY.md §5 step 2), plus
broadcast ≡ cell-join equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_geo import functions as SG
from spark_geo import join as SJ
from spark_geo import knn as SK
from spark_geo.kernel import construct as K_con
from spark_geo.kernel import wkb as K_wkb
from spark_geo.kernel.geom import Geom


@pytest.fixture(scope="module")
def point_tree_df(spark):
    # reference point_tree fixture: POINT (i i), i = 0..9
    rows = [(i, K_wkb.dumps(Geom.point(i, i))) for i in range(10)]
    return spark.createDataFrame(rows, "right_id long, geom binary")


@pytest.fixture(scope="module")
def probe_boxes_df(spark):
    rows = [(0, K_wkb.dumps(Geom.box(2, 2, 4, 4))),
            (1, K_wkb.dumps(Geom.box(5, 5, 6, 6)))]
    return spark.createDataFrame(rows, "left_id long, geom binary")


def _pairs(df, l="left_id", r="right_id"):
    return sorted((row[l], row[r]) for row in df.collect())


def test_broadcast_join_golden_boxes(spark, probe_boxes_df, point_tree_df):
    # reference strtree.py:183-196: query_bulk([box(2,2,4,4), box(5,5,6,6)])
    # -> [[0,0,0,1,1],[2,3,4,5,6]]
    out = SJ.broadcast_spatial_join(probe_boxes_df, point_tree_df,
                                    predicate="intersects",
                                    right_id="right_id")
    assert _pairs(out) == [(0, 2), (0, 3), (0, 4), (1, 5), (1, 6)]


def test_broadcast_join_contains_golden(spark, probe_boxes_df, point_tree_df):
    out = SJ.broadcast_spatial_join(probe_boxes_df, point_tree_df,
                                    predicate="contains", right_id="right_id")
    assert _pairs(out) == [(0, 3)]  # boundary points excluded


def test_broadcast_join_points_left_fast_path(spark, point_tree_df):
    # points as the (big) left side vs polygon layer: vectorized PIP path
    pts = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(6)], "left_id long, lon double, lat double"
    ).withColumn("geom", SG.st_point("lon", "lat"))
    boxes = spark.createDataFrame(
        [(0, K_wkb.dumps(Geom.box(2, 2, 4, 4)))], "right_id long, geom binary")
    within = SJ.broadcast_spatial_join(pts, boxes, predicate="within",
                                       left_geom="geom", right_id="right_id")
    assert _pairs(within) == [(3, 0)]
    inter = SJ.broadcast_spatial_join(pts, boxes, predicate="intersects",
                                      left_geom="geom", right_id="right_id")
    assert _pairs(inter) == [(2, 0), (3, 0), (4, 0)]
    touch = SJ.broadcast_spatial_join(pts, boxes, predicate="touches",
                                      left_geom="geom", right_id="right_id")
    assert _pairs(touch) == [(2, 0), (4, 0)]


def test_broadcast_join_dwithin(spark, point_tree_df):
    pts = spark.createDataFrame([(0, 0.5, 0.5)], "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    out = SJ.broadcast_spatial_join(pts, point_tree_df, predicate="dwithin",
                                    distance=1.0, right_id="right_id")
    # reference strtree.py:100-107: -> tree items 0 and 1
    assert _pairs(out) == [(0, 0), (0, 1)]


def test_broadcast_join_drops_null_and_empty(spark, point_tree_df):
    from spark_geo.kernel.geom import POINT
    pts = spark.createDataFrame(
        [(0, K_wkb.dumps(Geom.point(3, 3))), (1, None),
         (2, K_wkb.dumps(Geom(POINT)))], "left_id long, geom binary")
    out = SJ.broadcast_spatial_join(pts, point_tree_df, predicate="intersects",
                                    right_id="right_id")
    assert _pairs(out) == [(0, 3)]


def test_broadcast_join_poly_tree(spark):
    # buffered-circle tree (reference test_strtree.py poly fixture)
    r = np.sqrt(2) / 2 + 1e-9
    polys = [(i, K_wkb.dumps(K_con.buffer(Geom.point(i, i), r, quadsegs=32)))
             for i in range(10)]
    layer = spark.createDataFrame(polys, "right_id long, geom binary")
    pts = spark.createDataFrame([(0, 3.0, 3.0), (1, 0.5, 0.5)],
                                "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    out = SJ.broadcast_spatial_join(pts, layer, predicate="intersects",
                                    left_geom="geom", right_id="right_id")
    # (0.5, 0.5) is within r of both circles 0 and 1
    assert _pairs(out) == [(0, 3), (1, 0), (1, 1)]


def test_cell_join_equals_broadcast(spark):
    # 500 deterministic points vs 12 boxes: the two physical plans must
    # produce identical logical results
    pts = spark.range(500).select(
        F.col("id").alias("left_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(3600)) / 10.0 - 180.0).alias("lon"),
        (F.pmod(F.col("id") * 53 + 29, F.lit(1800)) / 10.0 - 90.0).alias("lat"),
    ).withColumn("geom", SG.st_point("lon", "lat"))
    boxes = [(j, K_wkb.dumps(Geom.box(-180 + j * 30, -90 + (j % 6) * 30,
                                      -180 + j * 30 + 25, -90 + (j % 6) * 30 + 25)))
             for j in range(12)]
    layer = spark.createDataFrame(boxes, "right_id long, geom binary")
    b = SJ.broadcast_spatial_join(pts, layer, predicate="intersects",
                                  left_geom="geom", right_id="right_id")
    c = SJ.cell_spatial_join(pts, layer, predicate="intersects",
                             left_geom="geom", right_geom="geom",
                             left_id="left_id", right_id="right_id", res=5,
                             left_is_points=True)
    assert _pairs(b.select("left_id", "right_id")) == _pairs(c)


def test_cell_join_dwithin_equals_broadcast(spark, point_tree_df):
    pts = spark.createDataFrame([(0, 0.5, 0.5), (1, 7.2, 7.2)],
                                "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    b = SJ.broadcast_spatial_join(pts, point_tree_df, predicate="dwithin",
                                  distance=1.0, right_id="right_id")
    c = SJ.cell_spatial_join(pts, point_tree_df, predicate="dwithin",
                             distance=1.0, left_id="left_id",
                             right_id="right_id", res=6, left_is_points=True)
    assert _pairs(b.select("left_id", "right_id")) == _pairs(c)


# -- kNN ----------------------------------------------------------------

def test_nearest_all_ties(spark, point_tree_df):
    pts = spark.createDataFrame([(0, 0.5, 0.5), (1, 1.1, 1.1)],
                                "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    out = SK.broadcast_nearest_all(pts, point_tree_df, left_geom="geom",
                                   right_id="right_id")
    got = sorted((r["left_id"], r["right_id"], round(r["distance"], 9))
                 for r in out.collect())
    d = round(float(np.sqrt(2) / 2), 9)
    assert got == [(0, 0, d), (0, 1, d), (1, 1, round(np.hypot(.1, .1), 9))]


def test_nearest_deterministic_tiebreak(spark, point_tree_df):
    pts = spark.createDataFrame([(0, 0.5, 0.5)], "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    out = SK.nearest(pts, point_tree_df, left_geom="geom", right_id="right_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["right_id"] == 0


def test_nearest_all_max_distance(spark, point_tree_df):
    pts = spark.createDataFrame([(0, 0.5, 0.5)], "left_id long, lon double, lat double") \
        .withColumn("geom", SG.st_point("lon", "lat"))
    out = SK.broadcast_nearest_all(pts, point_tree_df, left_geom="geom",
                                   right_id="right_id", max_distance=0.1)
    assert out.count() == 0


def test_cell_nearest_all_equals_broadcast(spark):
    pts = spark.range(40).select(
        F.col("id").alias("left_id"),
        (F.pmod(F.col("id") * 17 + 5, F.lit(200)) / 10.0).alias("lon"),
        (F.pmod(F.col("id") * 23 + 9, F.lit(160)) / 10.0).alias("lat"),
    ).withColumn("geom", SG.st_point("lon", "lat"))
    targets = spark.range(15).select(
        F.col("id").alias("right_id"),
        (F.pmod(F.col("id") * 41 + 3, F.lit(200)) / 10.0).alias("lon"),
        (F.pmod(F.col("id") * 31 + 7, F.lit(160)) / 10.0).alias("lat"),
    ).withColumn("geom", SG.st_point("lon", "lat"))
    b = SK.broadcast_nearest_all(pts, targets, left_geom="geom", right_id="right_id")
    c = SK.cell_nearest_all(pts, targets, left_geom="geom", right_geom="geom",
                            left_id="left_id", right_id="right_id",
                            res=5, max_rings=20)
    bp = sorted((r["left_id"], r["right_id"]) for r in b.collect())
    cp = sorted((r["left_id"], r["right_id"]) for r in c.collect())
    assert bp == cp


def test_cell_join_geoms_equals_broadcast(spark):
    """General (non-point) left geometries through the vectorized
    many-vs-one refine: boxes, lines and points as WKB lefts vs a box
    layer, intersects + dwithin, cell plan ≡ broadcast plan."""
    lefts = []
    for i in range(120):
        cx = (i * 37 % 360) - 180.0
        cy = (i * 53 % 170) - 85.0
        kind = i % 3
        if kind == 0:
            g = Geom.box(cx, cy, cx + 8, cy + 6)
        elif kind == 1:
            g = Geom.linestring([(cx, cy), (cx + 10, cy + 4), (cx + 3, cy + 9)])
        else:
            g = Geom.point(cx, cy)
        lefts.append((i, K_wkb.dumps(g)))
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    boxes = [(j, K_wkb.dumps(Geom.box(-180 + j * 30, -90 + (j % 6) * 30,
                                      -180 + j * 30 + 25, -90 + (j % 6) * 30 + 25)))
             for j in range(12)]
    layer = spark.createDataFrame(boxes, "right_id long, geom binary")
    for pred, dist in [("intersects", None), ("dwithin", 3.0)]:
        b = SJ.broadcast_spatial_join(left, layer, predicate=pred,
                                      distance=dist, right_id="right_id")
        c = SJ.cell_spatial_join(left, layer, predicate=pred, distance=dist,
                                 left_id="left_id", right_id="right_id",
                                 res=4, left_is_points=False)
        assert _pairs(b.select("left_id", "right_id")) == _pairs(c), pred


def test_cell_join_default_safe_for_polygons(spark):
    """r4: the DEFAULT cell_spatial_join path (no left_is_points flag)
    must be correct for polygon lefts — the point fast path is opt-in
    (a polygon under it silently dropped pairs)."""
    lefts = [(i, K_wkb.dumps(Geom.box(-30 + i * 7.0, -20 + i * 5.0,
                                      -27 + i * 7.0, -17 + i * 5.0)))
             for i in range(8)]
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    boxes = [(j, K_wkb.dumps(Geom.box(-32 + j * 11.0, -22 + j * 8.0,
                                      -28 + j * 11.0, -18 + j * 8.0)))
             for j in range(6)]
    layer = spark.createDataFrame(boxes, "right_id long, geom binary")
    b = SJ.broadcast_spatial_join(left, layer, predicate="intersects",
                                  right_id="right_id")
    c = SJ.cell_spatial_join(left, layer, predicate="intersects",
                             left_id="left_id", right_id="right_id", res=5)
    s = SJ.spatial_join(left, layer, predicate="intersects",
                        left_id="left_id", right_id="right_id",
                        strategy="cell", res=5)
    want = _pairs(b.select("left_id", "right_id"))
    assert _pairs(c) == want
    assert _pairs(s) == want


def test_cell_join_shuffles_ids_only(spark):
    """Scale property (r4): the two-phase cell join's only hash
    exchange carries the (_lid, _rid) id pair — WKB geometry columns
    never cross a shuffle (they rejoin via broadcast by id)."""
    import re
    lefts = [(i, K_wkb.dumps(Geom.box(i * 5.0, 0, i * 5.0 + 4, 4)))
             for i in range(10)]
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    layer = spark.createDataFrame(
        [(7, K_wkb.dumps(Geom.box(0, 0, 50, 50)))],
        "right_id long, geom binary")
    df = SJ.cell_spatial_join(left, layer, predicate="within",
                              left_id="left_id", right_id="right_id",
                              res=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if re.search(r"\bExchange hashpartitioning", line):
            assert "geom" not in line and "binary" not in line, line


def test_cell_join_geoms_scalar_fallback_predicate(spark):
    """Predicates without a batch path (within) still refine exactly
    via the scalar kernels over bbox survivors."""
    lefts = [(0, K_wkb.dumps(Geom.box(1, 1, 3, 3))),     # inside
             (1, K_wkb.dumps(Geom.box(-5, -5, 40, 40))),  # covers layer box
             (2, K_wkb.dumps(Geom.box(50, 50, 60, 60)))]  # disjoint
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    layer = spark.createDataFrame([(7, K_wkb.dumps(Geom.box(0, 0, 30, 30)))],
                                  "right_id long, geom binary")
    c = SJ.cell_spatial_join(left, layer, predicate="within",
                             left_id="left_id", right_id="right_id",
                             res=4, left_is_points=False)
    assert _pairs(c) == [(0, 7)]


def test_cell_nearest_all_geoms_equals_broadcast(spark):
    """General-geometry distributed nearest (cover-seeded ring
    expansion) ≡ broadcast STRtree nearest_all on a mixed fixture of
    boxes, lines and points (reference nearest_all accepts any
    geometry, strtree.py:278)."""
    lefts = []
    for i in range(40):
        cx = (i * 37 % 80) - 40.0
        cy = (i * 53 % 60) - 30.0
        if i % 3 == 0:
            g = Geom.box(cx, cy, cx + 3, cy + 2)
        elif i % 3 == 1:
            g = Geom.linestring([(cx, cy), (cx + 4, cy + 1.5)])
        else:
            g = Geom.point(cx, cy)
        lefts.append((i, K_wkb.dumps(g)))
    rights = []
    for j in range(15):
        cx = (j * 61 % 80) - 40.0 + 0.375
        cy = (j * 29 % 60) - 30.0 + 0.375
        g = Geom.box(cx, cy, cx + 2, cy + 2) if j % 2 else \
            Geom.linestring([(cx, cy), (cx + 3, cy - 1)])
        rights.append((j, K_wkb.dumps(g)))
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    right = spark.createDataFrame(rights, "right_id long, geom binary")
    b = SK.broadcast_nearest_all(left, right, right_id="right_id")
    c = SK.cell_nearest_all(left, right, res=5, max_rings=40,
                            assume_points=False)
    bp = sorted((r["left_id"], r["right_id"], round(r["distance"], 9))
                for r in b.collect())
    cp = sorted((r["left_id"], r["right_id"], round(r["distance"], 9))
                for r in c.collect())
    assert bp == cp


def test_cell_join_relate_pattern(spark):
    """r5: relate_pattern as a cell-join predicate.  Mixed box/line
    lefts vs a box layer with three patterns (area-overlaps, the
    generic 'interiors intersect' gate pattern, and crosses-for-lines);
    cell plan ≡ brute-force scalar relate_pattern over all pairs."""
    from spark_geo.kernel import relate as K_rel
    lefts = []
    for i in range(90):
        cx = (i * 37 % 360) - 180.0
        cy = (i * 53 % 170) - 85.0
        if i % 2 == 0:
            g = Geom.box(cx, cy, cx + 8, cy + 6)
        else:
            g = Geom.linestring([(cx - 2, cy - 1), (cx + 9, cy + 5)])
        lefts.append((i, K_wkb.dumps(g)))
    rights = [(j, K_wkb.dumps(Geom.box(-180 + j * 30, -90 + (j % 6) * 30,
                                       -180 + j * 30 + 25,
                                       -90 + (j % 6) * 30 + 25)))
              for j in range(12)]
    left = spark.createDataFrame(lefts, "left_id long, geom binary")
    layer = spark.createDataFrame(rights, "right_id long, geom binary")
    lg = {i: K_wkb.loads(w) for i, w in lefts}
    rg = {j: K_wkb.loads(w) for j, w in rights}
    for pat in ["T*T***T**", "T********", "0********"]:
        got = _pairs(SJ.cell_spatial_join(
            left, layer, predicate="relate_pattern", pattern=pat,
            left_id="left_id", right_id="right_id", res=4))
        want = sorted((a, b) for a in lg for b in rg
                      if K_rel.relate_pattern(lg[a], rg[b], pat))
        assert got == want, pat


def test_cell_join_relate_pattern_rejects_nonintersecting(spark):
    """A pattern satisfiable by disjoint pairs (all II/IB/BI/BB slots
    F or *) is a cross join — candidate generation by cell overlap
    cannot answer it, so the join must refuse."""
    df = spark.createDataFrame([(0, K_wkb.dumps(Geom.point(0, 0)))],
                               "left_id long, geom binary")
    with pytest.raises(ValueError, match="does not require"):
        SJ.cell_spatial_join(df, df, predicate="relate_pattern",
                             pattern="FF*FF****", right_id="left_id")
    with pytest.raises(ValueError, match="invalid DE-9IM"):
        SJ.cell_spatial_join(df, df, predicate="relate_pattern",
                             pattern="T*T", right_id="left_id")
    with pytest.raises(ValueError):
        SJ.cell_spatial_join(df, df, predicate="relate_pattern",
                             pattern=None, right_id="left_id")
    with pytest.raises(ValueError, match="left_is_points"):
        SJ.cell_spatial_join(df, df, predicate="relate_pattern",
                             pattern="T********", left_is_points=True,
                             right_id="left_id")
    with pytest.raises(ValueError, match="only valid"):
        SJ.cell_spatial_join(df, df, predicate="intersects",
                             pattern="T********", right_id="left_id")


def test_broadcast_right_side_guard(spark):
    """VERDICT r5 item 4: the direct broadcast APIs must refuse an
    oversized right side with an actionable error, not driver-OOM."""
    import pytest
    from spark_geo import join as SJ, knn as SK
    from spark_geo import functions as SG
    from pyspark.sql import functions as F
    big = (spark.range(0, 500)
           .select(F.col("id").alias("right_id"),
                   SG.st_point(F.rand(seed=1) * 10,
                               F.rand(seed=2) * 10).alias("geom")))
    left = spark.range(0, 4).select(
        F.col("id").alias("left_id"),
        SG.st_point(F.lit(1.0), F.lit(2.0)).alias("point"))
    with pytest.raises(ValueError, match="right side exceeds"):
        SJ.broadcast_spatial_join(left, big, predicate="intersects",
                                  left_geom="point", right_id="right_id",
                                  max_right_rows=100)
    with pytest.raises(ValueError, match="right side exceeds"):
        SJ.broadcast_lonlat_join(
            left.select("left_id", F.lit(1.0).alias("lon"),
                        F.lit(2.0).alias("lat")),
            big, predicate="intersects", right_id="right_id",
            keep=["left_id"], max_right_rows=100)
    with pytest.raises(ValueError, match="right side exceeds"):
        SK.broadcast_nearest_all(left, big, left_geom="point",
                                 right_id="right_id", max_right_rows=100)
    with pytest.raises(ValueError, match="right side exceeds"):
        SK.nearest_all_lonlat(
            left.select("left_id", F.lit(1.0).alias("lon"),
                        F.lit(2.0).alias("lat")),
            big, right_id="right_id", keep=["left_id"],
            max_right_rows=100)
    # within the cap: works
    n = SJ.broadcast_spatial_join(left, big, predicate="intersects",
                                  left_geom="point",
                                  right_id="right_id").count()
    assert n >= 0


def test_right_lonlat_parity_with_null_rows(spark):
    """r6: the right_lon/right_lat collect path must produce the same
    pairs as the WKB right side when the right table contains NULL and
    partial coordinates."""
    from spark_geo import join as SJ, knn as SK
    from spark_geo import functions as SG
    from pyspark.sql import functions as F
    rows = [(0, 1.0, 1.0), (1, None, 2.0), (2, 3.0, None),
            (3, None, None), (4, 2.0, 2.0), (5, 1.5, 1.2)]
    right = spark.createDataFrame(rows, "right_id long, lon double, lat double")
    right_wkb = right.select("right_id",
                             SG.st_point("lon", "lat").alias("geom"))
    left = spark.createDataFrame(
        [(10, 1.1, 1.1), (11, 2.0, 2.0), (12, 8.0, 8.0)],
        "left_id long, lon double, lat double")
    a = sorted((r[0], r[1]) for r in SJ.broadcast_lonlat_join(
        left, right, lon="lon", lat="lat", predicate="dwithin",
        distance=1.0, right_id="right_id", keep=["left_id"],
        right_lon="lon", right_lat="lat").collect())
    b = sorted((r[0], r[1]) for r in SJ.broadcast_lonlat_join(
        left, right_wkb, lon="lon", lat="lat", predicate="dwithin",
        distance=1.0, right_id="right_id", keep=["left_id"]).collect())
    assert a == b
    a = sorted(tuple(r) for r in SK.nearest_lonlat(
        left, right, lon="lon", lat="lat", right_id="right_id",
        keep=["left_id"], right_lon="lon", right_lat="lat")
        .select("left_id", "right_id", "distance").collect())
    b = sorted(tuple(r) for r in SK.nearest_lonlat(
        left, right_wkb, lon="lon", lat="lat", right_id="right_id",
        keep=["left_id"]).select("left_id", "right_id",
                                 "distance").collect())
    assert a == b
