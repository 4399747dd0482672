"""sources.py: pages/tiles read/write with partition pruning."""

from pyspark.sql import functions as F

from spark_geo import pipeline as PL
from spark_geo import sources as SRC
from spark_geo import tiles as TL


def test_write_read_pages_partitioned(spark, tmp_path):
    path = str(tmp_path / "pages")
    pages = PL.synth_pages(spark, 300)
    SRC.write_pages(pages, path)
    back = SRC.read_pages(spark, path)
    assert back.count() == 300
    assert set(back.columns) == set(pages.columns)
    # lang partition pruning reaches the scan
    plan = back.where(F.col("lang") == "en")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan


def test_write_read_tiles(spark, tmp_path):
    path = str(tmp_path / "tiles")
    pts = TL.assign_cells(PL.geocode(PL.synth_pages(spark, 200)), "lon", "lat", 6)
    stats = TL.tile_stats(pts)
    SRC.write_tiles(stats, path, parent_res=2)
    back = SRC.read_tiles(spark, path)
    assert back.agg(F.sum("n")).first()[0] == 200
    assert "cell_prefix" in back.columns


def test_iceberg_negotiation(spark, tmp_path):
    # no iceberg jars in this container: auto falls back to parquet
    assert SRC.iceberg_available(spark) is False
    path = str(tmp_path / "p2")
    SRC.write_pages(PL.synth_pages(spark, 50), path)
    assert SRC.read_pages(spark, path, fmt="auto").count() == 50


def test_bucketed_cell_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed by the cell key equi-join with ZERO
    exchanges — the co-located-join pre-partitioning for repeated
    pages x layer-cover joins."""
    import re
    from pyspark.sql import functions as F
    from spark_geo import sources as SRC

    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("cell"))
    b = spark.range(500).select(
        (F.col("id") % 97).alias("cell"), (F.col("id") * 2).alias("v"))
    SRC.write_bucketed_by_cell(a, "bkt_a_test", n_buckets=8)
    SRC.write_bucketed_by_cell(b, "bkt_b_test", n_buckets=8)
    try:
        ra, rb = SRC.read_bucketed(spark, "bkt_a_test"), SRC.read_bucketed(spark, "bkt_b_test")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ra.join(rb, "cell")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert len(re.findall(r"Exchange", plan)) == 0, plan[:1500]
            assert j.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a_test")
        spark.sql("DROP TABLE IF EXISTS bkt_b_test")
