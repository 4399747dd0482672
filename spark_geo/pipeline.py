"""The pages pipeline: Common-Crawl-style input table → geocode →
cell-encode → spatial join → tiles, with skew salting and
checkpoint/resume (BASELINE.json north_star / north_rule).

Input schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Invariant: extracted ``text`` is byte-identical per url — extraction
is a JVM-side regexp over the html body, and nothing downstream
rewrites it (verified by ``text_identity_violations``).

Everything before the geometry construction stays JVM-side (regexp
extraction, casts) so Catalyst can push filters/pruning into the scan;
only point construction + cell assignment enter Python, Arrow-batched.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from . import functions as SG
from . import join as SJ
from .kernel import wkb as K_wkb
from .kernel.geom import Geom

HOT_CITIES = [(-74.0060, 40.7128), (2.3522, 48.8566), (139.6917, 35.6895)]
LANGS = ["en", "de", "fr", "es", "pt"]


# ---------------------------------------------------------------------------
# deterministic synthetic pages (FIXTURES.md §1; seedless pure arithmetic)
# ---------------------------------------------------------------------------

def synth_pages(spark: SparkSession, n: int, hot_frac_denom: int = 5,
                partitions: int | None = None) -> DataFrame:
    """Deterministic CC-style pages table from ``spark.range`` — pure
    column arithmetic (LCG-style hashing), so any scale factor is
    reproducible with no external data and no Python row loop.

    20% of rows (id % hot_frac_denom == 0) cluster around 3 hot cities
    to exercise salting (FIXTURES.md §1 skew knob)."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    u1 = (F.pmod(F.col("id") * 48271 + 7, F.lit(1000003)) / 1000003.0)
    u2 = (F.pmod(F.col("id") * 16807 + 3, F.lit(999983)) / 999983.0)
    base_lon = u1 * 360.0 - 180.0
    base_lat = u2 * 180.0 - 90.0
    hot = F.pmod(F.col("id"), F.lit(hot_frac_denom)) == 0
    city = F.pmod(F.col("id"), F.lit(3))
    hot_lon = (F.when(city == 0, HOT_CITIES[0][0])
               .when(city == 1, HOT_CITIES[1][0])
               .otherwise(HOT_CITIES[2][0]) + (u1 - 0.5))
    hot_lat = (F.when(city == 0, HOT_CITIES[0][1])
               .when(city == 1, HOT_CITIES[1][1])
               .otherwise(HOT_CITIES[2][1]) + (u2 - 0.5) * 0.5)
    lon = F.round(F.when(hot, hot_lon).otherwise(base_lon), 4)
    lat = F.round(F.when(hot, hot_lat).otherwise(base_lat), 4)
    lang = (F.when(F.pmod("id", F.lit(5)) == 0, LANGS[0])
            .when(F.pmod("id", F.lit(5)) == 1, LANGS[1])
            .when(F.pmod("id", F.lit(5)) == 2, LANGS[2])
            .when(F.pmod("id", F.lit(5)) == 3, LANGS[3])
            .otherwise(LANGS[4]))
    text = F.format_string(
        "Page %d reports on a site located at %.4f,%.4f with further notes.",
        F.col("id"), lat, lon)
    return df.select(
        F.format_string("https://site%d.example/page/%d",
                        F.pmod("id", F.lit(1000)), F.col("id")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(F.format_string("<html><body>%s</body></html>", text), "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


# ---------------------------------------------------------------------------
# extraction + geocoding (JVM-side; no Python until point construction)
# ---------------------------------------------------------------------------

def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    """html -> body text via JVM regexp (byte-identical invariant)."""
    return df.withColumn(
        out_col,
        F.regexp_extract(F.decode(F.col(html_col), "UTF-8"),
                         "<body>(.*)</body>", 1))


def text_identity_violations(df: DataFrame) -> int:
    """Count rows where extracted text != original text (must be 0 —
    the per-row invariant vs the reference, BASELINE.json input_hint)."""
    e = extract_text(df)
    return e.where(F.col("extracted_text") != F.col("text")).count()


GEO_PATTERN = r"located at (-?\d+\.\d+),(-?\d+\.\d+)"


def geocode(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract 'located at <lat>,<lon>' geotags (deterministic regex
    gazetteer per SURVEY.md §2.11); rows without a tag get NULL lat/lon
    and are dropped from joins downstream (inner-join semantics).

    r6 (guide §1.2 per-task work): ONE regexp evaluation per row — the
    full match is taken once and split on the comma with plain string
    ops; the former per-group extraction ran the same Java regex twice
    per row.  Output values are identical: group 1/2 of GEO_PATTERN
    are exactly the comma-separated halves of the match after the
    11-char 'located at ' prefix."""
    m = F.regexp_extract(F.col(text_col), GEO_PATTERN, 0)
    body = F.substring(m, 12, 2_000_000)        # strip 'located at '
    lat = F.substring_index(body, ",", 1)
    lon = F.substring_index(body, ",", -1)
    return (df.withColumn("lat", F.when(lat != "", lat.cast("double")))
              .withColumn("lon", F.when(lon != "", lon.cast("double"))))


def to_points(df: DataFrame, lon: str = "lon", lat: str = "lat",
              geom_col: str = "point") -> DataFrame:
    return df.withColumn(geom_col, SG.st_point(F.col(lon), F.col(lat)))


# ---------------------------------------------------------------------------
# polygon layer (FIXTURES.md §2)
# ---------------------------------------------------------------------------

def make_world_layer(spark: SparkSession, nx: int = 24, ny: int = 12) -> DataFrame:
    """Deterministic polygon layer: nx✕ny boxes tiling the lon/lat
    domain, plus a concave polygon, one with a hole, one EMPTY and one
    NULL row (the tree must drop the last two, strtree.c:182-199)."""
    rows = []
    w, h = 360.0 / nx, 180.0 / ny
    pid = 0
    for j in range(ny):
        for i in range(nx):
            g = Geom.box(-180 + i * w, -90 + j * h, -180 + (i + 1) * w, -90 + (j + 1) * h)
            rows.append((pid, f"region{pid}", K_wkb.dumps(g)))
            pid += 1
    concave = Geom(3, rings=[__import__("numpy").array(
        [[-10, -10], [10, -10], [10, 10], [0, 0], [-10, 10], [-10, -10]], dtype=float)])
    rows.append((pid, "concave", K_wkb.dumps(concave))); pid += 1
    holed = Geom.polygon([(20, 20), (40, 20), (40, 40), (20, 40), (20, 20)],
                         holes=[[(25, 25), (35, 25), (35, 35), (25, 35), (25, 25)]])
    rows.append((pid, "holed", K_wkb.dumps(holed))); pid += 1
    rows.append((pid, "empty", K_wkb.dumps(Geom(3)))); pid += 1
    rows.append((pid + 1, "null", None))
    schema = T.StructType([
        T.StructField("polygon_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("geom", T.BinaryType()),
    ])
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# skew handling (explicit, per north_rule — beyond AQE)
# ---------------------------------------------------------------------------

def hot_cells(df: DataFrame, cell_col: str = "cell", threshold: int = 100_000) -> DataFrame:
    """Detect persistent hot cells (cities) by count."""
    return df.groupBy(cell_col).count().where(F.col("count") >= threshold)


def salt_hot_cells(left: DataFrame, right: DataFrame, hot: DataFrame,
                   cell_col: str = "cell", buckets: int = 16):
    """Explicit salting: hot left rows get cell⊕salt; the (small) right
    side is replicated ``buckets``✕ for hot cells only.  Join the two
    returned frames on 'salted_cell'."""
    hot_set = F.broadcast(hot.select(cell_col).withColumn("_is_hot", F.lit(True)))
    l = (left.join(hot_set, cell_col, "left")
         .withColumn("_salt",
                     F.when(F.col("_is_hot"), F.pmod(F.xxhash64("url"), F.lit(buckets)))
                     .otherwise(F.lit(0)))
         .withColumn("salted_cell",
                     F.concat_ws(":", F.col(cell_col).cast("string"),
                                 F.col("_salt").cast("string")))
         .drop("_is_hot"))
    salts = left.sparkSession.range(buckets).select(F.col("id").alias("_salt"))
    r_hot = (right.join(hot_set, cell_col, "inner").crossJoin(F.broadcast(salts)))
    r_cold = (right.join(hot_set, cell_col, "left_anti")
              .withColumn("_salt", F.lit(0)))
    r = (r_hot.drop("_is_hot").unionByName(r_cold)
         .withColumn("salted_cell",
                     F.concat_ws(":", F.col(cell_col).cast("string"),
                                 F.col("_salt").cast("string"))))
    return l, r


# ---------------------------------------------------------------------------
# flagship job + checkpoint/resume
# ---------------------------------------------------------------------------

def flagship(pages: DataFrame, layer: DataFrame, res: int = 7) -> DataFrame:
    """The headline query: geocode pages → cells + broadcast STRtree
    join to the polygon layer → per-region page counts.

    Exactly ONE Python crossing (probe + cell assignment fused in a
    single mapInPandas over two double columns — ~16 bytes/row through
    Arrow; geocode regexes and the final aggregate stay JVM-side), one
    shuffle (the final groupBy).

    r6 (guide §4.4-shaped fix, measured 1.8x at 6M pages): NO explicit
    isNotNull filter on the geocoded columns — Catalyst pushes such a
    filter below the projection by inlining the whole
    format/regexp-extract chain into the predicate, re-evaluating the
    expensive expressions up to 3 extra times per row.  The lon/lat
    probe already drops NULL/NaN rows inside the worker
    (join._probe_batch_points), so results are identical; untagged
    rows cost 16 B of Arrow traffic instead of repeated regex work."""
    pts = geocode(pages)
    joined = SJ.broadcast_lonlat_join(
        pts, layer, lon="lon", lat="lat", predicate="intersects",
        right_geom="geom", right_id="polygon_id", cell_res=res)
    return (joined.groupBy("polygon_id")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("cell").alias("n_cells")))


def run_with_checkpoint(pages: DataFrame, layer: DataFrame, out_dir: str,
                        res: int = 7, num_parts: int = 64,
                        key_col: str = "url") -> dict:
    """Resumable flagship run with per-partition lineage + metrics.

    - rows are bucketed by ``pmod(xxhash64(url), num_parts)``
    - a manifest (JSON) records completed buckets; a rerun anti-joins
      against it and processes only the remainder
    - per-bucket metrics rows (count, wall time) land in
      ``out_dir/metrics.jsonl``
    - output written with dynamic partition overwrite so a re-run of
      an interrupted bucket is idempotent."""
    spark = pages.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    manifest_path = os.path.join(out_dir, "manifest.json")
    done: list[int] = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = json.load(f)["completed_parts"]
    work = pages.withColumn("part_id", F.pmod(F.xxhash64(key_col), F.lit(num_parts)))
    if done:
        work = work.where(~F.col("part_id").isin(done))
    t0 = time.time()
    pts = to_points(geocode(work)).where(F.col("lon").isNotNull())
    pts = pts.withColumn("cell", SG.st_cell_lonlat(F.col("lon"), F.col("lat"), res))
    joined = SJ.broadcast_spatial_join(
        pts.select("part_id", "url", "lang", "cell", "point"), layer,
        predicate="intersects", left_geom="point", right_geom="geom",
        right_id="polygon_id")
    (joined.drop("point")
     .write.mode("overwrite").partitionBy("part_id")
     .parquet(os.path.join(out_dir, "data")))
    elapsed = time.time() - t0
    stats = (spark.read.parquet(os.path.join(out_dir, "data"))
             .groupBy("part_id").count().collect())
    processed = sorted(int(r["part_id"]) for r in stats if int(r["part_id"]) not in done)
    with open(os.path.join(out_dir, "metrics.jsonl"), "a") as f:
        for r in stats:
            if int(r["part_id"]) in processed:
                f.write(json.dumps({"part_id": int(r["part_id"]),
                                    "rows": r["count"],
                                    "run_elapsed_sec": elapsed}) + "\n")
    with open(manifest_path, "w") as f:
        json.dump({"completed_parts": sorted(set(done) | set(processed))}, f)
    return {"processed_parts": processed, "elapsed_sec": elapsed,
            "resumed_from": len(done)}
