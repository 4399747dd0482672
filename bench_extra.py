"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT part of the frozen driver contract (bench.py is the measured
artifact); this harness exists so each optimization's evidence —
noop-sink seconds and ``.explain("formatted")`` output — can be
captured per query and committed under plans/r06/.

Usage:
    python bench_extra.py --tag before [--sf /root/testdata/sf1.0] \
        [--runs 3] [--queries pip_join,dedup_lsh,...] [--plans-only]

Writes plans/r06/<query>_<tag>.txt and prints one JSON line of
median seconds per query.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def targets(spark, sf_dir):
    """name -> lazy DataFrame builder for every suite query plus the
    flagship, matching exactly what bench.py times."""
    import __spark_entry__ as E
    from spark_geo import text as TX
    from spark_geo import pipeline as PL

    def dedup_lsh():
        d = E._load(spark, sf_dir, "documents").select("doc_id", "text")
        return TX.lsh_candidate_pairs(d, n_hashes=32, bands=4)

    def flagship():
        pages = PL.synth_pages(spark, 6_000_000, partitions=64)
        layer = PL.make_world_layer(spark)
        return PL.flagship(pages, layer, res=7)

    return {
        "pip_join": lambda: E.q_pip_join_count(spark, sf_dir),
        "dwithin_join": lambda: E.q_dwithin_join(spark, sf_dir),
        "knn_nearest": lambda: E.q_knn_nearest(spark, sf_dir),
        "cell_assign": lambda: E.q_cell_assign(spark, sf_dir),
        "tile_rollup": lambda: E.q_tile_rollup(spark, sf_dir),
        "dedup_exact": lambda: E.q_dedup_exact(spark, sf_dir),
        "dedup_lsh": dedup_lsh,
        "ann_topk": lambda: E.q_ann_cosine_topk(spark, sf_dir),
        "text_quality": lambda: E.q_text_quality(spark, sf_dir),
        "events_sessionize": lambda: E.q_events_sessionize(spark, sf_dir),
        "flagship": flagship,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r06"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F
    from spark_geo.session import get_spark
    from spark_geo import functions as SG
    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 32),
                      app="spark_geo_bench_extra")
    # same warmup + split emulation as bench.py
    spark.range(100_000, numPartitions=64).select(
        SG.st_x(SG.st_point(F.rand(), F.rand()))
    ).write.format("noop").mode("overwrite").save()
    spark.conf.set("spark_geo.bench.input_partitions", str(cpus))

    tgt = targets(spark, args.sf)
    names = [q for q in args.queries.split(",") if q] or list(tgt)
    os.makedirs(args.plans_dir, exist_ok=True)

    times = {}
    for name in names:
        build = tgt[name]
        df = build()
        # plan capture
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(args.plans_dir,
                               f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        _force(build())  # warmup
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            _force(build())
            samples.append(round(time.perf_counter() - t0, 3))
        times[name] = {"median": round(statistics.median(samples), 3),
                       "samples": samples}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "sf_dir": args.sf, "times": times}))


if __name__ == "__main__":
    main()
