"""Benchmark driver: headline engine queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": "...", "value": <suite sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages": N,
   "pages_per_sec": <sf1-leg sustained throughput>, "cpus": N,
   "clean_runs": {...}, "flagship_sf1_*": ..., "runs_file": ...}

The headline line is COMPACT (round 5): raw per-run samples go to
BENCH/bench_runs_r{N}.json ($SPARK_GRAFT_ROUND), never stdout —
round 4's embedded query_runs overflowed the driver's tail capture.
``pages_per_sec`` is keyed to the sf1 (6M-page) flagship leg; the
sf0.1 leg is a fixed-overhead-bound smoke check reported as
``flagship_smoke_sec`` and excluded from the suite total.

The flagship measurement is the north-star workload: synthesize a
CC-style pages table sized to the scale factor (1 page per lineitem
row), geocode → point → cell-encode → broadcast-STRtree join against a
world layer → per-region tile aggregation.  Page synthesis is column
arithmetic standing in for the 100 TB scan.

Protocol (round 4) — the same stall-discard + median-of-clean
discipline as scripts/bench_scaling.py (VERDICT r3 item 1):

* Every timed run samples ``/proc/stat procs_blocked`` and measures
  the busy fraction of the session's cores while it executes, so this
  sandbox's documented external stalls (D-state pileups; the phantom
  stall where wall time passes with idle CPU) are DETECTED, not
  inferred.  A run is STALLED if blocked-processes spiked >= 4, its
  wall time is >= 1.4x the query's best run, or its busy fraction
  dropped below 0.8x the query's best.  The reported statistic is the
  MEDIAN over clean runs (all samples + markers published); min-of-N
  (round 3) could hide regressions and median-of-all (rounds 1-2)
  blended stalls in.
* The flagship runs in a FRESH taskset-pinned subprocess session:
  round 3's flagship numbers came from a session with 450+ accumulated
  stages and contradicted the same-day scaling harness by 4x on
  byte-identical code.  A fresh session is also the production shape —
  the flagship job ships via spark-submit, it does not run after seven
  other query families in one driver.
* Inputs are repartitioned to emulate the multi-split scan a real
  multi-file table provides (the sf parquet is a single unsplittable
  row group), floored by BYTES per split (64 KB at these SFs) so
  CPU-heavy small tables keep their parallelism while nation-sized
  dims stay at one split (see __spark_entry__._load).
* ``SPARK_GRAFT_SF1_PAGES`` (default 6,000,000) adds one flagship
  measurement at 10x the sf0.1 page count in the same fresh session —
  data-scaling evidence alongside the core-scaling harness.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
BLOCKED_SPIKE = 4
OUTLIER = 1.4
BUSY_DROP = 0.8


def _cpu_jiffies(ncores):
    busy = total = 0
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and not line.startswith("cpu "):
                idx = int(line[3:line.index(" ")])
                if idx >= ncores:
                    continue
                v = [int(x) for x in line.split()[1:]]
                total += sum(v)
                busy += sum(v) - v[3] - v[4]
    return busy, total


class StallSampler:
    """Stall fingerprints for one timed run (see scripts/
    bench_scaling.py): (a) /proc/stat procs_blocked spikes every 0.5s;
    (b) busy fraction of the first ``ncores`` cores over the run."""

    def __init__(self, ncores):
        self.ncores = ncores
        self.max_blocked = 0
        self.busy_frac = 1.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            try:
                with open("/proc/stat") as f:
                    for line in f:
                        if line.startswith("procs_blocked"):
                            self.max_blocked = max(self.max_blocked,
                                                   int(line.split()[1]))
                            break
            except OSError:
                pass
            self._stop.wait(0.5)

    def __enter__(self):
        self._j0 = _cpu_jiffies(self.ncores)
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)
        b1, t1 = _cpu_jiffies(self.ncores)
        db, dt = b1 - self._j0[0], t1 - self._j0[1]
        self.busy_frac = round(db / dt, 3) if dt > 0 else 1.0


def timed_runs(fn, ncores, n_runs=4, until_clean=0, max_runs=0):
    """1 warmup + ``n_runs`` sampled timed runs -> list of run dicts.

    ``until_clean``: for saturating jobs (the flagship), keep sampling
    past ``n_runs`` (up to ``max_runs``) until that many ABSOLUTELY
    clean runs exist — no blocked-process spike and pinned-core busy
    fraction >= 0.85.  The sandbox's external stalls come in phases;
    extra samples buy a shot at a clean window instead of publishing a
    contaminated median."""
    fn()  # warmup: codegen + python-worker spin-up out of the timing
    runs = []

    def one():
        with StallSampler(ncores) as s:
            t0 = time.perf_counter()
            fn()
            sec = time.perf_counter() - t0
        runs.append({"sec": round(sec, 3), "max_blocked": s.max_blocked,
                     "busy_frac": s.busy_frac})

    for _ in range(n_runs):
        one()
    if until_clean:
        def n_abs_clean():
            return sum(1 for r in runs
                       if r["max_blocked"] < BLOCKED_SPIKE
                       and r["busy_frac"] >= 0.85)
        while n_abs_clean() < until_clean and len(runs) < max_runs:
            one()
    return runs


def median_of_clean(runs):
    """(median_sec, clean_count): discard stall-marked runs by the
    bench_scaling criteria, median the rest; all-stalled falls back to
    the minimum (marked by clean_count=0).  The busy-fraction
    fingerprint (phantom stall: wall time with idle pinned cores) only
    applies to runs that normally saturate — short scheduling-bound
    queries legitimately idle their cores, so for them busy variance
    is noise, not a stall."""
    best = min(r["sec"] for r in runs)
    best_busy = max(r["busy_frac"] for r in runs)
    check_busy = best_busy >= 0.6
    clean = [r["sec"] for r in runs
             if r["max_blocked"] < BLOCKED_SPIKE
             and r["sec"] < OUTLIER * best
             and (not check_busy
                  or r["sec"] <= 1.15 * best  # a fast run is clean —
                  # only a SLOWED run with idle cores is the phantom-
                  # stall fingerprint
                  or r["busy_frac"] >= BUSY_DROP * best_busy)]
    if not clean:
        return best, 0
    return statistics.median(clean), len(clean)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def bench_pip_join(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_pip_join_count(spark, sf_dir))


def bench_dwithin(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_dwithin_join(spark, sf_dir))


def bench_knn(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_knn_nearest(spark, sf_dir))


def bench_tiles(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_cell_assign(spark, sf_dir))
    _force(E.q_tile_rollup(spark, sf_dir))


def bench_dedup(spark, sf_dir):
    """Measures the PRODUCTION dedup paths (xxhash64 LSH family), not
    the md5 oracle variants the correctness queries use."""
    import __spark_entry__ as E
    from spark_geo import text as TX
    _force(E.q_dedup_exact(spark, sf_dir))
    d = E._load(spark, sf_dir, "documents").select("doc_id", "text")
    # no orderBy: dedup output is an unordered pair set; sorting into a
    # noop sink measured a range exchange no production plan pays.
    # skew_stats exercises the default bucket cap under measurement
    # (VERDICT r3 item 4); the stats land on stderr, never stdout.
    stats: dict = {}
    _force(TX.lsh_candidate_pairs(d, n_hashes=32, bands=4,
                                  skew_stats=stats))
    print(f"bench_dedup skew_stats: {stats}", file=sys.stderr)


def bench_ann(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_ann_cosine_topk(spark, sf_dir))


def bench_text(spark, sf_dir):
    import __spark_entry__ as E
    _force(E.q_text_quality(spark, sf_dir))
    _force(E.q_events_sessionize(spark, sf_dir))


_FLAGSHIP_JOB = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import bench as B
from spark_geo.session import get_spark
from spark_geo import pipeline as PL

cpus = {cpus}
spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 32),
                  app="spark_geo_bench_flagship")
out = {{}}
for tag, (n, n_runs, until_clean) in {sizes!r}.items():
    pages = PL.synth_pages(spark, n, partitions=max(cpus * 2, 64))
    layer = PL.make_world_layer(spark)
    def job():
        B._force(PL.flagship(pages, layer, res=7))
    job()  # extra warmup: worker-heap first-touch faults (see memory)
    out[tag] = {{"pages": n,
                 "runs": B.timed_runs(job, cpus, n_runs=n_runs,
                                      until_clean=until_clean,
                                      max_runs=12)}}
print("FLAGSHIP_JSON " + json.dumps(out))
"""


def run_flagship_fresh(cpus, sizes):
    """Flagship in a fresh taskset-pinned subprocess session (see
    module docstring).  ``sizes``: {tag: (pages, n_runs, until_clean)}."""
    code = _FLAGSHIP_JOB.format(repo=REPO, cpus=cpus, sizes=sizes)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    env = dict(os.environ)
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3000, env=env)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("FLAGSHIP_JSON "):
            return json.loads(line[len("FLAGSHIP_JSON "):])
    raise RuntimeError("no FLAGSHIP_JSON line in flagship subprocess")


def _pin_self(cpus):
    """Re-exec under taskset so the whole session (JVM + Python
    workers) is pinned to exactly ``cpus`` cores — an honest
    N-executor emulation (same rationale as bench_scaling.run_level)
    and the precondition for the busy-fraction stall fingerprint."""
    if os.environ.get("SPARK_GRAFT_BENCH_PINNED") == "1":
        return
    import shutil
    if not shutil.which("taskset"):
        return
    os.environ["SPARK_GRAFT_BENCH_PINNED"] = "1"
    os.execvp("taskset", ["taskset", "-c", f"0-{cpus - 1}",
                          sys.executable] + sys.argv)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _pin_self(cpus)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    from pyspark.sql import functions as F
    from spark_geo.session import get_spark
    from spark_geo import functions as SG
    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 32),
                      app="spark_geo_bench")
    # JVM + Python-worker warmup outside timing (steady-state regime)
    spark.range(100_000, numPartitions=64).select(
        SG.st_x(SG.st_point(F.rand(), F.rand()))
    ).write.format("noop").mode("overwrite").save()

    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "0")) or \
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    sf = round(n_pages / 6_000_000, 4)
    sf1_pages = int(os.environ.get("SPARK_GRAFT_SF1_PAGES", "6000000"))

    suite = {
        "pip_join": lambda: bench_pip_join(spark, sf_dir),
        "dwithin_join": lambda: bench_dwithin(spark, sf_dir),
        "knn_nearest": lambda: bench_knn(spark, sf_dir),
        "cell_tiles": lambda: bench_tiles(spark, sf_dir),
        "dedup": lambda: bench_dedup(spark, sf_dir),
        "ann_topk": lambda: bench_ann(spark, sf_dir),
        "text_events": lambda: bench_text(spark, sf_dir),
    }
    want_flagship = True
    if only:
        keys = only.split(",")
        suite = {k: v for k, v in suite.items() if k in keys}
        want_flagship = "flagship_pages" in keys or not keys

    # emulate the multi-split scan a 100 TB table provides (the sf
    # parquet is one unsplittable row group; see __spark_entry__._load)
    spark.conf.set("spark_geo.bench.input_partitions", str(cpus))

    times = {}
    all_runs = {}
    clean_counts = {}
    for name, fn in suite.items():
        # until_clean on EVERY suite query (VERDICT r4 item 4): keep
        # sampling past n_runs until >= 3 absolutely clean runs, so no
        # query publishes a 1-2-clean-run median again.
        runs = timed_runs(fn, cpus, n_runs=4, until_clean=3, max_runs=10)
        all_runs[name] = runs
        med, n_clean = median_of_clean(runs)
        times[name] = round(med, 3)
        clean_counts[name] = n_clean

    flagship_info = {}
    if want_flagship:
        # sf0.1 leg is a SMOKE CHECK only (fixed-overhead-bound, see
        # BENCH/BASELINE.md); the sf1 leg is the sustained-throughput
        # headline and gets the full until_clean discipline.
        sizes = {"sf": (n_pages, 2, 0)}
        if sf1_pages and sf1_pages != n_pages:
            sizes["sf1"] = (sf1_pages, 5, 3)
        fres = run_flagship_fresh(cpus, sizes)
        med, n_clean = median_of_clean(fres["sf"]["runs"])
        clean_counts["flagship_smoke"] = n_clean
        all_runs["flagship_smoke"] = fres["sf"]["runs"]
        flagship_info["smoke_sec"] = round(med, 3)
        flagship_info["smoke_pages"] = n_pages
        if "sf1" in fres:
            med1, n1 = median_of_clean(fres["sf1"]["runs"])
            flagship_info["sf1_pages"] = fres["sf1"]["pages"]
            flagship_info["sf1_sec"] = round(med1, 3)
            flagship_info["sf1_clean_runs"] = n1
            flagship_info["sf1_pages_per_sec"] = round(
                fres["sf1"]["pages"] / med1, 1)
            all_runs["flagship_sf1"] = fres["sf1"]["runs"]

    # raw samples go to a side file, NOT the headline line: round 4's
    # driver could not parse the result because query_runs overflowed
    # its tail capture (VERDICT r4 item 1).
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "5")
    runs_file = os.path.join("BENCH", f"bench_runs_r{rnd}.json")
    try:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, runs_file), "w") as f:
            json.dump({"query_runs": all_runs, "cpus": cpus, "sf": sf},
                      f, indent=1)
    except OSError as e:
        print(f"warning: could not write {runs_file}: {e}",
              file=sys.stderr)

    # suite total EXCLUDES the flagship smoke leg (1-2 samples of a
    # fixed-overhead-bound job would contaminate the round-over-round
    # comparison; r4-equivalent suite-only total was 13.91s).
    total = round(sum(times.values()), 3)
    result = {
        "metric": "spatial-join + tile-assignment suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pages": n_pages,
        "pages_per_sec": flagship_info.get("sf1_pages_per_sec"),
        "statistic": "median-of-clean (stall-discard; see bench.py)",
        "clean_runs": clean_counts,
        "runs_file": runs_file,
        "cpus": cpus,
    }
    result.update({f"flagship_{k}": v for k, v in flagship_info.items()})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
