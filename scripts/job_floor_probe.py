"""Per-job scheduler-floor decomposition (VERDICT r6 #5/#6 follow-up).

Companion to ``dispatch_probe.py`` (which showed bench-scale rounds are
90-96 % job-active, i.e. plan-construction reuse has <10 % headroom at
10M-row scale). This probe targets the OTHER regime — the tiny-fixture
``crawl_round`` and the sf0.1 suite queries that bench.py times — where
tasks are sub-millisecond and the wall is dominated by the per-JOB cost
of Spark's scheduling round-trip (py4j submit → DAGScheduler event loop
→ task launch → result fetch).

Three measurements, same session, bench.py-identical warmups:

1. ``trivial_job_floor_ms`` — wall/N of N back-to-back
   ``spark.range(1).count()`` jobs: the cheapest possible job, so this
   is the scheduler's per-job floor on this box.
2. ``crawl_round_tiny`` — bench.py's exact crawl_round config, one
   timed round with a 100 Hz ``statusTracker`` sampler: wall, distinct
   jobs seen active, wall/job. If wall/job ≈ the trivial floor, the
   bench number measures scheduler dispatch, not plan cost.
3. ``lsh`` vs ``ngram`` at $SPARK_GRAFT_SF_DIR with the same sampler
   and bench.py's noop sink: if the ngram-minus-lsh wall delta ≈
   (job-count delta) × floor, the dangling ≤1.8 s ngram target is a
   job-count artifact at this scale, not a plan defect.

Jobs shorter than the 10 ms sample period could be missed; at a >100 ms
observed floor every job is caught.

    python scripts/job_floor_probe.py [cores]

Prints one JSON line per measurement plus a combined summary (also
written to BENCH/dispatch_floor.json when run from the repo).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sampled(sc, fn):
    """Run fn() while sampling active job ids at ~100 Hz.

    Returns (result, wall_s, jobs_seen, no_job_frac)."""
    tracker = sc.statusTracker()
    state = {"n": 0, "no_job": 0, "ids": set()}
    done = threading.Event()

    def sample():
        while not done.is_set():
            ids = tracker.getActiveJobsIds()
            state["n"] += 1
            if not ids:
                state["no_job"] += 1
            state["ids"].update(ids)
            time.sleep(0.01)

    th = threading.Thread(target=sample, daemon=True)
    t0 = time.time()
    th.start()
    out = fn()
    wall = time.time() - t0
    done.set()
    th.join(timeout=1)
    return out, wall, len(state["ids"]), state["no_job"] / max(1, state["n"])


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import __spark_entry__ as entry
    from ccrawler_spark.fixtures.gen import (
        ensure_corpus_layout, ensure_fixtures,
    )
    from ccrawler_spark.scheduler.cli import build_session, make_engine

    spark = build_session(cores)
    sc = spark.sparkContext
    qs = entry.queries()

    # bench.py-identical warmups (JVM, shuffle, parquet footer, Arrow
    # python workers) so floors are steady-state, not startup
    from pyspark.sql import functions as F

    spark.range(100_000).repartition(8, "id").groupBy(
        F.pmod("id", F.lit(7))).count().count()
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    def _touch(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(10_000).repartition(cores).mapInPandas(
        _touch, "id long").count()

    results = {"cores": cores}

    # 1. trivial-job floor (median of 3 batches of 40)
    floors = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(40):
            spark.range(1).count()
        floors.append((time.time() - t0) / 40 * 1000)
    results["trivial_job_floor_ms"] = round(statistics.median(floors), 1)
    results["trivial_job_floor_runs_ms"] = [round(x, 1) for x in floors]
    print(json.dumps({"trivial_job_floor_ms":
                      results["trivial_job_floor_ms"]}))

    # 2. bench.py's crawl_round, instrumented (median of 3 like bench)
    fdir = str(ensure_fixtures("tiny"))
    layout = str(ensure_corpus_layout(spark, fdir))
    seeds = spark.read.parquet(f"{fdir}/seeds.parquet")
    rows = []
    for _ in range(3):
        with tempfile.TemporaryDirectory() as out:
            engine, _ = make_engine(spark, fdir, out, size="tiny",
                                    corpus_layout=layout)
            engine.bootstrap(seeds)
            _, wall, jobs, njf = sampled(sc, lambda: engine.run_round(1))
            rows.append({"wall_s": round(wall, 3), "jobs": jobs,
                         "ms_per_job": round(wall / max(1, jobs) * 1000, 1),
                         "no_job_frac": round(njf, 3)})
    rows.sort(key=lambda r: r["wall_s"])
    results["crawl_round_tiny"] = {"runs": rows, "median": rows[1]}
    print(json.dumps({"crawl_round_tiny": rows[1]}))

    # 3. lsh vs ngram at SF_DIR (bench.py noop sink), median of 3
    for name in ("lsh_candidate_pairs", "ngram_jaccard_pairs"):
        runs = []
        for _ in range(3):
            _, wall, jobs, njf = sampled(
                sc,
                lambda: qs[name](spark, SF_DIR)
                .write.format("noop").mode("overwrite").save(),
            )
            runs.append({"wall_s": round(wall, 3), "jobs": jobs,
                         "no_job_frac": round(njf, 3)})
        runs.sort(key=lambda r: r["wall_s"])
        results[name] = {"runs": runs, "median": runs[1]}
        print(json.dumps({name: runs[1]}))

    lsh, ng = (results[n]["median"]
               for n in ("lsh_candidate_pairs", "ngram_jaccard_pairs"))
    floor_s = results["trivial_job_floor_ms"] / 1000
    results["ngram_minus_lsh"] = {
        "wall_delta_s": round(ng["wall_s"] - lsh["wall_s"], 3),
        "job_delta": ng["jobs"] - lsh["jobs"],
        "job_delta_x_floor_s": round((ng["jobs"] - lsh["jobs"]) * floor_s, 3),
    }
    results["sf_dir"] = SF_DIR
    print(json.dumps({"summary": results["ngram_minus_lsh"]}))

    repo_bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    if os.path.isdir(repo_bench):
        with open(os.path.join(repo_bench, "dispatch_floor.json"),
                  "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
