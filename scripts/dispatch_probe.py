"""Crawl-round dispatch-latency decomposition (VERDICT r6 #6).

The committed busy_frac measurements (BENCH/bench_suite_quiet_r6*.json:
suite-window busy_frac 0.277-0.299 on a 32-core box) say most of the
bench-scale crawl_round wall is NOT executor compute. This probe
decomposes a round's wall directly, with no engine changes: while
``run_round`` executes on a worker thread, the main thread samples
``sc.statusTracker().getActiveJobsIds()`` at ~100 Hz, giving

- ``no_job_frac``  — fraction of the round's wall with ZERO Spark jobs
  active: pure driver-side time (py4j plan construction, manifest /
  snapshot bookkeeping, job-submission gaps). Executors are idle by
  construction during these samples.
- ``jobs``         — jobs dispatched per round (each one costs a
  scheduler round-trip).

Interpretation guardrail: overlap means ``no_job_frac`` UNDERSTATES
driver cost (plan construction that overlaps a pool-submitted job is
hidden), so it is a LOWER bound on dispatch dominance. Conversely a
running job does not prove executor saturation — cross-check with the
suite busy_frac.

    python scripts/dispatch_probe.py [cores] [rounds]

Prints one JSON line per round plus a summary; wall-time affecting
nothing — sampling is a driver-side getter.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from ccrawler_spark.conf import BENCH
    from ccrawler_spark.fixtures.gen import (
        ensure_bench_fixtures, ensure_corpus_layout,
    )
    from ccrawler_spark.scheduler.cli import build_session, make_engine

    spark = build_session(cores)
    sc = spark.sparkContext
    fdir = str(ensure_bench_fixtures(spark))
    layout = str(ensure_corpus_layout(spark, fdir))
    sys.path.insert(0, "/root/repo/bench")
    from run_bench import universe_seeds

    out = tempfile.mkdtemp(prefix="dispatch-probe-", dir="/dev/shm")
    engine, store = make_engine(spark, fdir, out, conf=BENCH,
                                corpus_layout=layout)
    t0 = time.time()
    engine.bootstrap(universe_seeds(spark, fdir))
    print(json.dumps({"bootstrap_s": round(time.time() - t0, 2)}))

    tracker = sc.statusTracker()
    results = []
    for r in range(1, rounds + 1):
        samples = {"n": 0, "no_job": 0, "job_ids": set()}
        done = threading.Event()

        def sample():
            while not done.is_set():
                ids = tracker.getActiveJobsIds()
                samples["n"] += 1
                if not ids:
                    samples["no_job"] += 1
                samples["job_ids"].update(ids)
                time.sleep(0.01)

        th = threading.Thread(target=sample, daemon=True)
        t0 = time.time()
        th.start()
        rs = engine.run_round(r)
        wall = time.time() - t0
        done.set()
        th.join(timeout=1)
        row = {
            "round": r,
            "wall_s": round(wall, 3),
            "no_job_frac": round(samples["no_job"] / max(1, samples["n"]), 3),
            "jobs_seen_active": len(samples["job_ids"]),
            "samples": samples["n"],
            "fetched": rs.fetched,
        }
        results.append(row)
        print(json.dumps(row))
    walls = sorted(r["wall_s"] for r in results)
    print(json.dumps({
        "summary": {
            "cores": cores,
            "rounds": rounds,
            "median_wall_s": walls[len(walls) // 2],
            "median_no_job_frac": sorted(
                r["no_job_frac"] for r in results)[len(results) // 2],
        }
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
