"""M5 crawl-engine bench: frontier dequeue + fetch-schedule throughput
with two-parallelism scaling evidence (BASELINE.md protocol).

The north-rule's "N and 4N executors, scaling efficiency ≥ 0.8" cannot
use a real cluster in this sandbox (driver instruction): the same job +
byte-identical input runs at local[8] and local[32]; efficiency =
(thr_32 / thr_8) / 4.

Protocol (BASELINE.md): bootstrap seeds the frontier with the FULL
10^6-URL universe (the design metric is throughput on a *seeded*
frontier, BASELINE.json:2), 1 warm-up round untimed, ≥3 timed rounds;
URLs/sec = fetched-and-committed per second of run_round wall.

    python bench/run_bench.py            # both levels + BENCH/BASELINE.md
    python bench/run_bench.py --worker --cores 8 --json /tmp/x.json
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# 4 timed rounds = exactly one full head-cache cycle (head_multiple=4:
# three head-served rounds + the refill round that pays the full
# frontier composition) — the steady-state amortization, nothing hidden
# outside the timed window. Warm-up is a corpus-touch + worker spawn,
# not a round.
TIMED_ROUNDS = 4


def worker(cores: int, json_path: str, fixture_dir: str | None) -> None:
    from pyspark.sql import functions as F

    from ccrawler_spark.conf import BENCH
    from ccrawler_spark.fixtures.gen import ensure_bench_fixtures
    from ccrawler_spark.scheduler.cli import build_session, make_engine

    spark = build_session(cores)
    fdir = fixture_dir or str(ensure_bench_fixtures(spark))
    with tempfile.TemporaryDirectory(prefix=f"bench{cores}-") as out:
        engine, store = make_engine(spark, fdir, out, conf=BENCH)
        # seed the frontier with the full universe (design-scale shape:
        # frontier >> per-round fetches)
        hosts = spark.read.parquet(f"{fdir}/hosts.parquet")
        seeds = hosts.select(
            F.explode(F.sequence(F.lit(0), F.col("pages") - 1)).alias("j"),
            "host",
        ).select(F.concat(F.lit("http://"), F.col("host"), F.lit("/p/"),
                          F.col("j").cast("string")).alias("url"))
        t0 = time.time()
        st = engine.bootstrap(seeds)
        bootstrap_s = time.time() - t0
        frontier_rows = st.queued_after
        # warm-up WITHOUT consuming the big round-1 workload: touch the
        # whole corpus payload column (page cache) and spawn/import the
        # python workers once, untimed
        t0 = time.time()
        corpus = spark.read.parquet(f"{fdir}/corpus.parquet")
        corpus.select(F.sum(F.length("bytes"))).collect()
        from ccrawler_spark.scheduler.fetch import fetch_and_decode

        sample = engine.store.read_frontier(0).limit(30_000)
        fetch_and_decode(sample, corpus).count()
        warmup_s = time.time() - t0
        rounds = []
        for r in range(1, TIMED_ROUNDS + 1):
            t0 = time.time()
            rs = engine.run_round(r)
            wall = time.time() - t0
            rounds.append({"round": r, "wall_s": round(wall, 3),
                           "fetched": rs.fetched, "enqueued": rs.enqueued,
                           "timed": True})
        timed = [x for x in rounds if x["timed"]]
        fetched = sum(x["fetched"] for x in timed)
        wall = sum(x["wall_s"] for x in timed)
        out_json = {
            "cores": cores,
            "frontier_rows": frontier_rows,
            "bootstrap_s": round(bootstrap_s, 2),
            "warmup_s": round(warmup_s, 2),
            "rounds": rounds,
            "timed_fetched": fetched,
            "timed_wall_s": round(wall, 3),
            "urls_per_sec": round(fetched / wall, 2),
            "frontier_rows_per_sec": round(frontier_rows * len(timed) / wall, 1),
        }
        with open(json_path, "w") as f:
            json.dump(out_json, f, indent=1)
        print(json.dumps(out_json))
    spark.stop()


def orchestrate(levels=(8, 32)) -> None:
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # pre-generate fixtures once (with a big session) so workers share them
    from ccrawler_spark.fixtures.gen import FIXTURE_ROOT

    if not (FIXTURE_ROOT / "bench" / "_DONE_FULL").exists():
        from ccrawler_spark.scheduler.cli import build_session

        s = build_session(32)
        from ccrawler_spark.fixtures.gen import ensure_bench_fixtures

        ensure_bench_fixtures(s)
        s.stop()
    results = {}
    for cores in levels:
        jp = bench_dir / f"bench_local{cores}.json"
        p = subprocess.run(
            [sys.executable, str(REPO / "bench" / "run_bench.py"),
             "--worker", "--cores", str(cores), "--json", str(jp)],
            cwd=REPO, timeout=3600,
        )
        assert p.returncode == 0, f"worker local[{cores}] failed"
        results[cores] = json.load(open(jp))
    lo, hi = min(levels), max(levels)
    eff = (results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]) / (hi / lo)
    summary = {
        "metric": "frontier dequeue+fetch-schedule throughput",
        "levels": {str(c): results[c]["urls_per_sec"] for c in levels},
        "scaling_efficiency": round(eff, 3),
        "frontier_rows": results[hi]["frontier_rows"],
    }
    with open(bench_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    write_baseline_md(results, eff, lo, hi)
    print(json.dumps(summary))


def write_baseline_md(results, eff, lo, hi):
    md = ["# BENCH/BASELINE.md — measured crawl-engine throughput\n",
          "Protocol: BASELINE.md (M5). Seeded frontier = full bench universe;",
          f"cache/worker warm-up excluded; {TIMED_ROUNDS} timed rounds;",
          "URLs/sec = fetched-and-committed per second of run_round wall.\n",
          "| parallelism | frontier rows | timed fetches | timed wall (s) | URLs/sec | frontier rows/s |",
          "| --- | --- | --- | --- | --- | --- |"]
    for c in sorted(results):
        r = results[c]
        md.append(
            f"| local[{c}] | {r['frontier_rows']:,} | {r['timed_fetched']:,} "
            f"| {r['timed_wall_s']} | {r['urls_per_sec']} "
            f"| {r['frontier_rows_per_sec']:,} |"
        )
    md += [
        "",
        f"**Scaling efficiency local[{lo}]→local[{hi}] = "
        f"(thr_{hi}/thr_{lo})/{hi//lo} = {eff:.3f}** "
        f"({'meets' if eff >= 0.8 else 'BELOW'} the ≥ 0.8 requirement, "
        "BASELINE.json:2; two-parallelism protocol per driver instruction — "
        "no real cluster in sandbox).",
    ]
    with open(REPO / "BENCH" / "BASELINE.md", "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--json", default="/tmp/bench.json")
    ap.add_argument("--fixture-dir", default=None)
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()
    if args.worker:
        worker(args.cores, args.json, args.fixture_dir)
    else:
        orchestrate(tuple(int(x) for x in args.levels.split(",")))
