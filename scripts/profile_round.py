"""Stage-level timing of one bench round at a given core count.

    python scripts/profile_round.py 32
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ccrawler_spark.conf import BENCH
from ccrawler_spark.scheduler import stages
from ccrawler_spark.scheduler.cli import build_session, make_engine
from ccrawler_spark.scheduler.engine import FRONTIER_COLS
from ccrawler_spark.scheduler.fetch import fetch_and_decode
from ccrawler_spark.scheduler.seen import seen_dedup

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spark = build_session(cores)
fdir = "/root/repo/.fixtures/bench"
out = tempfile.mkdtemp()
engine, store = make_engine(spark, fdir, out, conf=BENCH)
sys.path.insert(0, "/root/repo/bench")
from run_bench import universe_seeds

seeds = universe_seeds(spark, fdir)
t0 = time.time()
engine.bootstrap(seeds)
print(f"[{cores}] bootstrap {time.time()-t0:.1f}s")


def T(label, fn):
    t = time.time()
    v = fn()
    print(f"[{cores}] {label}: {time.time()-t:.2f}s")
    return v


conf = BENCH
r = 1
prev = store.read_manifest(0)
round_ts = conf.t0_micros + r * conf.round_period_micros
frontier = store.read_frontier(0)
gated = stages.robots_gate(frontier, engine.robots_active, conf).cache()
denied = gated.filter(~F.col("allowed")).select(*FRONTIER_COLS)
allowed = gated.filter(F.col("allowed"))
scheduled = stages.with_fetch_sequence(
    stages.dequeue(allowed, conf), r, 0
).cache()
T("dequeue+seq", lambda: scheduled.count())
fetched = fetch_and_decode(scheduled, engine.corpus)
log_cols = ["seq", "url", "host", "host_bucket", "slot_ms", "priority",
            "discover_ts", "depth", "fetch_ok", "pixels_ok", "caption_ok",
            "phash_ok", "psnr_db"]
T("fetch+decode+log-write", lambda: store.write_parquet(
    fetched.select(*log_cols), "fetch_log", "round=1"))
candidates = stages.as_frontier_rows(
    stages.dedup_in_round(
        stages.discover_links(scheduled, engine.hosts, conf, engine.H, round_ts)
    ), conf)
seen = store.read_seen(0)
bloom = T("load bloom", lambda: store.read_bloom_latest(0).cache())
fresh = (
    seen_dedup(candidates, seen, conf, bloom)
    .withColumn("status", F.lit("queued"))
    .withColumn("retry_count", F.lit(0))
    .select(*FRONTIER_COLS)
    .repartition("host_bucket")
    .cache()
)
T("discover+dedup+seen", lambda: fresh.count())
T("counts x3", lambda: (engine._bucket_counts(scheduled),
                        engine._bucket_counts(denied),
                        engine._bucket_counts(fresh)))
T("removes write", lambda: store.write_parquet(
    scheduled.select("url_hash", "url").unionByName(
        denied.select("url_hash", "url")), "frontier", "removes-r1"))
T("bloom delta", lambda: engine._write_bloom_delta(fresh, bloom, 1))
spark.stop()
