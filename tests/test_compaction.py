"""Frontier delta-chain compaction: after threshold rounds the base is
rewritten and the chains reset — results must be identical to the
uncompacted run (and to the oracle)."""

from ccrawler_spark import testing as tt
from ccrawler_spark.conf import TINY
from ccrawler_spark.io.snapshot import SnapshotStore
from ccrawler_spark.scheduler.engine import CrawlEngine


def test_compaction_preserves_parity(spark, tiny_fixtures, tmp_path):
    store = SnapshotStore(spark, tmp_path, TINY, compact_threshold=2)
    corpus = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    hosts = spark.read.parquet(f"{tiny_fixtures}/hosts.parquet")
    robots = spark.read.parquet(f"{tiny_fixtures}/robots.parquet")
    engine = CrawlEngine(spark, store, corpus, hosts, robots, TINY)
    seeds = spark.read.parquet(f"{tiny_fixtures}/seeds.parquet")
    engine.bootstrap(seeds)
    for r in range(1, 4):
        engine.run_round(r)
    m = store.read_manifest(3)
    # threshold 2 ⇒ at least one compaction happened: chains were reset
    assert m["frontier"]["base"] != "frontier/base-r0"
    assert len(m["frontier"]["adds"]) < 3
    # parity unchanged
    eng = tt.engine_fetch_sequence(store)
    orc = tt.oracle_fetch_sequence(tt.oracle_run("tiny", rounds=3))
    assert eng == orc
    # orphan GC leaves all referenced data intact
    store.gc_orphans()
    assert tt.engine_fetch_sequence(store) == orc
