"""O42-O45 streaming surface (SURVEY.md §2.I): micro-batch frontier
feed, streaming dedup, watermarked rates, stateful politeness."""

import pytest
from pyspark.sql import functions as F

from ccrawler_spark import testing as tt
from ccrawler_spark.conf import TINY
from ccrawler_spark.streaming import frontier_stream as fs


@pytest.fixture(scope="module")
def tiny_store(spark, tiny_fixtures, tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_store")
    _, store, _ = tt.engine_run(spark, "tiny", str(out), rounds=3)
    return store


def test_frontier_stream_drains_store(spark, tiny_store, tmp_path):
    """O42: AvailableNow drains every frontier add-delta exactly once."""
    stream = fs.frontier_delta_stream(spark, str(tiny_store.root))
    q = (
        stream.writeStream.format("memory")
        .queryName("frontier_feed")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM frontier_feed").first()["n"]
    assert got > 0
    # base-r0 ∪ adds = every enqueued-ever url, each exactly once
    urls = spark.sql("SELECT url FROM frontier_feed").collect()
    assert len({r["url"] for r in urls}) == len(urls)
    from ccrawler_spark import testing as tt

    assert {r["url"] for r in urls} == tt.oracle_run("tiny", rounds=3).seen


def test_streaming_dedup_and_rates(spark, tiny_store, tmp_path):
    """O44/O45 compile into a streaming plan and produce rows."""
    stream = fs.frontier_delta_stream(
        spark, str(tiny_store.root), max_files_per_trigger=1
    )
    # short delay: each round's discover_ts advances 60 virtual seconds,
    # so every new micro-batch flushes the previous rounds' windows
    dedup = fs.streaming_dedup(stream, delay="30 seconds")
    q = (
        fs.discovery_rate(dedup, set_watermark=False)
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM rates").collect()
    assert sum(r["enqueued"] for r in rows) > 0


def test_stateful_politeness_slots(spark, tiny_store, tmp_path):
    """O43: slots are spaced crawl_delay apart per host and persist
    across micro-batches (last_slot continues)."""
    stream = fs.frontier_delta_stream(spark, str(tiny_store.root))
    out = fs.stateful_politeness(stream, TINY)
    q = (
        out.writeStream.format("memory")
        .queryName("polite")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM polite ORDER BY host, seq_in_host").collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        slots = [r["slot_ms"] for r in hr]
        assert slots == sorted(slots)
        diffs = {b - a for a, b in zip(slots, slots[1:])}
        assert diffs <= {TINY.default_crawl_delay_ms}, (host, diffs)


def test_frontier_stream_exactly_once_under_compaction(
    spark, tiny_fixtures, tmp_path_factory, tmp_path
):
    """ADVICE r1: compaction rewrites base-r{n>0}; the stream glob must
    NOT re-emit those rewritten rows — each enqueue appears exactly
    once even when several compactions happen mid-run."""
    from ccrawler_spark.scheduler.cli import make_engine

    out = tmp_path_factory.mktemp("stream_compact")
    fdir, _, _, _ = tt.load_fixture_meta("tiny")
    engine, store = make_engine(spark, str(fdir), str(out), size="tiny")
    store.compact_threshold = 2
    seeds = spark.read.parquet(f"{fdir}/seeds.parquet")
    engine.bootstrap(seeds)
    for r in range(1, 5):
        engine.run_round(r)
    # at least one compaction base must exist for this test to bite
    bases = list((store.root / "data" / "frontier").glob("base-r*"))
    assert any(b.name != "base-r0" for b in bases), bases

    stream = fs.frontier_delta_stream(spark, str(store.root))
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_compact")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    q.awaitTermination(120)
    urls = [r["url"] for r in spark.sql("SELECT url FROM feed_compact").collect()]
    assert len(set(urls)) == len(urls), "duplicate enqueue events emitted"
    assert set(urls) == tt.oracle_run("tiny", rounds=4).seen
