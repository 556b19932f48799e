"""Physical-plan shape assertions: the optimizations we claim must be
visible in `explain` output (SURVEY.md §4 / task brief: "iterate until
it's the plan you'd want")."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_robots_gate_is_broadcast_no_udf(spark, tiny_fixtures):
    """O13: broadcast hash join + pure Catalyst prefix match (no
    Python eval in the gate)."""
    from ccrawler_spark.conf import TINY
    from ccrawler_spark.scheduler.stages import robots_active, robots_gate

    robots = spark.read.parquet(f"{tiny_fixtures}/robots.parquet")
    frontier = (
        spark.createDataFrame(
            [("http://h0.example/p/1", "h0.example")], "url string, host string"
        )
    )
    plan = plan_of(robots_gate(frontier, robots_active(robots, 1), TINY))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fetch_prunes_corpus_columns(spark, tiny_fixtures):
    """Column pruning: the corpus scan must not read w/h (unused)."""
    from ccrawler_spark.scheduler.fetch import fetch_and_decode

    corpus = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    sched = spark.createDataFrame(
        [("u", "i", "h", 1, 0)],
        "url string, image_id string, host string, url_hash long, slot_ms int",
    )
    plan = plan_of(fetch_and_decode(sched, corpus))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l and "bytes" in l]
    assert read_schemas, plan[:500]
    # w/h are never projected ("h:" alone would false-positive on phash:)
    assert all(",w:" not in l and ",h:" not in l and "<w:" not in l
               for l in read_schemas), read_schemas


def test_seen_read_partition_pruning(spark, tiny_fixtures, tmp_path):
    """The seen table's seen_part dirs must prune via PartitionFilters."""
    from ccrawler_spark.conf import TINY
    from ccrawler_spark.functions.spark_exprs import umod_long

    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(1000)], "url_hash long, url string"
    ).withColumn("seen_part", umod_long(F.col("url_hash"), 64).cast("int"))
    df.write.partitionBy("seen_part").parquet(str(tmp_path / "seen"))
    seen = spark.read.parquet(str(tmp_path / "seen"))
    plan = plan_of(seen.filter(F.col("seen_part").isin([1, 2, 3])))
    # the partition predicate must land in PartitionFilters (dir-level
    # pruning), not PushedFilters/post-scan Filter
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any("seen_part" in l for l in pf_lines), plan[:800]


def test_textops_scalar_zero_shuffle(spark):
    """token/quality/lang-id: exactly ONE Arrow crossing (the integer
    token-count pass — round 8 migration off the interpreted-HOF
    scalar form), zero Exchanges; ratios/argmax stay JVM-side above
    it."""
    from ccrawler_spark.textops.textstats import (
        lang_id, quality_score, token_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for op in (token_stats, quality_score, lang_id):
        plan = plan_of(op(docs), mode="simple")
        assert plan.count("Exchange") == 0, f"{op.__name__}:\n{plan[:800]}"
        assert plan.count("MapInPandas") == 1, f"{op.__name__}:\n{plan[:800]}"


def test_textops_hashing_plan_shapes(spark):
    """Fingerprint builds (minhash, simhash, rolling-min fingerprint —
    all vectorized in r4 because interpreted HOF folds cost
    µs/element): exactly ONE Arrow crossing with ZERO exchanges — the
    fingerprint is computed in the scan's partitions and nothing else
    moves."""
    from ccrawler_spark.textops.dedup import minhash_signatures, simhash64
    from ccrawler_spark.textops.textstats import fingerprint

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for op in (minhash_signatures, simhash64, fingerprint):
        plan = plan_of(op(docs), mode="simple")
        assert plan.count("Exchange") == 0, f"{op.__name__}:\n{plan[:800]}"
        assert plan.count("MapInPandas") == 1, f"{op.__name__}:\n{plan[:800]}"


def test_dequeue_exchange_budget(spark):
    """The dequeue pipeline must not shuffle more than: salt window +
    host window + budget single-partition + slots reuse (≤ 4
    exchanges); the slots window must reuse the host-window
    partitioning rather than add a fifth."""
    from ccrawler_spark.conf import TINY
    from ccrawler_spark.scheduler.stages import dequeue

    fr = spark.createDataFrame(
        [(f"http://h{i%3}.example/p/{i}", f"h{i%3}.example", i, 0)
         for i in range(100)],
        "url string, host string, url_hash long, priority int",
    ).withColumn("discover_ts", F.timestamp_micros(F.lit(0))).withColumn(
        "crawl_delay_ms", F.lit(1000).cast("long")
    )
    plan = plan_of(dequeue(fr, TINY), mode="simple")
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 4, f"{n_exchanges} exchanges:\n{plan}"


def test_bootstrap_dedup_rides_layout_exchange(spark):
    """Bootstrap keep-one dedup must not add a second exchange: the
    layout repartition keys (host_bucket, umod(url_hash, 8)) are
    functions of the url, so the per-url window is satisfied by the
    existing hash partitioning (engine.bootstrap relies on this)."""
    from pyspark.sql import Window

    from ccrawler_spark.functions.spark_exprs import umod_long

    df = spark.range(100).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".x/p/"), F.col("id").cast("string")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url")).withColumn(
        "host_bucket", F.pmod(F.col("url_hash"), F.lit(64)).cast("int")
    )
    keys = [F.col("host_bucket"), umod_long(F.col("url_hash"), 8)]
    w = Window.partitionBy(*keys, "url").orderBy("url")
    out = (
        df.repartition(256, *keys)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    plan = plan_of(out, mode="simple")
    assert plan.count("Exchange") == 1, plan
