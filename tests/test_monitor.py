"""O18/O20/O21/O23/O24 observability + phash near-dup operators."""

from pyspark.sql import functions as F

from ccrawler_spark.conf import TINY


def test_phash_near_dup_on_corpus(spark, tiny_fixtures):
    """O18: identical-phash rows must pair; hamming is exact."""
    from ccrawler_spark.textops.dedup import phash_near_pairs

    corpus = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    pairs = phash_near_pairs(corpus, max_hamming=0)
    rows = pairs.collect()
    # ground truth: group by phash, count C(n,2) per group
    from collections import Counter

    counts = Counter(r["phash"] for r in corpus.select("phash").collect())
    expected = sum(n * (n - 1) // 2 for n in counts.values())
    assert len(rows) == expected
    assert all(r["hamming"] == 0 for r in rows)


def test_monitor_sketches_and_hot_hosts(spark, tiny_fixtures):
    from ccrawler_spark.scheduler import monitor
    from ccrawler_spark.scheduler.stages import with_url_derivations

    hosts = spark.read.parquet(f"{tiny_fixtures}/hosts.parquet")
    urls = hosts.select(
        F.explode(F.sequence(F.lit(0), F.col("pages") - 1)).alias("j"), "host"
    ).select(
        F.concat(F.lit("http://"), "host", F.lit("/p/"),
                 F.col("j").cast("string")).alias("url")
    )
    fr = with_url_derivations(urls, TINY).withColumn(
        "priority", F.lit(0)
    ).withColumn("discover_ts", F.timestamp_micros(F.lit(0)))

    depth = monitor.frontier_depth_stats(fr)
    assert depth.agg(F.sum("queued")).first()[0] == urls.count()

    sk = monitor.cardinality_sketches(fr)
    row = sk.first()
    assert abs(row["approx_hosts"] - 20) <= 2
    merged = monitor.merge_sketches(sk)
    m = merged.first()
    assert abs(m["distinct_hosts_alltime"] - 20) <= 2
    assert abs(m["distinct_urls_alltime"] - urls.count()) / urls.count() < 0.05

    hot = monitor.hot_hosts(fr, TINY).collect()
    # Zipf(1.2) over 20 hosts: h0 holds ~35% of pages — clearly hot
    assert any(r["host"] == "h0.example" for r in hot)
    assert all(r["suggested_fanout"] >= 2 for r in hot)
