"""Python XXH64 must be bit-identical to Spark's F.xxhash64 (seed 42)."""

from pyspark.sql import functions as F

from ccrawler_spark.functions.hashing import umod, ushift, xxhash64_str


def test_xxh64_matches_spark(spark):
    samples = [
        "",
        "a",
        "http://h3.example/p/17",
        "prio|http://h499.example/p/123456",
        "x" * 31,
        "y" * 32,
        "z" * 100,
        "unicode-éü漢字",
        "cap|http://h0.example/p/0|5",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert xxhash64_str(row["s"]) == row["h"], row["s"]


def test_umod_expr_matches_python(spark):
    """The Spark unsigned-modulo expression == Python umod (SEMANTICS §1)."""
    from ccrawler_spark.functions.spark_exprs import umod_long, ushift_long

    samples = [f"u{i}" for i in range(50)]
    for m in (3, 5, 20, 499, 64):
        df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
            "s",
            umod_long(F.xxhash64("s"), m).alias("m"),
            ushift_long(F.xxhash64("s"), 16).alias("sh"),
        )
        for row in df.collect():
            k = xxhash64_str(row["s"])
            assert row["m"] == umod(k, m), (row["s"], m)
            assert row["sh"] == ushift(k, 16)


def test_expected_caption_matches_python_reference(spark):
    """O41 caption invariant moved JVM-side: spark_exprs.expected_caption
    must equal fixtures.corpus.caption_of for every URL."""
    from pyspark.sql import functions as F

    from ccrawler_spark.fixtures import corpus as ref
    from ccrawler_spark.functions.spark_exprs import expected_caption

    urls = [f"http://h{i % 53}.example/p/{i}" for i in range(300)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["cap"]
        for r in df.select("url", expected_caption(F.col("url")).alias("cap")).collect()
    }
    for u in urls:
        assert got[u] == ref.caption_of(u), u
