"""O17 fetch join + O41 vectorized decode & per-row invariants.

"Fetching" a scheduled URL = joining it to its corpus row on image_id
(the corpus table replaces the live web, BASELINE.json:6) and decoding
the image payload. Decode runs in ``mapInArrow`` — Arrow RecordBatches
cross the JVM↔Python boundary once per batch, the numpy codecs operate
per image (BASELINE.json:15: vectorized Arrow/pandas UDFs, never
row-at-a-time Python ``F.udf``).

Per-row invariants (BASELINE.json:15), computed against the
deterministic reference pixels (docs/SEMANTICS.md §3):
  pixels_ok  — exact equality for lossless fmts; PSNR ≥ 40 dB for dct8
  caption_ok — byte-for-byte caption equality
  phash_ok   — recomputed phash: equal (lossless) / Hamming ≤ 2 (dct8)
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_CHECK_FIELDS = [
    StructField("url", StringType()),
    StructField("fetch_ok", BooleanType()),
    StructField("pixels_ok", BooleanType()),
    StructField("caption_ok", BooleanType()),
    StructField("phash_ok", BooleanType()),
    StructField("psnr_db", DoubleType()),
    StructField("dec_w", IntegerType()),
    StructField("dec_h", IntegerType()),
]


def _decode_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    import numpy as np

    from ccrawler_spark import codecs
    from ccrawler_spark.fixtures import corpus as ref

    for batch in batches:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        phashes = batch.column("phash").to_pylist()
        n = len(urls)
        out = {
            "url": urls,
            "fetch_ok": [False] * n,
            "pixels_ok": [False] * n,
            "caption_ok": [False] * n,
            "phash_ok": [False] * n,
            "psnr_db": [0.0] * n,
            "dec_w": [0] * n,
            "dec_h": [0] * n,
        }
        for i in range(n):
            if payloads[i] is None:
                continue  # corpus miss → fetch_ok stays False
            try:
                dec = codecs.decode(payloads[i], fmts[i])
            except Exception:
                continue
            out["fetch_ok"][i] = True
            out["dec_h"][i], out["dec_w"][i] = int(dec.shape[0]), int(dec.shape[1])
            expected = ref.pixels_of(urls[i])
            if expected.shape != dec.shape:
                continue
            if fmts[i] == "dct8":
                p = codecs.psnr(expected, dec)
                out["psnr_db"][i] = p if p != float("inf") else 999.0
                out["pixels_ok"][i] = bool(p >= 40.0)
                dist = bin(
                    (ref.phash_of(dec) ^ phashes[i]) & ((1 << 64) - 1)
                ).count("1")
                out["phash_ok"][i] = dist <= 2
            else:
                eq = bool(np.array_equal(expected, dec))
                out["pixels_ok"][i] = eq
                # lossless + equal ⇒ PSNR is +inf by definition; only
                # compute it for a failing row (diagnostic)
                out["psnr_db"][i] = (
                    999.0 if eq else codecs.psnr(expected, dec)
                )
                out["phash_ok"][i] = ref.phash_of(dec) == phashes[i]
            out["caption_ok"][i] = ref.caption_of(urls[i]) == caps[i]
        yield pa.RecordBatch.from_pydict(
            {
                "url": pa.array(out["url"], pa.string()),
                "fetch_ok": pa.array(out["fetch_ok"], pa.bool_()),
                "pixels_ok": pa.array(out["pixels_ok"], pa.bool_()),
                "caption_ok": pa.array(out["caption_ok"], pa.bool_()),
                "phash_ok": pa.array(out["phash_ok"], pa.bool_()),
                "psnr_db": pa.array(out["psnr_db"], pa.float64()),
                "dec_w": pa.array(out["dec_w"], pa.int32()),
                "dec_h": pa.array(out["dec_h"], pa.int32()),
            }
        )


def fetch_and_decode(scheduled: DataFrame, corpus: DataFrame) -> DataFrame:
    """Join scheduled URLs (≤ K rows) to the corpus and decode.

    The scheduled side is tiny relative to the corpus (≤ K rows), so it
    is broadcast and the corpus is never shuffled. Spark cannot
    broadcast the left side of a left-outer join, so misses are
    recovered with a small anti-join instead: hits = broadcast-inner,
    misses = scheduled ∖ hits (fetch_ok=false rows — they still occupy
    their politeness slot, SEMANTICS.md §6 step 6).
    """
    hits = corpus.select("image_id", "bytes", "fmt", "caption", "phash").join(
        scheduled.select("image_id", "url").hint("broadcast"),
        on="image_id", how="inner",
    )
    # AQE coalesces the join output toward 64MB partitions, which starves
    # the Arrow workers (decode is CPU-bound, ~0.5 ms/image, not
    # IO-bound) — spread the batch across every core before the UDF
    spark = scheduled.sparkSession
    n_slots = spark.sparkContext.defaultParallelism * 2
    checks = (
        hits.select("url", "bytes", "fmt", "caption", "phash")
        .repartition(n_slots)
        .mapInArrow(_decode_batches, StructType(DECODE_CHECK_FIELDS))
    )
    out = scheduled.join(checks.hint("broadcast"), on="url", how="left")
    return (
        out.withColumn("fetch_ok", F.coalesce("fetch_ok", F.lit(False)))
        .withColumn("pixels_ok", F.coalesce("pixels_ok", F.lit(False)))
        .withColumn("caption_ok", F.coalesce("caption_ok", F.lit(False)))
        .withColumn("phash_ok", F.coalesce("phash_ok", F.lit(False)))
        .withColumn("psnr_db", F.coalesce("psnr_db", F.lit(0.0)))
    )
