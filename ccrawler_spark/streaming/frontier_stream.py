"""Structured Streaming surface (SURVEY.md §2.I, O42-O45) — optional M6.

The primary engine is deterministic batch rounds (exact ordering parity
is only provable with deterministic batch boundaries — SURVEY.md §2.I
warning). This module provides the streaming variant for continuous
operation where ordering parity is relaxed to seen-set/effect parity:

  O42  micro-batch frontier feed: a file stream over the snapshot
       store's ``frontier/adds-r*`` delta dirs (round ↔ micro-batch),
       or Trigger.AvailableNow for drain-and-stop runs
  O43  stateful per-host politeness via applyInPandasWithState —
       per-host (last_slot, budget) state across micro-batches
  O44  watermarked discovery-rate aggregation (tumbling windows on
       discover_ts; late URLs beyond the watermark fall to the next
       batch, which the batch engine does trivially)
  O45  streaming URL dedup: dropDuplicatesWithinWatermark on url_hash

Everything here reuses the batch stages' column conventions so a
streaming frontier can be snapshotted back into the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType, TimestampType,
)

from ccrawler_spark.conf import CrawlConf

FRONTIER_STREAM_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("url_hash", LongType()),
    StructField("host", StringType()),
    StructField("host_bucket", IntegerType()),
    StructField("priority", IntegerType()),
    StructField("discover_ts", TimestampType()),
    StructField("depth", IntegerType()),
    StructField("image_id", StringType()),
    StructField("status", StringType()),
    StructField("retry_count", IntegerType()),
])


def frontier_delta_stream(spark: SparkSession, store_root: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    """O42: each committed round's adds-delta becomes a micro-batch.
    Enqueue events are exactly: the bootstrap base (base-r0) plus every
    adds-* delta. Compaction bases (base-r{n>0}) are REWRITES of rows
    already streamed — including them would re-emit every still-queued
    row past the dedup watermark and double-count discovery rates — and
    removes-* are equality deletes with a different schema; both stay
    out of the glob. ``max_files_per_trigger`` splits a drain into
    several micro-batches (append-mode windows flush only when a later
    batch advances the watermark)."""
    reader = (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(f"{store_root}/data/frontier/{{base-r0,adds-r*}}")


def streaming_dedup(frontier: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """O45: watermark-bounded exact dedup on (url_hash, url) — the
    streaming analogue of the O12 anti-join (state-store backed)."""
    return frontier.withWatermark("discover_ts", delay).dropDuplicatesWithinWatermark(
        ["url_hash", "url"]
    )


def discovery_rate(frontier: DataFrame, delay: str = "10 minutes",
                   window: str = "1 minute",
                   set_watermark: bool = True) -> DataFrame:
    """O44: per-(window, host_bucket) enqueue rates with late-data
    handling — the streaming metrics feed. Pass set_watermark=False
    when chaining after an operator that already declared one
    (redefining a watermark is disallowed)."""
    if set_watermark:
        frontier = frontier.withWatermark("discover_ts", delay)
    return (
        frontier
        .groupBy(F.window("discover_ts", window), "host_bucket")
        .agg(F.count("*").alias("enqueued"),
             F.approx_count_distinct("host").alias("hosts"))
    )


POLITENESS_STATE_SCHEMA = "last_slot_ms long, fetched long"
POLITENESS_OUT_SCHEMA = (
    "host string, url string, url_hash long, slot_ms long, seq_in_host long"
)


def stateful_politeness(frontier: DataFrame, conf: CrawlConf) -> DataFrame:
    """O43: per-host politeness slots maintained as streaming state.

    Each micro-batch assigns the host's next slots continuing from the
    persisted ``last_slot_ms`` — the streaming form of O27's virtual
    time (never wall clock). Ordering within a batch uses the same
    total ORD key as the batch engine.
    """
    import numpy as np
    import pandas as pd

    delay_ms = conf.default_crawl_delay_ms

    def assign(key, pdf_iter, state):
        (host,) = key
        if state.exists:
            last_slot, fetched = state.get
        else:
            last_slot, fetched = -delay_ms, 0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["priority", "discover_ts", "url_hash", "url"])
            n = len(pdf)
            # vectorized slot arithmetic: next n slots continue from the
            # persisted last_slot at delay_ms spacing (no per-row loop)
            slots = last_slot + (np.arange(n, dtype=np.int64) + 1) * delay_ms
            seqs = fetched + np.arange(n, dtype=np.int64) + 1
            out.append(pd.DataFrame({
                "host": host,
                "url": pdf["url"].to_numpy(),
                "url_hash": pdf["url_hash"].to_numpy(),
                "slot_ms": slots,
                "seq_in_host": seqs,
            }))
            if n:
                last_slot = int(slots[-1])
                fetched = int(seqs[-1])
        state.update((last_slot, fetched))
        yield pd.concat(out) if out else pd.DataFrame(
            columns=["host", "url", "url_hash", "slot_ms", "seq_in_host"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return frontier.groupBy("host").applyInPandasWithState(
        assign,
        outputStructType=POLITENESS_OUT_SCHEMA,
        stateStructType=POLITENESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
