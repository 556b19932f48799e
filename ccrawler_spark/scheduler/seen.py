"""O11 bloom pre-filter + O12 exact URL-seen anti-join.

The seen set is exact (BASELINE.json:6 "final URL-seen set exactly"):
the bloom is only a negative-membership fast path. A candidate whose
bloom probe says "definitely new" skips the exact join entirely; only
"maybe seen" candidates are verified against the seen table, and the
seen scan is partition-pruned to the ``seen_part`` values those
candidates actually hit (SURVEY.md §4.2).

Dedup equality is on the (url_hash, url) pair — hash as shuffle key,
full string as equality confirmation (collision rule, SURVEY.md §5.5).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccrawler_spark.conf import CrawlConf
from ccrawler_spark.functions.spark_exprs import umod_long
from ccrawler_spark.functions.udfs import make_bloom_probe_udf


def seen_dedup(
    candidates: DataFrame,
    seen: DataFrame,
    conf: CrawlConf,
    bloom_segments: dict[int, np.ndarray] | None,
) -> DataFrame:
    """Return candidates not in the seen set (exact)."""
    spark = candidates.sparkSession
    if bloom_segments is not None:
        probe = make_bloom_probe_udf(spark, bloom_segments, conf.bloom_num_hashes)
        candidates = candidates.withColumn(
            "_maybe_seen", probe(F.col("url_hash"), F.col("host_bucket"))
        )
        definitely_new = candidates.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybes = candidates.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    else:
        definitely_new = None
        maybes = candidates

    maybes = maybes.withColumn(
        "_seen_part", umod_long(F.col("url_hash"), conf.seen_partitions).cast("int")
    )
    # partition-pruned exact verification: only seen partitions that can
    # contain a maybe-candidate are scanned (Catalyst prunes seen_part dirs)
    survivors = maybes.join(
        seen.withColumnRenamed("seen_part", "_seen_part"),
        on=["_seen_part", "url_hash", "url"],
        how="left_anti",
    ).drop("_seen_part")
    if definitely_new is not None:
        return definitely_new.unionByName(survivors)
    return survivors
