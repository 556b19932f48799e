"""Arrow-batched pandas UDFs (no ``from __future__ import annotations``
here — pyspark resolves the pd.Series type hints at decoration time)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType


@F.pandas_udf(StringType())
def canonical_url_udf(urls: pd.Series) -> pd.Series:
    """O6 canonicalization tail (docs/SEMANTICS.md §2.1)."""
    from ccrawler_spark.urlnorm.normalize import canonicalize_batch

    return canonicalize_batch(urls)


def make_bloom_probe_udf(spark, segments, num_hashes):
    """O11: scalar pandas_udf probing the broadcast segmented bloom.

    ``segments``: dict host_bucket → np.uint8 bitset. False ⇒ definitely
    not seen (skip exact join); True ⇒ verify exactly (O12).
    """
    bc = spark.sparkContext.broadcast(segments)

    @F.pandas_udf(BooleanType())
    def probe(url_hash: pd.Series, host_bucket: pd.Series) -> pd.Series:
        from ccrawler_spark.bloom import filter as bf

        segs = bc.value
        h = url_hash.to_numpy(dtype=np.int64)
        b = host_bucket.to_numpy(dtype=np.int64)
        maybe = np.ones(len(h), dtype=bool)
        for bucket in np.unique(b):
            mask = b == bucket
            maybe[mask] = bf.probe(segs.get(int(bucket)), h[mask], num_hashes)
        return pd.Series(maybe)

    return probe
