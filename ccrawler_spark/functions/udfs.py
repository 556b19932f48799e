"""Arrow-batched pandas UDFs (no ``from __future__ import annotations``
here — pyspark resolves the pd.Series type hints at decoration time)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def canonical_url_udf(urls: pd.Series) -> pd.Series:
    """O6 canonicalization tail (docs/SEMANTICS.md §2.1)."""
    from ccrawler_spark.urlnorm.normalize import canonicalize_batch

    return canonicalize_batch(urls)
