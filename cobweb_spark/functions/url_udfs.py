"""Arrow-batched pandas UDFs for URL work that has no JVM builtin.

Only two Python touchpoints exist on the hot path (per the input_hint: no
per-row Python UDFs): URL canonicalization (the fetch join key,
``lib/cobweb.rb:124-127``) and the per-batch link absolutization inside the
extraction ``mapInPandas`` (``operators/extract.py``). Both memoize per
worker — URL sets are highly repetitive within a host shard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..urls import canonicalize, host_of


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    # canonicalize() is lru_cached; .map hits the cache for repeated URLs
    return urls.map(canonicalize, na_action="ignore")


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore")
