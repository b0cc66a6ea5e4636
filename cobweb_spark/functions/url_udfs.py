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

# already-canonical fast path: lowercase scheme+host, a "/" path, no
# fragment/percent-escapes/port/userinfo/whitespace. canonicalize() is the
# identity on these (the overwhelming case in web corpora — discovered
# links are absolutized from canonical page URLs), so only the residue
# pays per-element Python.
# fullmatch (not match+$: '$' matches before a trailing newline) and a
# REQUIRED non-empty query after '?' — canonicalize() strips a bare '?'
# ('http://h/p?' → 'http://h/p'), so such URLs must take the slow path.
_CANONICAL_RE = r"https?://[a-z0-9.\-]+/[^#%?\s]*(\?[^#%\s]+)?"


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    s = urls.astype("string")
    fast = (
        s.str.fullmatch(_CANONICAL_RE)
        & ~s.str.contains("/./", regex=False)
        & ~s.str.contains("/../", regex=False)
        & ~s.str.endswith("/.")
        & ~s.str.endswith("/..")
    ).fillna(False)
    if fast.all():
        return urls.copy()
    out = urls.copy()
    slow = ~fast
    # canonicalize() is lru_cached; .map hits the cache for repeated URLs
    out[slow] = urls[slow].map(canonicalize, na_action="ignore")
    return out


_HOST_FAST_RE = r"^[a-z]+://([a-z0-9.\-]+)(?:/|$)"


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    s = urls.astype("string")
    # portless lowercase hosts extract vectorized; ports/userinfo/case pay
    # the per-element parse
    ext = s.str.extract(_HOST_FAST_RE, expand=False)
    fast = ext.notna()
    if fast.all():
        return pd.Series(ext.astype(object), index=urls.index)
    out = pd.Series(ext.astype(object), index=urls.index)
    slow = ~fast
    out[slow] = urls[slow].map(host_of, na_action="ignore")
    return out
