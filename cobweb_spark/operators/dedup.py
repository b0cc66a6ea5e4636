"""Seen-set rejection — the heart of the engine.

The reference holds the seen-set in Redis sets and does per-link
``sismember`` round-trips (``lib/crawl.rb:130``,
``lib/cobweb_crawler.rb:118-119``). Here the seen-set is a DataFrame of
queued-form URLs (plus their xxhash64 key) and rejection is one
``left_anti`` equi-join per wave.

Scale tier (north rule): a partitioned bloom filter with a cuckoo-filter
overflow, keyed by xxhash64(url), prefilters candidates *before* the
anti-join: bloom misses are definitely-new and skip the join entirely;
only probable-hits flow into the exact anti-join, which remains the
correctness backstop (a false positive merely routes a new URL through the
join, never drops it). See ``cobweb_spark/operators/filters.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reject_seen(
    candidates: DataFrame,
    seen: DataFrame,
    prefilter=None,
    materialize: bool = True,
) -> DataFrame:
    """candidates minus seen (on the queued-form URL string).

    ``prefilter`` is an optional SeenFilterBank (bloom+cuckoo tier): when
    given, candidates are split into definite-misses (pass through —
    they never scan, shuffle against or join the seen table, THE saving
    at a 10^10-row seen set) and probable-hits (exact anti-join, the
    correctness backstop).

    The flagged stream is materialized before the split (``materialize``):
    both branches read one checkpointed pass instead of re-executing the
    whole extract→classify→dedup→probe pipeline per branch.
    """
    if prefilter is None:
        return candidates.join(
            seen.select(F.col("url").alias("link")), "link", "left_anti"
        )

    flagged = prefilter.mark_probable(candidates, key_col="link")
    if materialize:
        flagged = flagged.localCheckpoint()
    misses = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    probable = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    survivors = probable.join(
        seen.select(F.col("url").alias("link")), "link", "left_anti"
    )
    return misses.unionByName(survivors)
