"""Streaming frontier feed: continuous URL-seen dedup.

The reference is a continuous system (each job re-enqueues children,
``lib/crawl_job.rb:24-32``); the batch engine replays it as BFS waves.
This module covers the genuinely streaming shape: a feed of *discovered*
URLs (e.g. from an external fetcher fleet) deduplicated continuously.

Two tiers:

* ``dedup_within_watermark`` — built-in ``dropDuplicatesWithinWatermark``
  on the canonical URL: exact within the watermark horizon, state evicted
  automatically (the streaming analogue of the reference's Redis seen-set
  with TTL-ish retention, ``lib/stats.rb:222-227``).
* ``dedup_with_bloom_state`` — ``applyInPandasWithState``: each URL-hash
  shard keeps a serialized bloom filter in state (unbounded horizon,
  constant memory). A bloom hit may drop a true-new URL (state here is
  probabilistic-only — the batch engine keeps the exact anti-join; this
  tier is for feeds where ~1% over-dedup is acceptable, e.g. recrawl
  scheduling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..filters_np import BloomFilter

DEDUPED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("shard", T.IntegerType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_keys", T.LongType()),
    ]
)


def dedup_within_watermark(
    urls_stream: DataFrame, ts_col: str = "ts", horizon: str = "10 minutes"
) -> DataFrame:
    """Exact streaming dedup with bounded state (watermark eviction)."""
    return (
        urls_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["url"])
    )


def dedup_with_bloom_state(
    urls_stream: DataFrame,
    n_shards: int = 16,
    capacity_per_shard: int = 1 << 17,
    fpp: float = 0.01,
) -> DataFrame:
    """Custom stateful dedup: per-shard bloom bitsets in streaming state."""
    sharded = urls_stream.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    ).withColumn("key", F.xxhash64("url"))

    def update(key, pdfs, state: GroupState):
        import numpy as np

        shard = int(key[0])
        if state.exists:
            bits, n_keys = state.get
            bloom = BloomFilter.from_bytes(
                bytes(bits), capacity_per_shard, fpp, int(n_keys)
            )
        else:
            bloom = BloomFilter(capacity_per_shard, fpp)
        out = []
        for pdf in pdfs:
            keys = pdf["key"].values.astype(np.int64).view(np.uint64)
            fresh_mask = ~bloom.contains(keys)
            # dedup within the batch too: first occurrence wins
            fresh = pdf.loc[fresh_mask, ["url"]].drop_duplicates("url")
            bloom.add(
                keys[fresh_mask]
            )
            if len(fresh):
                fresh = fresh.assign(shard=shard)
                out.append(fresh)
        state.update((bloom.to_bytes(), bloom.n_keys))
        if out:
            yield pd.concat(out)

    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=DEDUPED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now_append(df: DataFrame, query_name: str) -> DataFrame:
    """Drain an append-mode stream (e.g. the dedup tiers) into an
    in-memory sink under an ``availableNow`` trigger and return the
    accumulated rows as a batch DataFrame — the deterministic one-shot
    harness the correctness gate runs (state lives only for the run;
    a fixed input feed gives a fixed output table)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"select * from {query_name}")
