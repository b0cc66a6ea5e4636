"""Deterministic dense sequence assignment (discovery_order / fetch_order).

``monotonically_increasing_id`` is nondeterministic across retries and not
dense; a single global window is a one-partition bottleneck. This uses the
classic scalable construction: range-partition on the (unique, total) sort
key, count rows per partition (one tiny job over the reused shuffle), then
add per-partition offsets in a mapInPandas — each partition numbers its rows
independently. Determinism holds because the sort key is unique: range
partitioning + within-partition sort give one global total order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zip_with_order(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str,
    start: int = 0,
    num_partitions: int | None = None,
    size_hint: int | None = None,
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = start, start+1, ... in ``sort_cols`` order.

    ``sort_cols`` must be a total (duplicate-free) ordering key.
    Returns (df, total_rows) — the count falls out of the offset pass for
    free, so callers never need a separate count job.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if size_hint is not None:
            # ~50k rows per range partition floor: tiny waves shouldn't pay
            # 32 near-empty tasks per pass
            num_partitions = max(1, min(num_partitions, size_hint // 50_000 + 1))
    d = df.repartitionByRange(num_partitions, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    d = d.localCheckpoint(eager=False)

    counts = (
        d.groupBy(F.spark_partition_id().alias("__pid"))
        .count()
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    offsets = {}
    acc = start
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    total = acc - start
    bc = spark.sparkContext.broadcast(offsets)

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType())]
    )

    def add_order(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in iterator:
            pdf[out_col] = np.arange(
                base + seen, base + seen + len(pdf), dtype=np.int64
            )
            seen += len(pdf)
            yield pdf

    return d.mapInPandas(add_order, schema), total


def zip_with_order_bucketed(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str,
    bucket_col,
    start: int = 0,
) -> tuple[DataFrame, int]:
    """``zip_with_order`` without the range-partitioner SAMPLING job, for
    callers that can compute an order-preserving bucket id directly (e.g.
    the wave loop knows the exact ``parent_fetch_order`` range).

    ``bucket_col`` must be monotone in the ``sort_cols`` order (rows of a
    lower sort key never land in a higher bucket). Numbering is entirely
    JVM-side: bucket counts come from one map-side-combined agg (shuffles
    n_buckets rows, not the data), the per-bucket offsets ride in as a
    literal map expression, and one bucket-partitioned window assigns
    row_number in whole-stage codegen. The input is localCheckpoint'ed
    (lazy) ONCE so the counts job and the window job read the same
    materialization — without the pin each would recompute the upstream
    plan independently, and any recompute divergence would desynchronize
    offsets from row_number (overlapping or gapped sequence values).
    """
    from pyspark.sql import Window

    df = df.withColumn("__bkt", bucket_col.cast("int"))
    df = df.localCheckpoint(eager=False)
    counts = df.groupBy("__bkt").count().collect()
    by_bkt = {r["__bkt"]: r["count"] for r in counts}
    offsets = {}
    acc = start
    for b in sorted(by_bkt):
        offsets[b] = acc
        acc += by_bkt[b]
    total = acc - start

    w = Window.partitionBy("__bkt").orderBy(*sort_cols)
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for b, off in offsets.items() for x in (b, off)]
        )
        off_expr = F.element_at(off_map, F.col("__bkt"))
    else:
        off_expr = F.lit(start)
    out = df.withColumn(
        out_col,
        (F.row_number().over(w) - 1 + off_expr).cast("long"),
    ).drop("__bkt")
    return out, total
