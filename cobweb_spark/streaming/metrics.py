"""Structured-Streaming per-minute metrics — the Stats time-series tier.

The reference keeps per-minute counters in Redis hashes with an eviction
sweep (``lib/stats.rb:150,211-228``). The streaming analogue: a file-source
``readStream`` over an events/pages feed → watermarked 1-minute tumbling
windows → counts per window, with the watermark subsuming the reference's
manual retention delete.

The crawl loop itself is NOT Structured Streaming — the frontier is
feedback (wave N output feeds wave N+1), which SS cannot express without
external round-trips (SURVEY §2.10); this module covers the genuinely
streaming surface (monitoring feeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def minute_counts_stream(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    group_col: str | None = None,
    watermark: str = "5 minutes",
) -> DataFrame:
    """File-source stream → per-minute (optionally per-key) counts."""
    stream = spark.readStream.schema(schema).parquet(path)
    # watermarks require TIMESTAMP (with timezone); parquet often carries NTZ
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.window(F.col(ts_col), "1 minute")
    keys = [win] + ([F.col(group_col)] if group_col else [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("minute"),
            *([F.col(group_col)] if group_col else []),
            "n",
        )
    )


def run_available_now(agg: DataFrame, query_name: str = "minute_counts"):
    """Drain everything currently available into an in-memory sink and
    return the result as a (batch) DataFrame — the test/bench harness."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.sql(f"select * from {query_name}")
