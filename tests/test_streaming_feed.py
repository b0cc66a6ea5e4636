"""Streaming frontier-feed dedup tests (file-source, availableNow)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"select * from {name}")


@pytest.fixture()
def feed(spark, tmp_path):
    rows = [
        (f"http://h{i % 5}.com/p{i % 40}", i)  # 100 events, 40 unique urls
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "url string, seq long").withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    )
    path = str(tmp_path / "feed")
    df.write.parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


class TestWatermarkDedup:
    def test_exact_within_horizon(self, spark, feed):
        from cobweb_spark.streaming.frontier_feed import (
            dedup_within_watermark,
        )

        out = _drain(dedup_within_watermark(feed), "wm_dedup")
        assert out.select("url").distinct().count() == 40
        assert out.count() == 40


class TestBloomStateDedup:
    def test_streaming_bloom_dedup(self, spark, feed):
        from cobweb_spark.streaming.frontier_feed import (
            dedup_with_bloom_state,
        )

        out = _drain(
            dedup_with_bloom_state(feed.select("url"), n_shards=4),
            "bloom_dedup",
        )
        urls = [r["url"] for r in out.collect()]
        assert len(urls) == len(set(urls))  # no duplicates emitted
        assert len(urls) == 40  # fpp negligible at this size
