"""DocumentScope projections, report/export sinks, HEAD fetch,
cancellation and the per-wave callback."""

import os

import pytest
from pyspark.sql import functions as F

from cobweb_spark.config import CrawlConfig
from cobweb_spark.model import FRONTIER_SCHEMA
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.sources.corpus import corpus_df
from cobweb_spark.testkit import fixtures as fx
from cobweb_spark.urls import host_of

pytestmark = pytest.mark.spark

BASE = fx.SAMPLE_SITE_BASE


@pytest.fixture(scope="module")
def docs(spark, sample_site_corpus):
    df = corpus_df(spark, sample_site_corpus).cache()
    df.count()
    return df


class TestDocumentScope:
    def test_title_and_counts(self, spark, docs):
        from cobweb_spark.operators.document_scope import document_scope

        scope = {
            r["doc_id"]: r for r in document_scope(docs).collect()
        }
        idx = scope["http://localhost:3532/"]
        assert idx["title"] == "CleanDream"
        assert idx["anchor_count"] > 10
        assert idx["style_count"] >= 18  # the @import block
        gallery = scope["http://localhost:3532/gallery.html"]
        assert gallery["image_count"] > 5


class TestHeadFetch:
    def test_head_follows_redirects(self, spark):
        from cobweb_spark.operators.sinks import head_fetch

        corpus = fx.build_redirect_corpus()
        rdocs = corpus_df(spark, corpus)
        frontier = spark.createDataFrame(
            [
                (
                    "http://redirect-me.com/redirect.html",
                    host_of("http://redirect-me.com/redirect.html"),
                    0,
                    0,
                    None,
                )
            ],
            FRONTIER_SCHEMA,
        ).withColumn("wave_rank", F.col("discovery_order"))
        row = head_fetch(frontier, rdocs, CrawlConfig()).collect()[0]
        assert row["fetch_url"] == "http://redirected-to.com/redirected.html"
        assert row["status_code"] == 200
        assert "spans" not in head_fetch(
            frontier, rdocs, CrawlConfig()
        ).columns


class TestSinks:
    def test_report_csv(self, spark, docs, tmp_path):
        from cobweb_spark.operators.sinks import write_report_csv

        res = SparkCrawler(
            spark, docs, CrawlConfig(crawl_limit=10)
        ).crawl(BASE)
        out = str(tmp_path / "report")
        write_report_csv(res.pages, docs, out)
        back = spark.read.option("header", True).csv(out)
        assert back.count() == 10
        assert "title" in back.columns
        assert (
            back.filter("url = 'http://localhost:3532/'")
            .collect()[0]["title"]
            == "CleanDream"
        )

    def test_export_partitioned(self, spark, docs, tmp_path):
        from cobweb_spark.operators.sinks import write_export

        res = SparkCrawler(
            spark, docs, CrawlConfig(crawl_limit=5)
        ).crawl(BASE)
        out = str(tmp_path / "mirror")
        write_export(res.pages, docs, out)
        back = spark.read.parquet(out)
        assert back.count() == 5
        assert "spans" in back.columns
        assert any(
            d.startswith("host=") for d in os.listdir(out) if "=" in d
        )


class TestHooks:
    def test_on_wave_callback(self, spark, docs):
        seen_waves = []

        def hook(pages_df, m):
            seen_waves.append((m["wave_id"], pages_df.count()))

        SparkCrawler(spark, docs, CrawlConfig()).crawl(
            BASE, on_wave=hook
        )
        assert [w for w, _n in seen_waves] == list(range(len(seen_waves)))
        assert sum(n for _w, n in seen_waves) == 78

    def test_cancel_between_waves(self, spark, docs):
        calls = []

        def cancel():
            calls.append(1)
            # the flag is polled twice per wave since round 4 (loop head
            # + between fetch and expand); call 5 is wave 2's head poll
            return len(calls) >= 5  # cancel before wave 2

        res = SparkCrawler(spark, docs, CrawlConfig()).crawl(
            BASE, cancel=cancel
        )
        assert res.pages.select("wave_id").distinct().count() == 2
        assert res.frontier_remaining.count() > 0
