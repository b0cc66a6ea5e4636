"""Bloom/cuckoo filter tier: numpy unit tests + Spark integration."""

import numpy as np
import pytest

from cobweb_spark.filters_np import BloomFilter, CuckooFilter, ShardFilter


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=10_000, fpp=0.01)
        keys = np.random.default_rng(1).integers(
            0, 2**63, 10_000, dtype=np.int64
        ).astype(np.uint64)
        bf.add(keys)
        assert bf.contains(keys).all()

    def test_fpp_bounded(self):
        bf = BloomFilter(capacity=10_000, fpp=0.01)
        rng = np.random.default_rng(2)
        keys = rng.integers(0, 2**62, 10_000, dtype=np.int64).astype(
            np.uint64
        )
        bf.add(keys)
        other = (
            rng.integers(0, 2**62, 50_000, dtype=np.int64).astype(np.uint64)
            + np.uint64(2**62)
        )
        fp_rate = bf.contains(other).mean()
        assert fp_rate < 0.03

    def test_roundtrip(self):
        bf = BloomFilter(capacity=1000, fpp=0.01)
        keys = np.arange(500, dtype=np.uint64)
        bf.add(keys)
        bf2 = BloomFilter.from_bytes(bf.to_bytes(), 1000, 0.01, bf.n_keys)
        assert bf2.contains(keys).all()


class TestCuckoo:
    def test_insert_query(self):
        cf = CuckooFilter(n_buckets=1 << 10)
        keys = np.arange(1000, dtype=np.uint64) * 7919
        cf.insert(keys)
        assert cf.contains(keys).all()

    def test_delete(self):
        cf = CuckooFilter(n_buckets=1 << 10)
        keys = np.arange(100, dtype=np.uint64) * 104729
        cf.insert(keys)
        removed = cf.delete(keys[:50])
        assert removed.all()
        assert cf.contains(keys[50:]).all()

    def test_overflow_goes_to_stash_no_false_negatives(self):
        # tiny table forces kicks + stash
        cf = CuckooFilter(n_buckets=8)
        keys = np.arange(200, dtype=np.uint64) * 65537
        cf.insert(keys)
        assert cf.contains(keys).all()
        assert len(cf.stash) > 0

    def test_roundtrip_with_stash(self):
        cf = CuckooFilter(n_buckets=8)
        keys = np.arange(150, dtype=np.uint64) * 31337
        cf.insert(keys)
        cf2 = CuckooFilter.from_bytes(cf.to_bytes())
        assert cf2.contains(keys).all()
        assert len(cf2.stash) == len(cf.stash)


class TestShardFilter:
    def test_bloom_overflow_to_cuckoo(self):
        sf = ShardFilter(capacity=100, fpp=0.01)
        keys = (np.arange(300, dtype=np.int64) * 7919 + 1).astype(np.int64)
        sf.add(keys)
        assert sf.contains(keys).all()
        assert sf.cuckoo.n_items == 200

    def test_state_roundtrip(self):
        sf = ShardFilter(capacity=100, fpp=0.01)
        keys = (np.arange(250, dtype=np.int64) * 104729 + 5).astype(np.int64)
        sf.add(keys)
        b, n, c = sf.to_state()
        sf2 = ShardFilter.from_state(b, n, c, 100, 0.01)
        assert sf2.contains(keys).all()


@pytest.mark.spark
class TestSeenFilterBankSpark:
    def test_mark_probable(self, spark):
        from cobweb_spark.operators.filters import SeenFilterBank

        bank = SeenFilterBank(
            spark, n_shards=4, capacity_per_shard=1000, fpp=0.01
        )
        seen_urls = spark.createDataFrame(
            [(f"http://h{i % 7}.com/p{i}",) for i in range(500)], "url string"
        )
        bank.add(seen_urls)

        cands = spark.createDataFrame(
            [(f"http://h{i % 7}.com/p{i}",) for i in range(400, 900)],
            "link string",
        )
        marked = bank.mark_probable(cands, key_col="link")
        rows = {r["link"]: r["__maybe_seen"] for r in marked.collect()}
        assert len(rows) == 500
        # every actually-seen candidate must be flagged (no false negatives)
        for i in range(400, 500):
            assert rows[f"http://h{i % 7}.com/p{i}"] is True
        # most unseen candidates pass as definite misses
        unseen_flagged = sum(
            1 for i in range(500, 900) if rows[f"http://h{i % 7}.com/p{i}"]
        )
        assert unseen_flagged < 40

    def test_crawl_parity_with_prefilter(self, spark, sample_site_corpus):
        """The bloom tier must not change crawl results — only routing."""
        from cobweb_spark.config import CrawlConfig
        from cobweb_spark.operators.filters import SeenFilterBank
        from cobweb_spark.oracle import CrawlOracle
        from cobweb_spark.plans.crawler import SparkCrawler
        from cobweb_spark.sources.corpus import corpus_df
        from cobweb_spark.testkit import fixtures as fx

        docs = corpus_df(spark, sample_site_corpus).cache()
        cfg = CrawlConfig()
        bank = SeenFilterBank(
            spark, n_shards=4, capacity_per_shard=4096, fpp=0.01
        )
        res = SparkCrawler(
            spark, docs, cfg, seen_prefilter=bank
        ).crawl(fx.SAMPLE_SITE_BASE)
        oracle = CrawlOracle(sample_site_corpus, cfg).crawl(
            fx.SAMPLE_SITE_BASE
        )
        assert res.fetch_sequence() == oracle.fetch_sequence
        assert {r["url"] for r in res.seen.collect()} == oracle.seen
