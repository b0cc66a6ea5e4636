"""spark-submit entry point for the crawl (north rule packaging).

Usage:
    python tools/make_pyfiles_zip.py  # build dist/cobweb_spark.zip
    spark-submit --master local-cluster[8,4,12288] \
        --py-files dist/cobweb_spark.zip \
        tools/submit_crawl.py --corpus <parquet> --seeds <file> \
        [--budget N] [--state-dir DIR]

Prints one JSON result line. This is the cluster-shaped path: the package
arrives via --py-files (no repo checkout on executors), input is a parquet
(or Iceberg) documents table, state snapshots land in --state-dir.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--seeds", required=True, help="file, one URL per line")
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--state-dir", default=None)
    ap.add_argument("--internal", action="append", default=["http://*"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cobweb-crawl").getOrCreate()

    from cobweb_spark.config import CrawlConfig
    from cobweb_spark.plans.crawler import SparkCrawler
    from cobweb_spark.plans.state import SnapshotStore
    from cobweb_spark.sources.corpus import load_documents

    with open(args.seeds) as f:
        seeds = [line.strip() for line in f if line.strip()]

    docs = load_documents(spark, args.corpus)
    cfg = CrawlConfig(
        internal_urls=args.internal,
        seed_urls=seeds,
        host_budget=args.budget,
        store_inbound_links=False,
    )
    store = (
        SnapshotStore(spark, args.state_dir) if args.state_dir else None
    )
    t0 = time.time()
    res = SparkCrawler(spark, docs, cfg, snapshot_store=store).crawl(None)
    n = res.pages.count()
    t = time.time() - t0
    print(
        json.dumps(
            {
                "fetched": n,
                "seconds": round(t, 2),
                "urls_per_sec": round(n / t, 1),
                "waves": res.n_waves,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
