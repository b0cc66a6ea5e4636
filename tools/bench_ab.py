"""Crawl-only A/B timing harness: repeats alternating configs in fresh
subprocesses (own JVM each) so cache/JIT warm-up and run-to-run noise can
be seen and amortized. Used to size prefilter_min_seen and to sanity-check
headline numbers before the scaling run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRAWL_ONLY = """
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from cobweb_spark.config import CrawlConfig
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.session import get_spark
from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents
spark = get_spark(app_name="ab")
corpus_path, seeds = cached_scale_corpus(**%(params)s)
docs = load_documents(spark, corpus_path)
cfg = CrawlConfig(internal_urls=["http://*"], seed_urls=seeds,
                  store_inbound_links=False, precompute_edges=False,
                  **%(cfg)s)
t0 = time.time()
res = SparkCrawler(spark, docs, cfg).crawl(None)
n = res.pages.count()
t = time.time() - t0
print("RESULT " + json.dumps({"fetched": n, "seconds": round(t, 2),
      "urls_per_sec": round(n / t, 1),
      "metrics": res.metrics}))
"""


def run_once(params: dict, cfg: dict) -> dict:
    code = CRAWL_ONLY % {"repo": REPO, "params": repr(params), "cfg": repr(cfg)}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main():
    params = dict(
        n_hosts=int(os.environ.get("COBWEB_BENCH_HOSTS", "200")),
        pages_per_host=int(os.environ.get("COBWEB_BENCH_PAGES", "2500")),
        mega_host_factor=10,
        out_degree=18,
        media_ratio=0.15,
        cross_host_prob=0.10,
        seed=42,
        n_seeds=int(os.environ.get("COBWEB_BENCH_SEEDS", "1000")),
    )
    configs = {
        "off": dict(use_seen_prefilter=False),
        "adaptive": dict(use_seen_prefilter=True),
        "forced": dict(use_seen_prefilter=True, prefilter_min_seen=0),
    }
    which = os.environ.get("COBWEB_AB_CONFIGS", "off,adaptive").split(",")
    repeats = int(os.environ.get("COBWEB_AB_REPEATS", "2"))
    results: dict[str, list] = {k: [] for k in which}
    for r in range(repeats):
        for k in which:
            res = run_once(params, configs[k])
            line = {
                "run": r,
                "config": k,
                "seconds": res["seconds"],
                "urls_per_sec": res["urls_per_sec"],
                "wave_expand": [m["t_expand"] for m in res["metrics"]],
                "wave_add": [m.get("t_add") for m in res["metrics"]],
            }
            print(json.dumps(line), flush=True)
            results[k].append(res["seconds"])
    print(
        json.dumps(
            {
                "summary": {
                    k: {"best": min(v), "all": v} for k, v in results.items()
                }
            }
        )
    )


if __name__ == "__main__":
    main()
