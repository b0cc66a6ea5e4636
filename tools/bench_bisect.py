"""Bisect the r4→r6 crawl-throughput gap: interleave the current engine
under several config knobs (slim expand off, prefilter off, both) against
the ec059c5 control, printing per-wave metrics for attribution."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRAWL_ONLY = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
from cobweb_spark.config import CrawlConfig
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.session import get_spark
from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents
spark = get_spark(app_name="bisect")
corpus_path, seeds = cached_scale_corpus(**%(params)s)
docs = load_documents(spark, corpus_path)
cfg = CrawlConfig(internal_urls=["http://*"], seed_urls=seeds,
                  store_inbound_links=False, precompute_edges=True,
                  **%(cfg)s)
t0 = time.time()
res = SparkCrawler(spark, docs, cfg).crawl(None)
n = res.pages.count()
t = time.time() - t0
print("RESULT " + json.dumps({"fetched": n, "seconds": round(t, 2),
      "urls_per_sec": round(n / t, 1), "metrics": res.metrics}))
"""


def run_once(root: str, params: dict, cfg: dict) -> dict:
    code = CRAWL_ONLY % {
        "root": root,
        "params": repr(params),
        "cfg": repr(cfg),
    }
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=root,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main() -> None:
    control = "/tmp/ctrl_ec059c5"
    params = dict(
        n_hosts=200, pages_per_host=2500, mega_host_factor=10,
        out_degree=18, media_ratio=0.15, cross_host_prob=0.10,
        seed=42, n_seeds=1000,
    )
    variants = [
        ("control", control, {}),
        ("current_default", REPO, {}),
        ("current_noslim", REPO, {"slim_expand": False}),
        ("current_nopre", REPO, {"use_seen_prefilter": False}),
        (
            "current_noslim_nopre",
            REPO,
            {"slim_expand": False, "use_seen_prefilter": False},
        ),
    ]
    which = os.environ.get("COBWEB_BISECT", "")
    if which:
        keep = set(which.split(","))
        variants = [v for v in variants if v[0] in keep]
    repeats = int(os.environ.get("COBWEB_BISECT_REPEATS", "1"))
    for r in range(repeats):
        for name, root, cfg in variants:
            try:
                res = run_once(root, params, cfg)
            except Exception as exc:
                print(json.dumps({"side": name, "error": str(exc)[:500]}),
                      flush=True)
                continue
            waves = res.pop("metrics", [])
            res.update(side=name, run=r)
            res["t_fetch"] = [m.get("t_fetch") for m in waves]
            res["t_expand"] = [m.get("t_expand") for m in waves]
            res["t_flag"] = [m.get("t_flag") for m in waves]
            res["t_zip"] = [m.get("t_zip") for m in waves]
            res["t_add"] = [m.get("t_add") for m in waves]
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
