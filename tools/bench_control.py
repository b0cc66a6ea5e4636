"""Interleaved engine-vs-control crawl benchmark.

Round-5 postmortem: the sandbox VM rebooted between rounds onto a host
with bursty CPU steal, voiding cross-round absolute comparisons. This
harness restores a comparable record by interleaving the CURRENT engine
with a pinned CONTROL checkout (the round-4 code at ``ec059c5``, checked
out as a git worktree) in the SAME weather window: A B A B ... with each
run in a fresh subprocess (own JVM), same cached corpus, same config.
The minimum of each side's runs is the engine number; all runs are
listed for the honesty record.

Usage: python tools/bench_control.py [control_worktree]
Env: COBWEB_AB_REPEATS (default 2), COBWEB_BENCH_HOSTS/PAGES/SEEDS,
COBWEB_CTRL_SEEDS8=1 adds the r1-compatible 8-seed leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRAWL_ONLY = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
from cobweb_spark.config import CrawlConfig
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.session import get_spark
from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents
spark = get_spark(app_name="ctrl-ab")
corpus_path, seeds = cached_scale_corpus(**%(params)s)
docs = load_documents(spark, corpus_path)
cfg = CrawlConfig(internal_urls=["http://*"], seed_urls=seeds,
                  store_inbound_links=False, precompute_edges=True)
t0 = time.time()
res = SparkCrawler(spark, docs, cfg).crawl(None)
n = res.pages.count()
t = time.time() - t0
print("RESULT " + json.dumps({"fetched": n, "seconds": round(t, 2),
      "urls_per_sec": round(n / t, 1)}))
"""


def run_once(root: str, params: dict) -> dict:
    code = CRAWL_ONLY % {"root": root, "params": repr(params)}
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


def interleave(tag: str, params: dict, sides: dict, repeats: int) -> dict:
    results: dict[str, list] = {k: [] for k in sides}
    for r in range(repeats):
        for name, root in sides.items():
            t0 = time.time()
            res = run_once(root, params)
            res.update(run=r, side=name, leg=tag, wall=round(time.time() - t0, 1))
            print(json.dumps(res), flush=True)
            results[name].append(res["seconds"])
    return {
        k: {"best": min(v), "all": v, "urls_per_sec_best": None}
        for k, v in results.items()
    }


def main() -> None:
    control = (
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/ctrl_ec059c5"
    )
    sides = {"current": REPO, "control_ec059c5": control}
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
    repeats = int(os.environ.get("COBWEB_AB_REPEATS", "2"))
    summary = {"crawl_scale": interleave("crawl_scale", params, sides, repeats)}
    if os.environ.get("COBWEB_CTRL_SEEDS8", "1") == "1":
        summary["crawl_scale_8seed"] = interleave(
            "crawl_scale_8seed", {**params, "n_seeds": 8}, sides, repeats
        )
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
