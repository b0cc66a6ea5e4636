"""Scaling-efficiency evidence: same crawl at two parallelism levels.

The north rule's two-cluster-size criterion (N vs 4N executors, ≥0.8
throughput scaling efficiency) cannot use a real cluster in this sandbox;
per the driver instruction it is evidenced by running the same job on the
same input at local[8] and local[32] and reporting both throughputs plus
efficiency = (T_8core / T_32core) / 4 ... expressed via throughput:
eff = (thr_32 / thr_8) / 4.

Each measurement is a fresh subprocess (own JVM) so executors/memory are
genuinely re-provisioned. Results go to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRAWL_ONLY = """
import json, os, sys, time
os.environ.setdefault("SPARK_HOME", "/opt/spark")
sys.path.insert(0, %(repo)r)
from cobweb_spark.config import CrawlConfig
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.session import get_spark
from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents

spark = get_spark(app_name="scaling-%(cpus)s", master=%(master)r)
corpus_path, seeds = cached_scale_corpus(**%(params)s)
docs = load_documents(spark, corpus_path)
cfg = CrawlConfig(internal_urls=["http://*"], seed_urls=seeds,
                  store_inbound_links=False, precompute_edges=True)
t0 = time.time()
res = SparkCrawler(spark, docs, cfg).crawl(None)
n = res.pages.count()
t = time.time() - t0
print("RESULT " + json.dumps({"cpus": %(cpus)s, "fetched": n,
                              "seconds": round(t, 2),
                              "urls_per_sec": round(n / t, 1)}))
"""


def run_at(cpus: int, params: dict, n_executors: int | None = None) -> dict:
    """One measurement in a fresh subprocess.

    ``n_executors`` set → spark ``local-cluster[n,4,mem]``: genuinely
    separate executor JVMs (own heap, GC, python workers) — the honest
    in-sandbox stand-in for an N-executor cluster. Otherwise ``local[cpus]``
    (single shared JVM).
    """
    if n_executors is not None:
        cores_per = 4
        mem_mb = int(os.environ.get("COBWEB_SCALING_EXEC_MB", "12288"))
        master = f"local-cluster[{n_executors},{cores_per},{mem_mb}]"
        cpus = n_executors * cores_per
    else:
        master = f"local[{cpus}]"
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(max(cpus, 8))
    # the driver does no heavy lifting in cluster mode; leave heap for
    # the executor JVMs (equal per-executor memory across configs)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    code = CRAWL_ONLY % {
        "repo": REPO,
        "cpus": cpus,
        "params": repr(params),
        "master": master,
    }
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT line from local[{cpus}] run:\n"
        + out.stdout[-2000:]
        + out.stderr[-2000:]
    )


def main():
    params = dict(
        n_hosts=int(os.environ.get("COBWEB_BENCH_HOSTS", "200")),
        pages_per_host=int(os.environ.get("COBWEB_BENCH_PAGES", "2500")),
        mega_host_factor=10,
        out_degree=18,
        media_ratio=0.15,
        cross_host_prob=0.10,
        seed=42,
    )
    import time

    # N vs 4N executors on local-cluster (separate executor JVMs); settle
    # between runs so one cluster's daemons fully exit before the next.
    # Default pair 1 vs 4 executors (4 vs 16 task slots): with one Python
    # worker per slot beside the JVM threads, this is the largest pair
    # whose high end does NOT oversubscribe the 32 physical cores —
    # the honest in-sandbox N→4N measurement. COBWEB_SCALING_PAIR=2,8
    # selects the oversubscribed wide pair for comparison.
    pair = os.environ.get("COBWEB_SCALING_PAIR", "1,4")
    n_lo, n_hi = (int(x) for x in pair.split(","))
    lo = run_at(0, params, n_executors=n_lo)
    time.sleep(15)
    hi = run_at(0, params, n_executors=n_hi)
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (n_hi / n_lo)
    result = {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}_executors",
        "mode": "local-cluster[N,4,mem] — separate executor JVMs",
        "low": lo,
        "high": hi,
        "efficiency": round(eff, 3),
        "corpus": params,
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
