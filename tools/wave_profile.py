"""Per-wave job-count + phase-time profile of one crawl (round 7).

Runs a single crawl with the bench headline config (optionally scaled
down via env) with the Spark event log enabled, then reports:
  - jobs per wave (from SparkListenerJobStart grouped by jobGroup.id)
  - the crawler's own per-wave phase metrics (t_fetch/t_flag/t_zip/t_add)

Usage:
    python tools/wave_profile.py [--hosts 200] [--pages 2500] \
        [--seeds 1000] [--precompute 1] [--budget 0] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=200)
    ap.add_argument("--pages", type=int, default=2500)
    ap.add_argument("--seeds", type=int, default=1000)
    ap.add_argument("--precompute", type=int, default=1)
    ap.add_argument("--budget", type=int, default=0)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--keep-log", default=None)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="cobweb-evlog-")

    from cobweb_spark.config import CrawlConfig
    from cobweb_spark.plans.crawler import SparkCrawler
    from cobweb_spark.session import get_spark
    from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents

    spark = get_spark(
        app_name="wave-profile",
        master=f"local[{args.cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    corpus_path, seeds = cached_scale_corpus(
        n_hosts=args.hosts,
        pages_per_host=args.pages,
        mega_host_factor=10,
        out_degree=18,
        media_ratio=0.15,
        cross_host_prob=0.10,
        seed=42,
        n_seeds=args.seeds,
    )
    docs = load_documents(spark, corpus_path)
    cfg = CrawlConfig(
        internal_urls=["http://*"],
        seed_urls=seeds,
        host_budget=args.budget or None,
        store_inbound_links=False,
        precompute_edges=bool(args.precompute),
        use_seen_prefilter=True,
        prefilter_min_seen=1_000_000,
    )
    t0 = time.time()
    crawler = SparkCrawler(spark, docs, cfg)
    res = crawler.crawl(None)
    n = res.pages.count()
    wall = time.time() - t0
    crawler.close()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job counts + wall per job group
    jobs = defaultdict(list)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        # eventlog v2 layout: a per-app directory of events_* files
        import glob

        cands = glob.glob(
            os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*")
        ) or glob.glob(os.path.join(evdir, "*", "events_*"))
        path = sorted(cands)[0]
    job_group = {}
    job_t0 = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
            jid = ev["Job ID"]
            job_group[jid] = grp
            job_t0[jid] = ev.get("Submission Time", 0)
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            jobs[grp].append([jid, desc[:60], 0.0])
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            grp = job_group.get(jid)
            if grp is not None:
                dur = (ev.get("Completion Time", 0) - job_t0.get(jid, 0)) / 1e3
                for row in jobs[grp]:
                    if row[0] == jid:
                        row[2] = round(dur, 2)

    out = {
        "fetched": n,
        "wall_s": round(wall, 1),
        "waves": res.n_waves,
        "crawler_metrics": res.metrics,
        "jobs_per_group": {g: len(v) for g, v in sorted(jobs.items())},
        "jobs_detail": {g: v for g, v in sorted(jobs.items())},
    }
    if args.keep_log:
        import shutil

        shutil.copy(path, args.keep_log)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
