import json, os, sys, time
sys.path.insert(0, "/root/repo")
slim = sys.argv[1] == "slim"
precompute = len(sys.argv) > 2 and sys.argv[2] == "pre"
from cobweb_spark.config import CrawlConfig
from cobweb_spark.plans.crawler import SparkCrawler
from cobweb_spark.session import get_spark
from cobweb_spark.sources.corpus import cached_scale_corpus, load_documents

logdir = f"/tmp/r5eventlogs/{'slim' if slim else 'exact'}{'_pre' if precompute else ''}"
os.makedirs(logdir, exist_ok=True)
spark = get_spark(app_name=f"slimab", extra_conf={
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": logdir,
    "spark.eventLog.compress": "false",
})
corpus_path, seeds = cached_scale_corpus(
    n_hosts=200, pages_per_host=2500, mega_host_factor=10, out_degree=18,
    media_ratio=0.15, cross_host_prob=0.10, seed=42, n_seeds=1000)
docs = load_documents(spark, corpus_path)
cfg = CrawlConfig(internal_urls=["http://*"], seed_urls=seeds,
                  store_inbound_links=False, precompute_edges=precompute,
                  slim_expand=slim)
import pandas as _pd
def _noop(it):
    for pdf in it:
        yield pdf
spark.range(0, 1_000_000, numPartitions=64).toDF("id").mapInPandas(_noop, "id long").count()
t0 = time.time()
res = SparkCrawler(spark, docs, cfg).crawl(None)
n = res.pages.count()
t = time.time() - t0
print("RESULT " + json.dumps({"slim": slim, "fetched": n, "seconds": round(t,2),
  "metrics": [{k: m[k] for k in ("wave_id","t_fetch","t_flag","t_zip","t_add")} for m in res.metrics]}))
spark.stop()
