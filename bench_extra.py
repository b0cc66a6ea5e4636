"""Round-7 measurement harness (guide §1) — NOT the driver bench.

Isolates each secondary operator with the noop sink (every column of
every row computed, no sink cost), captures `.explain("formatted")` for
the plan record (plans/r07/), and reports per-op wall times over N reps.
`bench.py` stays the frozen driver contract; numbers from here are cited
in OPTIMIZATION_r07.md.

Usage:
    python bench_extra.py [--reps 3] [--plans-dir plans/r07] [--suffix before]
    python bench_extra.py --only dedup_lsh_pairs,ann_lsh_multitable
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cobweb_spark.operators import similarity, textops
    from cobweb_spark.operators.stats import sessionize
    from cobweb_spark.session import get_spark

    spark = get_spark(app_name="cobweb-bench-extra")
    sf_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sf_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sf_events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    ops = {
        "dedup_minhash": lambda: textops.minhash_signatures(sf_docs),
        "dedup_lsh_pairs": lambda: textops.lsh_near_dup_pairs(sf_docs),
        "dedup_cluster_keepers": lambda: textops.cluster_keepers(sf_docs),
        "text_quality": lambda: textops.quality_scores(sf_docs),
        "ann_cosine_topk": lambda: similarity.cosine_topk(
            sf_emb, query_ids=[0, 1, 2, 3, 4], k=5
        ),
        "ann_lsh_multitable": lambda: similarity.lsh_ann_topk_multitable(
            sf_emb, query_ids=[0, 1, 2, 3, 4], k=5, dim=64
        ),
        "events_minute_counts": lambda: sf_events.groupBy(
            F.date_trunc("minute", "ts"), "event_type"
        ).count(),
        "text_contamination": lambda: textops.contamination_check(
            sf_docs, sf_docs.filter(F.col("doc_id") % 20 == 7), n=13
        ),
        "text_repetition": lambda: textops.repetition_signals(sf_docs),
        "dedup_segments": lambda: textops.segment_dedup(sf_docs),
        "dedup_semantic_keepers": lambda: similarity.semantic_dedup_keepers(
            sf_emb, threshold=0.4, n_planes=6, n_tables=4, dim=64
        ),
        "text_pii_redact": lambda: textops.pii_redact(sf_docs),
        "text_pack_sequences": lambda: textops.pack_sequences(
            sf_docs, seq_len=256
        ),
        "text_unigram_logprob": lambda: textops.unigram_logprob(sf_docs),
        "text_bigram_logprob": lambda: textops.bigram_logprob(sf_docs),
        "events_sessionize": lambda: sessionize(sf_events),
        "ann_ivf_topk": lambda: similarity.ivf_ann_topk(
            sf_emb, query_ids=[0, 1, 2, 3, 4], k=5, n_centroids=8, nprobe=2
        ),
        "text_length_stats_approx": lambda: textops.length_stats(
            sf_docs, approx=True
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        ops = {k: v for k, v in ops.items() if k in keep}

    # one warmup pass (executor python workers, JIT) on a cheap op
    spark.range(0, 1_000_000, numPartitions=64).agg(F.sum("id")).collect()

    results: dict[str, list[float]] = {}
    for name, build in ops.items():
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            # cluster_keepers/semantic/ivf run driver loops or collects at
            # plan-build time; capture explain for the pure-plan ops only
            try:
                plan = build()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(
                        args.plans_dir, f"{name}_{args.suffix}.txt"
                    ),
                    "w",
                ) as f:
                    f.write(plan)
            except Exception as e:  # pragma: no cover
                print(f"explain {name} failed: {e}", file=sys.stderr)
        rs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.time()
            noop(build())
            rs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = rs
        print(f"{name}: {rs}", file=sys.stderr)

    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "reps": args.reps,
                "runs": results,
                "min": {k: min(v) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
