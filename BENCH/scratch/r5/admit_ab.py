"""A/B: admit_wave deferred derivation — rank-filter vs frontier anti-join.

Backs the round-5 admit.py change (deferred = phase-1/phase-2 rank
overflow instead of frontier LEFT ANTI admitted) and the "Polite
re-rank share" note in BENCH/BASELINE.md.

Synthesizes the pathological polite shape: a frontier dominated by one
mega-host (the bench corpus's 25k-page host scaled up), budget such
that budget ≪ mega-host size, so nearly the whole frontier defers and
is re-ranked every wave. Measures one admit+materialize cycle each way.

Run: python BENCH/scratch/r5/admit_ab.py [n_rows] [budget]
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from cobweb_spark.operators.admit import admit_wave  # noqa: E402
from cobweb_spark.session import get_spark  # noqa: E402


def synth_frontier(spark, n):
    # 60% mega-host, rest spread over 10k small hosts
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 3, F.lit("mega.example"))
            .otherwise(F.concat(F.lit("h"), (F.col("id") % 10000).cast("string")))
            .alias("host"),
            F.concat(F.lit("http://x/"), F.col("id").cast("string")).alias("url"),
            (F.col("id") % 7).alias("depth"),
            F.col("id").alias("discovery_order"),
        )
        .repartition(32)
        .localCheckpoint()
    )


def admit_antijoin(frontier, budget, salt_shards=16):
    """The pre-round-5 variant: deferred = frontier ⟕̸ admitted."""
    from pyspark.sql import Window

    salted = F.pmod(F.xxhash64("url"), F.lit(salt_shards))
    w_salt = Window.partitionBy("host", salted).orderBy("depth", "discovery_order")
    pre = frontier.withColumn("__r1", F.row_number().over(w_salt))
    survivors = pre.filter(F.col("__r1") <= budget).drop("__r1")
    w_host = Window.partitionBy("host").orderBy("depth", "discovery_order")
    ranked = survivors.withColumn("__r2", F.row_number().over(w_host))
    admitted = ranked.filter(F.col("__r2") <= budget).drop("__r2")
    deferred = frontier.join(admitted.select("url"), "url", "left_anti")
    return admitted, deferred


def cycle(fn, frontier, budget):
    t0 = time.time()
    admitted, deferred = fn(frontier, budget)
    a = admitted.count()
    d = deferred.count()
    return time.time() - t0, a, d


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark()
    frontier = synth_frontier(spark, n)
    frontier.count()

    for label, fn in [
        ("rank-filter", admit_wave),
        ("anti-join", admit_antijoin),
        ("rank-filter", admit_wave),
        ("anti-join", admit_antijoin),
    ]:
        t, a, d = cycle(fn, frontier, budget)
        print(f"{label:12s} n={n} budget={budget} admit={a} defer={d} {t:.2f}s")

    # re-rank floor: the two window sorts alone (no deferred derivation)
    t0 = time.time()
    admitted, _ = admit_wave(frontier, budget)
    admitted.count()
    print(f"{'admit-only':12s} (window sorts + admitted count) {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
