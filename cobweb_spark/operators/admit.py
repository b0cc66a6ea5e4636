"""Wave admission: host-sharded priority queue with politeness budgets.

The frontier is ordered by (depth, discovery_order) — the BFS priority the
reference's single-worker FIFO realizes (SURVEY §3.4). With a per-host
politeness token budget, each wave admits at most ``host_budget`` URLs per
host in priority order; the rest defer to later waves, retaining their
discovery_order.

Skew: a mega-host would make a plain ``Window.partitionBy(host)`` one
giant partition. The two-phase variant first takes the per-(host, salt)
top-k within salted shards — shrinking the mega-host to at most
``salt_shards * budget`` rows — then ranks the survivors per host. Both
phases are JVM window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def admit_wave(
    frontier: DataFrame,
    host_budget: int | None,
    salt_shards: int = 16,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (admitted, deferred); deferred is None when no budget."""
    if host_budget is None:
        return frontier, None

    budget = int(host_budget)
    salted = F.pmod(F.xxhash64("url"), F.lit(salt_shards))
    w_salt = Window.partitionBy("host", salted).orderBy(
        "depth", "discovery_order"
    )
    pre = frontier.withColumn("__r1", F.row_number().over(w_salt))
    survivors = pre.filter(F.col("__r1") <= budget).drop("__r1")

    w_host = Window.partitionBy("host").orderBy("depth", "discovery_order")
    ranked = survivors.withColumn("__r2", F.row_number().over(w_host))
    admitted = ranked.filter(F.col("__r2") <= budget).drop("__r2")

    # deferred = frontier minus admitted (anti-join on url — unique in the
    # frontier by construction)
    deferred = frontier.join(
        admitted.select("url"), "url", "left_anti"
    )
    return admitted, deferred
