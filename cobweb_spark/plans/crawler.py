"""The crawl plan: driver-side BFS wave loop over DataFrame batches.

Each wave (SURVEY §3.5):

    admit (politeness top-k per host) → fetch join (+ redirect loop)
    → crawl-limit prefix cut → stats agg → span join (survivors only)
    → link extraction (mapInPandas) → classify/normalize/robots (rlike)
    → seen rejection (bloom prefilter + exact anti-join)
    → intra-wave first-discovery window → discovery_order assignment
    → frontier := deferred ∪ new links; seen += new links

Iteration is feedback (wave N output is wave N+1 input), which a single
Catalyst plan cannot express — hence the driver loop, with per-wave
``localCheckpoint`` (or snapshot commit when ``state_dir`` is set) to cut
lineage, the Spark analogue of the reference's unbounded job recursion
(``lib/crawl_job.rb:24-32,107-113``). Exactly-once finish/resume comes from
atomic per-wave snapshot commits instead of the reference's Redis
WATCH/MULTI + setnx locks (``lib/crawl.rb:241-291``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.url_udfs import host_udf
from ..model import FRONTIER_SCHEMA
from ..operators.admit import admit_wave
from ..operators.classify import (
    first_discovery_wins,
    robots_gate,
    select_internal,
)
from ..operators.dedup import reject_seen
from ..operators.extract import extract_links
from ..operators.fetch import apply_crawl_limit_cut, fetch_meta
from ..operators.order import zip_with_order
from ..operators import stats as stats_ops
from ..urls import host_of

PAGE_COLS = [
    "url",
    "host",
    "depth",
    "discovery_order",
    "parent",
    "wave_rank",
    "fetch_url",
    "base_url",
    "status_code",
    "mime_type",
    "character_set",
    "length",
    "response_time",
    "location",
    "redirect_through",
    "error",
    "text_content",
    "permitted",
    "fetch_order",
    "wave_id",
]


@dataclass
class SparkCrawlResult:
    pages: DataFrame  # one row per fetch, fetch_order-dense
    seen: DataFrame  # every URL ever enqueued (queued-form strings)
    frontier_remaining: DataFrame
    edges: DataFrame  # enqueue edges (src=parent queued url, dst=link)
    candidates: DataFrame  # ALL document links (for the inbound index)
    n_waves: int = 0
    metrics: list = field(default_factory=list)  # per-wave lineage/metrics

    def stats(self) -> dict:
        return stats_ops.collect_stats(self.pages)

    def fetch_sequence(self) -> list[str]:
        return [
            r["url"]
            for r in self.pages.orderBy("fetch_order")
            .select("url")
            .collect()
        ]


class SparkCrawler:
    """PySpark-native re-implementation of the reference crawl lifecycle
    (``CobwebCrawler#crawl``, ``lib/cobweb_crawler.rb:43-160``)."""

    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        seen_prefilter=None,
        snapshot_store=None,
    ):
        from ..session import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.documents = documents
        self.cfg = config or CrawlConfig()
        self.robots = robots
        self.prefilter = seen_prefilter
        self.store = snapshot_store

    # ------------------------------------------------------------------
    def _seed_frontier(self, base_url: str | None) -> DataFrame:
        cfg = self.cfg
        seeds: list[str] = []
        for s in cfg.seed_urls:
            if s not in seeds:
                seeds.append(s)
        if base_url is not None and base_url not in seeds:
            seeds.append(base_url)
        rows = [
            (u, host_of(u), 0, i, None) for i, u in enumerate(seeds)
        ]
        return self.spark.createDataFrame(rows, FRONTIER_SCHEMA)

    # ------------------------------------------------------------------
    def crawl(
        self, base_url: str | None = None, resume: bool = False
    ) -> SparkCrawlResult:
        spark, cfg = self.spark, self.cfg
        classifier = cfg.classifier(base_url)

        pages_parts: list[DataFrame] = []
        cand_parts: list[DataFrame] = []
        edge_parts: list[DataFrame] = []
        metrics: list[dict] = []

        latest = self.store.latest_wave() if (resume and self.store) else None
        if latest is not None:
            # exact resume: reload committed state and replay from wave k+1
            man = self.store.load_manifest(latest)
            frontier = self.store.load_table(
                latest, "frontier"
            ).localCheckpoint()
            seen = self.store.load_table(latest, "seen").localCheckpoint()
            pages_parts = self.store.load_parts(latest, "pages")
            cand_parts = self.store.load_parts(latest, "candidates")
            edge_parts = self.store.load_parts(latest, "edges")
            n_fetched = man["counters"]["n_fetched"]
            next_order = man["counters"]["next_order"]
            pages_counted = man["counters"]["pages_counted"]
            wave = latest + 1
            if man.get("has_filters") and self.prefilter is not None:
                import os

                self.prefilter.load(
                    os.path.join(self.store._wave_dir(latest), "filters")
                )
        else:
            frontier = self._seed_frontier(base_url).localCheckpoint()
            seen = frontier.select("url").localCheckpoint()
            n_fetched = 0
            next_order = frontier.count()
            pages_counted = 0
            wave = 0
            if self.prefilter is not None:
                self.prefilter.add(frontier.select("url"))
        empty_frontier = frontier.limit(0)
        # n_frontier tracks |frontier| so the loop head needs no isEmpty job
        n_frontier = frontier.count() if latest is not None else next_order

        while wave < cfg.max_waves:
            if n_frontier == 0:
                break
            remaining = (
                None
                if cfg.crawl_limit is None
                else int(cfg.crawl_limit) - pages_counted
            )
            if remaining is not None and remaining <= 0:
                break

            if cfg.host_budget is None:
                # plain BFS: the frontier is exactly the discovery_orders
                # [n_fetched, next_order) — contiguous and dense — so
                # fetch_order == discovery_order (FIFO equivalence,
                # SURVEY §3.4) and no ranking job is needed at all.
                admitted, deferred = frontier, None
                admitted = admitted.withColumn(
                    "wave_rank", F.col("discovery_order") - F.lit(n_fetched)
                )
            else:
                admitted, deferred = admit_wave(frontier, cfg.host_budget)
                admitted, _n = zip_with_order(
                    admitted,
                    ["depth", "discovery_order"],
                    "wave_rank",
                    start=0,
                    size_hint=n_frontier,
                )

            fetched = fetch_meta(admitted, self.documents, cfg)
            cut, limit_hit = apply_crawl_limit_cut(fetched, cfg, remaining)
            cut = (
                cut.withColumn(
                    "fetch_order", F.col("wave_rank") + F.lit(n_fetched)
                )
                .withColumn("wave_id", F.lit(wave))
                .select(*PAGE_COLS)
                .localCheckpoint()
            )
            # one agg job: total + countable rows (for crawl_limit_by_page)
            counts_row = cut.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        F.coalesce(F.col("mime_type"), F.lit("")).rlike(
                            "text/html"
                        ),
                        1,
                    ).otherwise(0)
                ).alias("n_pages"),
            ).collect()[0]
            n_cut = counts_row["n"]
            if n_cut == 0:
                frontier = (
                    deferred if deferred is not None else empty_frontier
                )
                if limit_hit:
                    frontier = empty_frontier
                break

            if cfg.crawl_limit_by_page:
                pages_counted += counts_row["n_pages"] or 0
            else:
                pages_counted += n_cut
            n_fetched += n_cut
            pages_parts.append(cut)

            # redirect-final URLs join the seen set too
            # (lib/crawl_helper.rb:35-39). cut is checkpointed, so this
            # union member is cheap to rescan — seen stays a lazy union of
            # checkpointed parts instead of re-materializing per wave.
            if cfg.mark_redirect_final_crawled:
                finals = cut.filter(
                    F.col("fetch_url") != F.col("url")
                ).select(F.col("fetch_url").alias("url"))
                seen = seen.unionByName(finals)

            # extraction input: permitted pages joined with their spans
            to_extract = cut.filter("permitted").select(
                F.col("url").alias("parent"),
                F.col("fetch_url").alias("parent_url"),
                F.col("fetch_order").alias("parent_fetch_order"),
                F.col("depth").alias("parent_depth"),
            )
            spans_src = self.documents.select("doc_id", "spans")
            with_spans = to_extract.join(
                spans_src,
                to_extract.parent_url == spans_src.doc_id,
                "left",
            ).drop("doc_id")
            candidates = extract_links(with_spans).localCheckpoint()
            cand_parts.append(candidates)

            selected = select_internal(candidates, classifier, cfg)
            selected = robots_gate(selected, self.robots, cfg)
            fresh = reject_seen(selected, seen, self.prefilter)
            fresh = first_discovery_wins(fresh)
            fresh, n_new = zip_with_order(
                fresh,
                ["parent_fetch_order", "position"],
                "discovery_order",
                start=next_order,
                size_hint=n_cut * 16,
            )

            new_frontier = fresh.select(
                F.col("link").alias("url"),
                host_udf("link").alias("host"),
                (F.col("parent_depth") + 1).alias("depth"),
                "discovery_order",
                F.col("parent").alias("parent"),
            ).localCheckpoint()
            next_order += n_new

            edges_wave = fresh.select(
                F.col("parent").alias("src"),
                F.col("link").alias("dst"),
            )
            edge_parts.append(edges_wave)
            # new_frontier is checkpointed; the union tree over checkpointed
            # parts is cheap to rescan — no per-wave seen re-materialization
            seen = seen.unionByName(new_frontier.select("url"))
            if self.prefilter is not None:
                self.prefilter.add(new_frontier.select("url"))

            metrics.append(
                {
                    "wave_id": wave,
                    "admitted": n_cut,
                    "new_links": n_new,
                    "pages_counted": pages_counted,
                    "n_fetched": n_fetched,
                }
            )

            if limit_hit:
                frontier = empty_frontier
                n_frontier = 0
            elif deferred is not None:
                frontier = deferred.unionByName(new_frontier).localCheckpoint()
                n_frontier = frontier.count()
            else:
                frontier = new_frontier
                n_frontier = n_new

            if self.store is not None and (
                limit_hit or wave % max(cfg.checkpoint_every, 1) == 0
            ):
                self.store.commit_wave(
                    wave_id=wave,
                    frontier=frontier,
                    seen=seen,
                    pages=cut,
                    edges=edges_wave,
                    candidates=candidates,
                    counters={
                        "n_fetched": n_fetched,
                        "next_order": next_order,
                        "pages_counted": pages_counted,
                    },
                    metrics=metrics[-1],
                    filters_bank=self.prefilter,
                )
            if limit_hit:
                break
            wave += 1

        def _union(parts: list[DataFrame], proto: DataFrame) -> DataFrame:
            if not parts:
                return proto.limit(0)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        pages = _union(
            pages_parts,
            fetch_meta(
                frontier.limit(0).withColumn("wave_rank", F.lit(0).cast("long")),
                self.documents,
                cfg,
            )
            .withColumn("fetch_order", F.lit(0).cast("long"))
            .withColumn("wave_id", F.lit(0))
            .select(*PAGE_COLS),
        )
        candidates = _union(
            cand_parts,
            extract_links(
                self.documents.limit(0).select(
                    F.col("doc_id").alias("parent"),
                    F.col("doc_id").alias("parent_url"),
                    F.lit(0).cast("long").alias("parent_fetch_order"),
                    F.lit(0).alias("parent_depth"),
                    "spans",
                )
            ),
        )
        edges = _union(
            edge_parts,
            self.spark.createDataFrame([], "src string, dst string"),
        )
        return SparkCrawlResult(
            pages=pages,
            seen=seen.distinct(),
            frontier_remaining=frontier,
            edges=edges,
            candidates=candidates,
            n_waves=wave + (1 if pages_parts else 0),
            metrics=metrics,
        )
