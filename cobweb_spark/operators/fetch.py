"""The "fetch" operator: frontier ⋈ documents with redirect resolution.

A fetch wave is a left equi-join of the admitted frontier against the
corpus metadata on the canonicalized URL (the analogue of ``Cobweb#get``,
``lib/cobweb.rb:122-304``). Redirects are a bounded driver loop of
re-joins over the shrinking still-redirecting subset, accumulating the
``redirect_through`` chain (``lib/cobweb.rb:188-207``); redirect-limit
exhaustion produces the reference's status-0 ``error/dnslookup`` row
(``lib/cobweb.rb:251-268``).

Scale notes: only metadata columns are joined here (spans are joined later,
for the limit-cut survivors only — column pruning keeps the scan narrow);
the join key is the canonical URL so AQE picks hash vs broadcast; the
redirect loop degrades gracefully (hop populations shrink geometrically and
each round is checkpointed to cut lineage).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..config import CrawlConfig
from ..functions.url_udfs import canonicalize_udf
from ..urls import canonicalize, join_no_fragment

META_COLS = [
    "doc_id",
    "status_code",
    "mime_type",
    "character_set",
    "length",
    "response_time",
    "location",
]


@pandas_udf(StringType())
def _join_canon_udf(base: pd.Series, link: pd.Series) -> pd.Series:
    """canonicalize(join_no_fragment(base, link)) — the redirect hop target
    (lib/cobweb.rb:191: UriHelper.join_no_fragment(uri, response['location']))."""
    out = [
        canonicalize(join_no_fragment(b, l)) if b is not None else None
        for b, l in zip(base, link)
    ]
    return pd.Series(out, dtype="object")


def _left_lookup(
    left: DataFrame, meta: DataFrame, broadcast_left: bool = True
) -> DataFrame:
    """left ⟕ meta on left.fetch_key == meta.doc_key, with the FRONTIER as
    the broadcast/build side.

    A plain ``left.join(meta, ..., 'left')`` can only build (or broadcast)
    the corpus side — catastrophic when the optimizer decides the corpus
    "fits" (on-disk stats undercount nested in-memory size by 10-50×).
    Decomposed instead into: inner join streaming the corpus against a
    broadcast of the frontier, plus a broadcast anti-join reconstructing
    the unmatched rows with null metadata. The corpus is scanned (never
    shuffled, never broadcast); the frontier is broadcast twice (it is the
    small side by design — per-wave batches).

    Join keys are 8-byte ``xxhash64(url)`` columns, not URL strings (see
    ``fetch_meta``): the per-wave probe over the whole cached corpus then
    hashes/compares longs and never streams the 40+-byte doc_id column —
    the Iceberg bucket-key shape.
    """
    # big waves skip the driver-side broadcast build (serial, memory-heavy)
    # and let the shuffled-hash join build on the frontier side instead
    lb = F.broadcast(left) if broadcast_left else left
    inner = meta.join(lb, meta["doc_key"] == lb["fetch_key"], "inner").drop(
        "doc_key"
    )
    keys = left.select("fetch_key").distinct()
    keys = F.broadcast(keys) if broadcast_left else keys
    matched_keys = (
        meta.select("doc_key")
        .join(keys, meta["doc_key"] == F.col("fetch_key"), "inner")
        .select("fetch_key")
    )
    data_cols = [c for c in META_COLS if c != "doc_id"]
    # broadcast the matched-key set only when the frontier side is small
    # enough to broadcast at all: a multi-10M-row wave's key set would OOM
    # the driver — the big-wave path uses a shuffled anti-join with the
    # keys as the (right/build) side instead
    mk = F.broadcast(matched_keys) if broadcast_left else matched_keys
    missing = left.join(mk, "fetch_key", "left_anti")
    for c, t in zip(
        data_cols,
        ["int", "string", "string", "long", "double", "string"],
    ):
        missing = missing.withColumn(c, F.lit(None).cast(t))
    return inner.unionByName(missing.select(*inner.columns))


def keyed_meta(documents: DataFrame, key_join: bool = True) -> DataFrame:
    """Narrow corpus projection keyed for the fetch join.

    ``key_join=True`` replaces the doc_id string with its xxhash64 — the
    cached relation every wave streams is then ~40 bytes/row narrower and
    the join probes compare longs. Requires doc_id → xxhash64 injectivity
    over the corpus (a corpus-build invariant at 10^10 scale; SparkCrawler
    verifies it once per crawl and falls back to string keys on the
    astronomically-unlikely collision). Passing an already-keyed frame
    (the crawler's cached copy) is a no-op.
    """
    if "doc_key" in documents.columns:
        return documents
    meta = documents.select(*META_COLS)
    key = F.xxhash64("doc_id") if key_join else F.col("doc_id")
    return meta.withColumn("doc_key", key).drop("doc_id")


def fetch_meta(
    frontier: DataFrame,
    documents: DataFrame,
    cfg: CrawlConfig,
    skip_redirects: bool = False,
    broadcast_frontier: bool = True,
    key_join: bool = True,
) -> DataFrame:
    """Join frontier against corpus metadata, resolving redirect chains.

    Input frontier columns: url, host, depth, discovery_order, parent,
    wave_rank (dense rank within the wave). Output adds: fetch_url (final
    canonical URL), base_url (initial canonical URL), status_code,
    mime_type, character_set, length, response_time, location,
    redirect_through, error, text_content, permitted, corpus_hit (the row
    matched a corpus document — only such rows can yield links).
    """
    meta = keyed_meta(documents, key_join)

    def fkey():
        return (
            F.xxhash64("fetch_url") if key_join else F.col("fetch_url")
        )

    cur = (
        frontier.withColumn("fetch_url", canonicalize_udf("url"))
        .withColumn("fetch_key", fkey())
        .withColumn("base_url", F.col("fetch_url"))
        .withColumn("redirect_through", F.lit(None).cast("array<string>"))
        .withColumn("error", F.lit(None).cast("string"))
        # _left_lookup references the frontier three times (inner, matched
        # keys, missing) — materialize once so the canonicalize UDF runs
        # once per wave
        .localCheckpoint(eager=False)
    )
    cur = _left_lookup(cur, meta, broadcast_left=broadcast_frontier)

    is_redirect = (
        F.col("status_code").isNotNull()
        & (F.col("status_code") >= 300)
        & (F.col("status_code") < 400)
        & F.lit(bool(cfg.follow_redirects))
    )

    done_parts: list[DataFrame] = []
    hops_allowed = max(int(cfg.redirect_limit or 10) - 1, 0)
    if skip_redirects:
        # caller proved the corpus has no 3xx rows: the hop loop (and its
        # extra join execution per isEmpty probe) is provably dead
        hops_allowed = 0
        done_parts.append(cur)
        cur = None
    for _hop in range(hops_allowed):
        done_parts.append(cur.filter(~is_redirect))
        redirecting = cur.filter(is_redirect)
        if redirecting.isEmpty():
            cur = None
            break
        redirecting = (
            redirecting.withColumn(
                "next_url", _join_canon_udf("fetch_url", "location")
            )
            .withColumn(
                "redirect_through",
                F.concat(
                    F.coalesce(
                        "redirect_through", F.array(F.col("fetch_url"))
                    ),
                    F.array(F.col("next_url")),
                ),
            )
            .drop(
                *[c for c in META_COLS if c != "doc_id"],
                "fetch_url",
                "fetch_key",
            )
            .withColumnRenamed("next_url", "fetch_url")
            .withColumn("fetch_key", fkey())
        )
        cur = _left_lookup(redirecting, meta).localCheckpoint(eager=False)

    if cur is not None:
        done_parts.append(cur.filter(~is_redirect))
        # redirect-limit exhausted: status-0 error rows
        # (lib/cobweb.rb:197,251-268). With zero hops taken (redirect_limit
        # == 1) the reported URL is the refused *target*, matching the
        # reference's rescue building content[:url] from the joined uri.
        exhausted = (
            cur.filter(is_redirect)
            .withColumn(
                "fetch_url",
                F.when(
                    F.col("redirect_through").isNull(),
                    _join_canon_udf("fetch_url", "location"),
                ).otherwise(F.col("fetch_url")),
            )
            .withColumn("status_code", F.lit(0))
            .withColumn("mime_type", F.lit("error/dnslookup"))
            .withColumn("character_set", F.lit(None).cast("string"))
            .withColumn("length", F.lit(0).cast("long"))
            .withColumn("response_time", F.lit(0.0))
            .withColumn("location", F.lit(None).cast("string"))
            .withColumn("error", F.lit("Redirect Limit reached"))
        )
        done_parts.append(exhausted)

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)

    # rows absent from the corpus: the missing-path response
    # (404 + empty mime by default — see CrawlConfig.missing_status)
    missing_mime = (
        cfg.missing_mime if cfg.missing_status != 0 else "error/dnslookup"
    )
    # materialize the found flag BEFORE any withColumn overwrites
    # status_code — later expressions must not see the patched value
    out = out.withColumn("corpus_hit", F.col("status_code").isNotNull())
    found = F.col("corpus_hit")
    out = (
        out.withColumn(
            "error",
            F.when(found, F.col("error")).otherwise(
                F.lit("not in corpus" if cfg.missing_status == 0 else None)
            ),
        )
        .withColumn(
            "mime_type",
            F.when(found, F.col("mime_type")).otherwise(F.lit(missing_mime)),
        )
        .withColumn(
            "status_code",
            F.when(found, F.col("status_code")).otherwise(
                F.lit(cfg.missing_status)
            ),
        )
        .withColumn(
            "length",
            F.when(found, F.col("length")).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "response_time",
            F.when(found, F.col("response_time")).otherwise(F.lit(0.0)),
        )
    )

    mime = F.coalesce(F.col("mime_type"), F.lit(""))
    out = out.withColumn(
        "text_content", mime.rlike(cfg.text_mime_re)
    ).withColumn("permitted", mime.rlike(cfg.valid_mime_re))
    return out.drop("fetch_key")


def apply_crawl_limit_cut(
    fetched: DataFrame, cfg: CrawlConfig, remaining: int | None
) -> tuple[DataFrame, bool]:
    """Cut the wave to the sequential crawl-limit prefix.

    The reference checks ``crawl_counter < limit`` before *every* fetch
    (``lib/crawl.rb:69``; by-page variant counts only text/html,
    ``lib/crawl.rb:173-182``), so the fetched set is the ordered prefix in
    which fewer than ``remaining`` countable rows precede each row
    (inclusive of the row that reaches the limit). Implemented as a
    top-k (TakeOrderedAndProject) over countable rows — no global window.

    Returns (cut wave, limit_hit).
    """
    if remaining is None:
        return fetched, False
    if remaining <= 0:
        return fetched.limit(0), True

    if cfg.crawl_limit_by_page:
        countable = F.coalesce(F.col("mime_type"), F.lit("")).rlike(
            "text/html"
        )
    else:
        countable = F.lit(True)

    top = (
        fetched.filter(countable)
        .orderBy("wave_rank")
        .limit(int(remaining))
        .agg(
            F.max("wave_rank").alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    if top["n"] is None or top["n"] < remaining:
        return fetched, False  # whole wave fits
    return fetched.filter(F.col("wave_rank") <= top["t"]), True
