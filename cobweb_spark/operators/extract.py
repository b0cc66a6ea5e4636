"""Link extraction from span arrays — the engine's only heavy Python stage.

One ``mapInPandas`` pass over fetched pages (no shuffle: each page's spans
sit in one row). Inside the batch everything is vectorized pandas: explode,
kind→category mapping (including the dual mapping of stylesheet links into
both ``related`` and ``styles``), the three ordered uniq passes, loop-filter
regexes and the scheme filter. URL absolutization uses a per-batch memo
dict over unique (base, raw) pairs — the only per-element Python, exactly
where the reference also leaves pure URL algebra
(``lib/content_link_parser.rb:48``).

Replays ``ContentLinkParser#all_links`` (``lib/content_link_parser.rb:35-55``)
plus the per-page ``uniq!`` of ``lib/cobweb_crawler.rb:102``. Output order
(category rank, selector rank, document offset) is the discovery-order
contract of SURVEY §3.4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import LINK_KIND_CATEGORIES
from ..urls import LOOP_RE_1, LOOP_RE_2, join_no_fragment

# static kind → (category_rank, selector_rank) rows; stylesheet links fan
# out to two categories (related + styles)
_KIND_ROWS = [
    (kind, crank, srank)
    for kind, cats in LINK_KIND_CATEGORIES.items()
    for (_cat, crank, srank) in cats
]
_KIND_TABLE = pd.DataFrame(
    _KIND_ROWS, columns=["kind", "cat_rank", "sel_rank"]
)

CANDIDATES_SCHEMA = T.StructType(
    [
        T.StructField("parent", T.StringType()),  # queued URL of the page
        T.StructField("parent_url", T.StringType()),  # final URL (abs base)
        T.StructField("parent_fetch_order", T.LongType()),
        T.StructField("parent_depth", T.IntegerType()),
        T.StructField("link", T.StringType()),  # absolutized, defragmented
        T.StructField("position", T.IntegerType()),
    ]
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "parent": pd.Series(dtype="object"),
            "parent_url": pd.Series(dtype="object"),
            "parent_fetch_order": pd.Series(dtype="int64"),
            "parent_depth": pd.Series(dtype="int32"),
            "link": pd.Series(dtype="object"),
            "position": pd.Series(dtype="int32"),
        }
    )
    if len(pdf) == 0:
        return empty

    spans_lists = [
        list(s) if s is not None else [] for s in pdf["spans"]
    ]
    counts = np.fromiter((len(s) for s in spans_lists), dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return empty

    page_idx = np.repeat(np.arange(len(pdf)), counts)
    flat_records = [rec for lst in spans_lists for rec in lst]
    flat = pd.DataFrame.from_records(flat_records)
    flat["page_idx"] = page_idx

    # per-page <base href> (first base span — Nokogiri @doc.at("base[href]"))
    base_mask = flat["kind"].values == "base"
    base_by_page: dict[int, str] = {}
    if base_mask.any():
        for pi, txt in zip(
            flat.loc[base_mask, "page_idx"], flat.loc[base_mask, "text"]
        ):
            if pi not in base_by_page and txt:
                base_by_page[int(pi)] = txt

    hits = flat.merge(_KIND_TABLE, on="kind", how="inner")
    hits = hits[hits["text"].notna()]
    if len(hits) == 0:
        return empty

    hits = hits.sort_values(
        ["page_idx", "cat_rank", "sel_rank", "offset"], kind="stable"
    )
    # per-category uniq (method_missing links.uniq, content_link_parser.rb:64)
    hits = hits.drop_duplicates(["page_idx", "cat_rank", "text"])
    # cross-category uniq in category order (all_links flatten.uniq, :47)
    hits = hits.drop_duplicates(["page_idx", "text"])

    # absolutize: join(page_url, join(base, raw)). Vectorized fast path for
    # raws that are already absolute http(s) URLs without fragments (the
    # overwhelming case in web-scale corpora) — joining an absolute URL is
    # the identity, so only relative/fragmented raws pay the urljoin memo.
    page_urls = pdf["parent_url"].values
    raw_s = hits["text"].astype("string")
    fast = (
        raw_s.str.startswith("http://") | raw_s.str.startswith("https://")
    ) & ~raw_s.str.contains("#", regex=False)
    fast = fast.fillna(False).values
    abs_links = np.array(hits["text"].values, dtype=object)
    if not fast.all():
        memo: dict[tuple, str | None] = {}
        slow_idx = np.nonzero(~fast)[0]
        pidx_vals = hits["page_idx"].values
        raw_vals = hits["text"].values
        for n in slow_idx:
            pi, raw = int(pidx_vals[n]), raw_vals[n]
            base = base_by_page.get(pi, "")
            key = (page_urls[pi], base, raw)
            if key not in memo:
                memo[key] = join_no_fragment(
                    page_urls[pi], join_no_fragment(base, raw)
                )
            abs_links[n] = memo[key]
    hits = hits.assign(link=abs_links)
    hits = hits[hits["link"].notna()]

    # loop-filter + scheme filter (content_link_parser.rb:51-53); the
    # warnings filter mutes pandas' "has match groups" note — the
    # backreferences are the point of these patterns
    import warnings

    link_s = hits["link"].astype("string")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        keep = ~(
            link_s.str.contains(LOOP_RE_1, regex=True, na=False)
            | link_s.str.contains(LOOP_RE_2, regex=True, na=False)
        )
    scheme = link_s.str.split(":", n=1).str[0]
    keep &= scheme.isin(["http", "https"])
    hits = hits[keep.fillna(False).values]

    # post-absolutize per-page uniq (document_links.uniq!,
    # lib/cobweb_crawler.rb:102) keeping first in extraction order
    hits = hits.drop_duplicates(["page_idx", "link"])
    hits = hits.assign(position=hits.groupby("page_idx").cumcount())

    pidx = hits["page_idx"].values
    return pd.DataFrame(
        {
            "parent": pdf["parent"].values[pidx],
            "parent_url": pdf["parent_url"].values[pidx],
            "parent_fetch_order": pdf["parent_fetch_order"].values[pidx],
            "parent_depth": pdf["parent_depth"].values[pidx],
            "link": hits["link"].values,
            "position": hits["position"].values.astype("int32"),
        }
    )


def extract_links(pages_with_spans: DataFrame) -> DataFrame:
    """pages (parent, parent_url, parent_fetch_order, parent_depth, spans)
    → candidate links, one row per (page, unique absolutized link)."""

    def run(iterator):
        for pdf in iterator:
            yield _extract_batch(pdf)

    cols = [
        "parent",
        "parent_url",
        "parent_fetch_order",
        "parent_depth",
        "spans",
    ]
    return pages_with_spans.select(*cols).mapInPandas(
        run, CANDIDATES_SCHEMA
    )


def category_counts(documents: DataFrame) -> DataFrame:
    """Per-document per-category unique-link counts (the link_data surface,
    ``lib/content_link_parser.rb:35-41``) — pure JVM: explode + higher-order
    functions, used by tests and the entry queries."""
    kind_rows = [
        (k, cat, crank, srank)
        for k, cats in LINK_KIND_CATEGORIES.items()
        for (cat, crank, srank) in cats
    ]
    spark = documents.sparkSession
    kinds = spark.createDataFrame(
        kind_rows, "kind string, category string, cat_rank int, sel_rank int"
    )
    flat = documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.offset")
    return (
        flat.join(F.broadcast(kinds), "kind")
        .where(F.col("text").isNotNull())
        .groupBy("doc_id", "category")
        .agg(F.countDistinct("text").alias("n_links"))
    )
