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
# out to two categories (related + styles). Custom tables come from
# CrawlConfig.kind_categories() (additional_tags / ignore_default_tags,
# lib/content_link_parser.rb:28-31).
def _kind_table(kind_categories: dict | None) -> pd.DataFrame:
    kc = LINK_KIND_CATEGORIES if kind_categories is None else kind_categories
    rows = [
        (kind, crank, srank)
        for kind, cats in kc.items()
        for (_cat, crank, srank) in cats
    ]
    return pd.DataFrame(rows, columns=["kind", "cat_rank", "sel_rank"])


_KIND_TABLE = _kind_table(None)

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


_EMPTY = {
    "parent": pd.Series(dtype="object"),
    "parent_url": pd.Series(dtype="object"),
    "parent_fetch_order": pd.Series(dtype="int64"),
    "parent_depth": pd.Series(dtype="int32"),
    "link": pd.Series(dtype="object"),
    "position": pd.Series(dtype="int32"),
}


def _extract_arrow_batch(batch, kind_table: pd.DataFrame) -> pd.DataFrame:
    """One Arrow RecordBatch of pages → candidate links (pandas).

    The span arrays are flattened with pyarrow (zero dict materialization
    — ``ListArray.flatten`` + ``StructArray.field`` are O(1) buffer
    slices), then everything downstream is vectorized pandas/numpy.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pd.DataFrame(_EMPTY)
    if batch.num_rows == 0:
        return empty

    cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
    spans = cols["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    counts = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return empty

    pdf = pd.DataFrame(
        {
            "parent": cols["parent"].to_pandas(),
            "parent_url": cols["parent_url"].to_pandas(),
            "parent_fetch_order": cols["parent_fetch_order"].to_pandas(),
            "parent_depth": cols["parent_depth"].to_pandas(),
        }
    )
    page_idx = np.repeat(np.arange(batch.num_rows), counts)
    struct = spans.flatten()
    flat = pd.DataFrame(
        {
            "kind": struct.field("kind").to_pandas(),
            "text": struct.field("text").to_pandas(),
            "offset": struct.field("offset").to_pandas(),
            "page_idx": page_idx,
        }
    )
    return _extract_flat(pdf, flat, kind_table)


def _extract_flat(
    pdf: pd.DataFrame, flat: pd.DataFrame, kind_table: pd.DataFrame = _KIND_TABLE
) -> pd.DataFrame:
    empty = pd.DataFrame(_EMPTY)

    # per-page <base href> (first base span — Nokogiri @doc.at("base[href]"))
    base_mask = flat["kind"].values == "base"
    base_by_page: dict[int, str] = {}
    if base_mask.any():
        for pi, txt in zip(
            flat.loc[base_mask, "page_idx"], flat.loc[base_mask, "text"]
        ):
            if pi not in base_by_page and txt:
                base_by_page[int(pi)] = txt

    hits = flat.merge(kind_table, on="kind", how="inner")
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

    # loop-filter + scheme filter (content_link_parser.rb:51-53); the two
    # reference regexes run as ONE alternation (groups renumbered for the
    # backrefs) — regex evaluation is the extraction hot spot. The
    # warnings filter mutes pandas' "has match groups" note — the
    # backreferences are the point of these patterns.
    import warnings

    link_s = hits["link"].astype("string")
    combined = r"/([^/]+?)/\1/|([^/]+?)/([^/]+?)/.*?\2/\3"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        keep = ~link_s.str.contains(combined, regex=True, na=False)
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


def extract_links(
    pages_with_spans: DataFrame, kind_categories: dict | None = None
) -> DataFrame:
    """pages (parent, parent_url, parent_fetch_order, parent_depth, spans)
    → candidate links, one row per (page, unique absolutized link).

    ``mapInArrow`` rather than ``mapInPandas``: list<struct> columns cross
    into Python as raw Arrow buffers and are flattened with O(1) pyarrow
    ops — the list-of-dicts conversion mapInPandas would do is ~50× the
    cost of the extraction itself at web scale.

    ``kind_categories`` overrides the default kind→category table
    (CrawlConfig.kind_categories(): additional_tags / ignore_default_tags).
    """
    kind_table = (
        _KIND_TABLE if kind_categories is None else _kind_table(kind_categories)
    )

    def run(iterator):
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                pa.field("parent", pa.string()),
                pa.field("parent_url", pa.string()),
                pa.field("parent_fetch_order", pa.int64()),
                pa.field("parent_depth", pa.int32()),
                pa.field("link", pa.string()),
                pa.field("position", pa.int32()),
            ]
        )
        for batch in iterator:
            out = _extract_arrow_batch(batch, kind_table)
            yield pa.RecordBatch.from_pandas(
                out, schema=arrow_schema, preserve_index=False
            )

    cols = [
        "parent",
        "parent_url",
        "parent_fetch_order",
        "parent_depth",
        "spans",
    ]
    return pages_with_spans.select(*cols).mapInArrow(
        run, CANDIDATES_SCHEMA
    )


def category_counts(
    documents: DataFrame, kind_categories: dict | None = None
) -> DataFrame:
    """Per-document per-category unique-link counts (the link_data surface,
    ``lib/content_link_parser.rb:35-41``) — pure JVM: explode + broadcast
    join against the kind table, used by tests and the entry queries."""
    kc = LINK_KIND_CATEGORIES if kind_categories is None else kind_categories
    kind_rows = [
        (k, cat, crank, srank)
        for k, cats in kc.items()
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
