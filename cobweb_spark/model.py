"""Data model: span kinds, link-category mapping, Spark schemas.

The corpus is an Iceberg/parquet ``documents`` table of interleaved
text+media documents (BASELINE.json ``input_hint``)::

    doc_id  string                      -- canonical URL (fetch join key)
    spans   array<struct<kind:string, text:string,
                         media_ref:string, offset:int>>

plus HTTP-layer sidecar columns modelling the content hash the reference
builds per fetch (``lib/cobweb.rb:214-238``): status_code, mime_type,
length, response_time, location, character_set.

A span is the pre-parsed analogue of one Nokogiri tag hit
(``lib/content_link_parser.rb:19-26``); link extraction therefore never
parses HTML at scale — the interleaved payload *is* the parse result.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Span kinds
# ---------------------------------------------------------------------------
# Link-bearing kinds map to the reference's tag categories
# (``lib/content_link_parser.rb:19-26``). Non-link kinds ('text', 'title',
# 'meta_name', 'media', 'base') carry page payload / metadata.
#
# (category, category_rank, selector_rank): the reference's ``all_links``
# flattens categories in insertion order links→images→related→scripts→styles
# (``lib/content_link_parser.rb:44-47``) and, inside a category, in
# selector-list order then document order — this ordering drives
# discovery_order, so it is part of the correctness contract (SURVEY §3.4).
#
# 'link_stylesheet' models ``<link rel="stylesheet" href>`` which the
# reference extracts into BOTH ``related`` (selector ``link[rel]``) and
# ``styles`` (selector ``link[rel='stylesheet'][href]``).
LINK_KIND_CATEGORIES: dict[str, list[tuple[str, int, int]]] = {
    "a": [("links", 0, 0)],
    "frame": [("links", 0, 1)],
    "meta_refresh": [("links", 0, 2)],
    "link": [("links", 0, 3)],  # link[href]:not([rel])
    "area": [("links", 0, 4)],
    "img": [("images", 1, 0)],
    "link_rel": [("related", 2, 0)],  # link[rel] (non-stylesheet)
    "link_stylesheet": [("related", 2, 0), ("styles", 4, 0)],
    "script": [("scripts", 3, 0)],
    "style_url": [("styles", 4, 1)],  # url(...) scanned from <style> blocks
}

CATEGORIES = ("links", "images", "related", "scripts", "styles")

NON_LINK_KINDS = ("text", "title", "meta_name", "base", "media")

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("character_set", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("response_time", T.DoubleType()),
        T.StructField("location", T.StringType()),  # redirect target for 3xx
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # queued form (raw)
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_order", T.LongType()),
        T.StructField("parent", T.StringType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_key", T.LongType()),  # xxhash64(url)
    ]
)

# Result of one fetch — the reference's "content hash"
# (``README.textile:34-54``, built in ``lib/cobweb.rb:145-239``).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),  # final URL after redirects
        T.StructField("base_url", T.StringType()),  # canonicalized request URL
        T.StructField("queued_url", T.StringType()),  # frontier (raw) form
        T.StructField("status_code", T.IntegerType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("character_set", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("response_time", T.DoubleType()),
        T.StructField("text_content", T.BooleanType()),
        T.StructField("location", T.StringType()),
        T.StructField("redirect_through", T.ArrayType(T.StringType())),
        T.StructField("error", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_order", T.LongType()),
        T.StructField("fetch_order", T.LongType()),
        T.StructField("parent", T.StringType()),
        T.StructField("wave_id", T.IntegerType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("user_agent", T.StringType()),
        T.StructField("rule", T.StringType()),  # 'allow' | 'disallow'
        T.StructField("pattern", T.StringType()),
        T.StructField("rank", T.IntegerType()),
    ]
)

# Enqueue edges as the crawler emits them (plans/crawler.py): src is the
# parent's queued URL, dst the enqueued link (queued form). The inbound
# index and navigation children derive from exactly these two columns.
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
    ]
)
