"""Link-graph operators: navigation edges and the inbound-links index.

* edges — the reference's ``navigation`` hash url→children
  (``lib/cobweb_crawler.rb:125-128``): one row per enqueued (src, dst).
* inbound index — the ``inbound_links_<md5(url)>`` Redis sets
  (``lib/crawl.rb:148-153``, ``lib/cobweb_crawler.rb:132-137``): built from
  ALL document links of permitted pages (not only enqueued ones), keyed by
  the normalized target, as ``groupBy(dst).agg(collect_set(src))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url_udfs import canonicalize_udf


def inbound_links(all_candidates: DataFrame) -> DataFrame:
    """candidates (parent, link) → (url, inbound: array<string>).

    Target keyed by canonical URL (URI.parse(link).normalize,
    lib/cobweb_crawler.rb:134)."""
    return (
        all_candidates.select(
            canonicalize_udf("link").alias("url"),
            F.col("parent").alias("src"),
        )
        .groupBy("url")
        .agg(F.sort_array(F.collect_set("src")).alias("inbound"))
    )


def navigation_children(edges: DataFrame) -> DataFrame:
    """edges (src, dst) → (url, children) — the navigation hash."""
    return edges.groupBy(F.col("src").alias("url")).agg(
        F.collect_list("dst").alias("children")
    )
