"""Per-page scalar projections — the DocumentScope DSL surface.

The reference's ``Document``/``DocumentScope`` (``lib/document.rb:1-65``)
exposes CSS-selector extraction (title, meta description/keywords, image
counts) used by the report command (``lib/report_command.rb:26-34``).
Over spans these become higher-order-function column expressions — pure
JVM, no UDF: filter the span array by kind, take the first match's text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_span_text(kind: str):
    return F.try_element_at(
        F.filter("spans", lambda s: s["kind"] == F.lit(kind)), F.lit(1)
    )["text"]


def _meta_value(name: str):
    """meta_name spans carry 'name=content' (testkit encoding)."""
    hit = F.try_element_at(
        F.filter(
            "spans",
            lambda s: (s["kind"] == F.lit("meta_name"))
            & s["text"].startswith(F.lit(name + "=")),
        ),
        F.lit(1),
    )["text"]
    return F.substring(hit, len(name) + 2, 1 << 20)


def document_scope(documents: DataFrame) -> DataFrame:
    """One row per document with the report columns
    (lib/report_command.rb:26-34): title, meta description/keywords,
    first-rel link, image count, script/style counts."""

    def kind_count(*kinds: str):
        arr = F.filter(
            "spans",
            lambda s: s["kind"].isin(*[F.lit(k) for k in kinds])
            if len(kinds) > 1
            else (s["kind"] == F.lit(kinds[0])),
        )
        return F.coalesce(F.size(arr), F.lit(0))

    return documents.select(
        "doc_id",
        "mime_type",
        "status_code",
        "length",
        _first_span_text("title").alias("title"),
        _meta_value("description").alias("meta_description"),
        _meta_value("keywords").alias("meta_keywords"),
        _first_span_text("link_rel").alias("first_rel_link"),
        kind_count("img").alias("image_count"),
        kind_count("script").alias("script_count"),
        kind_count("link_stylesheet", "style_url").alias("style_count"),
        kind_count("a").alias("anchor_count"),
    )
