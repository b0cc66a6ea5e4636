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


class SpanScope:
    """Generic DocumentScope DSL over a spans column — the span-model
    analogue of the reference's chainable ``method_missing`` selectors
    (``lib/document.rb:5-32``): ``x_tags`` narrows to every x span,
    ``x_tag`` to the first, ``x_tag(s)_with_y(value)`` filters on the
    pre-parsed attribute payload. Terminals (``text``/``texts``/``count``/
    ``media_refs``) are pure-JVM higher-order-function Columns usable in
    any ``select`` — arbitrary user projections, not a fixed column set.

    >>> s = SpanScope()
    >>> df.select(s.tags("a").count().alias("n_anchors"),
    ...           s.tag("title").text().alias("title"),
    ...           s.tags_with("meta_name", "description=").text())
    """

    def __init__(self, arr=None):
        self._arr = F.col("spans") if arr is None else arr

    # -- chainable narrowing ------------------------------------------------
    def tags(self, *kinds: str):
        cond = (
            (lambda s: s["kind"] == F.lit(kinds[0]))
            if len(kinds) == 1
            else (lambda s: s["kind"].isin(*[F.lit(k) for k in kinds]))
        )
        return SpanScope(F.filter(self._arr, cond))

    def tag(self, kind: str):
        """First matching span only (``x_tag`` / Nokogiri ``at``)."""
        return SpanScope(
            F.slice(
                F.filter(
                    self._arr, lambda s: s["kind"] == F.lit(kind)
                ),
                1,
                1,
            )
        )

    def tags_with(self, kind: str, text_prefix: str):
        """``x_tags_with_y``: attribute match — in the span model the
        attribute rides in ``text`` as ``name=value``."""
        return SpanScope(
            F.filter(
                self._arr,
                lambda s: (s["kind"] == F.lit(kind))
                & s["text"].startswith(F.lit(text_prefix)),
            )
        )

    # -- terminals (Columns) ------------------------------------------------
    def count(self):
        return F.coalesce(F.size(self._arr), F.lit(0))

    def texts(self):
        return F.transform(self._arr, lambda s: s["text"])

    def text(self):
        """Concatenated contents (``DocumentScope#contents``) — for a
        single-span scope, the span text itself."""
        return F.concat_ws("", self.texts())

    def first_text(self):
        return F.try_element_at(self._arr, F.lit(1))["text"]

    def media_refs(self):
        return F.transform(self._arr, lambda s: s["media_ref"])


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
