"""Sinks: filesystem export and CSV report.

* report — the per-page CSV of ``ReportCommand`` (``lib/report_command.rb:
  22-41``): one row per crawled page with the DocumentScope columns.
* export — the site mirror of ``ExportCommand`` (``lib/export_command.rb:
  5-84``), re-expressed as partitioned parquet/json of the pages table
  (text bodies as span arrays, binaries as media refs) instead of a
  YAML-file-per-page tree.
* HEAD fetch — ``Cobweb#head`` (``lib/cobweb.rb:307-451``): the same
  metadata join as GET, projecting header-ish columns only and skipping
  spans entirely (column pruning keeps the scan narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from .document_scope import document_scope
from .fetch import fetch_meta

HEAD_COLS = [
    "url",
    "fetch_url",
    "base_url",
    "status_code",
    "mime_type",
    "character_set",
    "redirect_through",
    "error",
]


def head_fetch(
    frontier: DataFrame, documents: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """HEAD request wave: headers-only projection of the fetch join
    (follows redirects exactly like GET, lib/cobweb.rb:364-377)."""
    return fetch_meta(frontier, documents, cfg).select(*HEAD_COLS)


def write_report_csv(
    pages: DataFrame, documents: DataFrame, path: str
) -> None:
    """Crawl report: crawled pages joined to their DocumentScope columns."""
    scope = document_scope(documents)
    report = (
        pages.filter("permitted")
        .select("url", "fetch_url", "fetch_order", "depth")
        .join(scope, pages.fetch_url == scope.doc_id, "left")
        .drop("doc_id")
        .orderBy("fetch_order")
    )
    report.write.mode("overwrite").option("header", True).csv(path)


def write_export(
    pages: DataFrame,
    documents: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: str = "host",
) -> None:
    """Site mirror: full page rows + spans, partitioned for re-reads."""
    full = pages.join(
        documents.select(F.col("doc_id"), "spans"),
        pages.fetch_url == F.col("doc_id"),
        "left",
    ).drop("doc_id")
    writer = full.write.mode("overwrite").partitionBy(partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format {fmt}")
