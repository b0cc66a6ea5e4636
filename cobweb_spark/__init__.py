"""cobweb_spark — a from-scratch, PySpark-native crawl-frontier engine.

Re-implements the query/dataflow semantics of the reference crawler
(stewartmckee/cobweb, a Ruby gem: see /root/reference) over a columnar
``documents`` table of interleaved text+media spans, using idiomatic
Spark DataFrame operators:

* fetch          = equi-join of the frontier against the document corpus
* link extract   = explode(spans) + window-ordered uniq (JVM) + one
                   pandas UDF for URL absolutization
* dedup          = partitioned bloom filter + cuckoo overflow prefilter,
                   backstopped by an exact ``left_anti`` join
* scheduling     = host-sharded priority queue (depth, discovery_order)
                   with per-host politeness token budgets
* stats          = groupBy().agg() per wave
* iteration      = driver-side BFS wave loop with per-wave snapshot
                   commits (parquet + manifest; Iceberg-shaped)

Nothing here is a port: the reference's Redis sets/counters/locks are
replaced by DataFrame set algebra and atomic snapshot commits.
"""

__version__ = "0.1.0"
