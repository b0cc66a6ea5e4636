"""Training-data text operators over the flat ``documents`` table.

The large-scale pipeline surface beyond the reference's own operators:
token counting, quality scoring, language-ID, fingerprinting, exact and
near deduplication (MinHash/LSH, SimHash, token Jaccard). Everything is
built from JVM expressions (split/explode/groupBy/md5) so the hot path
stays in whole-stage codegen; all hashing derives from md5 so the DuckDB
oracle SQL computes bit-identical values.

Cross-engine hash convention: ``h(s) = int(md5(s)[:15], 16)`` — 60 bits,
positive in both engines (Spark: conv(substr(md5(x),1,15),16,10) cast
bigint; DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic MinHash parameters: universal hashing mod the Mersenne
# prime 2^31-1 over 31-bit token hashes — products stay < 2^48, exactly
# representable in BIGINT in both Spark and DuckDB (no overflow, no
# decimal/hugeint divergence between engines)
MINHASH_K = 8
MH_PRIME = (1 << 31) - 1
MH_A = [100003 + 6 * j for j in range(MINHASH_K)]
MH_B = [15485863 + 7 * j for j in range(MINHASH_K)]

SIMHASH_BITS = 16

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "you", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "para"],
}


def _h(col):
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _tokens(text_col: str = "text"):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _widen_scan(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when its scan has fewer
    splits than cores (guide §2.5 "input skew": one small/unsplittable
    file serializes every fused downstream stage into one task — the
    round-start profile showed the whole tokenize→md5→minhash pipeline
    running 12 s in a single task on the benchmark documents file).
    No-op when the scan is already wide (a web-scale corpus has
    thousands of splits), so nothing is shuffled at scale; results are
    unchanged (every consumer is a keyed aggregation/join)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= min(target, 16):
        return df
    return df.repartition(target)


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subword proxy count (runs of
    letters / digits / single punctuation — a tokenizer-shaped regex)."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("n_subtokens"),
        F.length("text").alias("n_chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: length, punctuation density, stopword
    ratio, mean word length — the standard cheap pre-filter columns."""
    n_tokens = F.size(_tokens())
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[.,!?;:]"), 0)
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")),
            F.lit(r"\b(?:" + "|".join(STOPWORDS["en"]) + r")\b"),
            0,
        )
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        F.round(
            (F.length("text") - n_tokens + 1)
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("mean_word_len"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """N-gram/stopword-heuristic language ID: score = stopword hits per
    language wordlist; argmax wins (ties broken by language code)."""
    scores = [
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")),
                F.lit(r"\b(?:" + "|".join(words) + r")\b"),
                0,
            )
        ).alias(f"score_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    ]
    scored = documents.select("doc_id", "lang", *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first max wins, alphabetical
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred.alias("lang_pred"),
        best.alias("best_score"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (the exact-dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy on the fingerprint: one keeper (min
    doc_id) per group + group size. Analogue of the reference's seen-set
    exactness tier, applied to content instead of URLs."""
    fp = fingerprints(documents)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _token_hashes(documents: DataFrame) -> DataFrame:
    """distinct (doc_id, token) with the 60-bit token hash."""
    toks = _widen_scan(documents).select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).where(F.col("token") != "")
    return toks.distinct().withColumn("th", _h(F.col("token")))


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash over the distinct token set.

    sig_j = min over tokens of (a_j * h(token) + b_j) mod p — one
    partial-aggregatable groupBy (map-side combine), no UDF.
    """
    th = _token_hashes(documents)
    aggs = [
        F.min(
            (F.col("th") % MH_PRIME * MH_A[j] + MH_B[j]) % MH_PRIME
        ).alias(f"mh_{j}")
        for j in range(k)
    ]
    return th.groupBy("doc_id").agg(*aggs)


def lsh_near_dup_pairs(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature, bucket-join.

    Scale shape: the O(n²) comparison collapses to equi-joins on
    (band_id, band_signature); only same-bucket docs pair up.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(documents, k)
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"mh_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.concat_ws("_", *parts).alias(f"band_{b}")
        )
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"band_{b}").alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.band_sig")
    # pin the banded signatures before the self-join: the broadcast side
    # would otherwise re-execute the whole tokenize→hash→minhash pipeline
    # (the round-start plan shows the scan→explode→agg subtree TWICE —
    # broadcast and shuffle forms share no exchange to reuse); with the
    # lazy checkpoint both sides read one materialization (guide §1.2:
    # don't compute things twice). The explicit bucket-keyed repartition
    # does double duty: AQE would coalesce the ~1 MB post-signature
    # exchange to ONE partition, serializing the pair-emitting probe into
    # a single 10 s task (measured, BENCH/r07/evlog_lsh.json s10) — a
    # user-specified partition count is exempt from coalescing, and
    # keying it on the join key keeps the self-join exchange-free.
    n_part = int(
        documents.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    stacked = stacked.repartition(
        n_part, "band_id", "band_sig"
    ).localCheckpoint(eager=False)
    a = stacked.alias("a")
    c = stacked.alias("c")
    return (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_sig") == F.col("c.band_sig"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Iterated min-label propagation in a bounded driver loop (the same
    feedback shape as the crawler's redirect-chain loop): each round every
    node takes the minimum of its own label and its neighbors' labels —
    one co-partitioned join + map-side-combined groupBy per round,
    converging in O(component diameter) rounds. Near-dup clusters are
    near-cliques (diameter ≲ 3), so this terminates in a handful of
    rounds; the per-round work is two equi-joins over the edge list, the
    100 TB-safe shape (no driver-side graph). Returns (node, keeper)
    for every node that appears in an edge; keeper is the component's
    minimum node id. Raises if ``max_iters`` rounds don't reach the
    fixpoint (components deeper than max_iters — not a near-dup shape).
    """
    # pin the pair generation ONCE: the symmetric union below references
    # the edges plan twice (plain + swapped projection), and without the
    # pin the upstream pair pipeline (LSH band join / exact-cosine gate)
    # executes twice inside the checkpoint job (round 7, guide §1.2)
    edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint()
    both = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    # the edge list is reused every round: partition once on the probe key
    both = both.repartition("d").localCheckpoint()
    labels = (
        both.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("keeper", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = object()  # sentinel ≠ any sum (incl. the empty-graph null)
    for i in range(max_iters + 1):
        # one round = one co-partitioned join + one map-side-combined
        # groupBy over (neighbor labels ∪ own labels): min(own, min of
        # neighbors) without the second (labels ⋈ nbr_min) join the
        # round-start version paid. Convergence is read off the exact
        # label-sum: labels only ever decrease, so the sum strictly
        # decreases until the fixpoint — one agg collect per round that
        # also materializes the lazy checkpoint (one Spark job per round
        # instead of two; round 7).
        nbr = both.join(
            labels.select(
                F.col("node").alias("d"), F.col("keeper").alias("k")
            ),
            "d",
        ).select(F.col("s").alias("node"), "k")
        updated = (
            nbr.unionByName(
                labels.select("node", F.col("keeper").alias("k"))
            )
            .groupBy("node")
            .agg(F.min("k").alias("keeper"))
            .localCheckpoint(eager=False)
        )
        cur = updated.agg(
            F.sum(F.col("keeper").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = updated
        if cur == prev_sum:
            return labels
        prev_sum = cur
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iters} rounds"
    )


def cluster_keepers(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = 4,
) -> DataFrame:
    """Near-dup cluster resolution: the step after LSH pair generation
    that a training-data dedup pipeline actually consumes. Connected
    components over the ``lsh_near_dup_pairs`` graph; every document gets
    (doc_id, keeper) where keeper is the minimum doc_id of its near-dup
    component — documents in no pair keep themselves. Downstream dedup is
    then ``filter(doc_id == keeper)``.
    """
    pairs = lsh_near_dup_pairs(documents, k, bands)
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        documents.select("doc_id")
        .join(
            comps.select(F.col("node").alias("doc_id"), "keeper"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("keeper", F.col("doc_id")).alias("keeper"),
        )
    )


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over tokens: per-bit majority vote of token hashes."""
    th = _token_hashes(documents)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    agg = th.groupBy("doc_id").agg(*bit_sums)
    value = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(0)
        value = term if value is None else (value + term)
    return agg.select("doc_id", value.cast("bigint").alias("simhash"))


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard for pairs sharing ≥1 token.

    intersection via self-join on token, |A∪B| = |A|+|B|−|A∩B|. The
    per-token join is the scalable route (no cross join) BUT a token with
    document frequency d emits O(d²) pairs — a stopword-grade token at
    100 TB is quadratic work AQE can split but not shrink. ``max_df``
    (the standard document-frequency prefix filter) drops tokens with
    df > max_df before the self-join; sizes are computed AFTER the cap,
    so the guarded variant computes Jaccard over the df≤max_df token
    space — a well-defined, deterministic semantics the DuckDB oracle
    reproduces exactly. Unguarded (max_df=None) remains the small-scope
    oracle tier; at scale, run guarded or demote to post-LSH verification.
    """
    th = _token_hashes(documents).select("doc_id", "token")
    if max_df is not None:
        keep = (
            th.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= int(max_df))
            .select("token")
        )
        th = th.join(keep, "token")
    sizes = th.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = th.alias("a"), th.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")
    )
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _word_ngrams(t, n: int):
    """Array of space-joined word n-grams of token-array column ``t``.

    Pure JVM expression (sequence + slice + concat_ws) — the guard keeps
    Spark's ``sequence`` from generating a DESCENDING range when the doc
    has fewer than n tokens (it would, silently)."""
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
) -> DataFrame:
    """Benchmark-contamination check: fraction of each document's distinct
    word n-grams that appear in the ``benchmark`` table — the n-gram
    decontamination pass every training-data pipeline runs before a model
    sees the corpus (13-gram overlap is the common published convention).

    Scale shape: document n-grams are hashed (md5) and DISTINCT'ed per
    doc (one map-side-combinable pass); the benchmark n-gram set — small
    by definition, benchmarks are thousands of documents, not billions —
    is built once, DISTINCT'ed, and broadcast, so the overlap probe is a
    broadcast semi-join with no shuffle of the corpus side. Output is one
    row per document: (doc_id, n_grams, n_overlapping, contamination).
    """
    t = _tokens()
    doc_grams = (
        documents.select(
            "doc_id", F.explode(_word_ngrams(t, n)).alias("gram")
        )
        .select("doc_id", F.md5("gram").alias("g"))
        .distinct()
    )
    bench_grams = (
        benchmark.select(F.explode(_word_ngrams(t, n)).alias("gram"))
        .select(F.md5("gram").alias("g"))
        .distinct()
    )
    per_doc = doc_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_overlapping", F.lit(0)).alias("n_overlapping"),
            F.round(
                F.coalesce("n_overlapping", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("contamination"),
        )
    )


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals, all JVM expressions:

    * ``dup_word_frac``       — 1 − |distinct words| / |words| (the
      within-document duplicate-token mass);
    * ``top2gram_char_frac``  — max over repeated word 2-grams of
      (count × gram chars) / doc chars;
    * ``top3gram_char_frac``  — same over word 3-grams.

    Each signal is an explode → two-level map-side-combinable groupBy —
    the partial-agg shape that holds at corpus scale (state per doc, not
    per corpus). Documents with no repeated n-grams score 0.
    """
    t = _tokens()
    base = documents.select(
        "doc_id", F.length("text").alias("n_chars")
    )
    words = documents.select(
        "doc_id", F.explode(t).alias("w")
    ).where(F.col("w") != "")
    word_stats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("w").alias("n_distinct_words"),
    )

    def top_gram_chars(n: int, out: str) -> DataFrame:
        grams = documents.select(
            "doc_id", F.explode(_word_ngrams(t, n)).alias("g")
        )
        return (
            grams.groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
            .groupBy("doc_id")
            .agg(F.max(F.col("c") * F.length("g")).alias(out))
        )

    g2 = top_gram_chars(2, "dup2_chars")
    g3 = top_gram_chars(3, "dup3_chars")
    return (
        base.join(word_stats, "doc_id", "left")
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.round(
                F.lit(1)
                - F.coalesce("n_distinct_words", F.lit(0))
                / F.greatest(F.coalesce("n_words", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce("dup2_chars", F.lit(0))
                / F.greatest("n_chars", F.lit(1)),
                6,
            ).alias("top2gram_char_frac"),
            F.round(
                F.coalesce("dup3_chars", F.lit(0))
                / F.greatest("n_chars", F.lit(1)),
                6,
            ).alias("top3gram_char_frac"),
        )
    )


def token_chunk_segments(w: int = 10):
    """Segment-fingerprint array: md5 of each disjoint ``w``-token chunk.
    The segmenter for corpora without newline structure; for real web
    text pass ``line_segments()`` instead."""
    t = _tokens()
    return F.transform(
        F.sequence(
            F.lit(0), F.ceil(F.size(t) / F.lit(w)).cast("int") - F.lit(1)
        ),
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i * w + 1, w))),
    )


def line_segments(text_col: str = "text"):
    """Segment fingerprints from physical lines (the CCNet/RefinedWeb
    unit): md5 of each whitespace-normalized non-empty line."""
    lines = F.split(F.col(text_col), r"\n")
    return F.transform(
        F.filter(lines, lambda ln: F.trim(ln) != ""),
        lambda ln: F.md5(F.regexp_replace(F.trim(ln), r"\s+", " ")),
    )


def segment_dedup(
    documents: DataFrame,
    segment_col=None,
) -> DataFrame:
    """Sub-document (line/paragraph) deduplication — the CCNet/RefinedWeb
    tier between exact-document and MinHash dedup: fingerprint every
    segment, group fingerprints ACROSS the corpus, and charge each
    document for segments whose corpus-wide keeper (minimum doc_id) is a
    different document. Downstream, a pipeline drops those segments; here
    the per-document accounting is the queryable output:
    (doc_id, n_segments, n_dup_segments, dup_frac, max_segment_df).

    Scale shape: explode → one hash-partitioned groupBy on the segment
    fingerprint (min/count are partial-aggregatable, map-side combined)
    → co-partitioned join back on the fingerprint → per-doc groupBy.
    No window functions, no driver state; boilerplate segments (the
    hot keys) skew the fingerprint groupBy and are exactly what AQE
    skew-split handles.
    """
    if segment_col is None:
        segment_col = token_chunk_segments()
    segs = documents.select(
        "doc_id", F.explode(segment_col).alias("fp")
    )
    keepers = segs.groupBy("fp").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).alias("df"),
    )
    per_doc = (
        segs.join(keepers, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(
                F.when(F.col("keeper") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_dup_segments"),
            F.max("df").alias("max_segment_df"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_dup_segments", F.lit(0)).alias(
                "n_dup_segments"
            ),
            F.round(
                F.coalesce("n_dup_segments", F.lit(0))
                / F.greatest(F.coalesce("n_segments", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_frac"),
            F.coalesce("max_segment_df", F.lit(0)).alias("max_segment_df"),
        )
    )


# -- round 5: PII, splits, vocabulary, per-source quotas ------------------

# PII patterns written in the Java-regex ∩ RE2 dialect (no lookaround, no
# backreferences) so Spark and the DuckDB oracle match identical spans.
# Redaction order matters: emails first (they contain digit runs and
# dots), then IPv4, then phones.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{7,15}\b|\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrub — the pre-training redaction pass: count and replace
    emails, IPv4 addresses and phone numbers with typed placeholders.

    All JVM ``regexp_replace``/``regexp_extract_all`` (whole-stage
    codegen; per-doc work, no shuffle at all — the one truly
    embarrassingly-parallel operator in the pipeline). Counts are taken
    on the ORIGINAL text, then replacements applied in a fixed order so
    an email's digit runs are never double-counted as phones.
    """
    n = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    )
    redacted = F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    return documents.select(
        "doc_id",
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IPV4).alias("n_ipv4"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                F.lit(PII_PHONE),
                0,
            )
        ).alias("n_phones"),
        redacted.alias("redacted"),
    )


def hash_split(
    documents: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free hash of
    the document id: bucket = md5-hash(doc_id) mod 100. The split is
    stable under corpus growth/reordering/re-partitioning (the property
    random() sampling lacks), reproducible across engines, and pure
    per-row compute — no shuffle, no state.
    """
    bucket = F.pmod(_h(F.col("doc_id").cast("string")), F.lit(100))
    return documents.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def vocab_topk(documents: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k lowercased whitespace tokens by frequency
    (ties broken alphabetically), with dense global rank.

    Scale shape: explode → one map-side-combined groupBy(token) →
    ``orderBy(...).limit(k)`` — Spark plans the limit as a distributed
    TakeOrdered (per-partition top-k, then a k·P-row driver merge), NOT
    a global sort. The row_number window then runs over k rows only.
    """
    counts = (
        documents.select(F.explode(_tokens()).alias("token"))
        .where(F.col("token") != "")
        .select(F.lower("token").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return counts.withColumn("rank", F.row_number().over(w))


def source_quota_sample(documents: DataFrame, quota: int = 50) -> DataFrame:
    """Per-source quota sampling — the data-mixing primitive: keep at
    most ``quota`` documents per source, chosen by a deterministic
    hash order (so the sample is uniform-ish, stable, and identical in
    any engine), and return them with their within-source sample rank.

    One window per source partition. A mega-source makes that partition
    big — same skew story as politeness admission (`operators/admit.py`);
    at 10^10 docs apply the same two-phase salted pre-top-k before the
    per-source window. At benchmark scale the direct window is the
    honest measurement.
    """
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        documents.select("doc_id", "source")
        .withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= quota)
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 256,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Sequence packing — map each document onto its token-offset range in
    the concatenated training stream (GPT-style concat-and-chunk packing).

    Documents are laid out in deterministic ``md5(doc_id)`` order (the
    same content-free shuffle as ``hash_split``), tokens concatenated,
    and the stream cut into fixed ``seq_len`` windows. The output gives,
    per document: its token count, its start offset in the stream, and
    the first/last training-sequence ids it lands in — everything a
    pack-and-shard writer needs to emit examples.

    The global running offset is the same scalable construction as BFS
    ``discovery_order`` (`operators/order.py`): bucket by an
    order-preserving md5 prefix (16^bucket_hex_chars buckets), per-bucket
    token sums from ONE map-side-combined agg (collects n_buckets rows,
    never data), driver prefix-sum rides back as a literal map, and a
    per-bucket window cumsum assigns offsets in whole-stage codegen —
    no single-partition global window, no Python stage. At 100 TB raise
    ``bucket_hex_chars`` so per-bucket rows stay executor-sized.
    """
    okey = F.md5(F.col("doc_id").cast("string"))
    # count only real tokens: split("") is [""], so unfiltered size()
    # would bill empty documents one phantom token (advice r5) — and
    # disagree with the '' filter unigram/bigram scoring applies
    toks = documents.select(
        "doc_id",
        F.size(F.filter(_tokens(), lambda x: x != ""))
        .cast("bigint")
        .alias("n_tokens"),
        okey.alias("__okey"),
        F.conv(F.substring(okey, 1, bucket_hex_chars), 16, 10)
        .cast("int")
        .alias("__bkt"),
    )
    toks = toks.localCheckpoint(eager=False)
    sums = toks.groupBy("__bkt").agg(F.sum("n_tokens").alias("s")).collect()
    by_bkt = {r["__bkt"]: r["s"] for r in sums}
    offsets, acc = {}, 0
    for b in sorted(by_bkt):
        offsets[b] = acc
        acc += by_bkt[b]
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for b, off in offsets.items() for x in (b, off)]
        )
        base = F.element_at(off_map, F.col("__bkt"))
    else:
        base = F.lit(0)
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (base + F.sum("n_tokens").over(w) - F.col("n_tokens")).cast(
        "bigint"
    )
    # integer `div`, not float floor: exact at any stream length.
    # empty documents (n_tokens = 0) occupy no window: seq_last pins to
    # seq_first and n_seqs to 0 — never evaluate (start_off - 1) div,
    # where trunc-vs-floor division diverges across engines
    return toks.select(
        "doc_id", "n_tokens", start.alias("start_off")
    ).select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr(f"start_off div {seq_len}").alias("seq_first"),
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN start_off div {seq_len} "
            f"ELSE (start_off + n_tokens - 1) div {seq_len} END"
        ).alias("seq_last"),
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN 0 "
            f"ELSE (start_off + n_tokens - 1) div {seq_len} "
            f"- start_off div {seq_len} + 1 END"
        ).alias("n_seqs"),
    )


# vocab tables at or under this row count broadcast to the scoring join
# (key-only count first — never a blind broadcast of an unbounded agg)
UNIGRAM_BROADCAST_MAX_VOCAB = 2_000_000


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Unigram language-model quality score: per-document mean negative
    log-probability of its tokens under the corpus's own unigram
    distribution — the cheap stand-in for a KenLM/perplexity filter
    (low avg_nll ≈ stopword-heavy boilerplate, high ≈ rare-token noise).

    Scale shape: the exploded token stream collapses FIRST to
    ``(doc_id, token) → k`` occurrence counts — a shuffle keyed by the
    pair, which Zipf-skewed tokens cannot concentrate the way a
    token-only key would ("the" spreads across all docs). The
    vocabulary is then one further map-side-combined groupBy over that
    already-small table, and the scoring join probes ONE row per
    (doc, distinct-token) instead of one per occurrence — every probe
    matches exactly one vocab row, so the join never amplifies. The
    vocab of a web corpus is SMALL relative to the corpus
    (|V| ≪ N·len): it is broadcast when its row count is verifiably
    under ``broadcast_max_vocab`` (one key-only count, payload pruned),
    else the shuffle join partial-aggregates cleanly. The corpus total
    is a scalar driver agg over the vocab.
    """
    doc_tok = (
        documents.select("doc_id", F.explode(_tokens()).alias("token"))
        .where(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ).localCheckpoint(eager=False)
    vocab = doc_tok.groupBy("token").agg(F.sum("k").alias("cnt"))
    if (
        vocab.select("token").limit(UNIGRAM_BROADCAST_MAX_VOCAB + 1).count()
        <= UNIGRAM_BROADCAST_MAX_VOCAB
    ):
        vocab = F.broadcast(vocab)
    total = doc_tok.agg(F.sum("k")).collect()[0][0] or 0
    nll = -F.log(F.col("cnt") / F.lit(float(max(total, 1))))
    return (
        doc_tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("k") * nll) / F.sum("k"), 4
            ).alias("avg_nll"),
        )
    )


def temperature_sample(
    documents: DataFrame, tau: float = 0.5, target_frac: float = 0.3
) -> DataFrame:
    """Temperature-based source mixing — the multilingual/multi-source
    LM sampling rule: source *s* gets probability mass
    ``n_s^tau / sum(n^tau)`` (tau<1 upweights small sources), realized
    as a per-source acceptance rate against a deterministic md5
    fraction of the doc id. Expected sample size ≈ ``target_frac · N``
    with the mix flattened toward tau; rates cap at 1 (a tiny source
    cannot be oversampled without replacement).

    Scale shape: source statistics are ONE map-side-combined
    groupBy(source) collapsing to |sources| rows (thousands at web
    scale) — the corpus totals ride along as a lazy single-row
    cross-join (no driver collect, and an empty corpus yields an empty
    result instead of a scalar-NULL crash) — broadcast back onto the
    corpus, so the accept decision is pure per-row compute with no
    shuffle of the documents themselves. Determinism: same hash
    convention as ``hash_split``, so the sample is stable under growth,
    reordering, and engine choice.
    """
    stats = documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source")
    )
    totals = stats.agg(
        F.sum(F.pow(F.col("n_source").cast("double"), F.lit(float(tau))))
        .alias("__denom"),
        F.sum("n_source").cast("double").alias("__n_total"),
    )
    rate = F.least(
        F.lit(1.0),
        F.pow(F.col("n_source").cast("double"), F.lit(float(tau)))
        / F.col("__denom")
        * (F.lit(float(target_frac)) * F.col("__n_total"))
        / F.col("n_source").cast("double"),
    )
    rated = F.broadcast(
        stats.crossJoin(F.broadcast(totals)).select(
            "source", "n_source", rate.alias("rate")
        )
    )
    frac = _h(F.col("doc_id").cast("string")) / F.lit(float(1 << 60))
    return documents.join(rated, "source").select(
        "doc_id",
        "source",
        "n_source",
        F.round("rate", 6).alias("rate"),
        (frac < F.col("rate")).alias("sampled"),
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Bigram language-model quality score: per-document mean negative
    log-probability of each adjacent token pair under the corpus's own
    bigram Markov model, ``-ln( c(w1,w2) / c(w1,·) )`` — one rung above
    ``unigram_logprob`` on the KenLM ladder (captures word-order
    fluency, not just token rarity). Documents with fewer than two
    tokens have no bigrams and emit no row.

    Scale shape: adjacent pairs come from array slicing inside codegen
    (no self-join on position) and collapse FIRST to
    ``(doc_id, w1, w2) → k`` occurrence counts, so the scoring joins
    probe one row per (doc, distinct-pair) rather than per occurrence
    and the shuffle key carries doc_id (Zipf-skew on common pairs
    spreads across docs). The bigram table is one further map-side-
    combined groupBy over that table, context counts are a second
    aggregation OVER THE BIGRAM TABLE (|bigrams| ≪ corpus tokens), and
    both scoring joins key to exactly one count row — non-amplifying,
    same join shape as ``unigram_logprob``; the bigram table broadcasts
    under the same verified row-count threshold.
    """
    arr = F.filter(_tokens(), lambda x: x != "")
    doc_pairs = (
        documents.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                    F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ).localCheckpoint(eager=False)
    big = doc_pairs.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    ctx = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    if (
        big.select("w1").limit(UNIGRAM_BROADCAST_MAX_VOCAB + 1).count()
        <= UNIGRAM_BROADCAST_MAX_VOCAB
    ):
        big = F.broadcast(big)
        ctx = F.broadcast(ctx)
    nll = -F.log(F.col("c2").cast("double") / F.col("c1").cast("double"))
    return (
        doc_pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * nll) / F.sum("k"), 4
            ).alias("avg_nll"),
        )
    )


def length_stats(
    documents: DataFrame,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-language document-length distribution: count, mean, and
    p50/p90/p99 of ``n_chars`` — the corpus profile a filtering
    pipeline reads before setting length cutoffs.

    Two tiers, one groupBy(lang) each:

    * ``approx=False`` (oracle tier): exact interpolated
      ``percentile`` — NOT partial-aggregatable (Spark buffers each
      group's values), fine at benchmark scale, a scale-killer at
      10^10 rows per language.
    * ``approx=True`` (production tier): ``percentile_approx`` —
      Greenwald-Khanna sketches that partial-aggregate and merge, so
      per-executor state is O(accuracy) regardless of group size; rank
      error ≤ 1/accuracy. Same two-tier positioning as brute-force
      cosine vs LSH ANN; a pytest band pins approx-vs-exact agreement.
    """
    if approx:
        # ONE array-valued sketch aggregate, elements selected after the
        # agg — the per-percentile F.expr variant built and merged the
        # Greenwald-Khanna sketch three times per group (round-6 advice)
        pct = (
            f"percentile_approx(n_chars, array(0.5, 0.9, 0.99), "
            f"{int(accuracy)})"
        )
        return (
            documents.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.round(F.avg("n_chars"), 4).alias("mean_chars"),
                F.expr(pct).alias("_p"),
            )
            .select(
                "lang",
                "n_docs",
                "mean_chars",
                F.col("_p")[0].cast("double").alias("p50"),
                F.col("_p")[1].cast("double").alias("p90"),
                F.col("_p")[2].cast("double").alias("p99"),
            )
        )
    return documents.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99"),
    )
