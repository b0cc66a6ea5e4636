"""Similarity search over the ``embeddings`` table (array<float> column).

* ``cosine_topk``    — brute-force exact top-k: higher-order functions
  (zip_with + aggregate) keep the dot product in JVM codegen; per-query
  ranking is a window over the query partition. The baseline/oracle path.
* ``lsh_ann_topk``   — the scale path: random-hyperplane LSH buckets
  (deterministic md5-derived hyperplanes), candidates restricted to the
  query's bucket (plus optional multi-probe by Hamming-1 neighbors).
  Approximate — verified as rows-only + recall test in pytest.

At 100 TB the brute-force variant is a cross join — O(Q·N) — only sane
for small Q; the LSH variant turns it into an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # promote to double before multiplying: DuckDB's oracle computes in
    # double too, so the sequential sums are bit-identical across engines
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda y: y.cast("double"))
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank); ties broken by
    neighbor_id for determinism. Self-matches excluded.
    """
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    pairs = q.crossJoin(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
        )
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG state)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            v = (int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0
            row.append(v)
        planes.append(row)
    return planes


def _bucket_udf(dim: int, n_planes: int, seeds: list[int]):
    """Vectorized sign-LSH bucket assignment: embedding → array<int> of
    one bucket per table (seed).

    Replaces the per-table Catalyst expression tree (round 7): n_tables ×
    n_planes `aggregate(zip_with(...))` folds over 64-literal plane
    arrays built a ~450 KB physical plan whose lambdas evaluate
    INTERPRETED per element (higher-order functions have no codegen) —
    guide §4.2: hand whole Arrow batches to numpy instead. One matmul
    against the (dim × n_tables·n_planes) plane matrix computes every
    bit. Sign parity with the JVM/DuckDB sequential fold is exact: a
    64-term float64 dot differs from the sequential sum by ≪ 1e-10, so
    any |dot| ≥ 1e-9 has the same sign under both summation orders;
    the (never observed) |dot| < 1e-9 margin re-computes that one dot
    with the exact left-to-right double fold the SQL expression uses.
    """
    from pyspark.sql.functions import pandas_udf

    mats = np.array(
        [_hyperplanes(dim, n_planes, seed=s) for s in seeds],
        dtype=np.float64,
    )  # (T, P, D)
    mat = mats.reshape(-1, dim).T  # (D, T*P)
    n_tables = len(seeds)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        e = np.array(emb.tolist(), dtype=np.float64)  # (N, D)
        if e.size == 0:
            return pd.Series([], dtype=object)
        dots = e @ mat  # (N, T*P)
        for i, j in np.argwhere(np.abs(dots) < 1e-9):
            acc = 0.0
            for k in range(dim):
                acc += float(e[i, k]) * float(mat[k, j])
            dots[i, j] = 0.0 if acc >= 0.0 else -1.0
        bits = (dots >= 0.0).reshape(len(e), n_tables, n_planes)
        b = (bits * weights).sum(axis=2).astype(np.int32)
        return pd.Series(list(b))

    return buckets


def lsh_bucket(embeddings: DataFrame, n_planes: int = 8, dim: int | None = None) -> DataFrame:
    """Add a sign-LSH bucket id: bit_p = dot(v, plane_p) >= 0.

    Pass ``dim`` explicitly in plan-construction paths: the ``first()``
    fallback is a driver action (a Spark job inside operator construction)
    and exists only for interactive convenience.
    """
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    bu = _bucket_udf(dim, n_planes, [7])
    return embeddings.withColumn(
        "bucket", F.element_at(bu("embedding"), 1)
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the LSH bucket.

    With ``multiprobe`` the query also probes every Hamming-1 neighbor
    bucket (flip one hyperplane bit) — the standard recall boost for
    sign-LSH at the cost of (n_planes+1)× candidate fan-out.
    """
    bucketed = lsh_bucket(embeddings, n_planes, dim=dim)
    q = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "query_id",
            "q_emb",
            F.explode(probes).alias("q_bucket"),
        )
    cand = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("bucket").alias("n_bucket"),
    )
    pairs = q.join(
        cand, F.col("q_bucket") == F.col("n_bucket")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_ann_topk_multitable(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 16,
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Multi-table sign-LSH ANN: L independent hash tables, candidates
    unioned across tables, exact cosine ranking over the union.

    One table of sign-LSH has per-neighbor hit probability ~p^b (p =
    1 − θ/π per hyperplane bit); on near-isotropic vectors that is
    single-digit recall (measured 0.11 recall@5 on the sandbox
    embeddings). The standard construction is L tables with independent
    hyperplanes: miss probability (1 − p_hit)^L — recall@5 ≥ 0.8 at
    L=16 here (tests/test_round4.py pins the floor). Plan shape is the
    100 TB one: candidate generation is one equi-join on (table_id,
    bucket); the (vec, table) assignment explodes L rows per vector,
    which is multi-table LSH's inherent storage/compute price, not a
    Spark artifact. Real embedding corpora cluster (higher p), so
    production uses smaller L for the same recall; the parameters trade
    candidate fan-out for recall explicitly.
    """
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])

    bu = _bucket_udf(dim, n_planes, [7 + t for t in range(n_tables)])
    bucketed = embeddings.select(
        "vec_id",
        "embedding",
        F.posexplode(bu("embedding")).alias("table_id", "bucket"),
    )
    q = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "query_id",
            "q_emb",
            "q_table",
            F.explode(probes).alias("q_bucket"),
        )
    cand = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("table_id").alias("n_table"),
        F.col("bucket").alias("n_bucket"),
    )
    # dedup BEFORE scoring: a neighbor found by several tables/probes is
    # scored once, not L times
    pairs = (
        q.join(
            cand,
            (F.col("q_table") == F.col("n_table"))
            & (F.col("q_bucket") == F.col("n_bucket")),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_emb", "neighbor_id", "n_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs by embedding cosine — the SemDeDup
    shape: multi-table sign-LSH generates candidates (bucket equi-joins,
    never all-pairs), exact cosine filters them at ``threshold``.

    Fewer planes than the ANN tier (6 vs 8): pair generation wants
    recall on moderately-similar pairs, and halving the bucket space
    quadruples per-bucket collision probability at ~4× the candidate
    fan-out — the explicit recall/cost trade. Approximate by design
    (LSH can miss a pair); the DuckDB oracle mirrors the same tables,
    so the check is exact over the same candidate set.
    Returns (vec_a, vec_b, cosine) with vec_a < vec_b.
    """
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])

    bu = _bucket_udf(dim, n_planes, [7 + t for t in range(n_tables)])
    bucketed = embeddings.select(
        "vec_id",
        "embedding",
        F.posexplode(bu("embedding")).alias("table_id", "bucket"),
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        "table_id",
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "table_id",
        "bucket",
    )
    # dedup across tables BEFORE the exact cosine: a pair colliding in
    # several tables is scored once
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "emb_a", "vec_b", "emb_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_keepers(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-level near-dup resolution (SemDeDup): connected
    components over the ``semantic_dedup_pairs`` graph, one keeper
    (minimum vec_id) per semantic cluster; vectors in no pair keep
    themselves. Reuses the same bounded min-label propagation as the
    text dedup tier — the candidate generation, the verification and
    the cluster resolution are all equi-join/groupBy shapes.
    """
    from .textops import connected_components

    pairs = semantic_dedup_pairs(
        embeddings, threshold, n_planes, n_tables, dim
    )
    comps = connected_components(pairs, src="vec_a", dst="vec_b")
    return (
        embeddings.select("vec_id")
        .join(
            comps.select(F.col("node").alias("vec_id"), "keeper"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("keeper", F.col("vec_id")).alias("keeper"),
        )
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse-quantizer centroids: the ``n_centroids``
    corpus vectors with the smallest ``md5(vec_id)`` (ties by vec_id).

    Sampled centroids instead of k-means iterations keep the construction
    reproducible across engines (the DuckDB oracle re-derives the same
    set with ``ORDER BY md5(...) LIMIT K``) and collect exactly K rows to
    the driver — the one driver action in the IVF path, bounded by K, not
    the corpus. At 100 TB K ~ sqrt(N) is still thousands of rows, safely
    collectable; a k-means refinement would only change the centroid
    table, not the plan shape downstream.
    """
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


def _centroid_sims(emb_col, centroids):
    """Array of (sim, -cid) structs: per-row cosine-to-centroid, computed
    once per centroid, all in JVM codegen. ``array_max`` on it gives the
    best centroid (max sim, ties to the smallest cid via the negated id);
    ``sort_array(desc)`` + ``slice`` gives the nprobe-nearest list."""
    entries = []
    for cid, cemb in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cemb])
        sim = _dot(emb_col, arr) / _norm(arr)
        entries.append(
            F.struct(
                sim.alias("sim"),
                F.lit(-cid).cast("bigint").alias("negcid"),
            )
        )
    return F.array(*entries)


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Assign every vector to its inverted list: cid of the max-cosine
    centroid. Map-only — the centroid table rides in as a literal array
    (broadcast by construction), so building the IVF index is one scan
    with zero shuffles; writing it partitioned by ``cid`` IS the index.
    """
    sims = _centroid_sims(F.col("embedding"), centroids)
    return embeddings.withColumn(
        "cid", (-F.array_max(sims)["negcid"]).cast("bigint")
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into ``n_centroids``
    inverted lists, probe the ``nprobe`` nearest lists per query, exact
    cosine ranking within the probed lists.

    The third standard ANN construction next to the sign-LSH tiers:
    where LSH recall is tuned by (planes, tables), IVF recall is tuned
    by nprobe/n_centroids — candidates are corpus-partition-shaped
    (~nprobe/K of the data per query) rather than hash-bucket-shaped.
    Candidate generation is one equi-join on ``cid``; inverted lists
    partition the corpus, so probing never double-scores a neighbor.
    Approximate by design; the DuckDB oracle mirrors the same sampled
    centroids, assignment and probe ranking exactly.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    cents = ivf_centroids(embeddings, n_centroids)
    inv = ivf_assign(embeddings, cents).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        "cid",
    )
    q_sims = _centroid_sims(F.col("embedding"), cents)
    probes = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.slice(F.sort_array(q_sims, asc=False), 1, nprobe)
            ).alias("probe"),
        )
        .select(
            "query_id",
            "q_emb",
            (-F.col("probe")["negcid"]).cast("bigint").alias("cid"),
        )
    )
    pairs = probes.join(inv, "cid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("n_emb"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
