"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring production vector-search practice:

* ``cosine_topk`` — exact brute force: broadcast the (small) query
  set against the corpus, one narrow map stage + TakeOrdered per
  query. The right baseline, and the recall oracle for the ANN path.
* ``lsh_topk`` — random-hyperplane LSH: corpus bucketed by sign
  pattern; queries probe their own bucket (plus multi-probe
  neighbors), scoring only the bucket's members. At 100 TB the
  bucketed path turns a full-corpus scan per query into a keyed
  join on bucket id. Hyperplanes are md5-derived (deterministic —
  no RNG state, resumable, identical across runs/engines).

All arithmetic is elementwise-double fold (zip_with + aggregate),
bit-identical to the DuckDB oracle's sequential fold — verified
empirically, which lets the driver hash-match exact cosine scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with elementwise double cast and sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, ranked per
    query with deterministic tie-break on neighbor id. Output:
    (query_id, neighbor_id, cos_sim, rank). Self-matches excluded.

    Norms are projected per SIDE ROW below the join (``q_norm``
    materializes in the broadcast relation, ``c_norm`` in the stream
    side's child project), so each candidate pair costs one array
    fold (the dot), not three — same IEEE ops in the same order as
    folding inline, so scores stay bit-identical to the oracle."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_values(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components: component d
    is md5("plane{p}|dim{d}") first-8-hex → uint32, scaled to
    [-0.5, 0.5). Stateless — any process recomputes the identical
    plane (hashlib here == Spark md5 on UTF-8; the driver oracle
    relies on that to mirror bucketing bit-for-bit)."""
    import hashlib

    return [
        int(hashlib.md5(f"plane{plane}|dim{d}".encode()).hexdigest()[:8], 16)
        / float(0xFFFFFFFF)
        - 0.5
        for d in range(dim)
    ]


def _hyperplane(dim: int, plane: int) -> Column:
    """Plane as a literal double array. Computed driver-side in Python
    rather than as 64 md5/conv/cast expression nodes per plane: the
    values are constants either way, but literal arrays keep the
    bucket expression small enough for fast codegen (8 planes × 64
    dims of md5 nodes measurably slowed plan compilation)."""
    return F.array(*[F.lit(v) for v in _hyperplane_values(dim, plane)])


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-pattern bucket id: bit p = 1 iff vec · plane_p ≥ 0."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        sign = (dot(vec_col, _hyperplane(dim, p)) >= 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(sign, p))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (and, with ``multiprobe``≥1, buckets at Hamming distance 1
    — flipping each plane bit once — which sharply improves recall
    for near-boundary vectors)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket0"),
    )
    probes = [F.col("bucket0")]
    if multiprobe >= 1:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    q = q_base.select(
        "query_id",
        "q_vec",
        "q_norm",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "cent_vec",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    centroid-id tiebreak): broadcast the small centroid set, argmax
    per vector via ``max_by`` over a (cos, -cell) struct — a hash
    aggregate with map-side partial combine, NOT a sort window: the
    shuffle carries one pre-reduced row per vector per map partition
    instead of sorting |corpus| × |centroids| rows. At 100 TB this is
    the partitioning pass of an IVF index; the output is typically
    written bucketed by ``cell`` so probes become partition-pruned
    scans."""
    c = centroids.select(
        F.col(cent_id_col).alias("cell"),
        F.col(cent_vec_col).alias("cv"),
        l2_norm(F.col(cent_vec_col)).alias("cvn"),
    )
    # Corpus-row norm projected once below the join (vs once per
    # centroid pair inside cosine()): per pair costs one fold.
    scored = (
        corpus.select(
            id_col, vec_col, l2_norm(F.col(vec_col)).alias("vn")
        )
        .crossJoin(F.broadcast(c))
        .select(
            id_col,
            vec_col,
            "cell",
            (
                dot(F.col(vec_col), F.col("cv"))
                / (F.col("vn") * F.col("cvn"))
            ).alias("c_cos"),
        )
    )
    # max over (c_cos, -cell) == highest cosine, lowest cell id on ties
    # — identical ordering to ORDER BY c_cos DESC, cell.
    return scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.max_by("cell", F.struct(F.col("c_cos"), -F.col("cell"))).alias("cell"),
    )


def kmeans_refine_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 1,
    decimals: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd refinement of the IVF centroids.

    Seeds are the first ``n_centroids`` corpus rows by id (stateless,
    any engine recomputes them); each iteration assigns every vector
    to its nearest seed by cosine (``ivf_assign``) and replaces each
    centroid with the member mean, component-wise, rounded to
    ``decimals`` — rounding absorbs the accumulation-order drift
    between engines so the oracle replays the refinement exactly
    (same trick as ``embedding_centroids``). No RNG anywhere: the
    result is a pure function of the corpus.

    Plan shape per iteration: one broadcast-assign pass over the
    corpus + one (cell, pos)-keyed hash-agg — the k-means|| shape. At
    100 TB this runs as an offline index-build job whose output (a
    |cells| × dim table, a few KB) is persisted and broadcast at
    query time; it is NOT recomputed per query."""
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        long = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "v")
        )
        per_pos = long.groupBy("cell", "pos").agg(
            F.round(F.avg("v"), decimals).alias("cv")
        )
        cents = per_pos.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("cent_vec")
        ).select(F.col("cell").alias("cent_id"), "cent_vec")
        # |cells| × dim rows — a few KB. Every downstream consumer
        # (next iteration, cell assignment, probe selection) re-reads
        # this subtree; caching it cuts the corpus re-scans that lazy
        # recomputation would multiply in.
        cents = cents.cache()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 1,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into ``n_centroids``
    cells by nearest centroid; each query probes its ``nprobe``
    nearest cells and scores only their members.

    Centroids are the first ``n_centroids`` corpus rows by id,
    improved by ``refine_iters`` deterministic Lloyd iterations
    (``kmeans_refine_centroids``) — seed rows need not span the space
    for recall to hold. Everything stays mirrorable in plain SQL.
    Scale shape: the candidate join is keyed on ``cell`` (shuffle or
    pruned bucket scan), never a full corpus × queries cross
    product; the refinement is the offline index-build pass."""
    if refine_iters > 0:
        centroids = kmeans_refine_centroids(
            corpus, n_centroids, refine_iters, id_col=id_col, vec_col=vec_col
        )
    else:
        centroids = (
            corpus.filter(F.col(id_col) < n_centroids)
            .select(
                F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
            )
        )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    cells = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        "cell",
    )

    qc = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    ).crossJoin(
        F.broadcast(
            centroids.select(
                F.col("cent_id").alias("cell"),
                F.col("cent_vec"),
                l2_norm(F.col("cent_vec")).alias("cent_norm"),
            )
        )
    )
    wq = W.partitionBy("query_id").orderBy(
        (
            dot(F.col("q_vec"), F.col("cent_vec"))
            / (F.col("q_norm") * F.col("cent_norm"))
        ).desc(),
        F.col("cell"),
    )
    probes = (
        qc.withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "cell")
    )

    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed self-join
    (same sign pattern ⇒ likely high cosine), exact cosine verify,
    threshold. The scale path for semantic dedup — the bucket join
    replaces the O(n²) pair space.

    Buckets larger than ``max_bucket`` are dropped before the
    self-join (same policy as the MinHash path,
    ``dedup.lsh_candidate_pairs``): near-identical embeddings —
    precisely the near-dup case — concentrate in one bucket, and a
    degenerate bucket of B members would emit B²/2 pairs before the
    threshold filter. The cap bounds the worst case at
    max_bucket²/2 per bucket; mass-duplicate content belongs to
    exact dedup (hash of the vector bytes), not the pairwise path.
    The count uses a window over the SAME key the join shuffles on,
    so capping adds no extra exchange."""
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy("bucket"))
    ).filter(F.col("_n") <= max_bucket).drop("_n")
    a = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_norm").alias("na"),
    )
    c = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_norm").alias("nb"),
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 5,
) -> DataFrame:
    """Per-group mean vector (average pooling), emitted LONG —
    ``(group, pos, centroid)`` — rather than re-assembled arrays.

    Plan: posexplode the vector (narrow, ×dim row blowup) → one
    hash-agg keyed (group, pos). Partial aggregation sums map-side, so
    the shuffle carries |groups|·dim partial sums per partition — at
    100 TB with dim=1024 and 10k groups that is ~10M rows per
    partition worst case, still tiny next to the input. The long form
    is deliberately join-ready for IVF assignment (``ivf_assign``)
    and keeps the oracle trivial (DuckDB
    ``generate_subscripts``+``unnest`` zip). Rounding bounds
    float-accumulation-order drift between engines.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return (
        exploded.groupBy(group_col, "pos")
        .agg(F.round(F.avg("v"), decimals).alias("centroid"))
        .withColumn("pos", F.col("pos").cast("long"))
    )
