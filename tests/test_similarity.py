"""Similarity search: exact brute-force correctness and LSH recall
against it (the standard ANN evaluation)."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators import similarity as S

DIM = 16


def _vectors(spark, n=60, seed=7):
    rng = random.Random(seed)
    # A few tight clusters plus noise, so top-k is meaningful.
    centers = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(4)]
    rows = []
    for i in range(n):
        c = centers[i % 4]
        vec = [x + rng.gauss(0, 0.1) for x in c]
        rows.append(Row(vec_id=i, embedding=[float(x) for x in vec]))
    return spark.createDataFrame(rows)


def _brute_force_py(rows, query_ids, k):
    vecs = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    out = {}
    for q in query_ids:
        scored = sorted(
            ((round(cos(vecs[q], vecs[c]), 6), c) for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [c for _, c in scored[:k]]
    return out


def test_cosine_topk_matches_python_reference(spark):
    df = _vectors(spark)
    rows = df.collect()
    got = S.cosine_topk(df, df.filter("vec_id < 3"), k=5, vec_col="embedding")
    by_q = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    expected = _brute_force_py(rows, [0, 1, 2], 5)
    assert by_q == expected


def test_lsh_topk_recall(spark):
    df = _vectors(spark, n=120)
    queries = df.filter("vec_id < 10")
    exact = S.cosine_topk(df, queries, k=5)
    approx = S.lsh_topk(df, queries, k=5, dim=DIM, n_planes=6, multiprobe=1)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_near_dup_pairs(spark):
    base = _vectors(spark, n=30)
    # duplicate vec 0 as id 1000 → cosine 1.0 must be found
    dup = base.filter("vec_id = 0").selectExpr(
        "CAST(1000 AS BIGINT) AS vec_id", "embedding"
    )
    df = base.unionByName(dup)
    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.embedding_near_dup_pairs(df, threshold=0.99, dim=DIM).collect()
    }
    assert (0, 1000) in pairs
    assert pairs[(0, 1000)] == 1.0


def test_embedding_near_dup_finds_planted(spark):
    from pyspark.sql import functions as F

    base = [Row(vec_id=i, embedding=[math.sin(i * 64 + d) for d in range(64)]) for i in range(20)]
    df = spark.createDataFrame(base)
    pert = df.select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
    )
    out = S.embedding_near_dup_pairs(df.unionByName(pert), threshold=0.99)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # every found pair is a planted (i, i+100) pair; most are recovered
    assert all(b - a == 100 for a, b in got)
    assert len(got) >= 15


def test_embedding_near_dup_bucket_cap_bounds_candidates(spark):
    """A mass-duplicate cluster (B identical vectors) must NOT emit
    B²/2 pairs: the degenerate bucket exceeds max_bucket and is
    dropped, while normal-sized buckets still yield their pairs."""
    from pyspark.sql import functions as F

    n_mass = 400
    mass = spark.range(n_mass).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(d + 1)) for d in range(DIM)]).alias("embedding"),
    )
    # One well-separated planted near-dup pair in its own bucket.
    pair = spark.createDataFrame(
        [
            Row(vec_id=10_000, embedding=[(-1.0) ** d * (d + 1) for d in range(DIM)]),
            Row(vec_id=10_001, embedding=[(-1.0) ** d * (d + 1) + 0.001 for d in range(DIM)]),
        ]
    )
    df = mass.unionByName(pair)

    capped = S.embedding_near_dup_pairs(
        df, threshold=0.99, dim=DIM, max_bucket=100
    ).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    # The 400-member bucket (79,800 potential pairs) is dropped wholesale;
    # the planted pair in a small bucket survives.
    assert got == {(10_000, 10_001)}

    # Sanity: with the cap lifted the mass cluster floods the output.
    uncapped = S.embedding_near_dup_pairs(
        df, threshold=0.99, dim=DIM, max_bucket=10**9
    ).count()
    assert uncapped == n_mass * (n_mass - 1) // 2 + 1


def test_ivf_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F
    import math as m
    rows = [Row(vec_id=i, embedding=[m.sin(i * 31 + d) * 0.5 + m.cos(d * (i % 5)) for d in range(DIM)]) for i in range(120)]
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(corpus, queries, k=5)
    approx = S.ivf_topk(corpus, queries, k=5, n_centroids=8, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # nprobe=3/8 cells: expect solid (not perfect) recall of exact top-5
    assert len(e & a) / len(e) >= 0.6
    # and every IVF hit must carry the exact cosine score
    es = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.neighbor_id) in es:
            assert abs(es[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9


def test_ivf_refined_recall_at_10(spark):
    """The contract the refinement exists to meet: on the sf0.01
    embeddings fixture, IVF with one deterministic Lloyd iteration
    reaches recall@10 ≥ 0.9 of the exact cosine baseline (at a 50%
    scan fraction: 16 of 32 cells probed) — and the refined centroids
    strictly beat the raw first-N seeds at the same parameters."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=10).collect()
    }

    def recall(iters: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(
                emb, queries, k=10, n_centroids=32, nprobe=16,
                refine_iters=iters,
            ).collect()
        }
        return len(exact & got) / len(exact)

    refined, seeded = recall(1), recall(0)
    assert refined >= 0.9
    assert refined > seeded


def test_embedding_centroids_match_numpy(spark):
    import numpy as np

    from mpg_data_warehouse_spark.operators.similarity import embedding_centroids

    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = {
        (r.label, r.pos): r.centroid
        for r in embedding_centroids(emb, "label", "embedding").collect()
    }
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        mean = np.mean(np.stack(grp["embedding"].to_numpy()), axis=0)
        for pos in (0, 7, 63):
            assert abs(got[(label, pos)] - round(float(mean[pos]), 5)) < 1e-4
    dim = len(pdf["embedding"].iloc[0])
    assert len(got) == pdf["label"].nunique() * dim


def test_ivf_index_at_rest_matches_in_flight_and_prunes(spark, tmp_path):
    """ivf_write_index + ivf_probe_index must return exactly the
    in-flight ivf_topk result (same centroids, scoring, ranking), and
    the probe's corpus scan must be partition-pruned to the probed
    cells only."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_probe_index,
        ivf_topk,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=3).collect()
    }

    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, path, n_centroids=8)
    probed = ivf_probe_index(spark, path, queries, k=10, nprobe=3)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in probed.collect()
    }
    assert got == want

    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan or "PartitionFilters: [isnotnull(cell" in plan or "cell#" in plan.split("PartitionFilters")[1][:200]


def test_ivf_index_rebuild_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_probe_index,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    path = str(tmp_path / "ivf_idx2")
    ivf_write_index(emb, path, n_centroids=8)
    q = emb.filter(F.col("vec_id") < 3)
    r1 = {tuple(r) for r in ivf_probe_index(spark, path, q, k=5).collect()}
    ivf_write_index(emb, path, n_centroids=8)  # rebuild over same corpus
    r2 = {tuple(r) for r in ivf_probe_index(spark, path, q, k=5).collect()}
    assert r1 == r2


def test_ivf_append_index_incremental_ingest(spark, tmp_path):
    """ivf_append_index: new vectors join the frozen-centroid index
    in O(|batch|), become immediately probe-visible, and replays are
    no-ops."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_append_index,
        ivf_probe_index,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n_total = emb.count()
    first = emb.filter(F.col("vec_id") < n_total // 2)
    rest = emb.filter(F.col("vec_id") >= n_total // 2)

    path = str(tmp_path / "ivf_incr")
    ivf_write_index(first, path, n_centroids=8)
    appended = ivf_append_index(spark, path, rest)
    assert appended == rest.count()

    stored = spark.read.parquet(path)
    assert stored.count() == n_total
    assert stored.select("neighbor_id").distinct().count() == n_total

    # a query whose vector equals an appended one (fresh id, so the
    # self-exclusion in scoring doesn't apply) finds it at rank 1
    target = rest.limit(1).collect()[0]
    probe_q = spark.createDataFrame(
        [(-1, target.embedding)], "vec_id long, embedding array<double>"
    )
    top = ivf_probe_index(spark, path, probe_q, k=3, nprobe=2).filter(
        F.col("rank") == 1
    ).collect()[0]
    assert top.neighbor_id == target.vec_id
    assert abs(top.cos_sim - 1.0) < 1e-6

    # replay of the same batch double-inserts nothing
    assert ivf_append_index(spark, path, rest) == 0
    assert spark.read.parquet(path).count() == n_total


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _pq_corpus(spark):
    """Three well-separated clusters in 8-dim space, 5 members each."""
    import itertools

    from pyspark.sql import Row

    anchors = [
        [10.0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 10.0, 0, 0, 0, 10.0, 0],
        [0, 5.0, 0, 5.0, 0, 5.0, 0, 5.0],
    ]
    rows = []
    for ci, a in enumerate(anchors):
        for k in range(5):
            vec = [x + 0.01 * k for x in a]
            rows.append(Row(vec_id=ci * 10 + k, embedding=vec))
    return spark.createDataFrame(rows), anchors


def test_pq_train_codebook_shape_and_determinism(spark):
    from mpg_data_warehouse_spark.operators.similarity import (
        pq_train_codebooks,
    )

    corpus, _ = _pq_corpus(spark)
    books = pq_train_codebooks(corpus, m=4, k=3, iters=2)
    assert len(books) == 4
    for book in books:
        assert len(book) == 3
        for code, cvec in book:
            assert 0 <= code < 3
            assert len(cvec) == 2  # 8 dims / 4 subspaces
    # pure function of the corpus: retrain gives identical books
    assert books == pq_train_codebooks(corpus, m=4, k=3, iters=2)


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest

    from mpg_data_warehouse_spark.operators.similarity import (
        pq_train_codebooks,
    )

    corpus, _ = _pq_corpus(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(corpus, m=3)


def test_pq_encode_identical_vectors_share_codes(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    corpus, _ = _pq_corpus(spark)
    books = pq_train_codebooks(corpus, m=4, k=3, iters=2)
    dup = spark.createDataFrame(
        [
            Row(vec_id=100, embedding=[10.0] + [0.0] * 7),
            Row(vec_id=200, embedding=[10.0] + [0.0] * 7),
        ]
    )
    codes = {r.vec_id: list(r.codes) for r in pq_encode(dup, books).collect()}
    assert codes[100] == codes[200]
    assert len(codes[100]) == 4
    assert all(0 <= c < 3 for c in codes[100])


def test_pq_topk_recalls_cluster_neighbors(spark):
    """ADC over codes must rank same-cluster members first on
    separated clusters — recall@4 == 1 for every query."""
    from mpg_data_warehouse_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    corpus, _ = _pq_corpus(spark)
    books = pq_train_codebooks(corpus, m=4, k=3, iters=2)
    codes = pq_encode(corpus, books)
    queries = corpus.where("vec_id in (0, 10, 20)")
    got = pq_topk(codes, queries, books, k=4)
    rows = got.collect()
    for r in rows:
        assert r.query_id // 10 == r.neighbor_id // 10, r
    # every query found its 4 co-cluster members
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert per_q == {0: 4, 10: 4, 20: 4}


def test_pq_plan_is_jvm_only(spark):
    from mpg_data_warehouse_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    corpus, _ = _pq_corpus(spark)
    books = pq_train_codebooks(corpus, m=4, k=3, iters=1)
    codes = pq_encode(corpus, books)
    plan = (
        pq_topk(codes, corpus.limit(2), books, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivfpq_topk_recalls_cluster_neighbors(spark):
    """Probing + ADC together: co-cluster members rank first even when
    a probed cell also holds a different cluster's members (rank-based
    seeds all come from cluster 0 here, so the coarse cells are
    imperfect by construction — ADC has to do the separating)."""
    from mpg_data_warehouse_spark.operators.similarity import ivfpq_topk

    corpus, _ = _pq_corpus(spark)
    got = ivfpq_topk(
        corpus,
        corpus.where("vec_id in (0, 20)"),
        k=4,
        n_centroids=3,
        nprobe=2,
        m=4,
        k_codes=3,
    )
    rows = got.collect()
    assert rows, "no results"
    for r in rows:
        assert r.query_id // 10 == r.neighbor_id // 10, r
    from collections import Counter

    assert Counter(r.query_id for r in rows) == {0: 4, 20: 4}


def test_zero_norm_vector_cannot_win_topk_or_dedup(spark):
    from pyspark.sql import Row

    zero = Row(vec_id=999, embedding=[0.0] * DIM)
    df = _vectors(spark, n=20).unionByName(spark.createDataFrame([zero]))
    top = S.cosine_topk(df, df.filter("vec_id = 0"), k=5).collect()
    assert all(r.neighbor_id != 999 for r in top)  # NaN never ranks first
    pairs = S.embedding_near_dup_pairs(df, threshold=0.9, dim=DIM).collect()
    assert all(999 not in (r.id_a, r.id_b) for r in pairs)


def test_lsh_dim_mismatch_raises_loudly(spark):
    import pytest

    df = _vectors(spark, n=10)  # DIM=16 vectors
    with pytest.raises(ValueError, match="length"):
        S.lsh_topk(df, df.limit(2), dim=64)
    with pytest.raises(ValueError, match="length"):
        S.embedding_near_dup_pairs(df, dim=64)


def test_lsh_topk_checks_query_dim(spark):
    """ADVICE r4: a wrong-length QUERY vector silently bucketed to
    null and returned zero results; now it raises like the corpus."""
    import pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.similarity import lsh_topk

    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0, 0.0, 1.0]) for i in range(4)]
    )
    bad_queries = spark.createDataFrame(
        [Row(vec_id=100, embedding=[1.0, 2.0])]
    )
    with pytest.raises(ValueError, match="dim"):
        lsh_topk(corpus, bad_queries, k=2, dim=4, n_planes=4)


def test_ivf_delete_rewrites_only_hit_cells(spark, tmp_path):
    """Deletion removes the ids, leaves untouched cells' files
    byte-identical, removes fully-emptied cell dirs, and probes see
    the change immediately."""
    import os

    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_delete_index,
        ivf_probe_index,
        ivf_write_index,
    )

    vecs = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[1.0 * (i % 4 == 0), 1.0 * (i % 4 == 1),
                                     1.0 * (i % 4 == 2), 1.0 * (i % 4 == 3)])
            for i in range(40)
        ]
    )
    path = str(tmp_path / "idx")
    ivf_write_index(vecs, path, n_centroids=4, id_col="vec_id",
                    vec_col="embedding")
    idx = spark.read.parquet(path)
    cell_of = {r.neighbor_id: r.cell for r in idx.collect()}
    victims = [i for i in range(40) if i % 4 == 0]  # one whole cell
    victims.append(1)  # plus one vector from another cell
    before_files = {
        c: sorted(os.listdir(os.path.join(path, f"cell={c}")))
        for c in set(cell_of.values())
    }
    n = ivf_delete_index(
        spark, path,
        spark.createDataFrame([Row(vec_id=v) for v in victims]),
    )
    assert n == len(victims)
    after = spark.read.parquet(path)
    remaining = {r.neighbor_id for r in after.collect()}
    assert remaining == set(range(40)) - set(victims)
    # the emptied cell's directory is gone
    emptied = cell_of[0]
    assert not os.path.exists(os.path.join(path, f"cell={emptied}"))
    # cells with no victims keep their exact files
    untouched = {
        c for c in set(cell_of.values())
        if not any(cell_of[v] == c for v in victims)
    }
    for c in untouched:
        assert sorted(
            os.listdir(os.path.join(path, f"cell={c}"))
        ) == before_files[c]
    # probe no longer returns deleted neighbors
    hits = ivf_probe_index(
        spark, path,
        vecs.filter(F.col("vec_id") == 2).select("vec_id", "embedding"),
        k=40, nprobe=4, id_col="vec_id", vec_col="embedding",
    )
    assert not {r.neighbor_id for r in hits.collect()} & set(victims)


def test_ivf_delete_missing_ids_noop(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_delete_index,
        ivf_write_index,
    )

    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(8)]
    )
    path = str(tmp_path / "idx")
    ivf_write_index(vecs, path, n_centroids=2, id_col="vec_id",
                    vec_col="embedding")
    n = ivf_delete_index(
        spark, path, spark.createDataFrame([Row(vec_id=999)])
    )
    assert n == 0
    assert spark.read.parquet(path).count() == 8


def test_ivf_delete_full_wipe_keeps_index_usable(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_append_index,
        ivf_delete_index,
        ivf_probe_index,
        ivf_write_index,
    )

    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 2), 1.0]) for i in range(6)]
    )
    path = str(tmp_path / "idx")
    ivf_write_index(vecs, path, n_centroids=2, id_col="vec_id",
                    vec_col="embedding")
    assert ivf_delete_index(spark, path, vecs.select("vec_id")) == 6
    # still readable: empty probe, no AnalysisException
    q = spark.createDataFrame([Row(vec_id=100, embedding=[1.0, 1.0])])
    assert ivf_probe_index(
        spark, path, q, k=3, nprobe=2, id_col="vec_id", vec_col="embedding"
    ).count() == 0
    # and appendable after the wipe
    assert ivf_append_index(
        spark, path,
        spark.createDataFrame([Row(vec_id=50, embedding=[1.0, 1.0])]),
        id_col="vec_id", vec_col="embedding",
    ) == 1
    hits = ivf_probe_index(
        spark, path, q, k=3, nprobe=2, id_col="vec_id", vec_col="embedding"
    )
    assert {r.neighbor_id for r in hits.collect()} == {50}


def test_ivf_append_guards_dim_and_in_batch_dups(spark, tmp_path):
    """ivf_append_index: (a) a dimension-mismatched batch raises
    loudly instead of silently landing every vector in one arbitrary
    cell with NULL cosines; (b) duplicate ids WITHIN one batch
    collapse to one insert (the index anti-join can't see them — the
    streaming idempotent-append rule applied here)."""
    import pytest as _pytest

    from mpg_data_warehouse_spark.operators.similarity import (
        ivf_append_index,
        ivf_write_index,
    )

    path = str(tmp_path / "ivf")
    ivf_write_index(_vectors(spark, n=40), path, n_centroids=4)
    # (a) wrong-dim batch
    bad = spark.createDataFrame(
        [Row(vec_id=900, embedding=[1.0] * (DIM // 2))]
    )
    with _pytest.raises(ValueError, match="dim"):
        ivf_append_index(spark, path, bad)
    # (b) one batch redelivers the same id three times
    v = [float(i) for i in range(DIM)]
    batch = spark.createDataFrame(
        [Row(vec_id=901, embedding=v)] * 3
        + [Row(vec_id=902, embedding=v)]
    )
    assert ivf_append_index(spark, path, batch) == 2
    idx = spark.read.parquet(path)
    assert idx.filter(F.col("neighbor_id") == 901).count() == 1
    # replay of the same batch appends nothing
    assert ivf_append_index(spark, path, batch) == 0


def test_lsh_multiprobe_levels_expand_recall(spark):
    """multiprobe levels now do what the parameter says: level d
    probes every bucket within Hamming distance d, so candidate sets
    grow monotonically with the level (the old code silently treated
    every value >= 1 as 1); out-of-range levels raise."""
    import pytest as _pytest

    corpus = _vectors(spark, n=50)
    queries = _vectors(spark, n=4, seed=11)
    counts = {}
    for mp in (0, 1, 2):
        got = S.lsh_topk(
            corpus, queries, k=50, dim=DIM, multiprobe=mp
        ).count()
        counts[mp] = got
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[1] < counts[2] or counts[2] == 4 * 50
    with _pytest.raises(ValueError, match="multiprobe"):
        S.lsh_topk(corpus, queries, dim=DIM, multiprobe=99)
