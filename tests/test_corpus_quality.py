"""Unigram-LM quality scoring (CCNet-style perplexity proxy),
SemDeDup-style cell-scoped semantic dedup, and temperature-flattened
mixture sampling — the round-3 corpus-curation additions."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.sampling import (
    hash_bucket,
    temperature_mixture_sample,
)
from mpg_data_warehouse_spark.operators.similarity import (
    semantic_dedup_keep,
    semantic_dedup_pairs,
)
from mpg_data_warehouse_spark.operators.text import (
    doc_logprob_score,
    unigram_lm,
)


# ---------------------------------------------------------------------------
# Unigram LM
# ---------------------------------------------------------------------------


def _lm_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the dog sat"),
            Row(doc_id=3, text="zyx qwv"),  # all-OOV garble
        ]
    )


def test_unigram_lm_probabilities_match_hand_computation(spark):
    model, oov = unigram_lm(_lm_docs(spark), alpha=0.5)
    logp = {r.term: r.logp for r in model.collect()}
    # 11 tokens total, 8 distinct terms, denom = 11 + 0.5 * 9 = 15.5
    assert logp["the"] == round(math.log(3.5 / 15.5), 6)
    assert logp["sat"] == round(math.log(2.5 / 15.5), 6)
    assert logp["cat"] == round(math.log(1.5 / 15.5), 6)
    assert oov == round(math.log(0.5 / 15.5), 6)


def test_unigram_lm_vocab_cap_keeps_most_frequent(spark):
    model, _ = unigram_lm(_lm_docs(spark), vocab_size=2, alpha=0.5)
    kept = {r.term for r in model.collect()}
    # top-2 by count desc, term asc: the(3), sat(2)
    assert kept == {"the", "sat"}


def test_doc_logprob_score_ranks_garble_worst(spark):
    # Train on the fluent docs only; score a held-out garble doc so
    # its terms are genuinely OOV.
    train = _lm_docs(spark).filter(F.col("doc_id") < 3)
    model, oov = unigram_lm(train, alpha=0.5)
    scores = {
        r.doc_id: r
        for r in doc_logprob_score(_lm_docs(spark), model, oov).collect()
    }
    assert scores[1].n_tokens == 6
    # doc 3 is pure OOV — exactly -oov nats per token, and the worst.
    assert scores[3].nll_per_token == round(-oov, 6)
    assert scores[3].nll_per_token > scores[1].nll_per_token
    assert scores[3].nll_per_token > scores[2].nll_per_token


def test_doc_logprob_score_oov_scoring_against_truncated_vocab(spark):
    docs = _lm_docs(spark)
    model, oov = unigram_lm(docs, vocab_size=2, alpha=0.5)
    scores = {
        r.doc_id: r.nll_per_token
        for r in doc_logprob_score(docs, model, oov).collect()
    }
    # doc 2 = "the dog sat": the + sat in vocab, dog OOV.
    denom = 11 + 0.5 * 3  # N + alpha * (V+1), V=2
    expect = -(math.log(3.5 / denom) + math.log(0.5 / denom) + math.log(2.5 / denom)) / 3
    assert abs(scores[2] - expect) < 2e-6


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _vecs(spark):
    # Two tight groups far apart plus a loner; ids ordered so the
    # min-id retention rule is easy to assert.
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.999, 0.01, 0.0]),
        Row(vec_id=2, embedding=[0.998, 0.02, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.01, 0.999, 0.0]),
        Row(vec_id=5, embedding=[0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows)


def test_semantic_dedup_pairs_finds_within_group_dups_only(spark):
    pairs = semantic_dedup_pairs(
        _vecs(spark), threshold=0.99, n_centroids=3, refine_iters=1
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (1, 2) in got and (0, 2) in got
    assert (3, 4) in got
    # Cross-group and loner pairs never appear.
    assert all(a < b for a, b in got)
    assert not any(5 in p for p in got)
    assert not any((a < 3) != (b < 3) for a, b in got)


def test_semantic_dedup_keep_retains_min_id_per_group(spark):
    kept = semantic_dedup_keep(
        _vecs(spark), threshold=0.99, n_centroids=3, refine_iters=1
    )
    assert {r.vec_id for r in kept.collect()} == {0, 3, 5}


def test_semantic_dedup_cell_cap_drops_degenerate_cells(spark):
    # max_cell=2 excludes the 3-member group from the pairwise pass;
    # the 2-member group survives it.
    pairs = semantic_dedup_pairs(
        _vecs(spark), threshold=0.99, n_centroids=3, refine_iters=1,
        max_cell=2,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(3, 4)}


# ---------------------------------------------------------------------------
# Temperature mixture sampling
# ---------------------------------------------------------------------------


def _corpus(spark):
    rows = [
        Row(doc_id=f"big-{i}", source="big", n_tokens=10) for i in range(400)
    ] + [
        Row(doc_id=f"small-{i}", source="small", n_tokens=10) for i in range(40)
    ]
    return spark.createDataFrame(rows)


def test_temperature_one_reproduces_natural_mix_rates(spark):
    df = _corpus(spark)
    out = temperature_mixture_sample(
        df, "source", "doc_id", "n_tokens", temperature=1.0,
        target_total=2200.0,
    )
    # T=1: p_big=4000/4400, p_small=400/4400 → target_i/total_i = 0.5
    # for BOTH strata — identical cutoff, so the kept sets are exactly
    # the deterministic 50% hash-bucket sample of each stratum.
    cut = int(0.5 * 10_000)
    expect = df.filter(hash_bucket("doc_id") < F.lit(cut))
    assert (
        sorted(r.doc_id for r in out.collect())
        == sorted(r.doc_id for r in expect.collect())
    )


def test_temperature_zero_gives_uniform_per_stratum_budget(spark):
    out = temperature_mixture_sample(
        _corpus(spark), "source", "doc_id", "n_tokens", temperature=0.0,
        target_total=800.0,
    )
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # T=0: each stratum targets 400 tokens = 40 docs. The small source
    # keeps everything (rate capped at 1); the big one keeps ~10%.
    assert counts["small"] == 40
    assert 25 <= counts["big"] <= 55


def test_temperature_sampling_is_deterministic(spark):
    df = _corpus(spark)
    a = temperature_mixture_sample(
        df, "source", "doc_id", "n_tokens", 0.5, 1000.0
    )
    b = temperature_mixture_sample(
        df, "source", "doc_id", "n_tokens", 0.5, 1000.0
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_semantic_dedup_high_offset_ids(spark):
    """Ids that don't start at 0 (ingest sequence numbers) must seed
    centroids by RANK — a value-based seed filter (id < n_centroids)
    silently selected nothing and dedup became a no-op."""
    from pyspark.sql import functions as F

    shifted = _vecs(spark).withColumn(
        "vec_id", F.col("vec_id") + F.lit(5_000_000)
    )
    pairs = semantic_dedup_pairs(
        shifted, threshold=0.99, n_centroids=3, refine_iters=1
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    base = 5_000_000
    assert (base + 0, base + 1) in got and (base + 3, base + 4) in got
    kept = semantic_dedup_keep(
        shifted, threshold=0.99, n_centroids=3, refine_iters=1
    )
    assert {r.vec_id for r in kept.collect()} == {base, base + 3, base + 5}


# --- bigram LM (Jelinek-Mercer interpolated) ---


def _bi_py_model(texts, vocab_size=200, bigram_size=400, alpha=0.5):
    """Pure-Python mirror of bigram_lm's algebra."""
    from collections import Counter

    toks = [t.strip().lower().split() for t in texts]
    uni = Counter(w for ts in toks for w in ts)
    vocab = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    n_total = sum(uni.values())
    denom = float(n_total) + alpha * (len(vocab) + 1)
    p_uni = {w: round((c + alpha) / denom, 12) for w, c in vocab}
    p_oov = round(alpha / denom, 12)
    bc = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] += 1
    ctx = Counter()
    for (a, _b), c in bc.items():
        ctx[a] += c
    top = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:bigram_size]
    p_ml = {k: round(c / ctx[k[0]], 12) for k, c in top}
    return p_ml, p_uni, p_oov


def test_bigram_lm_matches_python_reference(spark):
    from mpg_data_warehouse_spark.operators.text import bigram_lm

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on the cat",
        "the mat sat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    bi, uni, p_oov = bigram_lm(df, vocab_size=5, bigram_size=6)
    want_bi, want_uni, want_oov = _bi_py_model(
        texts, vocab_size=5, bigram_size=6
    )
    got_bi = {(r.w1, r.w2): r.p_ml for r in bi.collect()}
    got_uni = {r.term: r.p_uni for r in uni.collect()}
    assert got_bi == want_bi
    assert got_uni == want_uni
    assert p_oov == want_oov


def test_bigram_score_matches_python_reference(spark):
    from mpg_data_warehouse_spark.operators.text import (
        bigram_lm,
        doc_logprob_score_bigram,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ran fast today",
        "a dog sat on the cat",
        "mat the on sat cat the",  # reversed word order
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    bi, uni, p_oov = bigram_lm(df, vocab_size=20, bigram_size=50)
    got = {
        r.doc_id: (r.n_bigrams, r.nll_per_token)
        for r in doc_logprob_score_bigram(df, bi, uni, p_oov, lam=0.7)
        .collect()
    }
    p_ml, p_uni, want_oov = _bi_py_model(texts, 20, 50)
    lam = 0.7
    for i, t in enumerate(texts):
        ts = t.split()
        # micro-nat quantization + exact integer half-up mean — the
        # operator's algebra (see doc_logprob_score's midpoint note)
        lls_u = [
            round(
                math.log(
                    lam * p_ml.get((a, b), 0.0)
                    + (1 - lam) * p_uni.get(b, want_oov)
                )
                * 1e6
            )
            for a, b in zip(ts, ts[1:])
        ]
        n = len(lls_u)
        want = ((-2 * sum(lls_u) + n) // (2 * n)) / 1e6
        assert got[i][0] == n
        assert got[i][1] == want


def test_bigram_score_is_word_order_sensitive(spark):
    """Shuffling a doc's words must leave the unigram score fixed and
    worsen the bigram score — the property that justifies the model
    order upgrade."""
    from mpg_data_warehouse_spark.operators.text import (
        bigram_lm,
        doc_logprob_score,
        doc_logprob_score_bigram,
        unigram_lm,
    )

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat while the dog ran fast") for i in range(5)],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "mat the on sat cat the"),  # same bag of words, reversed
        ],
        ["doc_id", "text"],
    )
    bi, uni, p_oov = bigram_lm(train, vocab_size=50, bigram_size=100)
    bs = {
        r.doc_id: r.nll_per_token
        for r in doc_logprob_score_bigram(probe, bi, uni, p_oov).collect()
    }
    assert bs[1] > bs[0], "reversed word order must score worse"
    um, oov = unigram_lm(train, vocab_size=50)
    us = {
        r.doc_id: r.nll_per_token
        for r in doc_logprob_score(probe, um, oov).collect()
    }
    assert us[0] == us[1], "unigram score is order-invariant"


def test_bigram_short_docs_absent(spark):
    from mpg_data_warehouse_spark.operators.text import (
        bigram_lm,
        doc_logprob_score_bigram,
    )

    df = spark.createDataFrame(
        [(0, "hello world again"), (1, "single"), (2, "")],
        ["doc_id", "text"],
    )
    bi, uni, p_oov = bigram_lm(df, vocab_size=10, bigram_size=10)
    got = {r.doc_id for r in
           doc_logprob_score_bigram(df, bi, uni, p_oov).collect()}
    assert got == {0}
