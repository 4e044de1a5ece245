"""Dedup families: exact, MinHash+LSH, SimHash — behavioral
properties on constructed near-duplicates."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators import dedup as D

DOC = (
    "the quick brown fox jumps over the lazy dog while the cold river "
    "runs past the old mill and the tall trees sway in the evening wind"
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=DOC),
            Row(doc_id=2, text=DOC),  # exact dup of 1
            Row(doc_id=3, text=DOC.replace("quick", "swift")),  # near-dup of 1
            Row(doc_id=4, text="completely different content about spark "
                               "query engines and distributed shuffles at scale"),
        ]
    )


def test_exact_dedup(spark):
    out = D.exact_dedup(_corpus(spark)).collect()
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id[1] == 2  # docs 1+2 collapse, min id kept
    assert 2 not in by_id
    assert by_id[3] == 1 and by_id[4] == 1


def test_word_shingles(spark):
    df = spark.createDataFrame([Row(text="a b c d"), Row(text="x y")])
    got = [r.s for r in df.select(D.word_shingles("text", 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["x y"]  # short doc: one partial shingle


def test_minhash_identical_signatures(spark):
    sigs = D.minhash_signatures(_corpus(spark)).collect()
    by_id = {r.doc_id: [r[f"sig_{i}"] for i in range(8)] for r in sigs}
    assert by_id[1] == by_id[2]  # identical text → identical signature
    shared = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared >= 4  # near-dup shares most minhashes
    shared_diff = sum(a == b for a, b in zip(by_id[1], by_id[4]))
    assert shared_diff <= 2


def test_minhash_pipeline_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_dedup_pairs(_corpus(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert not any(4 in p for p in pairs)


def test_minhash_restrict_verify_matches_default(spark, monkeypatch):
    """The opt-in pair-incident verify restriction (r13) must emit
    exactly the default path's pairs — it only narrows the shingle
    fold to ids the verify joins would probe anyway. Covers all three
    gate outcomes: the broadcast-taken case (min-docs forced to 0),
    the oversized-id fallback (max-ids forced to 0), and the r14
    profitability decline (default min-docs ≫ the test corpus — the
    bench-scale path, which must be the plain unrestricted plan)."""
    import mpg_data_warehouse_spark.operators.dedup as DD

    base = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.minhash_dedup_pairs(_corpus(spark), threshold=0.5).collect()
    }
    # profitability gate declines on a tiny corpus (default threshold)
    declined = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.minhash_dedup_pairs(
            _corpus(spark), threshold=0.5, restrict_verify=True
        ).collect()
    }
    assert declined == base and base
    # gate passes → broadcast semi-join restriction taken
    monkeypatch.setattr(DD, "_VERIFY_RESTRICT_MIN_DOCS", 0)
    opt = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.minhash_dedup_pairs(
            _corpus(spark), threshold=0.5, restrict_verify=True
        ).collect()
    }
    assert opt == base
    # gate passes but the id set is over the broadcast cap → full fold
    monkeypatch.setattr(DD, "_VERIFY_RESTRICT_MAX_IDS", 0)
    fallback = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.minhash_dedup_pairs(
            _corpus(spark), threshold=0.5, restrict_verify=True
        ).collect()
    }
    assert fallback == base


def test_simhash_properties(spark):
    fps = {
        r.doc_id: r.fp
        for r in D.simhash_fingerprints(_corpus(spark)).collect()
    }
    assert fps[1] == fps[2]

    def hamming(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(fps[1], fps[3]) <= 10  # near-dup: close fingerprints
    assert hamming(fps[1], fps[4]) > 10  # unrelated: far apart


def test_simhash_near_pairs_blocking(spark):
    out = {(r.id_a, r.id_b) for r in D.simhash_near_pairs(_corpus(spark), max_hamming=3).collect()}
    assert (1, 2) in out
    assert not any(4 in p for p in out)


def test_lsh_candidates_subset_and_cap(spark):
    sigs = D.minhash_signatures(_corpus(spark))
    cands = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in cands
    # max_bucket=1 drops every bucket with >1 member → no candidates
    none = D.lsh_candidate_pairs(sigs, max_bucket=1).count()
    assert none == 0


def test_ngram_jaccard_exact_pairs(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(_corpus(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert all(4 not in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_superset_of_minhash(spark):
    """Exact inverted-index candidates are complete: every MinHash
    pair (which needs a band collision) must also be found exactly."""
    mh = {(r.id_a, r.id_b) for r in D.minhash_dedup_pairs(_corpus(spark), threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b) for r in D.ngram_jaccard_pairs(_corpus(spark), threshold=0.5).collect()}
    assert mh <= ex


def test_shared_shingle_max_df_damps(spark):
    sh = D.exploded_shingles(_corpus(spark))
    undamped = D.shared_shingle_pairs(sh).count()
    damped = D.shared_shingle_pairs(sh, max_df=1).count()
    assert damped == 0  # every shared shingle has df >= 2 by definition
    assert undamped >= 3


def test_connected_components_topologies(spark):
    from pyspark.sql import Row
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(1, 9)])
    # chain 1-2-3, triangle 4-5-6 (+redundant edge), isolated 7, 8
    pairs = spark.createDataFrame([
        Row(id_a=1, id_b=2), Row(id_a=2, id_b=3),
        Row(id_a=4, id_b=5), Row(id_a=5, id_b=6), Row(id_a=4, id_b=6),
    ])
    comp = {r.doc_id: r.component for r in D.connected_components(pairs, ids).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7, 8: 8}


def test_retain_representatives(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(doc_id=i, text=f"t{i}") for i in range(1, 7)])
    pairs = spark.createDataFrame([
        Row(id_a=1, id_b=3), Row(id_a=3, id_b=5),   # cluster {1,3,5} -> keep 1
        Row(id_a=2, id_b=6),                         # cluster {2,6} -> keep 2
    ])
    kept = sorted(r.doc_id for r in D.retain_representatives(df, pairs).collect())
    assert kept == [1, 2, 4]


def test_contamination_report_planted_leak(spark):
    from mpg_data_warehouse_spark.operators.dedup import contamination_report

    corpus = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "totally unrelated content about other things entirely"),
        ],
        ["doc_id", "text"],
    )
    # eval doc 1 is a verbatim substring of corpus doc 100 → containment 1.0
    eval_set = spark.createDataFrame(
        [(1, "beta gamma delta epsilon"), (2, "nothing shared here at all")],
        ["doc_id", "text"],
    )
    out = {
        (r.eval_id, r.corpus_id): r.overlap
        for r in contamination_report(corpus, eval_set).collect()
    }
    assert out[(1, 100)] == 1.0
    assert (2, 100) not in out and (2, 101) not in out


def test_contamination_eval_side_broadcast(spark):
    """Scale contract: the corpus-side scan joins against a broadcast
    eval shingle table — no shuffle of the corpus."""
    from mpg_data_warehouse_spark.operators.dedup import contamination_report

    corpus = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "b c d")], ["doc_id", "text"])
    plan = (
        contamination_report(corpus, ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_minhash_matches_batch_rerun(spark):
    """Signing the corpus once and running the batch path on
    corpus+new must agree with the incremental path on every pair
    that involves a new doc."""
    from mpg_data_warehouse_spark.operators.dedup import (
        incremental_minhash_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different content about spark and shuffles"),
        (3, "the quick brown fox jumps over the lazy dog today"),
    ]
    new = [
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1/3
        (11, "fresh unseen text with no duplicates anywhere at all"),
    ]
    corpus = spark.createDataFrame(base, ["doc_id", "text"])
    batch = spark.createDataFrame(new, ["doc_id", "text"])

    corpus_sigs = minhash_signatures(corpus)
    new_sigs, inc_pairs = incremental_minhash_pairs(corpus_sigs, batch)
    got = {(r.id_a, r.id_b) for r in inc_pairs.collect()}

    all_sigs = minhash_signatures(corpus.unionByName(batch))
    full = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(all_sigs).collect()
        if r.id_a >= 10 or r.id_b >= 10
    }
    assert got == full
    assert (1, 10) in got and (3, 10) in got  # new dup found
    assert not any(a <= 3 and b <= 3 for a, b in got)  # no old-old pairs
    # returned signatures keep the incremental invariant
    assert set(new_sigs.columns) == set(corpus_sigs.columns)
    assert new_sigs.count() == 2


def test_ngram_jaccard_collapse_exact_parity(spark):
    """Exact-dedup-first (default) must emit exactly the pair set of
    the corpus-as-given complete pipeline, including replica pairs at
    Jaccard 1.0 and high-id / interleaved-id replica groups (the
    expansion re-normalizes id_a < id_b)."""
    rows = [Row(doc_id=i, text=DOC) for i in (1, 2, 900001)]  # 3 replicas
    rows += [
        Row(doc_id=5, text=DOC.replace("quick", "swift")),
        Row(doc_id=6, text=DOC.replace("quick", "swift")),  # replica of 5
        Row(doc_id=7, text="completely different content about spark "
                           "query engines and distributed shuffles at scale"),
    ]
    df = spark.createDataFrame(rows)
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            df, threshold=0.3, collapse_exact=False
        ).collect()
    }
    assert fast == slow
    assert (1, 2, 1.0) in fast and (2, 900001, 1.0) in fast
    assert (5, 6, 1.0) in fast
    # cross-group: every replica of DOC pairs with every replica of the
    # perturbed doc at the same jaccard
    cross = {(a, b) for a, b, _ in fast if {a, b} & {5, 6} and {a, b} & {1, 2, 900001}}
    assert len(cross) == 6


def test_connected_components_small_and_distributed_paths_agree(spark):
    """The driver union-find fast path and the distributed label
    propagation must produce identical components, including isolated
    nodes and a multi-hop chain."""
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11)]
    )
    ids = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 4, 7, 10, 11]])
    fast = {
        (r.doc_id, r.component)
        for r in D.connected_components(pairs, ids).collect()
    }
    dist = {
        (r.doc_id, r.component)
        for r in D.connected_components(
            pairs, ids, small_graph_edges=0
        ).collect()
    }
    expect = {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (10, 10), (11, 10)}
    assert fast == expect
    assert dist == expect


def test_retain_fast_path_matches_distributed(spark):
    """The r13 broadcast-anti-join fast path (driver union-find
    non-roots) and the distributed label-propagation fallback must
    keep identical survivors — chain, cluster, isolated node, and a
    pair id absent from ``df`` (an alien root must still evict its
    in-corpus partner)."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in [1, 2, 3, 4, 7, 10, 11, 20]]
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11),
         Row(id_a=19, id_b=20)]  # 19 not in df: 20 still removed
    )
    fast = sorted(
        r.doc_id for r in D.retain_representatives(df, pairs).collect()
    )
    dist = sorted(
        r.doc_id
        for r in D.retain_representatives(
            df, pairs, small_graph_edges=0
        ).collect()
    )
    assert fast == [1, 7, 10]
    assert dist == [1, 7, 10]


def test_retain_no_pairs_returns_df(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a"), Row(doc_id=2, text="b")])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert sorted(
        r.doc_id for r in D.retain_representatives(df, pairs).collect()
    ) == [1, 2]


# ---------------------------------------------------------------------------
# Passage-level span dedup (Lee et al. 2021 ExactSubstr, window form)
# ---------------------------------------------------------------------------

BOILER = "this content is licensed under the creative commons attribution share alike four point zero license"


def _span_corpus(spark):
    # 8-token boilerplate block shared by docs 1 and 2 (and repeated
    # twice inside doc 3); unique prose around it.
    u1 = "alpha bravo charlie delta echo foxtrot golf hotel"
    u2 = "india juliett kilo lima mike november oscar papa"
    u3 = "quebec romeo sierra tango uniform victor whiskey xray"
    b = "one two three four five six seven eight"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{u1} {b}"),
            Row(doc_id=2, text=f"{b} {u2}"),
            Row(doc_id=3, text=f"{b} {b}"),
            Row(doc_id=4, text=u3),
        ]
    )


def test_duplicate_spans_flags_shared_and_repeated_blocks(spark):
    out = D.duplicate_spans(
        _span_corpus(spark), span_tokens=8, stride=8, min_occurrences=2
    ).collect()
    got = {(r.doc_id, r.span_idx): r.n_occurrences for r in out}
    # doc 1 window 1 == doc 2 window 0 == doc 3 windows 0 and 1
    assert got == {(1, 1): 4, (2, 0): 4, (3, 0): 4, (3, 1): 4}


def test_span_duplication_stats_fraction(spark):
    stats = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
        for r in D.span_duplication_stats(
            _span_corpus(spark), span_tokens=8, stride=8
        ).collect()
    }
    assert stats[3] == (2, 2, 1.0)
    assert stats[1] == (2, 1, 0.5)
    assert stats[4] == (1, 0, 0.0)


def test_strip_duplicate_spans_removes_block_everywhere(spark):
    out = {
        r.doc_id: r.text
        for r in D.strip_duplicate_spans(
            _span_corpus(spark), span_tokens=8
        ).collect()
    }
    assert out[1] == "alpha bravo charlie delta echo foxtrot golf hotel"
    assert out[2] == "india juliett kilo lima mike november oscar papa"
    assert out[3] == ""
    assert out[4] == "quebec romeo sierra tango uniform victor whiskey xray"


def test_strip_duplicate_spans_keep_first_spares_one_copy(spark):
    out = {
        r.doc_id: r.text
        for r in D.strip_duplicate_spans(
            _span_corpus(spark), span_tokens=8, keep_first=True
        ).collect()
    }
    # smallest (id, span_idx) occurrence is doc 1 window 1 — it stays
    assert out[1] == (
        "alpha bravo charlie delta echo foxtrot golf hotel "
        "one two three four five six seven eight"
    )
    assert out[2] == "india juliett kilo lima mike november oscar papa"
    assert out[3] == ""


def test_decontaminate_drops_ngram_leaks(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.dedup import decontaminate

    bench_q = "what is the capital of atlantis under the sea today"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words {bench_q} outro words"),
            Row(doc_id=2, text="completely unrelated training text " * 3),
            Row(doc_id=3, text="the capital of atlantis is mentioned "
                               "but not the full question span here"),
        ]
    )
    eval_set = spark.createDataFrame([Row(doc_id=100, text=bench_q)])

    kept = decontaminate(corpus, eval_set, shingle_n=10)
    assert {r.doc_id for r in kept.collect()} == {2, 3}

    report = decontaminate(corpus, eval_set, shingle_n=10, keep_report=True)
    rep = {r.doc_id: r.n_matched_shingles for r in report.collect()}
    assert set(rep) == {1} and rep[1] >= 1


# ---------------------------------------------------------------------------
# review-pass regressions (round 4)
# ---------------------------------------------------------------------------


def test_band_signatures_rejects_indivisible_bands(spark):
    import pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    sigs = minhash_signatures(df, num_hashes=10)
    with pytest.raises(ValueError, match="divide"):
        band_signatures(sigs, num_hashes=10, bands=4)
    with pytest.raises(ValueError, match="divide"):
        band_signatures(sigs, num_hashes=10, bands=20)


def test_ngram_null_text_pairs_as_empty_content_in_both_modes(spark):
    """Null text tokenizes like empty text (one "" shingle), so two
    null-text docs are EXACT replicas of each other — the collapse
    default and the complete mode must agree on emitting their pair,
    and on nothing else."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps high today"),
            Row(doc_id=2, text="the quick brown fox jumps high today"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text=None),
        ]
    )
    collapsed = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    complete = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, collapse_exact=False
        ).collect()
    }
    assert collapsed == complete == {(1, 2): 1.0, (3, 4): 1.0}


def test_connected_components_raises_on_max_iter_exhaustion(spark):
    import pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.dedup import (
        connected_components,
    )

    # a 6-node chain needs ~5 rounds; cap at 2 and force the
    # distributed path with small_graph_edges=0
    pairs = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(6)]
    )
    ids = spark.range(7).selectExpr("id AS doc_id")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            pairs, ids, max_iter=2, small_graph_edges=0
        )
    # and with enough rounds the same graph labels as one component
    out = connected_components(
        pairs, ids, max_iter=10, small_graph_edges=0
    )
    assert {r.component for r in out.collect()} == {0}


def test_simhash_chunks_scale_with_max_hamming(spark):
    """The pigeonhole guarantee requires > max_hamming chunks: the old
    fixed 4-chunk split silently missed true pairs for k > 3 whose
    differing bits spread across all 4 chunks. Chunks now scale with
    k; the default k=3 keeps the original 4 × 16-bit layout."""
    import pytest as _pytest

    # default path unchanged (oracle-hash compatibility)
    out3 = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(_corpus(spark), max_hamming=3).collect()
    }
    assert (1, 2) in out3
    # k > 3 now admits more-distant pairs instead of silently capping
    out6 = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(_corpus(spark), max_hamming=6).collect()
    }
    assert out3 <= out6
    with _pytest.raises(ValueError, match="max_hamming"):
        D.simhash_near_pairs(_corpus(spark), max_hamming=40)


def test_simhash_max_hamming_zero_exact_match_no_overflow(spark):
    """k=0 means ONE 64-bit chunk: the full fingerprint is the join
    key. The old (1 << 64) - 1 mask literal overflowed java long at
    plan build (the same class the pHash block-mask fix closed in
    multimodal.py) — now it must run and return exactly the pairs
    with identical fingerprints."""
    out = D.simhash_near_pairs(_corpus(spark), max_hamming=0).collect()
    fps = {
        r[0]: r[1]
        for r in D.simhash_fingerprints(_corpus(spark)).collect()
    }
    expect = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and fps[a] == fps[b]
    }
    assert {(r.id_a, r.id_b) for r in out} == expect
    assert all(r.hamming == 0 for r in out)


def test_lsh_dropped_buckets_audit_matches_cap(spark):
    """The cap audit reports exactly the (band, bucket) groups
    cap_buckets drops — no silent truncation: a corpus whose
    duplicate class exceeds max_bucket shows up here with its doc
    count instead of just vanishing from the pair output."""
    from pyspark.sql import Row

    # 5 identical docs => one 5-doc bucket per band; 2 singletons
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta epsilon") for i in range(5)]
        + [
            Row(doc_id=10, text="one two three four five six"),
            Row(doc_id=11, text="seven eight nine ten eleven twelve"),
        ]
    )
    sigs = D.minhash_signatures(docs, num_hashes=8, shingle_n=2)
    dropped = D.lsh_dropped_buckets(
        sigs, num_hashes=8, bands=4, max_bucket=4
    ).collect()
    # every band's identical-class bucket exceeds the cap of 4
    assert {r.band for r in dropped} == {0, 1, 2, 3}
    assert all(r.n_docs == 5 for r in dropped)
    # and with the cap above the class size, nothing is dropped
    assert (
        D.lsh_dropped_buckets(sigs, num_hashes=8, bands=4, max_bucket=5).count()
        == 0
    )


def test_minhash_audit_cap_invariant_checks_and_raises(spark, monkeypatch):
    """r12 contract fold: ``audit_cap_invariant=True`` must (a) pass
    when the audit accounts for exactly the rows cap_buckets removes,
    and (b) RAISE when the audit drifts from the cap — a lying audit
    silently under-reporting forgone pair mass is the failure mode the
    invariant exists to catch."""
    import pytest
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="alpha beta gamma delta epsilon")
            for i in range(8)
        ]
        + [Row(doc_id=100, text="one two three four five six")]
    )
    # 8 identical docs: every band has a degenerate 8-doc bucket;
    # max_bucket=5 drops all of them, so no pair survives — and the
    # audit must account for each of the 4 bands' 8 dropped rows
    out = D.minhash_dedup_pairs(
        docs, shingle_n=2, max_bucket=5, audit_cap_invariant=True
    )
    assert out.count() == 0

    real = D.lsh_dropped_buckets
    monkeypatch.setattr(
        D,
        "lsh_dropped_buckets",
        lambda *a, **k: real(*a, **k).filter("1=0"),
    )
    with pytest.raises(AssertionError, match="drifted"):
        D.minhash_dedup_pairs(
            docs, shingle_n=2, max_bucket=5, audit_cap_invariant=True
        )
