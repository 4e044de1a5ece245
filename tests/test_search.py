"""Persisted inverted index: build, OR/AND search, stopword damping,
and partition-filter pushdown on the term-bucket layout."""

import os
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.search import (
    build_inverted_index,
    search_terms,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie delta"),
            Row(doc_id=2, text="alpha bravo echo"),
            Row(doc_id=3, text="charlie delta foxtrot"),
            Row(doc_id=4, text="Alpha ALPHA alpha"),  # case + repeats
        ]
    )


def test_search_any_and_all(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_inverted_index(_docs(spark), idx)
    any_hits = {
        r.doc_id for r in search_terms(spark, idx, ["alpha", "charlie"]).collect()
    }
    assert any_hits == {1, 2, 3, 4}
    all_hits = {
        r.doc_id
        for r in search_terms(spark, idx, ["alpha", "charlie"], mode="all").collect()
    }
    assert all_hits == {1}
    # query terms normalize like the index (case-insensitive)
    assert {
        r.doc_id for r in search_terms(spark, idx, ["ALPHA"]).collect()
    } == {1, 2, 4}
    with pytest.raises(ValueError):
        search_terms(spark, idx, ["  "])
    with pytest.raises(ValueError):
        search_terms(spark, idx, ["x"], mode="fuzzy")


def test_max_df_drops_stopword_postings(spark, tmp_path):
    idx = str(tmp_path / "idx")
    # 'alpha' appears in 3 docs -> dropped at max_df=2
    build_inverted_index(_docs(spark), idx, max_df=2)
    assert search_terms(spark, idx, ["alpha"]).count() == 0
    assert {
        r.doc_id for r in search_terms(spark, idx, ["charlie"]).collect()
    } == {1, 3}


def test_search_scan_is_partition_pruned(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_inverted_index(_docs(spark), idx)
    plan = (
        search_terms(spark, idx, ["foxtrot"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket IN-list must reach the scan's PartitionFilters, so
    # non-matching bucket directories are never opened
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]


def test_phrase_query_tokenizes_like_the_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="machine learning systems"),
            Row(doc_id=2, text="machine tooling"),
            Row(doc_id=3, text="deep learning"),
        ]
    )
    build_inverted_index(docs, idx)
    # a phrase splits into its indexed terms instead of never matching
    assert {
        r.doc_id
        for r in search_terms(spark, idx, ["machine learning"]).collect()
    } == {1, 2, 3}
    assert {
        r.doc_id
        for r in search_terms(
            spark, idx, ["machine learning"], mode="all"
        ).collect()
    } == {1}


def _bm25_ref(corpus, query_terms, k1=1.2, b=0.75):
    """Independent in-Python BM25 (Lucene/Robertson variant) for the
    fixture corpus: {doc_id: score}."""
    import math

    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in sorted(set(query_terms)):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            scores[d] = scores.get(d, 0.0) + w
    return scores


def test_bm25_matches_reference_formula(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search,
        build_ranked_index,
    )

    corpus = {
        1: "alpha bravo charlie delta",
        2: "alpha bravo echo",
        3: "charlie delta foxtrot",
        4: "Alpha ALPHA alpha",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in corpus.items()]
    )
    idx = str(tmp_path / "ridx")
    build_ranked_index(docs, idx)
    got = {
        r.doc_id: r.score
        for r in bm25_search(spark, idx, "alpha charlie", k=10).collect()
    }
    ref = _bm25_ref(corpus, ["alpha", "charlie"])
    assert set(got) == set(ref)
    for d in ref:
        assert abs(got[d] - ref[d]) < 1e-5, (d, got[d], ref[d])


def test_await_all_settles_every_leg_before_raising():
    """_await_all must wait for EVERY leg before propagating the first
    exception — a caller may clean up the paths the legs write to, so
    returning with a leg still running would race that cleanup."""
    import time

    from mpg_data_warehouse_spark.operators.search import _await_all

    settled = []

    def slow_ok():
        time.sleep(0.3)
        settled.append("slow")

    def fast_boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        _await_all(slow_ok, fast_boom)
    assert settled == ["slow"]


def test_build_rebuild_over_existing_index_leaves_no_stale_state(
    spark, tmp_path
):
    """Rebuilding an index AT THE SAME PATH over a smaller corpus must
    leave no stale bucket dirs, postings, manifest rows, or stats from
    the previous (wider) build — pins the r10 explicit-pre-clean +
    dynamic-overwrite build path (a dynamic overwrite alone would let
    bucket dirs the new build doesn't touch survive)."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=d, text=f"term{d} shared word") for d in range(40)]
    )
    idx = str(tmp_path / "ridx")
    build_ranked_index(docs, idx)
    # rebuild over a 5-doc corpus at the same path
    small = docs.filter("doc_id < 5")
    build_ranked_index(small, idx)
    # postings: only the 5 docs' terms survive
    ids = {
        r.doc_id
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert ids == set(range(5)), ids
    # manifest: same
    man = spark.read.parquet(os.path.join(idx, "_docs"))
    assert {r.doc_id for r in man.select("doc_id").collect()} == set(range(5))
    # a term only the old corpus had scores nothing
    assert bm25_search(spark, idx, "term30", k=10).count() == 0
    # stats retreated with the rebuild
    import json as _json

    with open(os.path.join(idx, "_corpus_stats.json")) as fh:
        assert _json.load(fh)["n_docs"] == 5


def test_bm25_rank_is_deterministic_and_k_capped(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search_many,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="tie tie tie") for i in range(5)]
    )
    idx = str(tmp_path / "ridx")
    build_ranked_index(docs, idx)
    rows = bm25_search_many(spark, idx, ["tie"], k=3).collect()
    # equal scores -> rank ties broken by doc id, capped at k
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (0, 1),
        (1, 2),
        (2, 3),
    ]


def test_bm25_repeated_term_saturates_not_linear(spark, tmp_path):
    """tf saturation: 3x the term count must score higher but far
    less than 3x (the k1 clamp) — the property that distinguishes
    BM25 from raw tf."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="zeta one two"),
            Row(doc_id=2, text="zeta zeta zeta"),
            Row(doc_id=3, text="other words here"),
        ]
    )
    idx = str(tmp_path / "ridx")
    build_ranked_index(docs, idx)
    got = {r.doc_id: r.score for r in bm25_search(spark, idx, "zeta").collect()}
    assert got[2] > got[1]
    assert got[2] < 3 * got[1]


def test_index_is_self_describing_on_bucket_count(spark, tmp_path):
    """A probe against an index built with a different n_buckets used
    to silently filter matching postings out; the layout is now
    recorded in the index and mismatched explicit values raise."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search,
        build_ranked_index,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "idx32")
    build_inverted_index(docs, idx, n_buckets=32)
    # no n_buckets passed: resolved from the index meta
    got = {r.doc_id for r in search_terms(spark, idx, ["alpha"]).collect()}
    assert got == {1, 2, 4}
    with pytest.raises(ValueError, match="n_buckets=32"):
        search_terms(spark, idx, ["alpha"], n_buckets=64)

    ridx = str(tmp_path / "ridx32")
    build_ranked_index(docs, ridx, n_buckets=32)
    assert bm25_search(spark, ridx, "alpha", k=5).count() == 3
    with pytest.raises(ValueError, match="n_buckets=32"):
        bm25_search(spark, ridx, "alpha", k=5, n_buckets=64)


def test_bm25_append_matches_full_rebuild(spark, tmp_path):
    """Incremental append over two batches scores identically to one
    full build over the union — stats advance arithmetically and df
    re-derives from the probed lists."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_search,
        build_ranked_index,
    )

    batch1 = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha bravo echo"),
        ]
    )
    batch2 = spark.createDataFrame(
        [
            Row(doc_id=3, text="charlie delta foxtrot"),
            Row(doc_id=4, text="alpha alpha golf"),
        ]
    )
    inc = str(tmp_path / "inc")
    build_ranked_index(batch1, inc)
    assert bm25_append_index(batch2, inc) == 2
    full = str(tmp_path / "full")
    build_ranked_index(batch1.unionByName(batch2), full)
    for q in ("alpha", "charlie delta", "golf"):
        a = {(r.doc_id, r.score) for r in bm25_search(spark, inc, q).collect()}
        b = {(r.doc_id, r.score) for r in bm25_search(spark, full, q).collect()}
        assert a == b, q


def test_bm25_append_replay_is_idempotent(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_search,
        build_ranked_index,
    )

    idx = str(tmp_path / "idx")
    build_ranked_index(
        spark.createDataFrame([Row(doc_id=1, text="alpha bravo")]), idx
    )
    batch = spark.createDataFrame([Row(doc_id=2, text="alpha charlie")])
    assert bm25_append_index(batch, idx) == 1
    # replayed delivery: same ids drop out, stats unchanged
    assert bm25_append_index(batch, idx) == 0
    rows = bm25_search(spark, idx, "alpha").collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert len(rows) == 2


def test_bm25_delete_matches_rebuild_without_docs(spark, tmp_path):
    """Deleting docs (with their indexed text) scores identically to
    a fresh build over the survivors; stats retreat arithmetically."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_delete_index,
        bm25_search,
        build_ranked_index,
    )

    all_docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha bravo echo"),
            Row(doc_id=3, text="charlie delta foxtrot"),
            Row(doc_id=4, text="alpha alpha golf"),
        ]
    )
    idx = str(tmp_path / "idx")
    build_ranked_index(all_docs, idx)
    victims = all_docs.filter(F.col("doc_id").isin([2, 4]))
    assert bm25_delete_index(victims, idx) == 2
    ref = str(tmp_path / "ref")
    build_ranked_index(all_docs.filter(~F.col("doc_id").isin([2, 4])), ref)
    for q in ("alpha", "charlie delta", "echo"):
        a = {(r.doc_id, r.score) for r in bm25_search(spark, idx, q).collect()}
        b = {(r.doc_id, r.score) for r in bm25_search(spark, ref, q).collect()}
        assert a == b, q
    # replay: deleting again removes nothing
    assert bm25_delete_index(victims, idx) == 0


def test_bm25_delete_full_wipe_keeps_index_usable(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_delete_index,
        bm25_search_many,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha bravo"), Row(doc_id=2, text="alpha c")]
    )
    idx = str(tmp_path / "idx")
    build_ranked_index(docs, idx)
    assert bm25_delete_index(docs, idx) == 2
    # still readable: empty result, no AnalysisException
    assert (
        bm25_search_many(spark, idx, ["alpha"], k=5).count() == 0
    )
    # and appendable: the natural next step after a wipe
    assert bm25_append_index(
        spark.createDataFrame([Row(doc_id=3, text="alpha delta")]), idx
    ) == 1
    got = bm25_search_many(spark, idx, ["alpha"], k=5).collect()
    assert [r.doc_id for r in got] == [3]


def test_bm25_append_replay_guard_survives_text_drift(spark, tmp_path):
    """The replay guard is keyed on the doc-id MANIFEST, not text: a
    redelivered batch whose text mutated between deliveries must still
    drop out (the old term-bucket probe could miss it)."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_search,
        build_ranked_index,
    )

    idx = str(tmp_path / "idx")
    build_ranked_index(
        spark.createDataFrame([Row(doc_id=1, text="alpha bravo")]), idx
    )
    batch = spark.createDataFrame([Row(doc_id=2, text="zulu yankee")])
    assert bm25_append_index(batch, idx) == 1
    # redelivery with MUTATED text — entirely different term buckets
    mutated = spark.createDataFrame([Row(doc_id=2, text="qq ww ee")])
    assert bm25_append_index(mutated, idx) == 0
    rows = bm25_search(spark, idx, "zulu").collect()
    assert [r.doc_id for r in rows] == [2]
    # the mutated terms were never inserted
    assert bm25_search(spark, idx, "qq").count() == 0


def test_bm25_delete_by_bare_ids_no_text_needed(spark, tmp_path):
    """Deletion takes document ids only — the manifest locates the
    posting buckets, so the caller needn't (and can't wrongly)
    supply text."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_delete_index,
        bm25_search,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha bravo echo"),
            Row(doc_id=3, text="charlie delta foxtrot"),
        ]
    )
    idx = str(tmp_path / "idx")
    build_ranked_index(docs, idx)
    victims = spark.createDataFrame([Row(doc_id=2)])
    assert bm25_delete_index(victims, idx) == 1
    ref = str(tmp_path / "ref")
    build_ranked_index(docs.filter(F.col("doc_id") != 2), ref)
    for q in ("alpha", "echo", "charlie delta"):
        a = {(r.doc_id, r.score) for r in bm25_search(spark, idx, q).collect()}
        b = {(r.doc_id, r.score) for r in bm25_search(spark, ref, q).collect()}
        assert a == b, q


def test_index_maintenance_requires_manifest(spark, tmp_path):
    """A legacy index without the _docs manifest fails loudly instead
    of guessing."""
    import shutil

    from mpg_data_warehouse_spark.operators.search import (
        DOCS_DIR,
        bm25_append_index,
        bm25_delete_index,
        build_ranked_index,
    )

    idx = str(tmp_path / "idx")
    build_ranked_index(
        spark.createDataFrame([Row(doc_id=1, text="alpha")]), idx
    )
    shutil.rmtree(os.path.join(idx, DOCS_DIR))
    batch = spark.createDataFrame([Row(doc_id=2, text="bravo")])
    with pytest.raises(ValueError, match="manifest"):
        bm25_append_index(batch, idx)
    with pytest.raises(ValueError, match="manifest"):
        bm25_delete_index(batch, idx)


def test_capped_out_doc_still_in_manifest_and_deletable(spark, tmp_path):
    """A doc whose EVERY term is max_df-capped owns zero postings but
    still counts in the corpus stats; the manifest must carry it
    (empty bucket set) so deletion by id retreats n_docs/avgdl
    correctly."""
    from mpg_data_warehouse_spark.operators.search import (
        STATS_FILE,
        bm25_delete_index,
        build_ranked_index,
    )
    from mpg_data_warehouse_spark.sources.storage import read_json

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common"),  # only capped terms
            Row(doc_id=2, text="common rare"),
            Row(doc_id=3, text="common rare2"),
        ]
    )
    idx = str(tmp_path / "idx")
    build_ranked_index(docs, idx, max_df=2)  # 'common' df=3 -> capped
    stats = read_json(os.path.join(idx, STATS_FILE))
    assert stats["n_docs"] == 3 and stats["dl_sum"] == 6
    # doc 1 deletable by bare id even though it has no postings
    assert bm25_delete_index(
        spark.createDataFrame([Row(doc_id=1)]), idx
    ) == 1
    stats = read_json(os.path.join(idx, STATS_FILE))
    assert stats["n_docs"] == 2 and stats["dl_sum"] == 4


def test_bm25_repair_scrubs_orphans_from_crashed_append(
    spark, tmp_path, monkeypatch
):
    """Crash-recovery contract for the append commit order (postings
    first, manifest second): a crash between the two commits leaves
    ORPHANED postings a blind retry would duplicate.
    bm25_repair_index scrubs exactly those rows, after which the
    retried append + search match a clean build over the union; a
    clean index repairs to 0 and is untouched."""
    from mpg_data_warehouse_spark.operators import search as S

    batch1 = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha bravo echo"),
        ]
    )
    batch2 = spark.createDataFrame(
        [
            Row(doc_id=3, text="charlie delta foxtrot"),
            Row(doc_id=4, text="alpha alpha golf"),
        ]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(batch1, idx)

    # repairing a CLEAN index is a no-op probe
    assert S.bm25_repair_index(spark, idx) == 0

    # simulate the crash window: postings commit, manifest write dies
    real_write_manifest = S._write_manifest

    def _boom(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(S, "_write_manifest", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        S.bm25_append_index(batch2, idx)
    monkeypatch.setattr(S, "_write_manifest", real_write_manifest)

    # batch2's postings are orphans: present in buckets, absent from
    # the manifest — the repair finds and scrubs exactly those docs
    assert S.bm25_repair_index(spark, idx) == 2
    # the index is back to its pre-crash state; the retried delivery
    # appends cleanly and scoring matches a one-shot build
    assert S.bm25_append_index(batch2, idx) == 2
    full = str(tmp_path / "full")
    S.build_ranked_index(batch1.unionByName(batch2), full)
    for q in ("alpha", "charlie delta", "golf"):
        a = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, idx, q).collect()
        }
        b = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, full, q).collect()
        }
        assert a == b, q
    # and the repaired+retried index is repair-clean again
    assert S.bm25_repair_index(spark, idx) == 0


def test_bm25_repair_mixed_file_falls_back_to_bucket_rewrite(
    spark, tmp_path
):
    """The r11 repair fast path unlinks PURE orphan files (the only
    state the append commit order can produce); a MIXED file — orphan
    and live rows sharing one parquet file, not producible by append
    but defended against — must route through the bucket rewrite and
    keep every live row."""
    import glob
    import os as _os

    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators import search as S

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha delta echo"),
        ]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs, idx)
    before = {
        (r.term, r.doc_id, r.tf)
        for r in spark.read.parquet(idx).select("term", "doc_id", "tf")
        .collect()
    }

    # hand-craft a MIXED file inside one existing bucket dir: one live
    # row (doc 1, manifest-listed) + one orphan row (doc 99)
    bucket_dir = sorted(glob.glob(_os.path.join(idx, "bucket=*")))[0]
    bucket_id = int(bucket_dir.rsplit("=", 1)[1])
    live_row = (
        spark.read.parquet(idx)
        .filter(F.col("bucket") == bucket_id)
        .select("term", "doc_id", "tf", "dl")
        .limit(1)
    )
    orphan_row = spark.createDataFrame(
        [Row(term="zulu", doc_id=99, tf=1, dl=1)]
    ).select(
        F.col("term"),
        F.col("doc_id").cast("long"),
        F.col("tf").cast("long"),
        F.col("dl").cast("long"),
    )
    staged = str(tmp_path / "mixedfile")
    live_row.unionByName(orphan_row).coalesce(1).write.parquet(staged)
    part = glob.glob(_os.path.join(staged, "part-*.parquet"))[0]
    _os.rename(part, _os.path.join(bucket_dir, "part-mixed.parquet"))

    # repair must scrub doc 99 only; the duplicated live row from the
    # mixed file is manifest-listed and SURVIVES the bucket rewrite
    assert S.bm25_repair_index(spark, idx) == 1
    after_rows = spark.read.parquet(idx).select(
        "term", "doc_id", "tf"
    ).collect()
    assert all(r.doc_id != 99 for r in after_rows)
    # every original posting is still present (the rewrite lost none)
    assert before <= {(r.term, r.doc_id, r.tf) for r in after_rows}
    # and a second repair answers 0
    assert S.bm25_repair_index(spark, idx) == 0


def test_bm25_repair_removes_emptied_new_bucket_dirs(
    spark, tmp_path, monkeypatch
):
    """r11 ADVICE: a crashed append can CREATE bucket dirs whose only
    files are pure orphans; unlinking the files must also remove the
    now-empty hive dirs, or they accumulate across repairs. Bucket
    dirs that pre-existed the crash must survive untouched."""
    import glob
    import os as _os

    from mpg_data_warehouse_spark.operators import search as S

    base = spark.createDataFrame([Row(doc_id=1, text="alpha")])
    idx = str(tmp_path / "idx")
    # explicit wide layout: a 1-doc corpus leaves ~62 bucket dirs
    # absent, so the crashed batch's terms create brand-new ones
    S.build_ranked_index(base, idx, n_buckets=64)
    dirs_before = set(glob.glob(_os.path.join(idx, "bucket=*")))

    batch = spark.createDataFrame(
        [
            Row(
                doc_id=2,
                text="bravo charlie delta echo foxtrot golf hotel india",
            )
        ]
    )

    def _boom(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(S, "_write_manifest", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        S.bm25_append_index(batch, idx)
    monkeypatch.undo()  # restore the real _write_manifest

    new_dirs = (
        set(glob.glob(_os.path.join(idx, "bucket=*"))) - dirs_before
    )
    # 8 distinct terms over 64 buckets: some land outside the 1-doc
    # build's dirs (all-collide probability ~(|before|/64)^8 ≈ 0)
    assert new_dirs
    assert S.bm25_repair_index(spark, idx) == 1
    assert (
        set(glob.glob(_os.path.join(idx, "bucket=*"))) == dirs_before
    )
    assert S.bm25_repair_index(spark, idx) == 0


def test_bm25_repair_degrades_on_bad_stats_sidecar(
    spark, tmp_path, monkeypatch
):
    """The stats sidecar is only a broadcast HINT for the repair
    anti-join — repair must survive the sidecar being malformed
    (possibly truncated by the very crash being repaired) or missing
    its n_docs key, degrading to the conservative shuffle join rather
    than crashing or force-broadcasting an unbounded manifest (r12
    ADVICE)."""
    import os

    from mpg_data_warehouse_spark.operators import search as S

    batch1 = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie"),
            Row(doc_id=2, text="alpha bravo echo"),
        ]
    )
    batch2 = spark.createDataFrame(
        [Row(doc_id=3, text="charlie delta foxtrot")]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(batch1, idx)
    real_write_manifest = S._write_manifest
    monkeypatch.setattr(
        S, "_write_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        S.bm25_append_index(batch2, idx)
    monkeypatch.setattr(S, "_write_manifest", real_write_manifest)

    stats_path = os.path.join(idx, S.STATS_FILE)
    with open(stats_path) as fh:
        good_stats = fh.read()

    # malformed JSON (a crash-truncated write) — repair still scrubs
    with open(stats_path, "w") as fh:
        fh.write(good_stats[: len(good_stats) // 2])
    assert S.bm25_repair_index(spark, idx) == 1

    # append (unlike repair) REQUIRES a readable sidecar — restore it
    # before provoking the next crash
    with open(stats_path, "w") as fh:
        fh.write(good_stats)

    # re-crash, then repair with the n_docs key absent — must not
    # force-broadcast (n_docs would otherwise default to 0) nor raise
    monkeypatch.setattr(
        S, "_write_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        S.bm25_append_index(batch2, idx)
    monkeypatch.setattr(S, "_write_manifest", real_write_manifest)
    with open(stats_path, "w") as fh:
        fh.write('{"avgdl": 3.0, "dl_sum": 9.0}')
    assert S.bm25_repair_index(spark, idx) == 1

    # restore the true sidecar; retried append + search still correct
    with open(stats_path, "w") as fh:
        fh.write(good_stats)
    assert S.bm25_append_index(batch2, idx) == 1
    got = {r.doc_id for r in S.bm25_search(spark, idx, "charlie").collect()}
    assert got == {1, 3}


# ---------------------------------------------------------------------------
# Manifest Bloom sidecar (r13)
# ---------------------------------------------------------------------------


def _bloom_superset_holds(spark, idx):
    """Every manifest id must probe maybe_seen=True (the no-false-
    negative superset invariant the replay guard's safety rests on)."""
    from mpg_data_warehouse_spark.operators import search as S
    from mpg_data_warehouse_spark.operators.bloom import bloom_maybe_seen

    bloom, ptr = S._read_manifest_bloom(spark, idx)
    assert bloom is not None, "sidecar unreadable"
    man = spark.read.parquet(S._manifest_path(idx)).select("doc_id")
    probed = bloom_maybe_seen(
        man, "doc_id", bloom, n_bits=ptr["n_bits"], k=ptr["k"],
        seed=ptr["seed"],
    )
    return probed.filter(~F.col("maybe_seen")).count() == 0


def test_bm25_bloom_sidecar_seeded_and_superset(spark, tmp_path, monkeypatch):
    """build_ranked_index seeds the sidecar; append and delete keep
    the superset invariant (delete shrinks the manifest only)."""
    from mpg_data_warehouse_spark.operators import search as S

    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i} bravo") for i in range(40)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 25"), idx)
    assert _bloom_superset_holds(spark, idx)
    assert S.bm25_append_index(docs.filter("doc_id >= 25"), idx) == 15
    assert _bloom_superset_holds(spark, idx)
    S.bm25_delete_index(
        docs.filter("doc_id % 4 = 0").select("doc_id"), idx
    )
    assert _bloom_superset_holds(spark, idx)
    # replay guard still EXACT through the two-tier path: the deleted
    # ids (28/32/36 of this batch) are maybe_seen in the stale-superset
    # bloom, but the exact tier sees they left the manifest and lets
    # them re-append; the 12 still-indexed docs are dropped
    assert S.bm25_append_index(docs.filter("doc_id >= 25"), idx) == 3


def test_bm25_all_new_append_reads_no_manifest_partitions(
    spark, tmp_path, monkeypatch
):
    """The sidecar's reason to exist: a fully-fresh batch must clear
    the replay guard from the Bloom probe alone — ZERO manifest IO.
    Proven by making any manifest read IMPOSSIBLE (the _docs parquet
    files are removed, directory kept) and appending an all-new
    batch: the two-tier guard succeeds; the r10 exact guard would
    have had to read the now-empty manifest."""
    import os
    import shutil

    from mpg_data_warehouse_spark.operators import search as S

    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i} bravo") for i in range(30)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 20"), idx)
    man = S._manifest_path(idx)
    for entry in os.listdir(man):
        p = os.path.join(man, entry)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    assert S.bm25_append_index(docs.filter("doc_id >= 20"), idx) == 10


def test_bm25_bloom_corrupt_pointer_falls_back_and_self_heals(
    spark, tmp_path, monkeypatch
):
    """A torn/garbage pointer degrades the guard to the exact
    anti-join (append still correct) and the append's own sidecar
    commit REPLACES the broken pointer — the next append is two-tier
    again."""
    import os

    from mpg_data_warehouse_spark.operators import search as S

    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i} bravo") for i in range(30)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 20"), idx)
    with open(os.path.join(idx, S.BLOOM_PTR_FILE), "w") as fh:
        fh.write('{"dir": "_docs_bloom_v1", "n_bits": "garbage"')
    assert S._read_manifest_bloom(spark, idx) == (None, None)
    assert S.bm25_append_index(docs.filter("doc_id >= 20"), idx) == 10
    bloom, ptr = S._read_manifest_bloom(spark, idx)
    assert bloom is not None and isinstance(ptr["n_bits"], int)
    assert _bloom_superset_holds(spark, idx)
    # the healed sidecar drives the guard again: full replay is a noop
    assert S.bm25_append_index(docs, idx) == 0


def test_bm25_bloom_resizes_when_capacity_exceeded(
    spark, tmp_path, monkeypatch
):
    """Growth past _BLOOM_MAX_BITS_PER_KEY density rebuilds the filter
    at the target density (amortized doubling); the rebuilt filter
    still covers every manifest id."""
    from mpg_data_warehouse_spark.operators import search as S

    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    monkeypatch.setattr(S, "_BLOOM_MIN_BITS", 256)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i} bravo") for i in range(120)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 10"), idx)
    _, ptr0 = S._read_manifest_bloom(spark, idx)
    assert ptr0["n_bits"] == 256  # 10 docs * 16 bits -> floor
    # 110 more docs: 120 * 10 > 256 forces the rebuild branch
    assert S.bm25_append_index(docs.filter("doc_id >= 10"), idx) == 110
    _, ptr1 = S._read_manifest_bloom(spark, idx)
    assert ptr1["n_bits"] >= 120 * S._BLOOM_TARGET_BITS_PER_KEY
    assert _bloom_superset_holds(spark, idx)
    assert S.bm25_append_index(docs, idx) == 0


def test_bm25_crash_between_bloom_and_manifest_keeps_contract(
    spark, tmp_path, monkeypatch
):
    """The new commit order (postings -> bloom -> manifest) under the
    injected crash: the bloom holds orphan ids (superset — safe), the
    repair-then-retry contract still converges to the clean-build
    state, and the sidecar stays a superset of the final manifest."""
    from mpg_data_warehouse_spark.operators import search as S

    b1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i} bravo") for i in range(20)]
    )
    b2 = spark.createDataFrame(
        [Row(doc_id=i, text=f"charlie token{i} delta") for i in range(20, 35)]
    )
    idx = str(tmp_path / "idx")
    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    S.build_ranked_index(b1, idx)
    real = S._write_manifest
    monkeypatch.setattr(
        S, "_write_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        S.bm25_append_index(b2, idx)
    monkeypatch.setattr(S, "_write_manifest", real)
    # crashed ids live in the bloom but not the manifest — the
    # superset direction; the guard must therefore exact-check them
    assert _bloom_superset_holds(spark, idx)
    assert S.bm25_repair_index(spark, idx) == 15
    assert S.bm25_append_index(b2, idx) == 15
    assert _bloom_superset_holds(spark, idx)
    full = str(tmp_path / "full")
    S.build_ranked_index(b1.unionByName(b2), full)
    for q in ("alpha", "charlie token22"):
        a = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, idx, q).collect()
        }
        b = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, full, q).collect()
        }
        assert a == b, q


def test_bm25_compact_index_merges_files_preserves_results(
    spark, tmp_path, monkeypatch
):
    """Three appends leave one file per batch per touched partition;
    compaction merges each fragmented bucket/idb partition to ONE
    file, preserves search results and stats byte-for-byte, keeps the
    replay guard exact, and is idempotent (second run finds nothing
    fragmented)."""
    import json as _json
    import os

    from mpg_data_warehouse_spark.operators import search as S

    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha shared token{i}") for i in range(60)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 30"), idx)
    S.bm25_append_index(docs.filter("doc_id >= 30 and doc_id < 45"), idx)
    S.bm25_append_index(docs.filter("doc_id >= 45"), idx)
    assert S._fragmented_partitions(idx, "bucket=", 2)  # debt exists

    before = sorted(
        (r.doc_id, r.score)
        for r in S.bm25_search(spark, idx, "alpha shared", k=100).collect()
    )
    with open(os.path.join(idx, S.STATS_FILE)) as fh:
        stats_before = _json.load(fh)

    rep = S.bm25_compact_index(spark, idx)
    assert rep["scrubbed"] == 0 and rep["buckets_compacted"] > 0
    assert rep["files_merged"] > 0 and rep["bloom_rebuilt"]
    assert not S._fragmented_partitions(idx, "bucket=", 2)
    assert not S._fragmented_partitions(S._manifest_path(idx), "idb=", 2)

    after = sorted(
        (r.doc_id, r.score)
        for r in S.bm25_search(spark, idx, "alpha shared", k=100).collect()
    )
    assert before == after
    with open(os.path.join(idx, S.STATS_FILE)) as fh:
        assert _json.load(fh) == stats_before
    assert _bloom_superset_holds(spark, idx)
    # replay guard still exact after the layout rewrite
    assert S.bm25_append_index(docs, idx) == 0
    # idempotent
    rep2 = S.bm25_compact_index(spark, idx)
    assert rep2["buckets_compacted"] == 0 and rep2["files_merged"] == 0


def test_bm25_compact_index_scrubs_orphans_first(
    spark, tmp_path, monkeypatch
):
    """Compacting a crashed index must not merge orphans into mixed
    files (that would demote later repair to the rewrite path) — the
    repair scrub runs first, and the compacted index converges to the
    clean-build state after the retry."""
    from mpg_data_warehouse_spark.operators import search as S

    b1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i}") for i in range(20)]
    )
    b2 = spark.createDataFrame(
        [Row(doc_id=i, text=f"bravo token{i}") for i in range(20, 30)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(b1, idx)
    monkeypatch.setattr(
        S, "_write_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        S.bm25_append_index(b2, idx)
    monkeypatch.undo()
    rep = S.bm25_compact_index(spark, idx)
    assert rep["scrubbed"] == 10
    assert S.bm25_append_index(b2, idx) == 10
    full = str(tmp_path / "full")
    S.build_ranked_index(b1.unionByName(b2), full)
    for q in ("alpha", "bravo token22"):
        a = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, idx, q).collect()
        }
        b = {
            (r.doc_id, r.score)
            for r in S.bm25_search(spark, full, q).collect()
        }
        assert a == b, q


def test_bm25_bloom_gated_off_below_min_docs(spark, tmp_path):
    """At the DEFAULT threshold a toy corpus carries no sidecar at all
    — build seeds nothing, appends maintain nothing (zero bloom
    overhead at bench scale), and the guard runs the exact path."""
    import os

    from mpg_data_warehouse_spark.operators import search as S

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i}") for i in range(30)]
    )
    idx = str(tmp_path / "idx")
    S.build_ranked_index(docs.filter("doc_id < 20"), idx)
    assert not os.path.exists(os.path.join(idx, S.BLOOM_PTR_FILE))
    assert S.bm25_append_index(docs.filter("doc_id >= 20"), idx) == 10
    assert not os.path.exists(os.path.join(idx, S.BLOOM_PTR_FILE))
    assert S.bm25_append_index(docs, idx) == 0  # exact guard works


def test_bm25_bloom_invalidated_when_corpus_shrinks_below_threshold(
    spark, tmp_path, monkeypatch
):
    """A sidecar that stops being maintained must stop EXISTING: when
    the corpus falls under the threshold, the next append removes the
    pointer (a skipped refresh would leave a subset filter — false
    negatives re-insert delivered docs). Compaction then sweeps the
    unreachable dirs."""
    import os

    from mpg_data_warehouse_spark.operators import search as S

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha token{i}") for i in range(40)]
    )
    idx = str(tmp_path / "idx")
    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 0)
    S.build_ranked_index(docs.filter("doc_id < 20"), idx)
    assert os.path.exists(os.path.join(idx, S.BLOOM_PTR_FILE))
    # threshold rises above the corpus (the shrink case, inverted for
    # test economy): the next append invalidates instead of refreshing
    monkeypatch.setattr(S, "_BLOOM_GUARD_MIN_DOCS", 10_000)
    assert S.bm25_append_index(docs.filter("doc_id >= 20"), idx) == 20
    assert not os.path.exists(os.path.join(idx, S.BLOOM_PTR_FILE))
    # guard stays exact without the sidecar
    assert S.bm25_append_index(docs, idx) == 0
    # filter dirs linger (append-time deletion would break in-flight
    # lineage) until compaction sweeps them
    assert any(
        d.startswith("_docs_bloom_v") for d in os.listdir(idx)
    )
    S.bm25_compact_index(spark, idx)
    assert not any(
        d.startswith("_docs_bloom_v") for d in os.listdir(idx)
    )


def test_term_bucket_py_matches_spark(spark):
    """The driver-side XXH64 twin must match Spark's engine hash
    EXACTLY — a drifted bucket silently prunes the wrong partitions.
    Covers unicode, empties-after-strip shapes, every length class of
    the XXH64 tail handling (0..3, 4..7, 8.., and >=32 stripe), and
    fuzzed random strings."""
    import random
    import string

    from mpg_data_warehouse_spark.operators import search as S

    rng = random.Random(13)
    tricky = [
        "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
        "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "naïve", "日本語のテキスト", "emoji🙂mix", "tab\tsep",
        "table", "scan", "merge", "window", "join", "batch",
    ]
    fuzz = [
        "".join(
            rng.choice(string.printable + "éüñ中日🙂")
            for _ in range(rng.randint(1, 80))
        )
        for _ in range(60)
    ]
    terms = tricky + fuzz
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            "term",
            S.term_bucket(F.col("term"), 64).alias("b64"),
            S.term_bucket(F.col("term"), 7).alias("b7"),
            F.xxhash64("term").alias("h"),
        )
        .collect()
    )
    for r in rows:
        assert S.xxhash64_py(r["term"].encode("utf-8")) == r["h"], r["term"]
        assert S.term_bucket_py(r["term"], 64) == r["b64"], r["term"]
        assert S.term_bucket_py(r["term"], 7) == r["b7"], r["term"]
