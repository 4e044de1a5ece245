"""Blocked Bloom filter: no false negatives ever, FPR within the
design bound, persistence round-trip, merge, and the two-tier
membership composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.bloom import (
    bloom_build,
    bloom_maybe_seen,
    bloom_merge,
    bloom_read,
)

N_BITS = 1 << 16  # small filter so the FPR assertion has teeth
K = 7


def _keys(spark, lo, hi, name="h"):
    return spark.range(lo, hi).select(F.col("id").alias(name))


def test_no_false_negatives_and_bounded_fpr(spark):
    seen = _keys(spark, 0, 2000)
    flt = bloom_build(seen, "h", n_bits=N_BITS, k=K)
    probe = _keys(spark, 0, 4000)  # first half seen, second half not
    out = bloom_maybe_seen(probe, "h", flt, n_bits=N_BITS, k=K)
    rows = {r.h: r.maybe_seen for r in out.collect()}
    # every inserted key MUST report maybe_seen (no false negatives)
    assert all(rows[h] for h in range(2000))
    # unseen keys: FPR ≈ (1 - e^(-k n / m))^k ≈ 0.7% here; allow 3x
    fp = sum(1 for h in range(2000, 4000) if rows[h])
    assert fp / 2000 < 0.03, fp


def test_round_trip_and_self_describing_params(spark, tmp_path):
    path = str(tmp_path / "bloom")
    bloom_build(_keys(spark, 0, 500), "h", path=path, n_bits=N_BITS, k=K)
    flt, meta = bloom_read(spark, path)
    assert meta == {"n_bits": N_BITS, "k": K, "seed": 0}
    out = bloom_maybe_seen(
        _keys(spark, 400, 600), "h", flt, n_bits=meta["n_bits"], k=meta["k"]
    )
    got = {r.h: r.maybe_seen for r in out.collect()}
    assert all(got[h] for h in range(400, 500))


def test_merge_equals_build_over_union(spark):
    a = bloom_build(_keys(spark, 0, 300), "h", n_bits=N_BITS, k=K)
    b = bloom_build(_keys(spark, 300, 600), "h", n_bits=N_BITS, k=K)
    merged = bloom_merge(a, b)
    direct = bloom_build(_keys(spark, 0, 600), "h", n_bits=N_BITS, k=K)
    assert {
        (r.block, r.bits) for r in merged.collect()
    } == {(r.block, r.bits) for r in direct.collect()}


def test_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(_keys(spark, 0, 10), "h", n_bits=100)


def test_two_tier_membership_composition(spark):
    """The intended use: bloom prefilter + exact check only for the
    maybe-seen remainder gives EXACTLY the anti-join answer."""
    corpus = spark.createDataFrame(
        [Row(doc_id=i, h=f"hash{i}") for i in range(1000)]
    )
    flt = bloom_build(corpus, "h", n_bits=N_BITS, k=K)
    batch = spark.createDataFrame(
        [Row(doc_id=10_000 + i, h=f"hash{i * 2}") for i in range(1000)]
    )  # evens 0..998 seen, evens 1000+ new
    from mpg_data_warehouse_spark.operators.bloom import two_tier_new_rows

    got = {
        r.doc_id
        for r in two_tier_new_rows(
            batch, corpus, "h", flt, n_bits=N_BITS, k=K
        ).collect()
    }
    want = {r.doc_id for r in batch.join(corpus.select("h"), "h", "left_anti").collect()}
    assert got == want
    # and the prefilter did real work: most new keys skipped the join
    probed = bloom_maybe_seen(batch, "h", flt, n_bits=N_BITS, k=K)
    assert probed.filter(~F.col("maybe_seen")).count() > 400


def test_null_key_carries_its_verdict(spark):
    """A NULL key hashes fine and must flow through both tiers: the
    rejoin used to be null-unsafe, giving NULL maybe_seen and
    dropping the row from both filters."""
    seen = spark.createDataFrame(
        [Row(h="a"), Row(h=None), Row(h="b")], "h string"
    )
    flt = bloom_build(seen, "h", n_bits=N_BITS, k=K)
    batch = spark.createDataFrame(
        [Row(h="a"), Row(h=None), Row(h="zz_unseen_zz")], "h string"
    )
    out = bloom_maybe_seen(batch, "h", flt, n_bits=N_BITS, k=K)
    rows = {r.h: r.maybe_seen for r in out.collect()}
    assert rows["a"] is True
    assert rows[None] is True  # inserted null key reports maybe-seen
    assert rows["zz_unseen_zz"] is False
    # the two tiers partition the batch exactly
    n = out.filter(~F.col("maybe_seen")).count() + out.filter(
        F.col("maybe_seen")
    ).count()
    assert n == 3


def test_k_zero_rejected(spark):
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(_keys(spark, 0, 5), "h", k=0)
    flt = bloom_build(_keys(spark, 0, 5), "h", n_bits=N_BITS, k=K)
    with pytest.raises(ValueError, match="k must be"):
        bloom_maybe_seen(_keys(spark, 0, 5), "h", flt, k=0)


def test_merge_paths_verifies_params_and_equals_rebuild(spark, tmp_path):
    """Path-form merge loads both sidecars, verifies compatibility,
    and produces the same filter as a from-scratch build."""
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    bloom_build(_keys(spark, 0, 300), "h", path=pa_, n_bits=N_BITS, k=K)
    bloom_build(_keys(spark, 300, 600), "h", path=pb, n_bits=N_BITS, k=K)
    merged = bloom_merge(pa_, pb, spark=spark)
    direct = bloom_build(_keys(spark, 0, 600), "h", n_bits=N_BITS, k=K)
    assert {
        (r.block, r.bits) for r in merged.collect()
    } == {(r.block, r.bits) for r in direct.collect()}


def test_merge_mismatched_params_raises(spark, tmp_path):
    import pytest

    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    bloom_build(_keys(spark, 0, 100), "h", path=pa_, n_bits=N_BITS, k=K)
    bloom_build(_keys(spark, 0, 100), "h", path=pb, n_bits=N_BITS * 2, k=K)
    with pytest.raises(ValueError, match="incompatible filter parameters"):
        bloom_merge(pa_, pb, spark=spark)
    # seed mismatch too
    pc = str(tmp_path / "c")
    bloom_build(_keys(spark, 0, 100), "h", path=pc, n_bits=N_BITS, k=K, seed=9)
    with pytest.raises(ValueError, match="incompatible filter parameters"):
        bloom_merge(pa_, pc, spark=spark)
    # one-sided knowledge is refused rather than trusted
    a, meta = bloom_read(spark, pa_)
    with pytest.raises(ValueError, match="one side has parameters"):
        bloom_merge(a, bloom_build(_keys(spark, 0, 10), "h"), meta_a=meta)
