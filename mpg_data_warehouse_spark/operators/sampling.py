"""Deterministic sampling operators for training-data pipelines.

Large-scale corpus work needs *reproducible* samples: the same row set
regardless of partitioning, executor count, task retries, or Spark
version. ``df.sample()`` is none of those (it is seed + partition
dependent), so everything here derives the keep/drop decision from a
content hash of a stable key column — md5, the same primitive the
dedup family uses (operators/dedup.py), so oracles can replay the
exact decision in DuckDB: ``CAST('0x' || substr(md5(k),1,8) AS
BIGINT) % buckets``.

Scale notes (100 TB): all of these are narrow map-side filters — no
shuffle, no state, fully pipelined into the scan. The hash is one md5
per row; the filter prunes before any downstream join/agg, so a 1%
sample cuts the rest of the plan's input 100×. Stratified rates are a
single ``CASE WHEN`` chain (broadcastable strata count), never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_sample",
    "stratified_sample",
    "split_train_holdout",
    "budget_rebalance_sample",
    "temperature_mixture_sample",
    "deterministic_shuffle",
    "cap_per_group",
    "dsir_importance_weights",
    "dsir_resample",
]


def hash_bucket(key: Column | str, buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form.

    First 8 hex chars → 32-bit unsigned int → modulo. Matches DuckDB
    ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % buckets`` bit for
    bit, which is what makes sampled query results oracle-checkable.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
    return (h.cast("long") % F.lit(buckets)).alias("bucket")


def _null_safe_bucket(key, buckets: int):
    """Null keys hash to null, which every bucket comparison rejects —
    silently VANISHING the row from both sides of a split. Pin them to
    bucket 0 instead: deterministic, documented, and exhaustive.
    (Non-null keys hash identically to before, so oracle SQL that
    mirrors ``hash_bucket`` on non-null key columns is unaffected.)"""
    return F.coalesce(hash_bucket(key, buckets), F.lit(0))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    bucket space. Reproducible across runs/partitionings; unbiased for
    hash-uniform keys. Map-side only — no shuffle. Null keys land in
    bucket 0 (kept whenever fraction > 0) rather than vanishing."""
    cut = int(round(fraction * buckets))
    return df.filter(_null_safe_bucket(key, buckets) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    strata: str,
    key: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` made
    reproducible): each stratum value gets its own keep-fraction.

    The per-row cutoff is a CASE WHEN chain over the (small) strata
    domain — pure column math, so the whole thing stays one narrow
    map stage even with thousands of strata.
    """
    cut: Column = F.lit(int(round(default_rate * buckets)))
    for value, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata) == F.lit(value), F.lit(int(round(rate * buckets)))
        ).otherwise(cut)
    return df.filter(_null_safe_bucket(key, buckets) < cut)


def split_train_holdout(
    df: DataFrame, key: str, holdout_fraction: float, buckets: int = 10_000
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible train/holdout split keyed on
    content hash — the standard eval-contamination guard: a key lands
    on the same side in every run and every pipeline that uses the
    same key column. Null keys land deterministically in bucket 0
    (the holdout side whenever the fraction is positive) — previously
    they vanished from BOTH splits."""
    cut = int(round(holdout_fraction * buckets))
    b = _null_safe_bucket(key, buckets)
    return df.filter(b >= F.lit(cut)), df.filter(b < F.lit(cut))


def budget_rebalance_sample(
    df: DataFrame,
    strata: str,
    key: str,
    weight: Column | str,
    target_per_stratum: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Down-sample each stratum toward a target *weight* budget (e.g.
    tokens per source — corpus mix rebalancing): stratum keep-rate =
    min(1, target / stratum_total), applied with the deterministic
    hash-bucket filter, so the mix is reproducible run-to-run and
    auditable in SQL.

    Rates are DATA-DEPENDENT but still deterministic: the per-stratum
    totals come from one small aggregate (|strata| rows, broadcast
    back), the cutoff uses floor() so any engine replays it exactly.
    The expected kept weight per stratum ≈ target (hash-uniform keys);
    exact budgets would need a sort-and-take — a full shuffle — and
    are rarely worth it for mix shaping at 100 TB.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    # null-safe bucket + null-safe stratum join: the raw hash_bucket
    # plus a plain equi-join silently VANISHED null-key rows (the
    # exact bug _null_safe_bucket's contract pins for the other
    # samplers) and whole null-strata groups; the groupBy puts null
    # strata in one group, so the join must match it null-safely
    weighted = df.withColumn("_rw", w).withColumn(
        "_b", _null_safe_bucket(key, buckets)
    )
    totals = weighted.groupBy(strata).agg(F.sum("_rw").alias("_total"))
    cut = F.floor(
        F.least(F.lit(1.0), F.lit(float(target_per_stratum)) / F.col("_total"))
        * buckets
    )
    t = F.broadcast(totals.withColumnRenamed(strata, "_strata"))
    return (
        weighted.join(t, weighted[strata].eqNullSafe(t["_strata"]))
        .filter(F.col("_b") < cut)
        .drop("_total", "_rw", "_b", "_strata")
    )


def temperature_mixture_sample(
    df: DataFrame,
    strata: str,
    key: str,
    weight: Column | str,
    temperature: float,
    target_total: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the T5/PaLM recipe for
    multi-source corpora): stratum *i* is sampled toward a share
    ``p_i ∝ total_i^T`` of ``target_total`` weight, so ``T=1``
    reproduces the natural mix, ``T→0`` approaches uniform-per-stratum,
    and intermediate T up-weights small sources without starving large
    ones. Keep-rate per stratum = min(1, target_total·p_i / total_i),
    applied with the deterministic hash-bucket filter.

    Plan shape is ``budget_rebalance_sample``'s: one |strata|-row
    aggregate, the flattened shares computed INSIDE that tiny relation
    (a window-free sum over it — it is broadcast-sized by definition),
    then a broadcast join + map-side filter. The corpus is scanned
    once and never shuffled. floor() on the bucket cutoff keeps the
    decision engine-replayable despite the double-precision pow."""
    w = F.col(weight) if isinstance(weight, str) else weight
    # same null-safety as budget_rebalance_sample: null keys bucket
    # deterministically instead of vanishing, null strata join
    weighted = df.withColumn("_rw", w).withColumn(
        "_b", _null_safe_bucket(key, buckets)
    )
    totals = weighted.groupBy(strata).agg(F.sum("_rw").alias("_total"))
    flattened = totals.withColumn(
        "_pt", F.pow(F.col("_total"), F.lit(float(temperature)))
    )
    denom = flattened.agg(F.sum("_pt").alias("_z"))
    rates = flattened.crossJoin(F.broadcast(denom)).select(
        F.col(strata).alias("_strata"),
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(target_total))
                * (F.col("_pt") / F.col("_z"))
                / F.col("_total"),
            )
            * buckets
        ).alias("_cut"),
    )
    r = F.broadcast(rates)
    return (
        weighted.join(r, weighted[strata].eqNullSafe(r["_strata"]))
        .filter(F.col("_b") < F.col("_cut"))
        .drop("_cut", "_rw", "_b", "_strata")
    )


def deterministic_shuffle(
    df: DataFrame,
    key: Column | str,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global permutation of a corpus — the "shuffle the
    training data" step, made deterministic so a re-run (or a resumed
    job) yields the SAME example order.

    Orders by ``xxhash64(key, seed)``: a keyed pseudo-random total
    order. ``orderBy`` range-partitions on sampled hash quantiles then
    sorts per partition — the standard scalable total-order plan (no
    single reducer). Changing ``seed`` gives an independent
    permutation (new epoch order) without touching the data.

    At 100 TB pair this with ``write_training_shards``: the hash order
    also decorrelates adjacent source documents, so each shard is an
    unbiased sample of the corpus.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.xxhash64(k, F.lit(seed))
    if num_partitions is not None:
        return df.repartitionByRange(num_partitions, h).sortWithinPartitions(h)
    return df.orderBy(h)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list[Column | str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source/domain document caps — the curation step that stops
    one domain from dominating a crawl-derived corpus (C4 and refined-
    web pipelines cap per-domain contributions for exactly this
    reason). Keeps at most ``cap`` rows per ``group_col``, choosing
    winners by ``order_by`` (e.g. a quality score, descending) with
    ``id_col`` as the deterministic tiebreak; default order is lowest
    id first (keep-earliest).

    One rank-window shuffle keyed by the group. A pathological hot
    group (one domain = half the corpus) makes that window's partition
    hot: AQE skew handling splits the sort, and since only the top
    ``cap`` survive, a pre-filter via a per-group COUNT would not
    reduce the shuffle (every row still needs ranking); the window is
    the minimal plan.
    """
    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    rk = F.row_number().over(
        Window.partitionBy(group_col).orderBy(*order)
    )
    return df.withColumn("_rk", rk).filter(F.col("_rk") <= cap).drop("_rk")


def _hashed_ngram_buckets(
    text_col: str, n_buckets: int, max_n: int = 2, hash_fn: str = "xxhash64"
) -> Column:
    """Bag of hashed word n-grams (n = 1..max_n) as bucket ids in
    [0, n_buckets): the DSIR feature space. Unigrams and bigrams come
    from one tokenize pass (``sequence`` + ``slice`` windows — no
    explode until the caller aggregates); hashing is ``xxhash64 %
    n_buckets``, so the feature vocabulary is FIXED-width regardless
    of corpus size — that is what keeps the importance table
    broadcastable at any scale."""
    from mpg_data_warehouse_spark.operators.text import norm_tokens

    toks = norm_tokens(text_col)
    grams = []
    for n in range(1, max_n + 1):
        # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, which
        # would feed slice a zero start — short docs get no n-grams
        positions = F.when(
            F.size(toks) >= n,
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        # capture n via a closure factory, NEVER `lambda i, n=n:` —
        # a default arg makes the lambda arity 2 and PySpark binds it
        # as transform's (element, index) form, so n silently became
        # the ARRAY INDEX and every feature was a junk slice (caught
        # by the dsir_select oracle; pinned in test_sampling)
        def _gram(width: int):
            return lambda i: F.concat_ws(" ", F.slice(toks, i, width))

        grams.append(F.transform(positions, _gram(n)))
    allgrams = grams[0] if len(grams) == 1 else F.concat(*grams)
    if hash_fn == "xxhash64":
        return F.transform(
            allgrams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
        )
    if hash_fn == "md5":
        # oracle-replayable bucket: 32-bit md5 prefix, the same
        # primitive as _stable_bucket — mirrors in any engine as
        # CAST('0x'||substr(md5(g),1,8) AS BIGINT) % n_buckets
        return F.transform(
            allgrams,
            lambda g: F.pmod(
                F.conv(
                    F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10
                ).cast("long"),
                F.lit(n_buckets),
            ),
        )
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _bucket_distribution(
    df: DataFrame,
    text_col: str,
    n_buckets: int,
    max_n: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(bucket, cnt) over the corpus's hashed n-grams — one explode +
    hash-agg; map-side combine collapses the Zipf head so the shuffle
    carries ≤ n_buckets rows per partition."""
    return (
        df.select(
            F.explode(
                _hashed_ngram_buckets(text_col, n_buckets, max_n, hash_fn)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    max_n: int = 2,
    smoothing: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document importance log-weights for Data Selection via
    Importance Resampling (Xie et al., NeurIPS 2023 — public): score
    each RAW doc by how much more likely its hashed-n-gram bag is
    under the TARGET distribution than under the raw distribution,
    ``log w(x) = Σ_features [log p̂_target(b) − log p̂_raw(b)]``
    with add-α smoothed bucket probabilities.

    Returns ``raw`` plus a ``dsir_logw`` column. Plan: the RAW corpus
    text is tokenized/hashed exactly ONCE — the per-doc feature table
    is persisted and serves both the raw bucket distribution and the
    weight join (the naive form re-exploded raw for each: three text
    passes, and r5 measured the single-pass rewrite at ~0.6× wall on
    a 500 K-doc corpus). The target corpus is scanned once for its
    distribution; both distributions are ≤ n_buckets rows (the
    feature-hashing guarantee) and collect driver-side to build the
    broadcast log-ratio table; doc weights materialize through an
    eager ``localCheckpoint`` so the persisted features can be freed
    before returning and no multi-pass lineage escapes to the
    caller."""
    import math

    doc_feats = raw.select(
        F.col(id_col),
        F.explode(
            _hashed_ngram_buckets(text_col, n_buckets, max_n, hash_fn)
        ).alias("bucket"),
    ).persist()
    try:
        # both bucket distributions ride ONE action (r13, guide §5:
        # two tiny collects were two scheduled jobs; the tagged union
        # runs them as one, and materializing the persisted feature
        # table inside it lets the weight join below reuse the cache
        # exactly as before). ≤ 2 × n_buckets rows either way.
        dist_rows = (
            _bucket_distribution(target, text_col, n_buckets, max_n, hash_fn)
            .withColumn("_k", F.lit("t"))
            .unionByName(
                doc_feats.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("_k", F.lit("r"))
            )
            .collect()
        )
        t_counts = {
            row["bucket"]: row["cnt"] for row in dist_rows if row["_k"] == "t"
        }
        r_counts = {
            row["bucket"]: row["cnt"] for row in dist_rows if row["_k"] == "r"
        }
        t_total = sum(t_counts.values())
        r_total = sum(r_counts.values())
        a = float(smoothing)
        ratio = raw.sparkSession.createDataFrame(
            [
                (
                    b,
                    math.log(
                        (t_counts.get(b, 0) + a) / (t_total + a * n_buckets)
                    )
                    - math.log(
                        (r_counts.get(b, 0) + a) / (r_total + a * n_buckets)
                    ),
                )
                for b in sorted(set(t_counts) | set(r_counts))
            ],
            "bucket long, lr double",
        )
        logw = (
            doc_feats.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.sum("lr").alias("dsir_logw"))
            # (id, double) per doc — small; eager so doc_feats can be
            # unpersisted without the caller's later actions
            # re-running the explode
            .localCheckpoint()
        )
    finally:
        doc_feats.unpersist()
    return raw.join(logw, id_col, "left").withColumn(
        "dsir_logw", F.coalesce(F.col("dsir_logw"), F.lit(0.0))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    max_n: int = 2,
    smoothing: float = 1.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Select ~``n`` raw docs matching the target distribution:
    Gumbel-top-k over the importance weights (sampling WITHOUT
    replacement ∝ w — the DSIR selection rule), with the Gumbel noise
    derived from ``xxhash64(id, seed)`` so the draw is a pure
    function of (corpus, seed): reruns and retries select the same
    documents, and a new seed is an independent draw.

    The top-k is a TakeOrdered (per-partition top-n + driver merge of
    n keys), not a global sort — fine for selection budgets that fit
    a driver merge. For larger budgets, cut at the (1 − n/N) quantile
    of the key with ``percentile_approx`` and filter — fully
    distributed, approximately n rows."""
    weighted = dsir_importance_weights(
        raw, target, id_col, text_col, n_buckets, max_n, smoothing, hash_fn
    )
    # uniform in (0,1) from the id hash; never exactly 0 or 1
    if hash_fn == "md5":
        # 40 bits from 10 hex chars of md5("<id>:<seed>") — the
        # oracle mirror is CAST('0x'||substr(md5(id||':'||seed),1,10)
        # AS BIGINT)
        draw = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(id_col).cast("string"), F.lit(str(seed))
                    ).cast("binary")
                ),
                1,
                10,
            ),
            16,
            10,
        ).cast("long")
    else:
        draw = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(2**40))
    u = (draw + 0.5) / F.lit(float(2**40))
    gumbel = -F.log(-F.log(u))
    return (
        weighted.withColumn("_gkey", F.col("dsir_logw") + gumbel)
        .orderBy(F.col("_gkey").desc())
        .limit(n)
        .drop("_gkey")
    )
