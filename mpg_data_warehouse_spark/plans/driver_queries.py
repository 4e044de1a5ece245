"""Driver-contract queries: every implemented operator family from
SURVEY.md §2, expressed on the driver's synthetic TPC-H-ish tables,
each paired with the ANSI-SQL oracle DuckDB runs on the same parquet.

Representative mapping (FIXTURES.md §4): ``lineitem`` ≈ the big
point-intercept fact, ``orders`` ≈ survey_metadata (anchor w/ date),
``l_returnflag`` ≈ categorical code column for the ``complete()``
grid-fill, ``nation``/``region`` ≈ broadcastable dims, ``events`` ≈
timestamped stream table, ``documents``/``embeddings`` ≈ the
LLM-pipeline extension surface.

Contract discipline (SURVEY §7.4 #5): every computed column is
aliased identically in the Spark plan and the oracle SQL; integer-ish
computed columns are cast to BIGINT on both sides; double aggregates
that accumulate in engine-dependent order are rounded on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mpg_data_warehouse_spark.operators.aggregates import (
    string_agg_ordered_limited,
)
from mpg_data_warehouse_spark.operators.complete import complete_map
from mpg_data_warehouse_spark.operators.ranking import topk_per_group
from mpg_data_warehouse_spark.operators.sampling import (
    split_train_holdout,
    stratified_sample,
)
from mpg_data_warehouse_spark.sources.readers import read_events
from mpg_data_warehouse_spark.operators.text import (
    term_counts,
    tfidf,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


# Queries whose builders hold corpus-sized storage internally
# (persist / cache / localCheckpoint): measured as the RDD-storage
# leak set at r9 (every other contract query leaves storage clean).
_SCOPED_QUERIES = {
    "minhash_near_dup_pairs",  # verify-stage shingle-set checkpoint
    "bm25_incremental_index",  # index lifecycle postings caches
    "near_dup_retention",  # exact-pass base + CC round checkpoints
    "dsir_select",  # feature-table persist
    "quality_classifier_scores",  # shared tokenization persist
    "retrieval_dense_topk",  # chunk-embedding persist
    "hybrid_rrf_retrieval",  # chunk-embedding persist
    "simhash_near_dup_pairs",  # r13 chunk-frame persist (self-join reuse)
    "membership_semi_anti",  # r13 bloom-branch persist (count + union reuse)
    "ivf_ann_topk",  # r13 corpus persist (seed/Lloyd/assign scan reuse)
    "funnel_click_to_purchase",  # 3 drained-stream state checkpoints
    "ingest_transform_rename",  # quarantine scan cache + read-back checkpoint
    "events_multi_grain_rollup",  # r11 shared hour-grain shuffle persist
    "embedding_cosine_near_dup",  # r13 bucketed-frame persist (self-join reuse)
    "multimodal_frame_sample",  # r13 fixture fingerprint persists (pair reuse)
    "span_duplication_stats",  # r13 augmented-corpus persist (two-leg reuse)
}


def _q(name: str, oracle: str | None = None, scoped: bool = False):
    """Register a contract query (+ its DuckDB oracle). ``scoped=True``
    (or membership in ``_SCOPED_QUERIES``) routes the build through
    ``session.run_scoped``: the query's internal persists / caches /
    localCheckpoints are released deterministically once the (small)
    result is materialized — the scoped-caching contract for builders
    with corpus-sized cached intermediates, so a long-lived driver
    composing many queries never accumulates dead storage (the r8
    session-age artifact)."""

    def deco(fn: QueryFn) -> QueryFn:
        if scoped or name in _SCOPED_QUERIES:
            from functools import wraps

            from mpg_data_warehouse_spark.session import run_scoped

            @wraps(fn)
            def scoped_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
                return run_scoped(spark, lambda: fn(spark, sf_dir))

            QUERIES[name] = scoped_fn
        else:
            QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as a usable (UTC) TIMESTAMP, whatever
    the physical parquet layout — see ``sources.readers.read_events``
    for the dtype-branching contract (nanos-long, TIMESTAMP_NTZ, and
    TIMESTAMP layouts all normalize to the same instants)."""
    return read_events(spark, os.path.join(sf_dir, "events.parquet"))


def _docs(
    spark: SparkSession, sf_dir: str, cols: tuple = ("doc_id", "text")
) -> DataFrame:
    """documents table spread across cores: the driver parquet is a
    single row-group (one scan task), so the tokenize/shingle/md5
    pipelines downstream would run single-threaded without this tiny
    repartition shuffle.

    The partition count is derived from the compressed file size
    (~4 MB of parquet per partition — text compresses ~5×, so that is
    ~20 MB in flight per task), floored at the session's scheduling
    width and capped at 4× it; a corpus big enough to carry multiple
    row groups splits at the scan and skips the shuffle entirely."""
    path = os.path.join(sf_dir, "documents.parquet")
    docs = _t(spark, sf_dir, "documents").select(*cols)
    try:
        n_files = docs.rdd.getNumPartitions()
        size = os.path.getsize(path)
    except OSError:
        return docs.repartition(spark.sparkContext.defaultParallelism)
    width = spark.sparkContext.defaultParallelism
    if n_files >= width:
        return docs
    target = max(width, min(4 * width, 1 + size // (4 << 20)))
    return docs.repartition(int(target))


# ---------------------------------------------------------------------------
# Flagship: A1 group-count-scaled → A8 complete() → J1 dim join → P5 filter.
# The ground-cover %-cover wrangle (reference
# notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:301-762) with
# lineitem as point_intercept_ground, l_returnflag as the ground code,
# orders as survey_metadata.
# ---------------------------------------------------------------------------


@_q(
    "ground_cover_pct_complete",
    """
    WITH agg AS (
      SELECT l_orderkey, l_returnflag,
             count(*) / 2.0 AS intercepts_pct
      FROM lineitem GROUP BY l_orderkey, l_returnflag
    ),
    grid AS (
      SELECT k.l_orderkey, c.l_returnflag
      FROM (SELECT DISTINCT l_orderkey FROM lineitem) k
      CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) c
    )
    SELECT g.l_orderkey, g.l_returnflag,
           COALESCE(a.intercepts_pct, 0.0) AS intercepts_pct,
           o.o_orderpriority,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year
    FROM grid g
    LEFT JOIN agg a
      ON g.l_orderkey = a.l_orderkey AND g.l_returnflag = a.l_returnflag
    LEFT JOIN orders o ON g.l_orderkey = o.o_orderkey
    WHERE year(o.o_orderdate) > 1995
    """,
)
def ground_cover_pct_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The year predicate is pushed below the grid build (semi-join
    of the fact against the filtered order keys) — the final filter
    would otherwise discard ~60% of completed rows after paying for
    them; same discipline as the reference's pre-complete() filter
    (gridVeg_groundCover_intercepts_WRANGLE.ipynb:315-318)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    dim = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).filter(F.col("o_year") > 1995)
    li = lineitem.join(
        F.broadcast(dim.select("o_orderkey")),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    agg = li.groupBy("l_orderkey", "l_returnflag").agg(
        (F.count(F.lit(1)) / F.lit(2.0)).alias("intercepts_pct")
    )
    # map-strategy completion (r5): one shuffle of the aggregate and
    # a map-side 3-flag explode, replacing the grid build + grid-
    # sized left join; the plan reads the fact once for the agg and
    # once for the (column-pruned) domain distinct.
    filled = complete_map(
        agg,
        expand=["l_returnflag"],
        nesting=["l_orderkey"],
        fill={"intercepts_pct": 0.0},
        # the expand domain is pinned to the UNFILTERED fact's flags
        # (the oracle's grid) — the semi-join must not narrow it
        expand_values=lineitem,
    )
    return (
        filled.join(F.broadcast(dim), filled.l_orderkey == dim.o_orderkey)
        .select(
            "l_orderkey",
            "l_returnflag",
            "intercepts_pct",
            "o_orderpriority",
            "o_year",
        )
    )


# --- S5/P1/P2/F5/F10: projected scan + rename + derived sequence column ---


@_q(
    "ingest_transform_rename",
    """
    SELECT o_orderkey AS survey_id,
           o_custkey  AS grid_point,
           CAST(year(o_orderdate) AS BIGINT) AS year,
           CASE WHEN year(o_orderdate) IN (1995, 1996) THEN '1995-96'
                ELSE CAST(CAST(year(o_orderdate) AS BIGINT) AS VARCHAR)
           END AS survey_sequence,
           o_orderpriority AS surveyor
    FROM orders
    """,
)
def ingest_transform_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest transform shape (reference P1 rename map + F10
    survey_sequence derivation, src/survey_metadata_update.py:45-81).

    r10 folds the full FileMaker-shaped INGEST LIFECYCLE under this
    query's UNCHANGED oracle (plain SQL over the parquet orders
    table), contract-verifying the previously unit-only source/sink
    families in one lineage:

    - **S14 local CSV sink**: the orders slice is exported to a real
      CSV directory with dates formatted ``M/d/yy`` (the FileMaker
      export shape, reference src/survey_metadata_update.py:35-42);
    - **S2 quarantine split**: a deliberately malformed line is
      injected into the staged export and the re-read runs through
      ``read_csv_with_quarantine`` — the hash can only match if the
      quarantine catches EXACTLY the injected line (a missed bad row
      adds a row; an over-eager split drops one);
    - **S1/S3/F1 CSV scan + M/d/yy parse with the pandas 69-pivot**:
      two-digit years 92-98 must land back on the original 19xx dates
      for the hash to hold; the 20xx side of the pivot is checked
      in-query on a +30-year shadow column (22-28 → 2022-2028) read
      back through the **S2 encoding-fallback** reader;
    - **S15 read-through cache**: the transform materializes through
      ``cached_or_compute`` twice — miss (compute + persist) then hit
      (the recompute thunk RAISES, so a hit that recomputes fails);
    - **S12 truncate-replace**: a decoy table is pre-written at the
      live path and overwritten via ``write_overwrite``; any decoy
      row surviving breaks the hash;
    - the returned frame is read back from the replaced table (S4),
      eagerly checkpointed, and the staging directory removed (no
      temp-dir debris per invocation; registered scoped so the
      quarantine scan cache and the checkpoint are released too).
    """
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from mpg_data_warehouse_spark.functions.dates import parse_date_mdyy
    from mpg_data_warehouse_spark.sources.readers import (
        cached_or_compute,
        read_csv_with_fallback,
        read_csv_with_quarantine,
        read_table,
    )
    from mpg_data_warehouse_spark.sources.writers import write_overwrite

    orders = _t(spark, sf_dir, "orders")
    staged = tempfile.mkdtemp(prefix="ingest_lifecycle_")
    export_dir = os.path.join(staged, "export_csv")
    try:
        # --- S14: local CSV sink, FileMaker M/d/yy date encoding ---
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "M/d/yy").alias("o_orderdate"),
            F.date_format(
                F.add_months("o_orderdate", 360), "M/d/yy"
            ).alias("o_shifted"),
            "o_orderpriority",
        ).write.mode("overwrite").option("header", "true").csv(export_dir)
        # inject one malformed line (non-numeric key) as an extra part
        # file — the quarantine split must catch exactly this row
        with open(os.path.join(export_dir, "part-malformed.csv"), "w") as fh:
            fh.write("o_orderkey,o_custkey,o_orderdate,o_shifted,o_orderpriority\n")
            # keys malformed (the quarantine trigger); dates stay
            # parseable so Catalyst may evaluate the shadow-column
            # parse before the null-key filter without an ANSI raise
            fh.write("not_a_key,42,6/1/95,6/1/25,0-BROKEN\n")
        schema = T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_custkey", T.LongType()),
                T.StructField("o_orderdate", T.StringType()),
                T.StructField("o_shifted", T.StringType()),
                T.StructField("o_orderpriority", T.StringType()),
            ]
        )
        # --- S2 (quarantine split) + S1 CSV scan ---
        good, bad = read_csv_with_quarantine(spark, export_dir, schema)
        n_bad = bad.count()
        if n_bad != 1:
            raise AssertionError(
                f"quarantine caught {n_bad} rows, expected exactly the "
                "1 injected malformed line"
            )
        # --- S2 (encoding fallback) + F1 20xx pivot side: the shadow
        # column's years 22-28 must parse to 2022-2028, i.e. exactly
        # original date + 360 months (the 19xx side is proven by the
        # oracle hash on the main column) ---
        probe = read_csv_with_fallback(
            spark, export_dir, schema=schema,
            encodings=("UTF-8", "ISO-8859-1"),
        ).filter(F.col("o_orderkey").isNotNull())
        n_pivot_bad = probe.filter(
            parse_date_mdyy("o_shifted")
            != F.add_months(parse_date_mdyy("o_orderdate"), 360)
        ).count()
        if n_pivot_bad:
            raise AssertionError(
                f"{n_pivot_bad} rows mis-pivoted on the 20xx side of "
                "the M/d/yy two-digit-year parse"
            )
        # --- S3/F1: date parse (19xx pivot side, under the hash) +
        # the P1/F10 transform itself ---
        year = F.year(parse_date_mdyy("o_orderdate")).cast("long")
        transformed = good.select(
            F.col("o_orderkey").alias("survey_id"),
            F.col("o_custkey").alias("grid_point"),
            year.alias("year"),
            F.when(year.isin(1995, 1996), F.lit("1995-96"))
            .otherwise(year.cast("string"))
            .alias("survey_sequence"),
            F.col("o_orderpriority").alias("surveyor"),
        )
        # --- S15: read-through cache — miss branch computes and
        # persists, hit branch must NOT invoke the thunk ---
        cache_path = os.path.join(staged, "interim_cache")
        cached_or_compute(spark, cache_path, lambda: transformed)

        def _must_not_recompute() -> DataFrame:
            raise AssertionError(
                "read-through cache HIT recomputed despite the cache "
                "file existing"
            )

        interim = cached_or_compute(spark, cache_path, _must_not_recompute)
        # --- S12: truncate-replace over a pre-existing decoy table ---
        live_path = os.path.join(staged, "live_table")
        interim.limit(7).withColumn(
            "surveyor", F.lit("__decoy__")
        ).write.parquet(live_path)
        write_overwrite(interim, live_path)
        # --- S4 read-back; materialize so the staging dir can go ---
        out = read_table(spark, live_path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return out


# --- J6 signature anti-join + P9/J9 semi-join membership as one
# tagged union (registry-consolidated from anti_join_new_keys +
# semi_join_existing). Each branch keeps its original tables and join
# direction; the union is plan-level only. ---


@_q(
    "membership_semi_anti",
    """
    SELECT 'new_key' AS membership, c.c_custkey AS entity_key,
           c.c_name AS entity_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) < 1996
    )
    UNION ALL
    SELECT 'existing' AS membership, p.p_partkey AS entity_key,
           p.p_name AS entity_name
    FROM part p
    WHERE EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    """,
)
def membership_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti branch is the J6 signature ingest op: batch (customers)
    minus the keys the warehouse already has (pre-1996 order activity
    plays the existing table — the full orders set covers every
    customer at sf0.01, which would make the anti-join vacuously
    empty and the check worthless). Since r6 the anti branch runs
    through the BLOOM TWO-TIER membership path
    (operators/bloom.py::two_tier_new_rows — the 100 TB continual-
    ingest design: the filter's "definitely new" majority skips the
    corpus anti-join entirely, only maybe-seen suspects pay it),
    while the oracle stays the plain NOT EXISTS: the hash is the
    external proof that the filter has zero false negatives and the
    exact second tier removes every false positive. Semi branch is
    the P9/J9 membership probe (parts with lineitem activity)."""
    from mpg_data_warehouse_spark.operators.bloom import (
        bloom_build,
        two_tier_new_rows,
    )

    customer = _t(spark, sf_dir, "customer")
    existing_keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") < 1996)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    flt = bloom_build(existing_keys, "c_custkey", n_bits=1 << 20, k=7)
    new_keys = two_tier_new_rows(
        customer.select("c_custkey", "c_name"),
        existing_keys,
        "c_custkey",
        flt,
        n_bits=1 << 20,
        k=7,
    ).select(
        F.lit("new_key").alias("membership"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
    )
    # r10: fold the A11 APPEND-RECONCILIATION lifecycle under this
    # hash (reference row-count reconciliation
    # notebooks/update_gridVeg_survey_metadata.ipynb:1257-1278). The
    # warehouse table is staged with exactly the NOT-new customers
    # (those with pre-1996 activity), the full customer batch is
    # delivered through operators.append.anti_join_append, and the
    # AppendResult must (a) reconcile (prev + appended == actual),
    # (b) append exactly the rows the oracle-verified Bloom branch
    # emits, and (c) append ZERO on redelivery (the idempotence
    # guarantee, §5). Any drift in the append/anti-join arithmetic
    # fails the slot even though the returned rows come from the
    # Bloom path — the binding is the count equality.
    import shutil
    import tempfile

    from mpg_data_warehouse_spark.operators.append import anti_join_append

    staged = tempfile.mkdtemp(prefix="append_recon_")
    table = os.path.join(staged, "customer_warehouse")
    try:
        batch = customer.select("c_custkey", "c_name")
        # the Bloom-branch count and the staged-table write are
        # independent jobs — overlap them (the shared engine helper)
        # so the recon setup costs max(legs), not their sum. new_keys
        # is PERSISTED (r13) — the count materializes the cache and
        # the final union re-reads it instead of re-running the whole
        # Bloom branch (the r12 cut paid one extra dim-sized
        # evaluation per collect); persist, unlike a checkpoint,
        # keeps the branch's executed plan visible inside the
        # InMemoryRelation for the digest, and the query is
        # registered scoped so the cache is released with the result.
        from mpg_data_warehouse_spark.concurrency import await_all

        new_keys = new_keys.persist()
        n_new, _ = await_all(
            new_keys.count,
            lambda: batch.join(
                existing_keys.distinct(), on="c_custkey", how="left_semi"
            ).write.parquet(table),
        )
        res = anti_join_append(spark, batch, table, keys=["c_custkey"])
        replay = anti_join_append(spark, batch, table, keys=["c_custkey"])
        if not (res.reconciled and replay.reconciled):
            raise AssertionError(f"append reconciliation failed: {res} / {replay}")
        if res.appended_rows != n_new or replay.appended_rows != 0:
            raise AssertionError(
                f"append lifecycle drift: appended {res.appended_rows} "
                f"(bloom branch says {n_new}), replay {replay.appended_rows}"
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    in_lineitem = (
        part.join(
            lineitem, part.p_partkey == lineitem.l_partkey, "left_semi"
        )
        .select(
            F.lit("existing").alias("membership"),
            F.col("p_partkey").alias("entity_key"),
            F.col("p_name").alias("entity_name"),
        )
    )
    return new_keys.unionByName(in_lineitem)


# --- J2/J3: multi-way left-join enrichment (broadcast dims) ---


@_q(
    "multi_way_join_enrich",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderpriority, c.c_mktsegment, n.n_name, r.r_name
    FROM lineitem l
    LEFT JOIN orders   o ON l.l_orderkey  = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey   = c.c_custkey
    LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
    """,
)
def multi_way_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-deep left-join chain (reference J2,
    src/analyze_gridveg_dates_pattern.py:32-91). nation/region are
    broadcast — at 100 TB the fact side never shuffles for them.

    r12: the region leg routes through ``operators.joins.salted_join``
    so the skew-salting fallback's result identity is priced under
    this slot's oracle hash (r11 VERDICT missing 4 — it was
    tool-verified only). Salting composes with broadcast: the
    exploded 5-row dim is still broadcast (16 salts × 5 rows), the
    fact side never shuffles, and unmatched/NULL-key rows keep LEFT
    semantics — so the fold prices correctness at zero plan cost;
    the skew VALUE is bench-proven separately
    (tools/skew_compare.py, BENCH_SCALE.md r11)."""
    from mpg_data_warehouse_spark.operators.joins import salted_join

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        salted_join(
            l.join(o, l.l_orderkey == o.o_orderkey, "left")
            .join(c, o.o_custkey == c.c_custkey, "left")
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left"),
            F.broadcast(r.withColumnRenamed("r_regionkey", "n_regionkey")),
            on=["n_regionkey"],
            how="left",
            # row-content salt over columns the plan already reads:
            # per-row spread even though the 5-value region key is
            # maximally hot, and column pruning stays intact
            salt_cols=["l_orderkey", "l_linenumber"],
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "o_orderpriority",
            "c_mktsegment",
            "n_name",
            "r_name",
        )
    )


# --- A3: group-count → HAVING n>1 (duplicate detection) ---


@_q(
    "group_multiples_having",
    """
    SELECT l_orderkey, l_partkey, count(*) AS n
    FROM lineitem
    GROUP BY l_orderkey, l_partkey
    HAVING count(*) > 1
    """,
)
def group_multiples_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_orderkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# --- A4: per-group count-distinct ---


@_q(
    "lineitem_flag_profile",
    """
    WITH prof AS (
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_discount > 0.05) AS n_high_discount,
             count(*) FILTER (WHERE l_tax = 0)         AS n_no_tax,
             count(*) AS n_rows,
             count(DISTINCT l_suppkey) AS n_suppliers,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_xy,
             round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_xy,
             round(stddev_samp(l_quantity), 6) AS stddev_x,
             round(stddev_samp(l_extendedprice), 6) AS stddev_y
      FROM lineitem GROUP BY l_returnflag
    ),
    -- bottom-256 quantile-sketch replay (operators/sketch.py): the
    -- sample is the 256 rows with the smallest 56-bit id-hashes,
    -- the estimate the lower order statistic of its values
    qs_ranked AS (
      SELECT l_returnflag, v,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY h, v) AS r
      FROM (
        SELECT l_returnflag,
               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                                        || '|'
                                        || CAST(l_linenumber AS VARCHAR)),
                                   1, 14) AS BIGINT) AS h,
               l_extendedprice AS v
        FROM lineitem WHERE l_extendedprice IS NOT NULL
      )
    ),
    qsamp AS (
      SELECT l_returnflag, list(v ORDER BY v) AS vs
      FROM qs_ranked WHERE r <= 256 GROUP BY l_returnflag
    ),
    qest AS (
      SELECT l_returnflag,
             vs[CAST(floor(0.5 * (len(vs) - 1)) AS INT) + 1] AS qs_p50
      FROM qsamp
    )
    SELECT p.*, q.qs_p50
    FROM prof p LEFT JOIN qest q USING (l_returnflag)
    """,
)
def lineitem_flag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 univariate profiling, plus (r9) the mergeable bottom-k
    QUANTILE sketch under the same hash: per-flag sketches are built
    at a FINER grain (flag × l_linenumber%4) and quantile_merge'd up
    to the flag — the emitted ``qs_p50`` next to the exact ``p50`` is
    the oracle-replayed proof that sketch merge ≡ direct build for
    the order-statistics family (the hour→day re-aggregation HLL/KMV/
    CMS already prove for theirs), and that the deterministic
    bottom-k sample (md5 id-hash order) is engine-portable."""
    from mpg_data_warehouse_spark.operators.aggregates import (
        corr_aggs,
        quantile_aggs,
    )
    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_estimate,
        quantile_merge,
        quantile_sketch,
    )

    lineitem = _t(spark, sf_dir, "lineitem")
    prof = lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_discount"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_no_tax"),
        F.count(F.lit(1)).alias("n_rows"),
        # A4 per-group count-distinct (re-homed here when
        # distinct_count_per_year rotated out of the registry)
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        *quantile_aggs("l_extendedprice"),
        *corr_aggs("l_quantity", "l_extendedprice"),
    )
    fine = quantile_sketch(
        lineitem.withColumn("_sub", (F.col("l_linenumber") % 4).cast("int")),
        ["l_returnflag", "_sub"],
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        k=256,
    )
    qs = quantile_merge(fine.drop("_sub"), ["l_returnflag"], k=256).select(
        "l_returnflag",
        quantile_estimate(F.col("qs_sample"), 0.5).alias("qs_p50"),
    )
    return prof.join(qs, "l_returnflag", "left")


# --- A6: ordered, limited string agg ---


@_q(
    "string_agg_top3_dates",
    """
    SELECT l_returnflag,
           array_to_string(
             list_slice(
               list_sort(list(CAST(CAST(l_shipdate AS DATE) AS VARCHAR))),
               1, 3),
             ',') AS first_dates
    FROM lineitem GROUP BY l_returnflag
    """,
)
def string_agg_top3_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_day", F.col("l_shipdate").cast("date")
    )
    return string_agg_ordered_limited(
        lineitem, ["l_returnflag"], "ship_day", 3, "first_dates"
    )


# --- A7: distinct projection dedup ---


# Passage-level duplicate-span stats (extension; Lee et al. 2021
# arXiv:2107.06499 ExactSubstr at window granularity). The synthetic
# corpus has no organic 10-token duplicate passages across docs, so the
# query injects them deterministically: every 10th doc donates its
# first 10-token window to a new doc (id + 1,000,000) whose remaining
# text is uppercased (so ONLY the donated window can collide). The
# operator must then report, per doc, how many of its fixed token
# windows are corpus-duplicated — including the organic short-tail
# collisions the tiny synthetic vocabulary produces. Registry slot
# freed by distinct_dedup (A7 ``.distinct()`` stays externally verified
# through species_richness_union_dedup's union-dedup stage).
@_q(
    "span_duplication_stats",
    r"""
    WITH aug0 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(
               (regexp_split_to_array(trim(text), '\s+'))[1:10], ' ')
               || ' ' || upper(text) AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    -- every 3rd doc gains two identical trailing lines (its first 5
    -- tokens) so the INTRA-doc line/ngram repetition signals see
    -- real duplicates (operators/text.py::repetition_signals fold)
    aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || chr(10)
                 || array_to_string(
                      (regexp_split_to_array(trim(text), '\s+'))[1:5], ' ')
                 || chr(10)
                 || array_to_string(
                      (regexp_split_to_array(trim(text), '\s+'))[1:5], ' ')
             ELSE text END AS text
      FROM aug0
    ),
    toked AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS toks
      FROM aug
    ),
    spans AS (
      SELECT doc_id, CAST(i AS INT) AS span_idx,
             md5(array_to_string(toks[(i*10+1):(i*10+10)], ' '))
               AS span_hash
      FROM toked,
           UNNEST(range(greatest(
             CAST(ceil((len(toks)-10)/10.0) AS BIGINT)+1, 1))) AS u(i)
    ),
    counts AS (
      SELECT span_hash, count(*) AS n_occ FROM spans GROUP BY span_hash
    ),
    lines AS (
      SELECT doc_id, regexp_split_to_array(text, chr(10)) AS ls FROM aug
    ),
    linestats AS (
      SELECT doc_id,
             round((len(ls) - len(list_distinct(ls))) * 1.0 / len(ls), 4)
               AS dup_line_frac
      FROM lines
    ),
    bg AS (
      SELECT doc_id, toks[CAST(i AS INT)] || ' '
               || toks[CAST(i AS INT) + 1] AS g
      FROM toked, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    bstats AS (
      SELECT doc_id, round(max(c) * 1.0 / sum(c), 4) AS top_bigram_frac
      FROM bgc GROUP BY doc_id
    )
    SELECT s.doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN c.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(sum(CASE WHEN c.n_occ >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS dup_span_frac,
           any_value(l.dup_line_frac) AS dup_line_frac,
           COALESCE(any_value(b.top_bigram_frac), 0.0) AS top_bigram_frac
    FROM spans s
    JOIN counts c USING (span_hash)
    JOIN linestats l ON l.doc_id = s.doc_id
    LEFT JOIN bstats b ON b.doc_id = s.doc_id
    GROUP BY s.doc_id
    """,
)
def span_duplication_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-passage fraction over a deterministic
    injected-duplicate corpus (operators.dedup.span_duplication_stats:
    tile → 32-byte window hashes → one hash-keyed aggregate → per-doc
    rollup; span text never shuffles past the map stage).

    r8 folds the Gopher-rule INTRA-doc repetition family (Rae et al.
    2021 Table A1; operators/text.py::repetition_signals →
    duplicate_line_fraction in-row array math + top-bigram share)
    under this hash: every 3rd aug doc gains two identical trailing
    lines, so the line-dup signal is exercised against real
    duplicates while the oracle recomputes both signals from plain
    unnest+GROUP BY SQL."""
    from mpg_data_warehouse_spark.operators import dedup as D
    from mpg_data_warehouse_spark.operators import text as X

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    donated = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.slice(X.tokens("text"), 1, 10)),
            F.upper(F.col("text")),
        ).alias("text"),
    )
    head5 = F.concat_ws(" ", F.slice(X.tokens("text"), 1, 5))
    # r13 (guide §2.4): the span leg AND the repetition leg both
    # consume the augmented corpus, and without a materialization each
    # re-ran the whole aug construction — two parquet scans plus two
    # evaluations of the regexp-tokenize / slice / upper / concat
    # machinery (the expensive part: regexp over every document's full
    # text). One persist builds it once; MEMORY_AND_DISK spills at
    # corpus scale. Registered scoped so the cache releases with the
    # result.
    aug = (
        docs.unionByName(donated)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit("\n"),
                    head5,
                    F.lit("\n"),
                    head5,
                ),
            ).otherwise(F.col("text")),
        )
        .persist()
    )
    spans = D.span_duplication_stats(
        aug, id_col="doc_id", text_col="text", span_tokens=10, stride=10
    )
    rep = X.repetition_signals(aug, id_col="doc_id", text_col="text")
    return spans.join(rep, "doc_id")


# --- W1: analytic partition count over a CASE category ---


@_q(
    "window_partition_count",
    """
    SELECT event_id,
           CASE WHEN value >= 100 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS category,
           count(*) OVER (
             PARTITION BY CASE WHEN value >= 100 THEN 'high'
                               WHEN value >= 50  THEN 'mid'
                               ELSE 'low' END
           ) AS category_count,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def window_partition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only window function (W1:
    COUNT(*) OVER (PARTITION BY CASE ...),
    src/analyze_gridveg_dates_pattern.py:73-79), plus the JSON scalar
    extraction from the props column (SURVEY §2.8 extension surface;
    registry-consolidated from json_extract_props — same event grain,
    one extra narrow projection on the same scan)."""
    events = _events(spark, sf_dir)
    category = (
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
    )
    df = events.withColumn("category", category)
    # r13 NOTE (measured, kept as-is): COUNT(*) OVER (PARTITION BY a
    # 3-value key) concentrates the window stage on 3 reducer tasks —
    # a genuine hot-key shape at 100 TB, where the fix is a 3-row
    # partial aggregate broadcast-joined back (event rows never
    # shuffle). That rewrite was BUILT and A/B-measured this round:
    # 0.71 s → 1.48 s at sf0.1 (reps=9 medians, same window) — the
    # per-run broadcast-build latency plus the second scan cost ~2×
    # the whole slot at bench scale, where shuffling 100 K narrow rows
    # is nearly free. Reverted; the agg+broadcast form is the
    # documented scale-up escape hatch, not the right local plan.
    return df.select(
        "event_id",
        "category",
        F.count(F.lit(1))
        .over(W.partitionBy("category"))
        .alias("category_count"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# --- U1/J8: both-direction anti-join + tagged union ---


@_q(
    "null_audit_events",
    """
    SELECT count(*) FILTER (WHERE event_id IS NULL)   AS event_id_nulls,
           count(*) FILTER (WHERE ts IS NULL)         AS ts_nulls,
           count(*) FILTER (WHERE user_id IS NULL)    AS user_id_nulls,
           count(*) FILTER (WHERE event_type IS NULL) AS event_type_nulls,
           count(*) FILTER (WHERE value IS NULL)      AS value_nulls,
           count(*) FILTER (WHERE props IS NULL)      AS props_nulls,
           count(*) AS total_rows,
           count(*) FILTER (WHERE event_id IS NULL OR ts IS NULL
                               OR user_id IS NULL OR event_type IS NULL
                               OR value IS NULL OR props IS NULL)
             AS any_null_rows_n,
           CAST(count(*) FILTER (WHERE event_id IS NULL)
                + count(*) FILTER (WHERE ts IS NULL)
                + count(*) FILTER (WHERE event_type IS NULL) AS BIGINT)
             AS required_violations
    FROM events
    """,
)
def null_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 per-column null audit (one pass, map-side partials). r10
    folds the remaining null-gate families under this oracle:

    - **P12 any-null row filter** (``sources.readers.any_null_rows``,
      reference fix_gridVeg_additional_species_na_rows.ipynb:453-454):
      the filter's row count is emitted as ``any_null_rows_n`` and
      replayed by the oracle's OR-of-nulls count;
    - **P13 required-field gate** (``operators.validate.validate``,
      reference src/survey_metadata_update.py:103-114): the gate runs
      over (event_id, ts, event_type) and its total violation count —
      the per-column sums the reference loops for — is emitted as
      ``required_violations``.
    """
    from mpg_data_warehouse_spark.operators.validate import validate
    from mpg_data_warehouse_spark.sources.readers import any_null_rows

    events = _events(spark, sf_dir)
    aggs = [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls")
        for c in events.columns
    ]
    audit = events.agg(*aggs, F.count(F.lit(1)).alias("total_rows"))
    anyn = any_null_rows(events).agg(
        F.count(F.lit(1)).alias("any_null_rows_n")
    )
    report = validate(events, required=["event_id", "ts", "event_type"])
    return audit.crossJoin(anyn).withColumn(
        "required_violations",
        F.lit(sum(report.null_violations.values())).cast("long"),
    )


# --- J4/J5: date repair from authoritative dimension ---


@_q(
    "date_repair_from_dim",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(CAST(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                          THEN o.o_orderdate ELSE l.l_shipdate END
                     AS DATE) AS VARCHAR)
             AS repaired_date,
           CAST(year(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                          THEN o.o_orderdate ELSE l.l_shipdate END) AS BIGINT)
             AS repaired_year
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def date_repair_from_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The date-corruption repair shape (reference J4/J5,
    src/fix_gridveg_dates.py:85-133): out-of-envelope fact dates are
    replaced from the anchor dimension, year re-derived."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = l.join(o, l.l_orderkey == o.o_orderkey, "left")
    corrupted = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    repaired = F.when(corrupted, F.col("o_orderdate")).otherwise(
        F.col("l_shipdate")
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        # ISO string, not DateType: pandas materializes DuckDB DATE as
        # datetime64 but Spark DateType as date objects — strings are
        # representation-proof across the comparison boundary.
        repaired.cast("date").cast("string").alias("repaired_date"),
        F.year(repaired).cast("long").alias("repaired_year"),
    )


# --- P10/P6: regex + sentinel filters ---


@_q(
    "regex_sentinel_filter",
    r"""
    WITH base AS (
      SELECT doc_id, lang, source,
             text || CASE WHEN doc_id % 2 = 0
                          THEN ' contact u' || CAST(doc_id AS VARCHAR)
                               || '@ex.com'
                          ELSE '' END
                  || ' ref ' || CAST(doc_id + 10000000 AS VARCHAR) AS pt
      FROM documents
      WHERE regexp_matches(lang, '^[a-z]{2}$') AND lang <> 'zh'
    )
    SELECT doc_id, lang, source,
           CAST(len(regexp_extract_all(pt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{4,}\b'))
             AS BIGINT) AS pii_hits,
           md5(regexp_replace(pt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{4,}\b',
             '[REDACTED]', 'g')) AS clean_fp
    FROM base
    """,
)
def regex_sentinel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format validation (reference P10 ^[NSEW]\\d{1,2}$) + sentinel
    value removal (P6 key_plant_code != 'NV') — 3-valued-logic `!=`
    drops NULLs on both engines, matching the dplyr/SQL sites.

    r8 folds PII redaction (operators/text.py::redact /
    redaction_count — RE2-safe email + long-digit patterns, a pure
    narrow-map scrub) under this hash: deterministic synthetic PII
    (an email on every even doc, a numeric ref on all) is appended,
    counted, scrubbed, and fingerprinted; the oracle replays the
    identical regex in DuckDB's RE2, proving the pattern dialect is
    engine-portable — the property the scrub relies on when the same
    policy file drives Spark and downstream scanners."""
    from mpg_data_warehouse_spark.operators import text as X

    docs = _t(spark, sf_dir, "documents")
    kept = docs.filter(
        F.col("lang").rlike(r"^[a-z]{2}$") & (F.col("lang") != "zh")
    )
    pii_text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@ex.com"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" ref "),
        (F.col("doc_id") + 10000000).cast("string"),
    )
    return kept.withColumn("_pt", pii_text).select(
        "doc_id",
        "lang",
        "source",
        X.redaction_count(F.col("_pt")).alias("pii_hits"),
        F.md5(X.redact(F.col("_pt"))).alias("clean_fp"),
    )


# --- A10/F2 frequency tables: date-component value counts AND a
# fixed-width numeric histogram as one tagged union (registry-
# consolidated from value_counts_by_month + histogram_extendedprice).
# Each branch is its own scan + one tiny post-combine shuffle; the
# union is plan-level only (no extra exchange). ---


@_q(
    "frequency_tables",
    """
    WITH zb AS (
      SELECT CAST(min(l_suppkey) AS DOUBLE) AS lo1,
             CAST(max(l_suppkey) AS DOUBLE) AS hi1,
             CAST(min(l_partkey) AS DOUBLE) AS lo2,
             CAST(max(l_partkey) AS DOUBLE) AS hi2
      FROM lineitem
    ),
    -- Morton replay (writers.py::zorder_value, bits=16): min-max
    -- normalize each key into 16 bits (truncating cast, clamped),
    -- interleave via shift-mask terms — bits are disjoint so the
    -- bit-OR chain equals this sum
    zn AS (
      SELECT least(65535, greatest(0, CAST(trunc(
               (l_suppkey - lo1)
               / (CASE WHEN hi1 - lo1 = 0 THEN 1.0 ELSE hi1 - lo1 END)
               * 65535) AS BIGINT))) AS n1,
             least(65535, greatest(0, CAST(trunc(
               (l_partkey - lo2)
               / (CASE WHEN hi2 - lo2 = 0 THEN 1.0 ELSE hi2 - lo2 END)
               * 65535) AS BIGINT))) AS n2
      FROM lineitem CROSS JOIN zb
    ),
    zv AS (
      SELECT list_sum(list_transform(range(0, 16),
               i -> (((n1 >> i) & 1) << (2 * i))
                    + (((n2 >> i) & 1) << (2 * i + 1)))) AS z
      FROM zn
    )
    SELECT 'month' AS kind,
           CAST(year(o_orderdate) AS BIGINT)  AS k1,
           CAST(month(o_orderdate) AS BIGINT) AS k2,
           count(*) AS n
    FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
    UNION ALL
    SELECT 'price_bucket' AS kind,
           CAST(least(floor(l_extendedprice / 5000.0), 20) AS BIGINT) AS k1,
           CAST(NULL AS BIGINT) AS k2,
           count(*) AS n
    FROM lineitem
    GROUP BY 2
    UNION ALL
    SELECT 'zorder_bucket' AS kind,
           CAST(z >> 22 AS BIGINT) AS k1,
           CAST(NULL AS BIGINT) AS k2,
           count(*) AS n
    FROM zv
    GROUP BY 1, 2
    """,
)
def frequency_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 adds a third leg: a histogram over the Morton
    (Z-order) key of (l_suppkey, l_partkey) — the bit-interleave
    algebra `writers.zorder_value` clusters files by, externally
    verified (the oracle replays normalize → truncating cast → clamp
    → 32 shift-mask terms exactly). Bounds come from one min/max
    aggregate, same as `write_zordered`."""
    from mpg_data_warehouse_spark.operators.aggregates import histogram_fixed
    from mpg_data_warehouse_spark.sources.writers import zorder_value

    orders = _t(spark, sf_dir, "orders")
    months = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("k1"),
            F.month("o_orderdate").cast("long").alias("k2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("month").alias("kind"), "k1", "k2", "n")
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    hist = histogram_fixed(lineitem, "l_extendedprice", 5000.0, 20).select(
        F.lit("price_bucket").alias("kind"),
        F.col("bucket").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        "n",
    )
    b = lineitem.agg(
        F.min("l_suppkey").alias("lo1"),
        F.max("l_suppkey").alias("hi1"),
        F.min("l_partkey").alias("lo2"),
        F.max("l_partkey").alias("hi2"),
    ).first()
    zbuckets = (
        lineitem.select(
            zorder_value(
                F.col("l_suppkey"),
                float(b["lo1"]),
                float(b["hi1"]),
                F.col("l_partkey"),
                float(b["lo2"]),
                float(b["hi2"]),
            ).alias("_z")
        )
        .groupBy(F.shiftright("_z", 22).cast("long").alias("k1"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("zorder_bucket").alias("kind"),
            "k1",
            F.lit(None).cast("long").alias("k2"),
            "n",
        )
    )
    return months.unionByName(hist).unionByName(zbuckets)


# --- O1-O3: deterministic top-k ---


@_q(
    "topk_orders_scoped",
    """
    SELECT 'all' AS scope, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 10
    UNION ALL
    SELECT o_orderpriority AS scope, CAST(rn AS BIGINT) AS rn,
           o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 5
    """,
)
def topk_orders_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O3 global top-k + per-group ranking window in one tagged
    union (registry-consolidated from top_k_orders +
    topk_orders_per_priority). The global branch plans as
    TakeOrderedAndProject — no global sort materialization; its rank
    comes from a window over the already-limited 10-row single
    partition (trivial by construction). The per-group branch is a
    row_number window with WindowGroupLimit pruning to 5 rows per
    group map-side before its exchange. Ties broken on the key so
    both row sets are engine-independent."""
    orders = _t(spark, sf_dir, "orders")
    glob = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.lit("all").alias("scope"),
            F.row_number()
            .over(W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
            .cast("long")
            .alias("rn"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    per_group = topk_per_group(
        orders,
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=5,
    ).select(
        F.col("o_orderpriority").alias("scope"),
        F.col("rn").cast("long").alias("rn"),
        "o_orderkey",
        "o_totalprice",
    )
    return glob.unionByName(per_group)


# ===========================================================================
# Extension surface: LLM-training-data pipeline operators over the
# documents / embeddings / events tables (SURVEY §7.2 step 7).
# ===========================================================================


_STOP_SQL = "('the','a','and','of','to','in','is')"
_LANG_SCORES_SQL = """
         len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
         len(list_filter(toks, x -> x IN ('the','and','of','to','a')))     AS s_en,
         len(list_filter(toks, x -> x IN ('el','la','de','que','y')))      AS s_es,
         len(list_filter(toks, x -> x IN ('le','la','les','et','des')))    AS s_fr
"""


@_q(
    "text_profile",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text, toks, {_LANG_SCORES_SQL}
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(toks), 4) AS stopword_ratio,
           CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           md5(array_to_string(list_sort(list_distinct(toks)), ' '))
             AS fingerprint,
           round((CAST(len(toks) >= 10 AND len(toks) <= 100000 AS INT)
                + CAST(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                            AS DOUBLE) / len(toks) > 0.01 AS INT)
                + CAST((CAST(length(text) - len(toks) + 1 AS DOUBLE)
                        / len(toks)) >= 2.0
                       AND (CAST(length(text) - len(toks) + 1 AS DOUBLE)
                            / len(toks)) <= 12.0 AS INT)
                 ) / 3.0, 4) AS quality_score
    FROM scored
    """,
)
def text_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token count, stopword ratio, language-ID
    heuristic, order-insensitive content fingerprint, and the
    composite quality score (registry-consolidated from
    quality_score_docs — same doc grain, tokenized ONCE and shared
    across every metric) — all JVM-side column math (operators.text),
    one narrow map stage.

    Round 7 folds ``html.extract_html_text`` under this UNCHANGED
    hash: every document is first wrapped in deterministic HTML —
    head+script (structural strip), a nav and a footer (container
    drop), a ≥25-char link wall (dropped ONLY by the link-density
    filter), a <25-char junk div (dropped ONLY by the length filter),
    and the real text inside ``<p>`` with every space encoded as
    ``&nbsp;`` (entity-decode path) — then extracted. The profile is
    computed from the EXTRACTED text, so the oracle hash matching the
    plain-text profile proves extraction ≡ identity on content while
    removing every boilerplate block for its own distinct reason
    (operators/html.py:127)."""
    from mpg_data_warehouse_spark.operators import text as X
    from mpg_data_warehouse_spark.operators.html import extract_html_text

    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.withColumn(
        "_html",
        F.concat(
            F.lit(
                "<html><head><title>t</title><script>var x = 1 < 2;"
                "</script></head><body>"
                '<nav><a href="/">home</a> <a href="/a">about</a></nav>'
                '<div><a href="/1">alpha beta gamma delta</a> '
                '<a href="/2">epsilon zeta eta theta</a></div>'
                "<div>click here now</div><p>"
            ),
            F.replace(F.col("text"), F.lit(" "), F.lit("&nbsp;")),
            F.lit(
                '</p><footer><a href="/t">terms</a> &amp; conditions'
                "</footer></body></html>"
            ),
        ),
    )
    docs = extract_html_text(wrapped, html_col="_html", out_col="_xt").select(
        "doc_id", F.col("_xt").alias("text")
    )
    toked = docs.select("doc_id", "text", X.tokens("text").alias("_toks"))
    return toked.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        X.stopword_ratio_from(F.col("_toks")).alias("stopword_ratio"),
        X.lang_id_from(F.col("_toks")).alias("lang_pred"),
        X.doc_fingerprint_from(F.col("_toks")).alias("fingerprint"),
        X.quality_score_from(F.col("text"), F.col("_toks")).alias(
            "quality_score"
        ),
    )


# MinHash+LSH near-dup. The synthetic corpus has no organic near-dups,
# so both sides augment it with deterministic perturbed copies (every
# 10th doc, first two tokens dropped, id + 1,000,000) — the operator
# must then recover exactly those pairs that band-collide and pass
# Jaccard ≥ 0.5. Full pipeline is oracle-checked: signatures, banding,
# candidate join, and exact-Jaccard verify all reproduce in DuckDB
# because every hash is md5-derived.
# One-hash MinHash permutation family (operators/dedup.py
# minhash_signatures): per-seed constants inlined as literals so the
# oracle replays the exact same integer mix over one md5 per shingle.
from mpg_data_warehouse_spark.operators.dedup import (  # noqa: E402
    MINHASH_MOD as _MH_M,
    _minhash_seed_constants,
)

_MINHASH_SIGS = ", ".join(
    f"min(((hi * {a} + lo * {b} + {i}) % {_MH_M})) AS sig_{i}"
    for i, (a, b) in enumerate(_minhash_seed_constants(8))
)
_MINHASH_BANDS = " ".join(
    f"WHEN {b} THEN CAST(sig_{2*b} AS VARCHAR) || '|' || CAST(sig_{2*b+1} AS VARCHAR)"
    for b in range(4)
)


# Shared CTE chain: perturbed corpus → shingles → signatures → bands →
# candidates → exact-Jaccard scores. Used by the pair query and by the
# retention (connected-components) query; the latter supplies its own
# ``base`` (exact-dedup survivors), so base and body are separate.
_MINHASH_PERTURBED = """SELECT doc_id + 1000000 AS doc_id,
             array_to_string(
               list_slice(regexp_split_to_array(trim(text), '\\s+'),
                          3, 100000), ' ') AS text
      FROM documents WHERE doc_id % 10 = 0"""

_MINHASH_BODY = f"""toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM base
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(toks) - 3, 0) + 1),
               i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])
             )) AS shingles
      FROM toks
    ),
    sh AS (SELECT doc_id, unnest(shingles) AS s FROM grams),
    shh AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_MH_M} AS hi,
             CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) % {_MH_M} AS lo
      FROM sh
    ),
    sigs AS (
      SELECT doc_id, {_MINHASH_SIGS}
      FROM shh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, band,
             md5(CASE band {_MINHASH_BANDS} END) AS bucket
      FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)
    ),
    -- cap_buckets mirror (operators/dedup.py): (band, bucket) groups
    -- larger than 1000 are degenerate content and are DROPPED before
    -- the candidate join — on uniform corpora the cap never binds
    -- (hash unchanged); on zipf-skewed corpora the uncapped oracle
    -- diverged (r11 zipf parity run) until it replayed the cap too
    bandsc AS (
      SELECT doc_id, band, bucket FROM (
        SELECT doc_id, band, bucket,
               count(*) OVER (PARTITION BY band, bucket) AS _bn
        FROM bands)
      WHERE _bn <= 1000
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandsc a
      JOIN bandsc b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
      GROUP BY c.id_a, c.id_b
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM grams),
    scored AS (
      SELECT c.id_a, c.id_b,
             round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                   / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)), 4)
               AS jaccard
      FROM cands c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes za ON za.doc_id = c.id_a
      JOIN sizes zb ON zb.doc_id = c.id_b
    )"""

_MINHASH_CTES = (
    f"""base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      {_MINHASH_PERTURBED}
    ),
    """
    + _MINHASH_BODY
)


@_q(
    "minhash_near_dup_pairs",
    f"""
    WITH {_MINHASH_CTES}
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """,
)
def minhash_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mpg_data_warehouse_spark.operators.dedup import minhash_dedup_pairs
    from mpg_data_warehouse_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    perturbed = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(tokens("text"), 3, 100000)).alias("text"),
    )
    base = docs.unionByName(perturbed)
    # audit_cap_invariant (r12): the lsh_dropped_buckets audit runs
    # against the production cap and must account for EXACTLY the rows
    # cap_buckets removes — the oracle replays the cap (bandsc CTE),
    # and this invariant prices the audit of what the cap forgoes
    # under the same hash (r11 VERDICT missing 3).
    return minhash_dedup_pairs(
        base,
        num_hashes=8,
        bands=4,
        shingle_n=3,
        threshold=0.5,
        audit_cap_invariant=True,
    )


# --- Incremental BM25 index maintenance (rotated in r6; the ceded
# ann_cosine_topk's brute-force cosine executes verbatim inside the
# lsh/ivf/pq/retrieval oracles, so the exact-cosine family stays
# externally verified — COVERAGE.md §ext). ---


@_q(
    "bm25_incremental_index",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE doc_id % 7 <> 0
    ),
    tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    qt AS (
      SELECT * FROM (VALUES
        (0, 'table'), (0, 'scan'), (0, 'merge'),
        (1, 'window'), (1, 'join'), (1, 'batch')
      ) AS q(query_id, term)
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE term IN (SELECT term FROM qt) GROUP BY term
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
             ), 6) AS score
      FROM tf
      JOIN qt q ON q.term = tf.term
      JOIN dfreq d ON d.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def bm25_incremental_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE incremental-maintenance lifecycle of the ranked index
    under external verification (operators/search.py): build over two
    thirds of the corpus, CRASH a partial first delivery (an
    SF-INVARIANT ~34-doc slice of the append batch — see the crash
    comment below) between its two commits (postings durable, manifest
    absent — the one inconsistent state the append commit order can
    leave), repair with ``bm25_repair_index`` (must scrub exactly the
    crashed slice; a second repair must answer 0), deliver the FULL
    batch (an OVERLAPPING redelivery — repaired slice + fresh
    remainder, the at-least-once shape the recovery contract makes
    safe), REPLAY the same append (the _docs-manifest guard must add
    zero documents), then delete every 7th document by bare id, and
    score two queries. The oracle is plain BM25 over ``documents WHERE
    doc_id % 7 <> 0`` — a fresh build over the final corpus state — so
    the hash proves crash-repair-retry ≡ clean append, append ≡,
    replay ≡ no-op, delete ≡ rebuild, and the exact-integer ``dl_sum``
    stats arithmetic all at once. (An under-scrub leaves orphans the
    retry's manifest guard cannot see and re-inserts → duplicated
    postings break the hash; an over-scrub loses live postings →
    missing scores break it. Reference surface: the rollback/recovery
    lifecycle notebooks/update_gridVeg_survey_metadata.ipynb:1392-1402.)
    """
    import tempfile

    from mpg_data_warehouse_spark.operators import search as _search
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_delete_index,
        bm25_repair_index,
        bm25_search_many,
        build_ranked_index,
    )
    from mpg_data_warehouse_spark.operators.text import norm_tokens

    # One materialization of the corpus feeds every lifecycle phase
    # (build / crashed slice / orphan count / retry / delete ids) —
    # unpersisted, each phase re-reads AND re-repartitions the parquet
    # (~5 corpus scans per run). The slot is scoped, so the pin is
    # released once the result materializes.
    docs = _docs(spark, sf_dir).persist()
    idx = tempfile.mkdtemp(prefix="bm25_incr_contract_")
    build_ranked_index(docs.filter(F.col("doc_id") % 3 != 0), idx)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    # ---- crash injection: run the REAL append on a PARTIAL first
    # delivery and fail its manifest commit, leaving exactly the
    # orphaned-postings state the repair op exists for. The crashed
    # slice is SF-INVARIANT (r11 VERDICT 3: the crash semantics don't
    # scale with the crashed batch's size, so the fold prices a fixed
    # ~34-doc slice, not an O(corpus) partial append): doc_id < 500
    # covers the whole corpus at the correctness SF (ids are 0..499
    # at sf0.01 — behavior there is byte-identical to the unbounded
    # form) and pins the slice to the same 34 documents at every
    # larger SF. The final corpus state — and therefore the oracle
    # hash — never depends on which slice crashed.
    # Monkeypatching the commit function beats hand-staging postings:
    # the staged state can never drift from what the production code
    # actually writes. The retry below then redelivers the FULL batch
    # — an OVERLAPPING redelivery (repaired slice + fresh remainder),
    # the exact at-least-once shape the recovery contract promises to
    # make safe.
    class _InjectedCrash(Exception):
        pass

    def _boom(*a, **k):
        raise _InjectedCrash("injected crash before manifest commit")

    crashed = batch.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 500)
    )
    real_write_manifest = _search._write_manifest
    _search._write_manifest = _boom
    try:
        try:
            bm25_append_index(crashed, idx)
            raise AssertionError(
                "crash injection never fired — the append no longer "
                "routes its manifest commit through _write_manifest"
            )
        except _InjectedCrash:
            pass
    finally:
        _search._write_manifest = real_write_manifest

    # docs contributing ≥1 token — computed independently of the
    # repair's own orphan count (norm_tokens already drops empty
    # strings, so size > 0 is exactly the min_term_len=1 rule)
    expected_orphans = crashed.filter(
        F.size(norm_tokens("text")) > 0
    ).count()
    n_scrubbed = bm25_repair_index(spark, idx)
    if n_scrubbed != expected_orphans:
        raise AssertionError(
            f"bm25_repair_index scrubbed {n_scrubbed} docs, expected "
            f"{expected_orphans} (the crashed batch)"
        )
    if bm25_repair_index(spark, idx) != 0:
        raise AssertionError(
            "bm25_repair_index found orphans in a just-repaired index"
        )

    # the blind retry the repair contract promises is now safe
    bm25_append_index(batch, idx)
    # replayed delivery must be a no-op (a bare assert would vanish
    # under python -O and silently stop exercising the guard)
    n_replayed = bm25_append_index(batch, idx)
    if n_replayed != 0:
        raise AssertionError(
            f"replayed append inserted {n_replayed} docs; the _docs "
            "manifest replay guard failed"
        )
    bm25_delete_index(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), idx
    )
    return bm25_search_many(
        spark, idx, ["table scan merge", "window join batch"], k=10
    )


def _simhash_oracle_sql() -> str:
    """Full DuckDB mirror of the 64-bit SimHash pipeline.

    DuckDB's BIGINT left-shift raises on overflow instead of wrapping,
    so the unsigned 64-bit hash/fingerprint lives in HUGEINT with
    division-based bit extraction: bit b of h is (h // 2**b) % 2 —
    identical to Spark's arithmetic-shift-and-mask on the signed
    representation for every bit including 63 (verified)."""
    votes = ",\n             ".join(
        f"sum(CAST((h // {1 << b}) % 2 AS BIGINT)) AS v{b}" for b in range(64)
    )
    fp_sum = "\n           + ".join(
        f"CASE WHEN 2 * v{b} > n_sh THEN CAST({1 << b} AS HUGEINT) ELSE 0 END"
        for b in range(64)
    )
    chunk = "CAST((fp_u // {div}) % 65536 AS BIGINT)"
    chunks = ", ".join(
        chunk.format(div=1 << (16 * i)) + f" AS ck{i}" for i in range(4)
    )
    ham = " + ".join(
        f"bit_count(xor(a.ck{i}, b.ck{i}))" for i in range(4)
    )
    pair_on = " OR ".join(f"a.ck{i} = b.ck{i}" for i in range(4))
    return f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(
               list_slice(regexp_split_to_array(trim(text), '\\s+'),
                          2, 100000), ' ') AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM base
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(toks) - 2, 0) + 1),
               i -> concat_ws(' ', toks[i+1], toks[i+2])
             )) AS shingles
      FROM toks
    ),
    sh AS (SELECT doc_id, unnest(shingles) AS s FROM grams),
    hashed AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS HUGEINT)
               * 4294967296
               + CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) AS h
      FROM sh
    ),
    votes AS (
      SELECT doc_id, count(*) AS n_sh,
             {votes}
      FROM hashed GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id,
           ( {fp_sum} ) AS fp_u
      FROM votes
    ),
    ck AS (SELECT doc_id, {chunks} FROM fp),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({ham} AS BIGINT) AS hamming
      FROM ck a JOIN ck b
        ON a.doc_id < b.doc_id AND ({pair_on})
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """


@_q("simhash_near_dup_pairs", _simhash_oracle_sql())
def simhash_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, fully oracle-mirrored: md5-derived
    64-bit hashes, per-bit majority vote, 16-bit-chunk pigeonhole
    blocking, Hamming ≤ 3 — bit-identical in DuckDB HUGEINT math."""
    from mpg_data_warehouse_spark.operators.dedup import simhash_near_pairs
    from mpg_data_warehouse_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    perturbed = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(tokens("text"), 2, 100000)).alias("text"),
    )
    return simhash_near_pairs(docs.unionByName(perturbed), max_hamming=3)


def _lsh_topk_oracle_sql() -> str:
    """DuckDB mirror of lsh_topk: identical hyperplane constants,
    sign-pattern buckets, multiprobe (self + 8 Hamming-1 flips),
    bucket-keyed candidate join, exact cosine rank."""
    from mpg_data_warehouse_spark.operators.similarity import _hyperplane_values

    bucket_terms = []
    for p in range(8):
        lst = "[" + ", ".join(repr(c) for c in _hyperplane_values(64, p)) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(v, {lst}), "
            f"x -> x[1] * x[2])) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket_expr = "\n         + ".join(bucket_terms)
    probe_list = "[bucket0, " + ", ".join(
        f"xor(bucket0, {1 << p})" for p in range(8)
    ) + "]"
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, v,
           {bucket_expr} AS bucket
      FROM e
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, bucket AS bucket0 FROM b
      WHERE vec_id < 5
    ),
    probes AS (
      SELECT query_id, qv, unnest({probe_list}) AS bucket FROM q
    ),
    scored AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
             round(
               list_sum(list_transform(list_zip(p.qv, c.v),
                 x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(list_zip(p.qv, p.qv),
                    x -> x[1] * x[2])))
                * sqrt(list_sum(list_transform(list_zip(c.v, c.v),
                    x -> x[1] * x[2])))),
               6) AS cos_sim
      FROM b c JOIN probes p ON c.bucket = p.bucket
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """


@_q("lsh_ann_topk", _lsh_topk_oracle_sql())
def lsh_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k, fully oracle-mirrored
    (hyperplanes, multiprobe buckets and scoring reproduce in DuckDB);
    recall vs brute force additionally pinned by
    tests/test_similarity.py."""
    from mpg_data_warehouse_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, dim=64)


@_q(
    "sessionize_events",
    """
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > 1800000000 THEN 1 ELSE 0
             END AS is_start
      FROM o
    ),
    sess AS (
      SELECT user_id,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_num
      FROM marked
    )
    SELECT user_id, session_num, count(*) AS n_events
    FROM sess GROUP BY user_id, session_num
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + running sum
    windows — the batch analog of streaming session windows."""
    events = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    marked = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = marked.select(
        "user_id",
        F.sum("is_start").over(w2).cast("long").alias("session_num"),
    )
    return sess.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# The second wrangle pipeline: A2 group-sum → A8 complete() → J3 dim
# join → P5 filter (reference
# notebooks/gridVeg_plant_functional_groups_WRANGLE.ipynb:508-511,
# 748-752, 823-828, 951-952) — part.p_brand plays the functional-group
# role, sum(l_quantity)/2 the summed detection rate.
# ---------------------------------------------------------------------------


@_q(
    "functional_groups_detection_rate",
    """
    WITH enriched AS (
      SELECT l.l_orderkey, p.p_brand, l.l_quantity
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    agg AS (
      SELECT l_orderkey, p_brand,
             round(sum(l_quantity) / 2.0, 2) AS detection_rate
      FROM enriched GROUP BY l_orderkey, p_brand
    ),
    grid AS (
      SELECT k.l_orderkey, c.p_brand
      FROM (SELECT DISTINCT l_orderkey FROM lineitem) k
      CROSS JOIN (SELECT DISTINCT p_brand FROM part) c
    )
    SELECT g.l_orderkey, g.p_brand,
           COALESCE(a.detection_rate, 0.0) AS detection_rate,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year
    FROM grid g
    LEFT JOIN agg a
      ON g.l_orderkey = a.l_orderkey AND g.p_brand = a.p_brand
    LEFT JOIN orders o ON g.l_orderkey = o.o_orderkey
    WHERE year(o.o_orderdate) > 1995
    """,
)
def functional_groups_detection_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-groups wrangle: broadcast dim join (part is the
    species-metadata analog), group-sum, complete() with explicit
    domains, survey join, year filter.

    Grid domains come from the CHEAP sources — brands from the part
    dimension, anchors from the fact's single key column — not from
    re-executing the join+aggregate (which the default observed-
    distinct path would do twice more; TPC-H referential integrity
    makes the sets identical, and the oracle pins that).

    The year predicate is pushed BELOW the grid build: the final
    ``WHERE o_year > 1995`` would otherwise discard ~60% of grid rows
    AFTER the expensive completion — semi-joining the fact against
    the filtered order keys first shrinks the aggregate, the grid,
    and both big joins by the filter's selectivity (the
    filter-before-complete discipline the reference itself applies,
    gridVeg_groundCover_intercepts_WRANGLE.ipynb:315-318)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = _t(spark, sf_dir, "orders")
    dim = orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    ).filter(F.col("o_year") > 1995)
    li = lineitem.join(
        F.broadcast(dim.select("o_orderkey")),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey", "p_brand")
        .agg(F.round(F.sum("l_quantity") / F.lit(2.0), 2).alias("detection_rate"))
    )
    # map-strategy completion: the grid join here was the engine's
    # most memory-intense plan at sf1.0 (~37 M grid rows shuffled into
    # a sort-merge join, 1.9x GC spread across bench reps);
    # complete_map shuffles only the aggregate (one narrow map per
    # order key) and explodes the 25-brand domain map-side.
    filled = complete_map(
        agg,
        expand=["p_brand"],
        nesting=["l_orderkey"],
        fill={"detection_rate": 0.0},
        expand_values=part,
        nesting_values=li,
    )
    return filled.join(
        F.broadcast(dim), filled.l_orderkey == dim.o_orderkey
    ).select("l_orderkey", "p_brand", "detection_rate", "o_year")


# ---------------------------------------------------------------------------
# The third wrangle pipeline: U2 tagged union → A3 multiples → J7
# anti-join → re-union (reference
# notebooks/gridVeg_species_richness_WRANGLE.ipynb:225-226, 346-348,
# 688-691, 740-746, 858-862, 937-941) — (l_orderkey, l_partkey) plays
# the (survey_ID, key_plant_species) detection pair.
# ---------------------------------------------------------------------------


@_q(
    "species_richness_union_dedup",
    """
    WITH pi AS (
      SELECT l_orderkey, l_partkey,
             'point_intercept' AS detection_type
      FROM lineitem
    ),
    multi AS (
      SELECT l_orderkey, l_partkey FROM pi
      GROUP BY l_orderkey, l_partkey HAVING count(*) > 1
    ),
    supp AS (
      SELECT DISTINCT l_orderkey, l_partkey,
             'supplemental' AS detection_type
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    supp_clean AS (
      SELECT s.* FROM supp s
      WHERE NOT EXISTS (
        SELECT 1 FROM multi m
        WHERE m.l_orderkey = s.l_orderkey AND m.l_partkey = s.l_partkey
      )
    )
    SELECT * FROM pi UNION ALL SELECT * FROM supp_clean
    """,
)
def species_richness_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Species-richness wrangle: primary detections ∪ supplemental
    detections (tagged), where supplemental pairs already seen ≥2×
    in the primary source are anti-joined away before the union."""
    from mpg_data_warehouse_spark.operators.aggregates import multiples

    lineitem = _t(spark, sf_dir, "lineitem")
    pi = lineitem.select(
        "l_orderkey",
        "l_partkey",
        F.lit("point_intercept").alias("detection_type"),
    )
    multi = multiples(pi, ["l_orderkey", "l_partkey"]).select(
        "l_orderkey", "l_partkey"
    )
    supp = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn("detection_type", F.lit("supplemental"))
    )
    supp_clean = supp.join(multi, ["l_orderkey", "l_partkey"], "left_anti")
    return pi.unionByName(supp_clean)


# ---------------------------------------------------------------------------
# Avro OCF source/sink round-trip (rotated in r6; the ceded
# ngram_jaccard_pairs' exact-Jaccard family stays externally verified
# through minhash_near_dup_pairs — whose oracle computes true Jaccard
# over the same perturbed corpus — and eval_contamination_pairs'
# n-gram-overlap oracle; the operator itself stays property-pinned in
# tests/test_dedup.py + test_properties.py).
# ---------------------------------------------------------------------------


@_q(
    "avro_roundtrip_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
           CAST(sum(CASE WHEN o_custkey % 7 = 0 THEN NULL
                         ELSE o_custkey END) AS BIGINT) AS sum_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native Avro OCF sink + source under external verification
    (sources/avro_ocf.py): orders — longs, a NULL-bearing long, a
    double, a string, and a DATE (the date logical type) — is written
    to a fresh Avro directory (deflate codec, staged + atomically
    installed) and read back through the mapInArrow decoder; the
    aggregate runs over the ROUND-TRIPPED frame while the oracle
    reads the original parquet. Any drift in the zigzag varints, the
    deflate codec, null unions, or epoch-day date arithmetic breaks
    the hash. Dollar cents sum as exact integers (a double sum's
    accumulation order is engine-dependent at 2 dp); dates emit as
    ISO strings on both sides (driver date-dtype contract)."""
    import tempfile

    from mpg_data_warehouse_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderdate",
    )
    tmp = tempfile.mkdtemp(prefix="avro_contract_")
    write_avro(orders, tmp, codec="deflate", mode="overwrite")
    back = read_avro(spark, tmp)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("sum_price_cents"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
        F.sum("o_custkey").cast("bigint").alias("sum_cust"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (extension): random-hyperplane LSH
# self-join + exact cosine verify. The oracle mirrors the *entire*
# approximate algorithm — the md5-derived hyperplanes are constants,
# precomputed here in Python and inlined into the DuckDB SQL, so
# bucketing decisions match bit-for-bit.
# ---------------------------------------------------------------------------


def _plane_consts(dim: int = 64, n_planes: int = 8) -> list[list[float]]:
    """The exact plane components operators.similarity uses — single
    source of truth so Spark bucketing and the DuckDB oracle can never
    drift."""
    from mpg_data_warehouse_spark.operators.similarity import _hyperplane_values

    return [_hyperplane_values(dim, p) for p in range(n_planes)]


def _near_dup_oracle_sql() -> str:
    planes = _plane_consts()
    bucket_terms = []
    for p, comps in enumerate(planes):
        lst = "[" + ", ".join(repr(c) for c in comps) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(v, {lst}), "
            f"x -> x[1] * x[2])) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket_expr = "\n         + ".join(bucket_terms)
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    aug AS (
      SELECT vec_id, v FROM e
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(v, x -> x + 0.005) AS v
      FROM e WHERE vec_id % 10 = 0
    ),
    b AS (
      SELECT vec_id, v,
           {bucket_expr} AS bucket
      FROM aug
      QUALIFY count(*) OVER (PARTITION BY bucket) <= 1000
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
             round(
               list_sum(list_transform(list_zip(a.v, c.v),
                 x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(list_zip(a.v, a.v),
                    x -> x[1] * x[2])))
                * sqrt(list_sum(list_transform(list_zip(c.v, c.v),
                    x -> x[1] * x[2])))),
               6) AS cos_sim
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.99
    """


@_q("embedding_cosine_near_dup", _near_dup_oracle_sql())
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs over the embedding column: LSH bucket
    self-join (keyed, never O(n²)) + exact cosine ≥ 0.99. Corpus
    augmented with deterministic +0.005 perturbed copies of every
    10th vector (the synthetic embeddings have no organic near-dups;
    max natural pairwise cosine ≈ 0.48)."""
    from mpg_data_warehouse_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    perturbed = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
    )
    return embedding_near_dup_pairs(
        emb.unionByName(perturbed), threshold=0.99, dim=64, n_planes=8,
        max_bucket=1000,  # mirrored by the oracle's QUALIFY bucket cap
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (extension): binary content column → Arrow-
# batched mapInPandas decode → typed metadata. The fake container's
# fields are deterministic functions of (doc_id, n_chars), so the
# oracle recomputes them in SQL — hash-matching proves the bytes
# survived the attach → Arrow batch → Python parse round trip intact.
# ---------------------------------------------------------------------------


@_q(
    "multimodal_frame_sample",
    """
    WITH meta AS (
      SELECT doc_id,
             CAST(64 + (doc_id % 8) * 32 AS INTEGER) AS width,
             CAST(48 + (doc_id % 6) * 32 AS INTEGER) AS height,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  ELSE 'webp' END AS format,
             length('IMG1|' || CAST(64 + (doc_id % 8) * 32 AS VARCHAR)
                    || '|' || CAST(48 + (doc_id % 6) * 32 AS VARCHAR)
                    || '|' || (CASE doc_id % 3 WHEN 0 THEN 'png'
                               WHEN 1 THEN 'jpeg' ELSE 'webp' END)
                    || '|') + (n_chars % 256) AS payload_len
      FROM documents
    ),
    fixture AS (SELECT doc_id FROM documents WHERE doc_id < 120)
    SELECT 'frame' AS kind, m.doc_id AS id_a,
           CAST(k.frame_idx AS BIGINT) AS id_b,
           CAST(CASE WHEN k.frame_idx < 3
                     THEN payload_len // 4
                     ELSE least(payload_len // 4,
                                payload_len - 3 * (payload_len // 4))
                END AS BIGINT) AS n1,
           CAST(m.width AS BIGINT) AS n2, CAST(m.height AS BIGINT) AS n3,
           m.format AS s1, CAST(NULL AS DOUBLE) AS d1
    FROM meta m
    CROSS JOIN (SELECT unnest([0,1,2,3]) AS frame_idx) k
    UNION ALL
    -- pHash near-dups: byte-identical planes within an id%12 group
    -- (PPM and BMP containers mixed) MUST pair at hamming 0; measured
    -- min cross-group hamming is 20 > max_hamming 8, so the pair set
    -- is exactly the within-group pairs
    SELECT 'phash_pair', a.doc_id, b.doc_id, 0,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM fixture a JOIN fixture b
      ON a.doc_id % 12 = b.doc_id % 12 AND a.doc_id < b.doc_id
    UNION ALL
    -- audio near-dups: byte-identical WAV clips within an id%10 group
    -- share their whole sub-fingerprint set (match_frac 1.0); cross
    -- groups share none (measured 0.0)
    SELECT 'audio_pair', a.doc_id, b.doc_id, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), 1.0
    FROM fixture a JOIN fixture b
      ON a.doc_id % 10 = b.doc_id % 10 AND a.doc_id < b.doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal report, three tagged legs under one hash.

    ``frame`` rows: 1→N fan-out through mapInPandas (each payload
    yields 4 frame slices) joined with the Arrow-batched header decode
    — per-frame byte lengths plus decoded typed metadata; the oracle
    recomputes the slice arithmetic (last frame may be short) and the
    header fields from the source table.

    Round 7 adds MEDIA NEAR-DUP under the same hash, over REAL
    generated container bytes (the environment has no compressed-media
    codecs, but PPM/BMP/WAV decode is deterministic — see
    multimodal.attach_fixture_image/_audio):

    ``phash_pair`` rows: decode 120 fixture images (group-identical
    luma planes, PPM/BMP containers MIXED per group), DCT-pHash each
    (image_phash), then pigeonhole-block + XOR-popcount pairing
    (phash_near_dup_pairs, max_hamming=8). The oracle predicts the
    exact pair set: all within-group pairs at hamming 0 — reachable
    only if both parsers decode the same plane (incl. the BMP
    bottom-up row flip; the plane is vertically asymmetric), the hash
    is plane-deterministic, and the blocking misses nothing.

    ``audio_pair`` rows: Haitsma–Kalker sub-fingerprints over group-
    identical PCM WAV clips (audio_fingerprint), paired by shared
    distinct sub-fingerprints (audio_near_dup_pairs) — within-group
    match_frac is exactly 1.0, cross-group 0.0.

    Reference surface this extends: src/image_metadata_update.py
    (decode/meta pipeline) — the near-dup legs are the 100 TB media
    dedup this engine adds."""
    from mpg_data_warehouse_spark.operators.multimodal import (
        attach_fake_image,
        attach_fixture_audio,
        attach_fixture_image,
        audio_fingerprint,
        audio_near_dup_pairs,
        decode_image_meta,
        image_phash,
        phash_near_dup_pairs,
        sample_frames,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with_img = attach_fake_image(docs)
    # r13 (guide §2.3/§8): the report consumes only the LENGTH of each
    # frame slice — project it immediately after the sampler so the
    # join moves (doc_id, frame_idx, 8-byte length), never the frame
    # payload bytes. At bench scale the meta side broadcasts; at
    # corpus scale (meta too big to broadcast) the join would shuffle
    # both sides, and shuffling lengths instead of payloads is the
    # §8 "decide with small rows" rule.
    frames = sample_frames(with_img, n_frames=4).select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("_flen"),
    )
    meta = decode_image_meta(with_img).select(
        "doc_id", "width", "height", "format"
    )
    frame_rows = frames.join(meta, "doc_id").select(
        F.lit("frame").alias("kind"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("frame_idx").cast("long").alias("id_b"),
        F.col("_flen").alias("n1"),
        F.col("width").cast("long").alias("n2"),
        F.col("height").cast("long").alias("n3"),
        F.col("format").alias("s1"),
        F.lit(None).cast("double").alias("d1"),
    )

    fixture = docs.select("doc_id").filter(F.col("doc_id") < 120)
    img_fix = attach_fixture_image(
        fixture.withColumn("grp", (F.col("doc_id") % 12).cast("int")), "grp"
    )
    # r13 (guide §2.4): persist the two tiny fingerprint frames (≤120
    # fixture rows each) — the pairing operators reference their input
    # several times (block/sub-fingerprint self-joins, size and
    # hot-bucket probes), and every un-materialized reference re-ran
    # the WHOLE attach → decode → hash Python chain (2 mapInPandas
    # stages each): the static plan carried 18 MapInPandas nodes for
    # what is 5 distinct Python passes. The query is registered scoped
    # so both caches release with the result.
    phash_rows = phash_near_dup_pairs(
        image_phash(img_fix).filter(F.col("ok")).persist(), max_hamming=8
    ).select(
        F.lit("phash_pair").alias("kind"),
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("double").alias("d1"),
    )

    aud_fix = attach_fixture_audio(
        fixture.withColumn("grp", (F.col("doc_id") % 10).cast("int")), "grp"
    )
    audio_rows = audio_near_dup_pairs(
        audio_fingerprint(aud_fix).filter(F.col("ok")).persist()
    ).select(
        F.lit("audio_pair").alias("kind"),
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.lit(None).cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s1"),
        F.col("match_frac").cast("double").alias("d1"),
    )
    return frame_rows.unionByName(phash_rows).unionByName(audio_rows)


# ---------------------------------------------------------------------------
# Near-dup retention (the capstone dedup op): pairs → connected
# components → keep the smallest id per cluster. Spark runs iterative
# min-label propagation (keyed joins, driver sees only a convergence
# scalar); the oracle closes the same graph with a recursive CTE.
# ---------------------------------------------------------------------------


@_q(
    "near_dup_retention",
    f"""
    WITH RECURSIVE raw AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      {_MINHASH_PERTURBED}
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text
      FROM documents WHERE doc_id % 17 = 0
    ),
    base AS (
      SELECT min(doc_id) AS doc_id, min(text) AS text
      FROM raw GROUP BY md5(text)
    ),
    {_MINHASH_BODY},
    pairs AS (
      SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    cc AS (
      SELECT doc_id AS node, doc_id AS label FROM base
      UNION
      SELECT e.dst AS node, cc.label
      FROM cc JOIN edges e ON e.src = cc.node
    ),
    comp AS (
      SELECT node, min(label) AS component FROM cc GROUP BY node
    )
    SELECT b.doc_id
    FROM base b JOIN comp ON b.doc_id = comp.node
    WHERE comp.component = b.doc_id
    """,
)
def near_dup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation dedup pipeline (registry-consolidated from
    dedup_exact + the near-dup retention capstone): exact hash-groupBy
    dedup FIRST (one cheap shuffle removes verbatim copies — every
    17th doc is re-injected verbatim under id+2,000,000 to make the
    pass observable), then MinHash pair generation and
    keep-one-per-cluster retention over the survivors. Running the
    exact pass before shingling is the production ordering: at 100 TB
    verbatim copies are the bulk of dup mass and must never reach the
    (far costlier) shingle/band stage. If the exact pass leaked a
    copy, MinHash would see jaccard-1.0 pairs and the retained set —
    hence the hash — would shift."""
    from mpg_data_warehouse_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
        retain_representatives,
    )
    from mpg_data_warehouse_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    perturbed = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(tokens("text"), 3, 100000)).alias("text"),
    )
    copies = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    raw = docs.unionByName(perturbed).unionByName(copies)
    keep = exact_dedup(raw).select("doc_id")
    # base feeds three consumers (shingle pipeline, CC id list, final
    # retention join) and an iterative op downstream: materialize the
    # exact-pass result once instead of re-running hash-groupBy + semi
    # join per consumer (at 100 TB this is the checkpoint between the
    # exact and near stages of the curation pipeline).
    base = raw.join(keep, "doc_id", "left_semi").localCheckpoint(eager=False)
    # restrict_verify: contract lineage carries no Observations, so
    # the opt-in pair-incident verify trim is safe here (r13)
    pairs = minhash_dedup_pairs(
        base,
        num_hashes=8,
        bands=4,
        shingle_n=3,
        threshold=0.5,
        restrict_verify=True,
    )
    return retain_representatives(base, pairs).select("doc_id")


# ---------------------------------------------------------------------------
# Temporal joins Spark lacks natively (§7 extensions): as-of join
# (union-sort trick, one shuffle) and binned range join (equi-join on
# bin ids instead of a nested-loop non-equi join). DuckDB mirrors
# with native ASOF JOIN and a plain inequality join respectively.
# ---------------------------------------------------------------------------


@_q(
    "temporal_asof_range",
    """
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value,
             CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE round(value * 2, 2) END AS v2
      FROM events
      WHERE event_type = 'purchase'
    ),
    iv AS (
      SELECT event_id AS purchase_id,
             us // 3600000000 - 6 AS lo_h,
             us // 3600000000 + 6 AS hi_h
      FROM purchases
    ),
    pts AS (SELECT event_id, us // 3600000000 AS ev_h FROM clicks)
    SELECT 'asof' AS kind, c.event_id AS id_a, c.user_id AS id_b,
           round(p.value, 2) AS metric, p.v2 AS metric2
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.us >= p.us
    UNION ALL
    SELECT 'range' AS kind, i.purchase_id AS id_a,
           CAST(NULL AS BIGINT) AS id_b,
           CAST(count(*) AS DOUBLE) AS metric,
           CAST(NULL AS DOUBLE) AS metric2
    FROM pts p JOIN iv i
      ON p.ev_h >= i.lo_h AND p.ev_h <= i.hi_h
    GROUP BY i.purchase_id
    UNION ALL
    SELECT 'rangeleft' AS kind, p.event_id AS id_a,
           CAST(NULL AS BIGINT) AS id_b,
           CAST(count(i.purchase_id) AS DOUBLE) AS metric,
           CAST(NULL AS DOUBLE) AS metric2
    FROM pts p LEFT JOIN iv i
      ON p.ev_h >= i.lo_h AND p.ev_h <= i.hi_h
    GROUP BY p.event_id
    """,
)
def temporal_asof_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two temporal joins Spark lacks natively, as one tagged
    union (registry-consolidated from asof_join_events +
    range_join_click_attribution; each branch keeps its own plan).

    asof branch: each click annotated with the value AND a NULLABLE
    second column (``v2``, null on every 3rd purchase) of the user's
    most recent prior (or simultaneous) purchase — union-sort trick,
    one shuffle on the key. The nullable column oracle-pins the r10
    struct-carry semantics fix: a NULL field in the LATEST right row
    must surface as NULL (DuckDB ASOF parity), not be back-filled
    from an older right row. range branch: clicks inside each
    purchase's ±6-hour attribution window — point-in-interval join
    via bin equi-join (bin = window width, so each interval lands in
    ≤ 2 bins), never a nested-loop non-equi join. rangeleft branch:
    the same join with ``how='left'`` from the CLICK side — every
    click keeps a row, count 0 when no window contains it — pinning
    the r10 fix where 'left' silently degraded to inner. DuckDB
    mirrors with native ASOF JOIN and plain inequality LEFT/inner
    joins respectively."""
    from mpg_data_warehouse_spark.operators.temporal import (
        asof_join,
        range_join_binned,
    )

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "us",
        "value",
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("value") * 2, 2))
        .alias("v2"),
    )
    asof = asof_join(
        clicks,
        purchases.select("user_id", "us", "value", "v2"),
        key="user_id",
        left_ts="us",
        right_ts="us",
        right_cols=["value", "v2"],
    ).select(
        F.lit("asof").alias("kind"),
        F.col("event_id").alias("id_a"),
        F.col("user_id").alias("id_b"),
        F.round("asof_value", 2).alias("metric"),
        F.col("asof_v2").alias("metric2"),
    )
    iv = purchases.select(
        F.col("event_id").alias("purchase_id"),
        (F.expr("us div 3600000000") - 6).alias("lo_h"),
        (F.expr("us div 3600000000") + 6).alias("hi_h"),
    )
    pts = clicks.select(
        "event_id", F.expr("us div 3600000000").alias("ev_h")
    )
    # ONE left bin join feeds BOTH range legs: the inner semantics are
    # its non-null rows (a second inner call would re-execute the bin
    # equi-join — at event-stream scale the duplicated shuffle is the
    # dominant cost of the slot). r13 NOTE (measured, kept as-is):
    # PERSISTING this frame was tried and is 3.5× WORSE (1.62 s →
    # 5.62 s at sf0.1, reps=7, same window) — the join output is
    # PAIR-grain (each click × every ±6 h window containing it), far
    # larger than either input, and materializing it costs more than
    # running the broadcast join once per consumer, where each
    # aggregate pipelines the pairs straight into map-side partials
    # without ever storing them (guide §5: cache only when recompute
    # beats the memory pressure — here it does not).
    left_pairs = range_join_binned(
        pts, iv, "ev_h", "lo_h", "hi_h", bin_width=12, how="left"
    )
    ranged = (
        left_pairs.filter(F.col("purchase_id").isNotNull())
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_near"))
        .select(
            F.lit("range").alias("kind"),
            F.col("purchase_id").alias("id_a"),
            F.lit(None).cast("long").alias("id_b"),
            F.col("n_clicks_near").cast("double").alias("metric"),
            F.lit(None).cast("double").alias("metric2"),
        )
    )
    ranged_left = (
        left_pairs.groupBy("event_id")
        .agg(F.count("purchase_id").alias("n_windows"))
        .select(
            F.lit("rangeleft").alias("kind"),
            F.col("event_id").alias("id_a"),
            F.lit(None).cast("long").alias("id_b"),
            F.col("n_windows").cast("double").alias("metric"),
            F.lit(None).cast("double").alias("metric2"),
        )
    )
    return asof.unionByName(ranged).unionByName(ranged_left)


# ---------------------------------------------------------------------------
# Multi-granularity rollup in ONE pass (the continuous-aggregate /
# hypertable-rollup analog): GROUPING SETS over (hour, type) and
# (day, type) — one shuffle feeds both granularities, vs two
# separate aggregation jobs.
# ---------------------------------------------------------------------------


@_q(
    "events_multi_grain_rollup",
    """
    WITH roll AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             event_type AS t,
             CAST(grouping(date_trunc('hour', ts)) AS BIGINT)
               AS is_day_grain,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY GROUPING SETS (
        (date_trunc('hour', ts), date_trunc('day', ts), event_type),
        (date_trunc('day', ts), event_type)
      )
    ),
    -- HLL register replay (operators/sketch.py, p=8): md5 halves ->
    -- top-8-bit bucket + 56-bit rest, rho = 57 - bit_length(rest) via
    -- length(bin(x)) -- exact integer arithmetic, no float log --
    -- then per-bucket max per group
    rho AS (
      SELECT h, d, t,
             hi // 16777216 AS bucket,
             57 - CASE WHEN (hi % 16777216) * 4294967296 + lo = 0 THEN 0
                       ELSE length(bin((hi % 16777216) * 4294967296 + lo))
                  END AS r
      FROM (
        SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
               event_type AS t,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS hi,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8)
                    AS BIGINT) AS lo
        FROM events
        -- count(DISTINCT) semantics: NULL values contribute no
        -- register (mirrors _register_rows' isNotNull filter — a
        -- NULL here would otherwise become a phantom NULL bucket)
        WHERE user_id IS NOT NULL
      )
    ),
    hreg AS (
      SELECT h, d, t, bucket, max(r) AS mr
      FROM rho GROUP BY h, d, t, bucket
    ),
    dreg AS (
      SELECT d, t, bucket, max(mr) AS mr
      FROM hreg GROUP BY d, t, bucket
    ),
    -- exact integer register sum T = sum_j 2^(57 - M_j) (empty
    -- registers contribute 2^57) in HUGEINT; V = empty registers
    hfin AS (
      SELECT h, d, t, 256 - count(*) AS v,
             (0.7213 / (1 + 1.079 / 256)) * 256 * 256
               * 144115188075855872
               / CAST(sum(1::BIGINT << (57 - mr))
                      + (256 - count(*)) * (1::HUGEINT << 57)
                      AS DOUBLE) AS raw
      FROM hreg GROUP BY h, d, t
    ),
    dfin AS (
      SELECT d, t, 256 - count(*) AS v,
             (0.7213 / (1 + 1.079 / 256)) * 256 * 256
               * 144115188075855872
               / CAST(sum(1::BIGINT << (57 - mr))
                      + (256 - count(*)) * (1::HUGEINT << 57)
                      AS DOUBLE) AS raw
      FROM dreg GROUP BY d, t
    ),
    -- r10: bottom-256 quantile-sketch replay over VALUE (md5 56-bit
    -- event_id hash order) at both grains — the Spark side builds the
    -- DAY grain by quantile_merge of the HOUR sketches, so the hash
    -- proves merge ≡ direct build for the order-statistics family in
    -- the multi-grain rollup path
    qsrows AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             event_type AS t,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14)
                  AS BIGINT) AS qh,
             value AS v
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_id IS NOT NULL
    ),
    hqs AS (
      SELECT h, d, t, list(v ORDER BY v) AS vs
      FROM (SELECT h, d, t, v,
                   row_number() OVER (PARTITION BY h, d, t
                                      ORDER BY qh, v) AS r
            FROM qsrows)
      WHERE r <= 256 GROUP BY h, d, t
    ),
    dqs AS (
      SELECT d, t, list(v ORDER BY v) AS vs
      FROM (SELECT d, t, v,
                   row_number() OVER (PARTITION BY d, t
                                      ORDER BY qh, v) AS r
            FROM qsrows)
      WHERE r <= 256 GROUP BY d, t
    )
    SELECT CAST(CAST(r.h AS TIMESTAMP) AS VARCHAR) AS hour_ts,
           CAST(CAST(r.d AS TIMESTAMP) AS VARCHAR) AS day_ts,
           r.t AS event_type,
           r.is_day_grain,
           r.n_events,
           r.sum_value,
           r.n_users,
           round(CASE WHEN COALESCE(hf.raw, df.raw) <= 640.0
                       AND COALESCE(hf.v, df.v) > 0
                      THEN 256.0 * ln(256.0 / COALESCE(hf.v, df.v))
                      ELSE COALESCE(hf.raw, df.raw) END, 4) AS hll_users,
           CAST(COALESCE(hf.v, df.v) AS BIGINT) AS hll_zero_regs,
           COALESCE(hq.vs, dq.vs)[
             CAST(floor(0.5 * (len(COALESCE(hq.vs, dq.vs)) - 1)) AS INT)
             + 1] AS qs_p50_value,
           CAST(len(COALESCE(hq.vs, dq.vs)) AS BIGINT) AS qs_n
    FROM roll r
    LEFT JOIN hfin hf
      ON r.is_day_grain = 0 AND r.h = hf.h AND r.d = hf.d AND r.t = hf.t
    LEFT JOIN dfin df
      ON r.is_day_grain = 1 AND r.d = df.d AND r.t = df.t
    LEFT JOIN hqs hq
      ON r.is_day_grain = 0 AND r.h = hq.h AND r.d = hq.d AND r.t = hq.t
    LEFT JOIN dqs dq
      ON r.is_day_grain = 1 AND r.d = dq.d AND r.t = dq.t
    """,
)
def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-consolidated: subsumes the former events_hourly_rollup
    (its hour grain is this query's hour grouping set, now including
    the per-grain user count-distinct; the streaming module keeps the
    incremental hourly form under its own contract query).

    r7: each grain also carries a mergeable HLL distinct-user sketch
    (operators/sketch.py) next to the exact count — the HOUR grain
    sketches the raw rows, the DAY grain is ``hll_merge`` of the hour
    sketches (never re-reads raw rows), while the oracle computes
    BOTH grains' registers directly from the rows — so the hash
    additionally proves merge ≡ direct build, the re-aggregation
    property continuous rollups rely on at 100 TB (BigQuery's
    ``HLL_COUNT.MERGE`` analog on the reference's platform).

    r10: the QUANTILE sketch family joins the same composition — the
    HOUR grain samples each group's VALUE distribution (bottom-256 by
    event_id hash), the DAY grain is ``quantile_merge`` of the hour
    sketches, and the oracle rebuilds both grains' samples directly
    from the rows: merge ≡ direct build now holds oracle-verified for
    order statistics in the rollup path, not just in
    lineitem_flag_profile's flat merge.

    r11 plan trim: ONE shuffle of the raw events — the projected
    event frame is hash-repartitioned on the hour-grain key and
    persisted, and every hour-grain family (count/sum/exact-distinct,
    HLL registers, quantile sample) aggregates on that partitioning
    without re-exchanging (HashPartitioning on a SUBSET of each
    grouping key set satisfies its clustering). The former
    GROUPING SETS roll re-shuffled 2× the event rows through its
    Expand; it is now split into an hour leg (zero extra exchanges)
    and a day leg whose exchanges carry partial-aggregated rows only.
    Day-grain sketches still derive by MERGE of the hour sketches
    (|hours| × fixed-width rows), never from raw events."""
    from mpg_data_warehouse_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
        hll_zero_regs,
        quantile_estimate,
        quantile_merge,
        quantile_sketch,
    )

    hkeys = ["_hour", "_day", "event_type"]
    events = (
        _events(spark, sf_dir)
        .select(
            F.date_trunc("hour", "ts").alias("_hour"),
            F.date_trunc("day", "ts").alias("_day"),
            "event_type",
            "value",
            "user_id",
            "event_id",
        )
        .repartition(*hkeys)
        .persist()
    )
    ts_type = events.schema["_hour"].dataType

    def _roll(keys: list[str], grain: int) -> DataFrame:
        return (
            events.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .withColumn("is_day_grain", F.lit(grain).cast("long"))
        )

    hour_sk = hll_sketch(events, hkeys, "user_id").persist()
    day_sk = hll_merge(hour_sk.drop("_hour"), ["_day", "event_type"])
    # quantile siblings: hour grain sampled from rows, day grain
    # MERGED from the hour sketches (never re-reads raw rows)
    hour_qs = quantile_sketch(events, hkeys, "value", ["event_id"]).persist()
    day_qs = quantile_merge(hour_qs.drop("_hour"), ["_day", "event_type"])
    hour_leg = (
        _roll(hkeys, 0).join(hour_sk, hkeys, "left").join(hour_qs, hkeys, "left")
    )
    day_leg = (
        _roll(["_day", "event_type"], 1)
        .join(day_sk, ["_day", "event_type"], "left")
        .join(day_qs, ["_day", "event_type"], "left")
        .withColumn("_hour", F.lit(None).cast(ts_type))
    )
    return hour_leg.unionByName(day_leg).select(
        F.col("_hour").cast("string").alias("hour_ts"),
        F.col("_day").cast("string").alias("day_ts"),
        "event_type",
        "is_day_grain",
        "n_events",
        "sum_value",
        "n_users",
        hll_estimate(F.col("hll_registers")).alias("hll_users"),
        hll_zero_regs(F.col("hll_registers")).alias("hll_zero_regs"),
        quantile_estimate(F.col("qs_sample"), 0.5).alias("qs_p50_value"),
        F.size("qs_sample").cast("long").alias("qs_n"),
    )


# --- A9: univariate profiling (describe/summary/min-max/nunique) ---


@_q(
    "text_tokens_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS ws,
             list_filter(
               regexp_split_to_array(
                 trim(regexp_replace(text, '([^\sA-Za-z0-9]+)', ' \1 ', 'g')),
                 '\s+'),
               x -> x <> '') AS bpe
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens_ws,
           CAST(len(bpe) AS BIGINT) AS n_tokens_bpe,
           list_reduce(
             list_transform(ws,
               x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)),
             (acc, h) -> (acc * 1000003 + h) % 2147483647
           ) AS rolling_fp
    FROM t
    """,
)
def text_tokens_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mpg_data_warehouse_spark.operators import text as X

    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        X.tokens("text").alias("_ws"),
        X.bpe_ish_tokens("text").alias("_bpe"),
    )
    return toked.select(
        "doc_id",
        F.size("_ws").cast("long").alias("n_tokens_ws"),
        F.size("_bpe").cast("long").alias("n_tokens_bpe"),
        X.rolling_fingerprint_from(F.col("_ws")).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# IVF ANN (extension): corpus partitioned by nearest-centroid cell;
# queries probe their nprobe nearest cells. Centroids seed from the
# 16 lowest-id corpus rows, then one deterministic Lloyd iteration
# (member-mean per cell, rounded — kmeans_refine_centroids); the
# oracle replays seeding, refinement, cell assignment, probe
# selection, and scoring exactly.
# ---------------------------------------------------------------------------

_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(list_zip({a}, {a}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(list_zip({b}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))))"
)


@_q(
    "ivf_ann_topk",
    f"""
    WITH cent0 AS (
      -- rank-based seeding (mirrors operators.similarity.seed_centroids):
      -- the 16 lowest-id rows, robust to ids that don't start at 0
      SELECT vec_id AS cell, embedding AS cv FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    assign0 AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a="e.embedding", b="c.cv")} DESC, c.cell
               ) AS rk
        FROM embeddings e CROSS JOIN cent0 c
      ) WHERE rk = 1
    ),
    cent_long AS (
      SELECT cell,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             unnest(embedding) AS v
      FROM assign0
    ),
    cent AS (
      SELECT cell, list(cvp ORDER BY pos) AS cv
      FROM (
        SELECT cell, pos, round(avg(v), 5) AS cvp
        FROM cent_long GROUP BY cell, pos
      )
      GROUP BY cell
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_COS.format(a="e.embedding", b="c.cv")} DESC, c.cell
               ) AS rk
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rk = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_COS.format(a="q.embedding", b="c.cv")} DESC, c.cell
               ) AS prk
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5
      ) WHERE prk <= 4
    ),
    scored AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
             round({_COS.format(a="p.qv", b="a.embedding")}, 6) AS cos_sim
      FROM assigned a JOIN probes p ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mpg_data_warehouse_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_centroids=16,
        nprobe=4,
        refine_iters=1,
    )


# ---------------------------------------------------------------------------
# Streaming through the contract: drain the events table as a real
# file-source stream (availableNow) and emit the watermarked rollup.
# The result is deterministic, so the ORACLE IS THE BATCH SQL — the
# incremental plan is held to the same hash as the batch plan.
# ---------------------------------------------------------------------------


@_q(
    "streaming_hourly_rollup",
    """
    SELECT CAST(CAST(date_trunc('hour', ts) AS TIMESTAMP) AS VARCHAR)
             AS hour_ts,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch↔stream equivalence as a contract query: stage the events
    with µs timestamps, drain them through readStream + watermark +
    tumbling window, return the memory-sink table."""
    import tempfile

    from mpg_data_warehouse_spark.streaming import events as SE

    staged = tempfile.mkdtemp(prefix="stream_events_")
    # r13 (guide §2.3 at the staging boundary): the rollup consumes
    # ts / event_type / value / user_id only — stage exactly those.
    # Fenced at sf0.1: the staging write is ~40% of the warm slot, and
    # event_id + props are ~35% of the staged bytes, written only to
    # be ignored by every downstream scan. The projected stream schema
    # comes from read_events_stream(columns=...), so stage and reader
    # can never drift.
    _cols = ["ts", "event_type", "value", "user_id"]
    _events(spark, sf_dir).select(*_cols).write.mode("overwrite").parquet(
        staged
    )
    stream = SE.hourly_rollup_stream(
        SE.read_events_stream(spark, staged, columns=_cols)
    )
    SE.run_to_memory(stream, "streaming_hourly_rollup_t", timeout_s=300)
    return spark.table("streaming_hourly_rollup_t").select(
        F.col("hour_ts").cast("string").alias("hour_ts"),
        "event_type",
        "n_events",
        "sum_value",
    )


@_q(
    "catalog_region_nations",
    """
    SELECT r.r_name AS region_name,
           count(*) AS n_nations,
           min(n.n_name) AS first_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def catalog_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-database resolution through the contract (SURVEY §1.3:
    BigQuery dataset → catalog DATABASE): the sf-dir is registered as
    a database of EXTERNAL parquet tables (metadata only, no copy) and
    the query resolves every input via ``spark.table("db.t")`` — no
    temp views, no direct paths. The join itself broadcasts the 5-row
    region dim."""
    from mpg_data_warehouse_spark.sources.catalog import register_sf_database

    db = register_sf_database(spark, sf_dir, tables=("nation", "region"))
    nation = spark.table(f"{db}.nation")
    region = spark.table(f"{db}.region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


# (streaming_user_totals ceded its registry slot in r6 to
# hybrid_rrf_retrieval. The applyInPandasWithState stateful-operator
# family it carried stays covered by tests/test_streaming.py's
# stateful-drain-equals-batch pin, and the streaming contract surface
# remains externally verified by streaming_hourly_rollup — the same
# exactly-once txlog sink + watermark machinery — and
# streaming_click_attribution's stream-stream join.)


@_q(
    "streaming_click_attribution",
    """
    WITH imp AS (
      SELECT user_id, epoch_us(ts) AS imp_us FROM events
      WHERE event_type = 'view'
    ),
    clk AS (
      SELECT user_id, epoch_us(ts) AS click_us, value AS click_value
      FROM events WHERE event_type = 'click'
    )
    SELECT i.user_id, i.imp_us, c.click_us,
           round(c.click_value, 2) AS click_value
    FROM imp i JOIN clk c
      ON i.user_id = c.user_id
     AND c.click_us >= i.imp_us
     AND c.click_us <= i.imp_us + 3600000000
    """,
)
def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join through the contract: views and
    clicks drained as two file streams, each click attributed to every
    view of the same user at most 1 hour earlier. availableNow drains
    the staged input in one micro-batch, so the join output is the
    complete (deterministic) pair set — held to the batch-SQL hash,
    exactly like streaming_hourly_rollup."""
    import tempfile

    from mpg_data_warehouse_spark.streaming import events as SE

    staged = tempfile.mkdtemp(prefix="stream_attr_")
    _events(spark, sf_dir).write.mode("overwrite").parquet(staged)
    imp = SE.read_events_stream(spark, staged).filter(
        F.col("event_type") == "view"
    )
    clk = SE.read_events_stream(spark, staged).filter(
        F.col("event_type") == "click"
    )
    joined = SE.click_attribution_stream(imp, clk, max_delay="1 hour")
    out = joined.select(
        "user_id",
        F.unix_micros("imp_ts").alias("imp_us"),
        F.unix_micros("click_ts").alias("click_us"),
        F.round("click_value", 2).alias("click_value"),
    )
    SE.run_to_memory(out, "streaming_click_attribution_t", timeout_s=300)
    return spark.table("streaming_click_attribution_t")


# ---------------------------------------------------------------------------
# Training-data pipeline extensions, batch 2: deterministic sampling,
# ranking, vocabulary / TF-IDF, redaction, quantile profiling,
# embedding centroids. All md5-derived decisions replay exactly in the
# DuckDB oracle (operators/sampling.py docstring).
# ---------------------------------------------------------------------------

_STRATA_SQL = """
      CASE o_orderpriority
        WHEN '1-URGENT' THEN 5000
        WHEN '2-HIGH' THEN 2500
        ELSE 500
      END"""


@_q(
    "sample_split_tagged",
    f"""
    SELECT 'orders_sample' AS kind, o_orderkey AS entity_key,
           o_orderpriority AS label
    FROM orders
    WHERE (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                 AS BIGINT) % 10000) < {_STRATA_SQL}
    UNION ALL
    SELECT 'customer_split' AS kind, c_custkey AS entity_key,
           CASE WHEN (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                           AS BIGINT) % 10000) < 1000
                THEN 'holdout' ELSE 'train' END AS label
    FROM customer
    """,
)
def sample_split_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-sampling family as one tagged union (registry-
    consolidated from stratified_sample_orders + train_holdout_split;
    each branch keeps its own table and plan).

    orders_sample branch: reproducible per-stratum sampling — urgent
    orders kept at 50%, high at 25%, everything else at 5% —
    hash-keyed on o_orderkey so the sample is identical on every run
    and in the oracle. customer_split branch: disjoint-and-exhaustive
    10% holdout keyed on content hash (the eval-contamination
    guard)."""
    orders = _t(spark, sf_dir, "orders")
    sampled = stratified_sample(
        orders,
        strata="o_orderpriority",
        key="o_orderkey",
        rates={"1-URGENT": 0.5, "2-HIGH": 0.25},
        default_rate=0.05,
    ).select(
        F.lit("orders_sample").alias("kind"),
        F.col("o_orderkey").alias("entity_key"),
        F.col("o_orderpriority").alias("label"),
    )
    customer = _t(spark, sf_dir, "customer")
    train, holdout = split_train_holdout(
        customer, key="c_custkey", holdout_fraction=0.1
    )
    split = train.select(
        F.lit("customer_split").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.lit("train").alias("label"),
    ).unionByName(
        holdout.select(
            F.lit("customer_split").alias("kind"),
            F.col("c_custkey").alias("entity_key"),
            F.lit("holdout").alias("label"),
        )
    )
    return sampled.unionByName(split)


_NORM_TOKENS_SQL = """
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
      FROM documents"""


@_q(
    "vocab_and_trigram_top",
    f"""
    WITH words AS (
      SELECT term, count(*) AS n
      FROM ({_NORM_TOKENS_SQL})
      WHERE term <> ''
      GROUP BY term
      ORDER BY n DESC, term
      LIMIT 50
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    gram_lists AS (
      SELECT list_transform(
               range(0, greatest(len(t) - 3, 0) + 1),
               i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])
             ) AS g
      FROM toks
    ),
    grams AS (
      SELECT gram, count(*) AS n
      FROM (SELECT unnest(g) AS gram FROM gram_lists)
      GROUP BY gram
      ORDER BY n DESC, gram
      LIMIT 50
    ),
    -- Count-Min replay (operators/sketch.py, width 1024 x depth 4):
    -- per depth row, bucket every occurrence by the seed-prefixed md5
    -- ('cms<d>|' || value, first 32 bits mod width) and count; a
    -- value's estimate is the MIN of its four bucket counts — exact
    -- integer algebra end to end
    dseq AS (SELECT unnest([0, 1, 2, 3]) AS d),
    wcnt AS (
      SELECT d,
             CAST('0x' || substr(md5('cms' || d || '|' || term), 1, 8)
                  AS BIGINT) % 1024 AS b,
             count(*) AS c
      FROM ({_NORM_TOKENS_SQL}) CROSS JOIN dseq
      WHERE term <> ''
      GROUP BY 1, 2
    ),
    wq AS (
      SELECT w.term AS gram, min(c.c) AS cms_n
      FROM words w CROSS JOIN dseq
      JOIN wcnt c
        ON c.d = dseq.d
       AND c.b = CAST('0x' || substr(md5('cms' || dseq.d || '|' || w.term),
                                     1, 8) AS BIGINT) % 1024
      GROUP BY w.term
    ),
    gcnt AS (
      SELECT d,
             CAST('0x' || substr(md5('cms' || d || '|' || gram), 1, 8)
                  AS BIGINT) % 1024 AS b,
             count(*) AS c
      FROM (SELECT unnest(g) AS gram FROM gram_lists) CROSS JOIN dseq
      GROUP BY 1, 2
    ),
    gq AS (
      SELECT g.gram, min(c.c) AS cms_n
      FROM grams g CROSS JOIN dseq
      JOIN gcnt c
        ON c.d = dseq.d
       AND c.b = CAST('0x' || substr(md5('cms' || dseq.d || '|' || g.gram),
                                     1, 8) AS BIGINT) % 1024
      GROUP BY g.gram
    )
    SELECT 'word' AS kind, w.term AS gram, w.n, wq.cms_n
    FROM words w JOIN wq ON wq.gram = w.term
    UNION ALL
    SELECT 'trigram' AS kind, g.gram, g.n, gq.cms_n
    FROM grams g JOIN gq ON gq.gram = g.gram
    """,
)
def vocab_and_trigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head + LM-style trigram head as one tagged
    union (registry-consolidated from vocab_top_terms +
    trigram_top_counts). Word branch: explode normalized tokens, one
    term-keyed agg (map-side combine absorbs the Zipf head),
    deterministic top-50. Trigram branch counts ALL occurrences —
    distinct=False is what separates language-model statistics from
    dedup shingles — with the same one-agg + deterministic-top-k
    shape.

    r7: each head row also carries ``cms_n`` — the Count-Min point
    estimate from ONE global 1024×4 sketch per branch
    (operators/sketch.py), probed via a one-row broadcast crossJoin.
    The oracle replays the full counter algebra (seeded-md5 buckets,
    per-depth counts, min), so the hash proves build + query exact —
    and CMS's ``estimate ≥ truth`` contract is visible in-row next to
    the exact ``n``."""
    from mpg_data_warehouse_spark.operators.dedup import shingles_from_tokens
    from mpg_data_warehouse_spark.operators.sketch import (
        cms_query,
        cms_sketch,
    )
    from mpg_data_warehouse_spark.operators.text import norm_tokens, tokens

    docs = _docs(spark, sf_dir)
    wocc = docs.select(F.explode(norm_tokens("text")).alias("term"))
    wsk = cms_sketch(wocc, [], "term")  # one global (1024 × 4) row
    words = (
        term_counts(docs, "text")
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(50)
        .select(F.lit("word").alias("kind"), F.col("term").alias("gram"), "n")
        .crossJoin(F.broadcast(wsk))
        .withColumn("cms_n", cms_query(F.col("cms_counters"), F.col("gram")))
        .drop("cms_counters")
    )
    toked = docs.select(tokens("text").alias("_toks"))
    gocc = toked.select(
        F.explode(
            shingles_from_tokens(F.col("_toks"), 3, distinct=False)
        ).alias("gram")
    )
    gsk = cms_sketch(gocc, [], "gram")
    grams = (
        gocc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(50)
        .select(F.lit("trigram").alias("kind"), "gram", "n")
        .crossJoin(F.broadcast(gsk))
        .withColumn("cms_n", cms_query(F.col("cms_counters"), F.col("gram")))
        .drop("cms_counters")
    )
    return words.unionByName(grams)


@_q(
    "tfidf_top_terms",
    f"""
    WITH dtc AS (
      SELECT doc_id, term, count(*) AS tf
      FROM ({_NORM_TOKENS_SQL})
      WHERE term <> ''
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS doc_freq FROM dtc GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT d.doc_id, d.term, d.tf,
             round(d.tf * ln(CAST(n.n_docs AS DOUBLE) / f.doc_freq), 6) AS tfidf
      FROM dtc d JOIN dfreq f USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF signature terms, top-3 per document: one (doc,term) agg,
    doc-frequency derived from it (no second text pass), term-keyed
    join, ranking window with deterministic tie-break."""
    docs = _docs(spark, sf_dir)
    scored = tfidf(docs, "doc_id", "text")
    return topk_per_group(
        scored,
        partition_by=["doc_id"],
        order_by=[F.col("tfidf").desc(), F.col("term")],
        k=3,
    ).select(
        "doc_id", "term", "tf", "tfidf", F.col("rn").cast("long").alias("rn")
    )


# PII plus a banned-term policy entry — the extra alternation makes the
# scrub observable on the synthetic corpus (which contains no emails).
# ---------------------------------------------------------------------------
# Sequence packing + token-budget accounting.
# ---------------------------------------------------------------------------

_PACK_MAX, _PACK_OVERLAP = 64, 8
_PACK_STRIDE = _PACK_MAX - _PACK_OVERLAP

# Pinned WordPiece vocab for the subword-budget leg (round 7): single
# chars of the corpus alphabet EXCEPT 'b'/'##b' (so 'batch'/'big' fail
# word-initially and 'table' fails mid-word -> [UNK], exercising both
# bad paths under the hash), plus multi-char pieces that only a greedy
# LONGEST-match scanner picks ('join'->[jo,##in], 'window'->[wind,##ow],
# 'sort'->[sor,##t] not [s,##o,##r,##t]).
_SUBWORD_VOCAB = (
    [c for c in "acdefghijklmnopqrstuvwy"]
    + ["##" + c for c in "acdefghijklmnopqrstuvwy"]
    + [
        "jo", "##in", "sc", "##an", "wind", "##ow", "cust", "##omer",
        "fil", "##ter", "que", "##ry", "str", "##eam", "sor", "##der",
        "##ue",
    ]
)
_SUBWORD_VOCAB_SQL = "[" + ", ".join(f"'{p}'" for p in _SUBWORD_VOCAB) + "]"


@_q(
    "pack_token_budget",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source, lang,
             regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    wexp AS (
      SELECT source, lang,
             unnest(list_filter(t, x -> x <> '')) AS w
      FROM (SELECT source, lang,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents)
    ),
    dwords AS (SELECT DISTINCT w FROM wexp),
    -- greedy LONGEST-match WordPiece against the pinned vocab, one
    -- deterministic chain per distinct word: pick = longest candidate
    -- length whose (word-initial | ##continuation) surface is in the
    -- vocab; no match -> the whole word is one [UNK]
    tok(w, rem, n, bad) AS (
      SELECT w, w, 0, false FROM dwords WHERE length(w) <= 32
      UNION ALL
      SELECT w,
             CASE WHEN pick IS NULL THEN rem ELSE substr(rem, pick + 1) END,
             n + 1,
             pick IS NULL
      FROM (
        SELECT w, rem, n,
               list_max([k FOR k IN range(1, least(length(rem), 16) + 1)
                         IF list_contains({_SUBWORD_VOCAB_SQL},
                              CASE WHEN n = 0 THEN rem[1:k]
                                   ELSE '##' || rem[1:k] END)]) AS pick
        FROM tok WHERE length(rem) > 0 AND NOT bad
      )
    ),
    wp AS (
      SELECT w, CASE WHEN bad THEN 1 ELSE n END AS n_pieces
      FROM tok WHERE bad OR length(rem) = 0
      UNION ALL
      SELECT w, 1 FROM dwords WHERE length(w) > 32
    ),
    sw AS (
      SELECT source, lang, CAST(sum(p.n_pieces) AS BIGINT) AS subword_tokens
      FROM wexp e JOIN wp p ON e.w = p.w
      GROUP BY source, lang
    ),
    cn AS (
      SELECT doc_id, source, lang, t,
             CASE WHEN len(t) <= {_PACK_MAX} THEN 1
                  ELSE 1 + (len(t) - {_PACK_MAX} + {_PACK_STRIDE - 1})
                           // {_PACK_STRIDE}
             END AS n_chunks
      FROM toks
    ),
    ch AS (
      SELECT doc_id, source, lang, t,
             unnest(range(0, n_chunks)) AS chunk_id
      FROM cn
    ),
    per_chunk AS (
      SELECT source, lang,
             CAST(len(list_slice(t, chunk_id * {_PACK_STRIDE} + 1,
                                    chunk_id * {_PACK_STRIDE} + {_PACK_MAX}))
                  AS BIGINT) AS chunk_tokens,
             CAST('0x' || substr(md5(array_to_string(
               list_slice(t, chunk_id * {_PACK_STRIDE} + 1,
                             chunk_id * {_PACK_STRIDE} + {_PACK_MAX}), ' ')),
               1, 8) AS BIGINT) AS cksum
      FROM ch
    ),
    chunk_stats AS (
      SELECT source, lang,
             count(*) AS n_chunks,
             CAST(sum(chunk_tokens) AS BIGINT) AS chunk_tokens,
             CAST(sum(cksum) AS BIGINT) AS chunk_checksum
      FROM per_chunk GROUP BY source, lang
    ),
    doc_stats AS (
      SELECT source, lang,
             count(*) AS n_docs,
             CAST(sum(len(list_filter(t, x -> x <> ''))) AS BIGINT)
               AS total_tokens
      FROM toks GROUP BY source, lang
    )
    SELECT d.source, d.lang, d.n_docs, d.total_tokens,
           s.subword_tokens,
           c.n_chunks, c.chunk_tokens, c.chunk_checksum
    FROM doc_stats d
    JOIN chunk_stats c ON d.source = c.source AND d.lang = c.lang
    JOIN sw s ON d.source = s.source AND d.lang = s.lang
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting + sequence packing in one report
    (registry-consolidated from token_budget_by_source +
    pack_sequences_docs): docs and whitespace tokens per (source,
    lang) slice — the mix-weighting input of corpus curation — joined
    with the packed-chunk counts from 64-token/8-overlap windows.
    Chunk CONTENT stays verified through the md5-derived checksum
    summed per slice (sum of 32-bit hash prefixes — order-insensitive
    and exact in BIGINT), so a mis-sliced window still breaks the
    hash even though the report is aggregated. Plan: one narrow token
    count + one chunk fan-out, each partially aggregated to the tiny
    (source, lang) grain before a broadcast-sized join.

    Round 7 folds the SUBWORD TOKENIZER under this hash: the budget
    report gains a ``subword_tokens`` column computed by
    ``tokenize.subword_token_count`` against a pinned WordPiece vocab
    (zero-UDF greedy longest-match, word-grain memoized), and the
    oracle replays greedy matching as a recursive CTE over the
    distinct words — longest-candidate pick, ``##`` continuation
    surfaces, and the whole-word [UNK] failure path are all algebra
    the hash must agree on (operators/tokenize.py:148)."""
    from mpg_data_warehouse_spark.operators.chunking import pack_sequences
    from mpg_data_warehouse_spark.operators.text import tokens
    from mpg_data_warehouse_spark.operators.tokenize import (
        subword_token_count,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    toks = F.filter(tokens("text"), lambda t: t != F.lit(""))
    doc_stats = (
        docs.select("source", "lang", F.size(toks).cast("long").alias("_n"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
        )
    )
    sub_stats = (
        subword_token_count(
            docs.select("doc_id", "source", "lang", "text"),
            list(_SUBWORD_VOCAB),
            id_col="doc_id",
            text_col="text",
        )
        .groupBy("source", "lang")
        .agg(F.sum("n_subword_tokens").alias("subword_tokens"))
    )
    chunks = pack_sequences(
        docs.select("doc_id", "text"), "doc_id", "text", _PACK_MAX, _PACK_OVERLAP
    )
    chunk_stats = (
        chunks.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .select(
            "source",
            "lang",
            F.col("n_tokens").cast("long").alias("chunk_tokens"),
            F.conv(
                F.substring(F.md5(F.col("chunk_text").cast("binary")), 1, 8),
                16,
                10,
            )
            .cast("long")
            .alias("cksum"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").alias("chunk_tokens"),
            F.sum("cksum").alias("chunk_checksum"),
        )
    )
    return (
        doc_stats.join(chunk_stats, ["source", "lang"])
        .join(sub_stats, ["source", "lang"])
        .select(
            "source", "lang", "n_docs", "total_tokens", "subword_tokens",
            "n_chunks", "chunk_tokens", "chunk_checksum",
        )
    )


@_q(
    "scd2_customer_segments",
    """
    WITH upd AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 500 AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 2000000, 'NEWSEG', 0.0
      FROM customer WHERE c_custkey % 89 = 0
    ),
    merged AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal FROM upd
    ),
    chg AS (
      SELECT c_custkey, 'MACHINERY' AS new_seg, c_acctbal + 100 AS new_bal
      FROM merged WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEWSEG', 0.0
      FROM merged WHERE c_custkey % 97 = 0
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           '1995-01-01' AS effective_from, '9999-12-31' AS effective_to,
           TRUE AS is_current
    FROM merged c
    WHERE c.c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           '1995-01-01', '2000-06-15', FALSE
    FROM merged c JOIN chg ON c.c_custkey = chg.c_custkey
    UNION ALL
    SELECT chg.c_custkey, chg.new_seg, chg.new_bal,
           '2000-06-15', '9999-12-31', TRUE
    FROM chg
    """,
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-maintenance pipeline (registry-consolidated from
    merge_upsert_customers + the SCD2 apply): first the MERGE
    semantics (J4/S12 mutation path, operators.append.merged_view —
    every 5th customer's balance adjusted, every 89th key inserted
    brand new), then SCD2 bootstrap of the merged dimension as of
    1995-01-01 and a change batch (every 7th merged customer
    re-segmented with a balance adjustment; every 97th key arrives
    brand new) applied as of 2000-06-15. The oracle reconstructs the
    identical untouched/closed/reopened partition with set logic over
    the same merged view."""
    from mpg_data_warehouse_spark.operators.append import merged_view
    from mpg_data_warehouse_spark.operators.scd import scd2_apply, scd2_init

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updates = raw.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 500).alias("c_acctbal"),
    ).unionByName(
        raw.filter(F.col("c_custkey") % 89 == 0).select(
            (F.col("c_custkey") + 2000000).alias("c_custkey"),
            F.lit("NEWSEG").alias("c_mktsegment"),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    cust = merged_view(raw, updates, ["c_custkey"])
    dim = scd2_init(cust, "1995-01-01")
    changes = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.lit("MACHINERY").alias("c_mktsegment"),
            (F.col("c_acctbal") + 100).alias("c_acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    out = scd2_apply(
        dim, changes, "c_custkey", ["c_mktsegment", "c_acctbal"], "2000-06-15"
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.col("effective_from").cast("string").alias("effective_from"),
        F.col("effective_to").cast("string").alias("effective_to"),
        "is_current",
    )


_SHINGLE_SQL = """list_distinct(list_transform(
               range(0, greatest(len(t) - 3, 0) + 1),
               i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))"""


@_q(
    "eval_contamination_pairs",
    f"""
    WITH evt AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 10
    ),
    cot AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id >= 10
    ),
    ev AS (
      SELECT doc_id AS eval_id, unnest({_SHINGLE_SQL}) AS shingle FROM evt
    ),
    co AS (
      SELECT doc_id AS corpus_id, unnest({_SHINGLE_SQL}) AS shingle FROM cot
    ),
    sizes AS (
      SELECT eval_id, count(*) AS n_eval_shingles FROM ev GROUP BY eval_id
    ),
    shared AS (
      SELECT ev.eval_id, co.corpus_id, count(*) AS n_shared
      FROM co JOIN ev USING (shingle)
      GROUP BY ev.eval_id, co.corpus_id
    )
    SELECT s.eval_id, s.corpus_id, s.n_shared, z.n_eval_shingles,
           round(CAST(s.n_shared AS DOUBLE) / z.n_eval_shingles, 4) AS overlap
    FROM shared s JOIN sizes z USING (eval_id)
    WHERE round(CAST(s.n_shared AS DOUBLE) / z.n_eval_shingles, 4) > 0.05
    """,
)
def eval_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: containment of each eval doc's trigram
    set inside every corpus doc sharing content. Eval side broadcasts;
    the corpus scan never shuffles."""
    from mpg_data_warehouse_spark.operators.dedup import contamination_report

    docs = _docs(spark, sf_dir)
    eval_set = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    return contamination_report(corpus, eval_set, min_overlap=0.05)


@_q(
    "corpus_mix_rebalance",
    """
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    tot AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS total
      FROM tok GROUP BY source
    ),
    kept AS (
      SELECT t.source, t.n_tok
      FROM tok t JOIN tot USING (source)
      WHERE (CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 10000)
            < CAST(floor(least(1.0, 800.0 / tot.total) * 10000) AS BIGINT)
    )
    SELECT source,
           count(*) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept
    FROM kept
    GROUP BY source
    """,
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mix shaping: down-sample every source toward an 800-token
    budget with DATA-DEPENDENT but fully deterministic rates — one
    small per-source total aggregate broadcast back, hash-bucket keep
    decision, floor() cutoffs, all replayed exactly by the oracle."""
    from mpg_data_warehouse_spark.operators.sampling import budget_rebalance_sample
    from mpg_data_warehouse_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.filter(tokens("text"), lambda t: t != F.lit(""))
    tok = docs.select(
        "doc_id", "source", F.size(toks).cast("long").alias("n_tok")
    )
    kept = budget_rebalance_sample(
        tok, strata="source", key="doc_id", weight="n_tok", target_per_stratum=800.0
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("tokens_kept"),
    )


@_q(
    "funnel_click_to_purchase",
    """
    WITH ev AS (
      SELECT user_id AS usr, epoch_us(ts) // 1000000 AS s, event_type
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    fa AS (
      SELECT usr, min(s) AS a_s FROM ev WHERE event_type = 'click' GROUP BY usr
    ),
    fb AS (
      SELECT e.usr, min(e.s) AS b_s
      FROM ev e JOIN fa ON fa.usr = e.usr
      WHERE e.event_type = 'purchase' AND e.s >= fa.a_s
      GROUP BY e.usr
    ),
    users AS (
      SELECT 'user' AS kind, fa.usr AS user_id, fa.a_s, fb.b_s,
             (fb.b_s IS NOT NULL AND fb.b_s - fa.a_s <= 3600) AS converted,
             CAST(NULL AS BIGINT) AS n_clickers,
             CAST(NULL AS BIGINT) AS n_purchasers,
             CAST(NULL AS BIGINT) AS n_overlap,
             CAST(NULL AS DOUBLE) AS kmv_clickers,
             CAST(NULL AS DOUBLE) AS kmv_purchasers,
             CAST(NULL AS DOUBLE) AS kmv_overlap
      FROM fa LEFT JOIN fb ON fa.usr = fb.usr
    ),
    -- KMV bottom-64 replay (operators/sketch.py): 56-bit hash = first
    -- 14 md5 hex chars; the k-set is the 64 smallest DISTINCT hashes
    -- per step; theta = min over full sketches of the kth hash (else
    -- the whole 2^56 domain); intersection sample = shared hashes
    -- below theta, scaled by the domain/theta ratio
    hashes AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(CAST(usr AS VARCHAR)), 1, 14)
                  AS BIGINT) AS h
      FROM ev WHERE usr IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM hashes
    ),
    ka AS (SELECT h FROM ranked WHERE event_type = 'click' AND r <= 64),
    kb AS (SELECT h FROM ranked WHERE event_type = 'purchase' AND r <= 64),
    stats AS (
      SELECT (SELECT count(*) FROM ka) AS cnt_a,
             (SELECT max(h) FROM ka) AS kth_a,
             (SELECT count(*) FROM kb) AS cnt_b,
             (SELECT max(h) FROM kb) AS kth_b
    ),
    theta AS (
      SELECT cnt_a, kth_a, cnt_b, kth_b,
             least(CASE WHEN cnt_a >= 64 THEN kth_a
                        ELSE 72057594037927936 END,
                   CASE WHEN cnt_b >= 64 THEN kth_b
                        ELSE 72057594037927936 END) AS th
      FROM stats
    ),
    inter AS (
      SELECT count(*) AS ci
      FROM ka JOIN kb USING (h) CROSS JOIN theta WHERE h < theta.th
    ),
    flags AS (
      SELECT usr,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
      FROM ev WHERE usr IS NOT NULL GROUP BY usr
    ),
    exact AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_clickers,
             CAST(sum(cb) AS BIGINT) AS n_purchasers,
             CAST(sum(ca * cb) AS BIGINT) AS n_overlap
      FROM flags
    ),
    audience AS (
      SELECT 'audience' AS kind,
             CAST(NULL AS BIGINT) AS user_id,
             CAST(NULL AS BIGINT) AS a_s,
             CAST(NULL AS BIGINT) AS b_s,
             CAST(NULL AS BOOLEAN) AS converted,
             e.n_clickers, e.n_purchasers, e.n_overlap,
             round(CASE WHEN t.cnt_a < 64 THEN CAST(t.cnt_a AS DOUBLE)
                        ELSE CAST(63 AS DOUBLE)
                             * CAST(72057594037927936 AS DOUBLE)
                             / CAST(t.kth_a AS DOUBLE) END, 4)
               AS kmv_clickers,
             round(CASE WHEN t.cnt_b < 64 THEN CAST(t.cnt_b AS DOUBLE)
                        ELSE CAST(63 AS DOUBLE)
                             * CAST(72057594037927936 AS DOUBLE)
                             / CAST(t.kth_b AS DOUBLE) END, 4)
               AS kmv_purchasers,
             round(CASE WHEN t.th = 72057594037927936
                        THEN CAST(i.ci AS DOUBLE)
                        ELSE CAST(i.ci AS DOUBLE)
                             * CAST(72057594037927936 AS DOUBLE)
                             / CAST(t.th AS DOUBLE) END, 4)
               AS kmv_overlap
      FROM exact e CROSS JOIN theta t CROSS JOIN inter i
    ),
    -- Count-Min replay for the STREAMED frequency sketch (r9): per
    -- step, probe = the smallest user id; exact count next to the
    -- CMS point estimate (min over 4 seeded-md5 bucket-match counts,
    -- width 256) — operators/sketch.py::_cms_bucket bit for bit
    cprobe AS (
      SELECT event_type, min(usr) AS pu
      FROM ev WHERE usr IS NOT NULL GROUP BY event_type
    ),
    cexact AS (
      SELECT e.event_type, p.pu, count(*) AS exact_n
      FROM ev e JOIN cprobe p
        ON e.event_type = p.event_type AND e.usr = p.pu
      GROUP BY e.event_type, p.pu
    ),
    cbuck AS (
      SELECT e.event_type, d.d, count(*) AS cnt
      FROM ev e
      JOIN cprobe p ON e.event_type = p.event_type
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(d)
      WHERE e.usr IS NOT NULL
        AND CAST('0x' || substr(md5('cms' || d.d || '|'
                                    || CAST(e.usr AS VARCHAR)), 1, 8)
                 AS BIGINT) % 256
          = CAST('0x' || substr(md5('cms' || d.d || '|'
                                    || CAST(p.pu AS VARCHAR)), 1, 8)
                 AS BIGINT) % 256
      GROUP BY e.event_type, d.d
    ),
    cest AS (SELECT event_type, min(cnt) AS est FROM cbuck GROUP BY event_type),
    cmsrows AS (
      SELECT 'cms_' || x.event_type AS kind,
             x.pu AS user_id,
             CAST(x.exact_n AS BIGINT) AS a_s,
             CAST(e.est AS BIGINT) AS b_s,
             CAST(NULL AS BOOLEAN) AS converted,
             CAST(NULL AS BIGINT) AS n_clickers,
             CAST(NULL AS BIGINT) AS n_purchasers,
             CAST(NULL AS BIGINT) AS n_overlap,
             CAST(NULL AS DOUBLE) AS kmv_clickers,
             CAST(NULL AS DOUBLE) AS kmv_purchasers,
             CAST(NULL AS DOUBLE) AS kmv_overlap
      FROM cexact x JOIN cest e ON x.event_type = e.event_type
    ),
    -- bottom-64 quantile-sketch replay (operators/sketch.py) for the
    -- STREAMED sample of each step's value distribution: the sample
    -- is the 64 rows with the smallest event-id hashes, the estimate
    -- the lower order statistic of its values
    qsr AS (
      SELECT event_type, value AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY h, value) AS r
      FROM (
        SELECT event_type, value,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14)
                    AS BIGINT) AS h
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      )
    ),
    qsamp AS (
      SELECT event_type, list(v ORDER BY v) AS vs
      FROM qsr WHERE r <= 64 GROUP BY event_type
    ),
    qsrows AS (
      SELECT 'qs_' || event_type AS kind,
             CAST(NULL AS BIGINT) AS user_id,
             CAST(len(vs) AS BIGINT) AS a_s,
             CAST(NULL AS BIGINT) AS b_s,
             CAST(NULL AS BOOLEAN) AS converted,
             CAST(NULL AS BIGINT) AS n_clickers,
             CAST(NULL AS BIGINT) AS n_purchasers,
             CAST(NULL AS BIGINT) AS n_overlap,
             vs[CAST(floor(0.5 * (len(vs) - 1)) AS INT) + 1]
               AS kmv_clickers,
             CAST(NULL AS DOUBLE) AS kmv_purchasers,
             CAST(NULL AS DOUBLE) AS kmv_overlap
      FROM qsamp
    )
    SELECT * FROM users UNION ALL SELECT * FROM audience
    UNION ALL SELECT * FROM cmsrows
    UNION ALL SELECT * FROM qsrows
    """,
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-step funnel (first click → first purchase at or
    after it, 1-hour conversion window) — cost proportional to the
    two step types' volume, not the event stream. Timestamps emitted
    as epoch seconds (truncating cast on both engines).

    r8 folds the KMV/theta bottom-k sketch family
    (operators/sketch.py::kmv_sketch / kmv_estimate /
    kmv_intersect_estimate) under this hash via an ``audience``
    summary leg: per-step distinct-user sketches built in ONE events
    pass (grouped by step, map-side WindowGroupLimit top-k), the
    clicker∩purchaser overlap estimated FROM THE SKETCHES ALONE next
    to the exact overlap — the segment-overlap question HLL registers
    cannot answer without the raw rows. At sf0.001 (15 users < k=64)
    the contract pins the exact branch; at sf0.01/0.1 (150/1500
    users) the estimator branch — both replayed hash-exactly by the
    oracle.

    Round 9 routes THREE streaming sketch twins through this hash,
    drained concurrently over the same staged steps (real availableNow
    file streams, two micro-batches via maxFilesPerTrigger=1): the
    per-step KMV sketches come from running_distinct_kmv_stream with
    the oracle unchanged — the streamed bottom-k state must be
    bit-identical to the batch build or every estimate drifts;
    running_term_freq_stream's drained Count-Min counters answer a
    per-step point probe (smallest user id) emitted as ``cms_*`` rows
    next to the exact count, replayed bucket-for-bucket; and
    running_quantile_stream's drained bottom-k value sample emits
    ``qs_*`` rows (sample size + median estimate), replayed
    sample-for-sample."""
    from mpg_data_warehouse_spark.operators import sketch as S
    from mpg_data_warehouse_spark.operators.temporal import funnel_conversion

    _K = S.KMV_K  # 64; the oracle inlines it
    ev = _events(spark, sf_dir)
    steps = ev.filter(F.col("event_type").isin("click", "purchase"))
    out = funnel_conversion(
        ev, "user_id", "ts", "event_type", "click", "purchase", 3600
    )
    _nulls = [
        F.lit(None).cast("long").alias("n_clickers"),
        F.lit(None).cast("long").alias("n_purchasers"),
        F.lit(None).cast("long").alias("n_overlap"),
        F.lit(None).cast("double").alias("kmv_clickers"),
        F.lit(None).cast("double").alias("kmv_purchasers"),
        F.lit(None).cast("double").alias("kmv_overlap"),
    ]
    users = out.select(
        F.lit("user").alias("kind"),
        F.col("user").alias("user_id"),
        F.col("a_ts").cast("long").alias("a_s"),
        F.col("b_ts").cast("long").alias("b_s"),
        "converted",
        *_nulls,
    )
    # r9: the per-step sketches come from the STREAMING twin
    # (streaming/events.py::running_distinct_kmv_stream) instead of
    # the batch kmv_sketch — the steps are staged as a 2-file parquet
    # dir and drained as a real availableNow file stream with
    # maxFilesPerTrigger=1, so TWO genuine micro-batches flow through
    # applyInPandasWithState before the final bottom-k state feeds
    # the estimates below. The oracle is UNCHANGED: the hash is the
    # external proof the streamed state is bit-identical to the batch
    # build (one drifted long in kmv_minima breaks kmv_estimate /
    # kmv_intersect_estimate and the slot goes red).
    import tempfile
    import uuid

    from mpg_data_warehouse_spark.streaming import events as SE

    staged = tempfile.mkdtemp(prefix="funnel_kmv_stream_")
    try:
        steps.repartition(2).write.mode("overwrite").parquet(staged)
        mem = f"funnel_kmv_{uuid.uuid4().hex}"
        stream_q = (
            SE.running_distinct_kmv_stream(
                SE.read_events_stream(spark, staged, max_files_per_trigger=1),
                k=_K,
            )
            .writeStream.format("memory")
            .queryName(mem)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # start the CMS twin's drain BEFORE awaiting the KMV one — the two
        # availableNow queries run concurrently, so the slot pays one
        # stream-lifecycle latency, not two
        memc = f"funnel_cms_{uuid.uuid4().hex}"
        cms_q = (
            SE.running_term_freq_stream(
                SE.read_events_stream(spark, staged, max_files_per_trigger=1),
                width=256,
                depth=4,
            )
            .writeStream.format("memory")
            .queryName(memc)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # third concurrent drain (r9): the QUANTILE twin
        # (running_quantile_stream) samples each step's VALUE distribution
        # keyed by event_id hash — its final bottom-k state feeds qs_*
        # rows below, replayed sample-for-sample by the oracle
        memq = f"funnel_qs_{uuid.uuid4().hex}"
        qs_q = (
            SE.running_quantile_stream(
                SE.read_events_stream(spark, staged, max_files_per_trigger=1),
                k=64,
            )
            .writeStream.format("memory")
            .queryName(memq)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination returns False on timeout WITHOUT raising — a
        # partial drain would silently feed first-batch-only state into
        # the estimates below, so fail loudly instead
        for qh, qname in ((stream_q, "kmv"), (cms_q, "cms"), (qs_q, "qs")):
            if not qh.awaitTermination(300):
                qh.stop()
                raise TimeoutError(f"funnel {qname} stream drain timed out")
        # update mode emits a key's state once per micro-batch it appears
        # in; the FINAL state is the row with the most minima (sub-k
        # growth phase) then the smallest k-th hash (at-k shrink phase) —
        # a tie on both means the emitted sets are bit-identical
        wfin = W.partitionBy("event_type").orderBy(
            F.size(S.KMV_COL).desc(), F.array_max(F.col(S.KMV_COL)).asc()
        )
        # materialize the (per-step-sized) final states eagerly, then drop
        # the uuid-named memory-sink tables — leaving them registered
        # would pin every drained emission in driver memory per
        # invocation, exactly the long-lived-driver debris run_scoped
        # exists to prevent
        per_step = (
            spark.table(mem)
            .withColumn("_rk", F.row_number().over(wfin))
            .filter(F.col("_rk") == 1)
            .select("event_type", S.KMV_COL)
            .localCheckpoint(eager=True)
        )
        wide = per_step.groupBy().agg(
            F.first(
                F.when(F.col("event_type") == "click", F.col(S.KMV_COL)),
                ignorenulls=True,
            ).alias("_a"),
            F.first(
                F.when(F.col("event_type") == "purchase", F.col(S.KMV_COL)),
                ignorenulls=True,
            ).alias("_b"),
        )
        exact = (
            steps.filter(F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(
                F.max((F.col("event_type") == "click").cast("int")).alias("ca"),
                F.max((F.col("event_type") == "purchase").cast("int")).alias(
                    "cb"
                ),
            )
            .agg(
                F.sum("ca").alias("n_clickers"),
                F.sum("cb").alias("n_purchasers"),
                F.sum(F.col("ca") * F.col("cb")).alias("n_overlap"),
            )
        )
        audience = exact.crossJoin(F.broadcast(wide)).select(
            F.lit("audience").alias("kind"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("long").alias("a_s"),
            F.lit(None).cast("long").alias("b_s"),
            F.lit(None).cast("boolean").alias("converted"),
            "n_clickers",
            "n_purchasers",
            "n_overlap",
            S.kmv_estimate(F.col("_a"), k=_K).alias("kmv_clickers"),
            S.kmv_estimate(F.col("_b"), k=_K).alias("kmv_purchasers"),
            S.kmv_intersect_estimate(F.col("_a"), F.col("_b"), k=_K).alias(
                "kmv_overlap"
            ),
        )
        # r9: the CMS streaming twin (running_term_freq_stream, drained
        # above concurrently with the KMV one over the SAME staged steps):
        # per step the smallest user id is probed against the streamed
        # counters — exact count next to the CMS point estimate, both
        # replayed by the oracle, so the hash proves the drained counter
        # array equals the batch algebra end-to-end.
        # counters are sums → the final emission per key has the largest
        # counter total (strictly monotone across micro-batches)
        wcms = W.partitionBy("event_type").orderBy(
            F.aggregate(
                "cms_counters", F.lit(0).cast("long"), lambda a, x: a + x
            ).desc()
        )
        counters = (
            spark.table(memc)
            .withColumn("_rk", F.row_number().over(wcms))
            .filter(F.col("_rk") == 1)
            .select("event_type", "cms_counters")
            .localCheckpoint(eager=True)
        )
        # quantile twin's final state: bottom-k by id-hash grows while
        # sub-k, then its largest retained hash only shrinks — same
        # selection logic as the KMV dedup above, on the (h, v) structs
        wqs = W.partitionBy("event_type").orderBy(
            F.size("qs_sample").desc(),
            F.expr("element_at(qs_sample, -1).h").asc(),
        )
        qs_state = (
            spark.table(memq)
            .withColumn("_rk", F.row_number().over(wqs))
            .filter(F.col("_rk") == 1)
            .select("event_type", "qs_sample")
            .localCheckpoint(eager=True)
        )
        spark.catalog.dropTempView(mem)
        spark.catalog.dropTempView(memc)
        spark.catalog.dropTempView(memq)
    finally:
        # the staged 2-file parquet dir is removed on EVERY exit
        # — drained or failed — or each failed invocation leaks a
        # temp dir (r10 review finding); on the success path the
        # final states are already eagerly checkpointed (the scoped
        # registration above releases those; this releases the disk)
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
    probe = (
        steps.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.min("user_id").alias("_pu"))
    )
    cexact = (
        steps.join(probe, "event_type")
        .filter(F.col("user_id") == F.col("_pu"))
        .groupBy("event_type", "_pu")
        .agg(F.count(F.lit(1)).alias("_exact"))
    )
    cms_rows = cexact.join(counters, "event_type").select(
        F.concat(F.lit("cms_"), F.col("event_type")).alias("kind"),
        F.col("_pu").alias("user_id"),
        F.col("_exact").cast("long").alias("a_s"),
        S.cms_query(
            F.col("cms_counters"),
            F.col("_pu").cast("string"),
            width=256,
            depth=4,
        )
        .cast("long")
        .alias("b_s"),
        F.lit(None).cast("boolean").alias("converted"),
        *_nulls,
    )
    # qs_* rows (r9): per step, the STREAMED sample's size and its
    # median estimate of the event VALUE distribution. Tagged-union
    # column reuse (the txlog_merge_diff rollup pattern): a_s carries
    # the sample size, kmv_clickers the double-typed qs_p50.
    qs_rows = qs_state.select(
        F.concat(F.lit("qs_"), F.col("event_type")).alias("kind"),
        F.lit(None).cast("long").alias("user_id"),
        F.size("qs_sample").cast("long").alias("a_s"),
        F.lit(None).cast("long").alias("b_s"),
        F.lit(None).cast("boolean").alias("converted"),
        F.lit(None).cast("long").alias("n_clickers"),
        F.lit(None).cast("long").alias("n_purchasers"),
        F.lit(None).cast("long").alias("n_overlap"),
        S.quantile_estimate(F.col("qs_sample"), 0.5).alias("kmv_clickers"),
        F.lit(None).cast("double").alias("kmv_purchasers"),
        F.lit(None).cast("double").alias("kmv_overlap"),
    )
    return (
        users.unionByName(audience)
        .unionByName(cms_rows)
        .unionByName(qs_rows)
    )


@_q(
    "local_supplier_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey
      AND year(o.o_orderdate) >= 1996
    GROUP BY n.n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue: the full snowflake
    (fact → orders → customer, fact → supplier → nation → region)
    with the join-key-correlation predicate c_nationkey = s_nationkey.

    Plan: customer/supplier/nation/region all broadcast (dim-sized);
    the only fact-scale shuffle is lineitem→orders. The correlation
    filter runs map-side after the broadcasts — Catalyst cannot push
    it below either join (it spans both branches), which is exactly
    why the dims must broadcast: a shuffle-join snowflake would move
    the fact four times."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") >= 1996)
    cust = F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    supp = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@_q(
    "user_value_windows",
    """
    SELECT user_id,
           event_id,
           round(avg(value) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts) // 1000000, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 4) AS rolling_avg,
           round(value - lag(value) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts) // 1000000, event_id
           ), 4) AS delta,
           CAST(row_number() OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts) // 1000000, event_id
           ) AS BIGINT) AS seq
    FROM events
    WHERE user_id < 50
    """,
)
def user_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered window FRAME (rows between 4 preceding and current)
    rolling mean + lag()-based change detection + sequence rank, all
    over ONE (partition, order) spec so Spark plans a single window
    operator — one shuffle on user_id, one per-partition sort
    (registry-consolidated from rolling_avg_user_value +
    user_value_deltas; the W-family extension beyond the reference's
    single partition count). First event's delta is NULL on both
    engines; ties broken by event_id so frame contents are
    partitioning-independent. The user_id filter pushes to the scan."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    order = [F.col("ts").cast("long"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    frame = w.rowsBetween(-4, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(frame), 4).alias("rolling_avg"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        F.row_number().over(w).cast("long").alias("seq"),
    )



# ---------------------------------------------------------------------------
# Round-5 oracle rotation: external hash verification for the round-4
# operator families (txlog, BM25 search, PQ/ADC, DSIR, NB classifier,
# dense retrieval). Each query runs the REAL operator; the oracle
# reconstructs its contract from the same parquet inputs (plus pinned
# literals where the operator takes driver-side parameters).
# ---------------------------------------------------------------------------


@_q(
    "txlog_merge_diff",
    """
    WITH v0 AS (
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ),
    head AS (
      -- MERGE semantics reconstructed: matched keys take the update,
      -- unmatched updates insert, untouched rows survive
      SELECT s_suppkey, s_name,
             CASE WHEN s_suppkey % 3 = 0
                  THEN round(s_acctbal + 1000.0, 2)
                  ELSE s_acctbal
             END AS s_acctbal
      FROM supplier
      UNION ALL
      SELECT s_suppkey + 1000000 AS s_suppkey,
             'NEW_' || s_name AS s_name,
             0.0 AS s_acctbal
      FROM supplier WHERE s_suppkey < 5
    )
    SELECT h.s_suppkey, h.s_name, h.s_acctbal,
           'new_or_changed' AS change_tag
    FROM head h
    WHERE NOT EXISTS (
      SELECT 1 FROM v0
      WHERE v0.s_suppkey = h.s_suppkey
        AND v0.s_acctbal IS NOT DISTINCT FROM h.s_acctbal
    )
    UNION ALL
    SELECT o.s_suppkey, o.s_name, o.s_acctbal,
           'replaced' AS change_tag
    FROM v0 o
    WHERE NOT EXISTS (
      SELECT 1 FROM head h
      WHERE h.s_suppkey = o.s_suppkey
        AND h.s_acctbal IS NOT DISTINCT FROM o.s_acctbal
    )
    UNION ALL
    SELECT s_suppkey % 10 AS s_suppkey,
           'ROLLUP_' || CAST(s_suppkey % 10 AS VARCHAR) AS s_name,
           CAST(sum(s_suppkey) AS DOUBLE) AS s_acctbal,
           'rollup_n=' || CAST(count(*) AS VARCHAR) AS change_tag
    FROM head
    GROUP BY s_suppkey % 10
    -- r9: Bloom file-skipping IN-probe, stale then refreshed sidecar —
    -- both must equal the plain IN over the head (no false negatives,
    -- residual filter exact)
    UNION ALL
    SELECT h.s_suppkey, h.s_name, h.s_acctbal,
           'bloom_probe_stale' AS change_tag
    FROM head h WHERE h.s_suppkey IN (3, 4, 1000001, 999999999)
    UNION ALL
    SELECT h.s_suppkey, h.s_name, h.s_acctbal,
           'bloom_probe_fresh' AS change_tag
    FROM head h WHERE h.s_suppkey IN (3, 4, 1000001, 999999999)
    -- r10: second sidecar (s_name) probed after maintain_table
    -- compacted the table and refreshed BOTH sidecars — one merge-
    -- inserted name, one untouched name, one guaranteed miss
    UNION ALL
    SELECT h.s_suppkey, h.s_name, h.s_acctbal,
           'bloom_probe_name' AS change_tag
    FROM head h WHERE h.s_name IN (
      SELECT 'NEW_' || s_name FROM supplier WHERE s_suppkey = 1
      UNION ALL SELECT s_name FROM supplier WHERE s_suppkey = 2
      UNION ALL SELECT 'NO_SUCH_SUPPLIER'
    )
    -- r10: incremental QUANTILE sketch rollup replay — the rollup
    -- bootstrapped on the even-key half and delta-maintained after
    -- the odd-key append must equal the bottom-256-by-id-hash sample
    -- over the FULL supplier set (merge ≡ direct build), its p50 the
    -- lower order statistic of the sample's values
    UNION ALL
    SELECT grp AS s_suppkey,
           'QS_' || CAST(grp AS VARCHAR) AS s_name,
           vs[CAST(floor(0.5 * (len(vs) - 1)) AS INT) + 1] AS s_acctbal,
           'sketch_rollup_qs_n=' || CAST(len(vs) AS VARCHAR) AS change_tag
    FROM (
      SELECT grp, list(v ORDER BY v) AS vs
      FROM (
        SELECT grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY h, v) AS r
        FROM (
          SELECT s_suppkey % 10 AS grp,
                 CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)),
                                     1, 14) AS BIGINT) AS h,
                 s_acctbal AS v
          FROM supplier WHERE s_acctbal IS NOT NULL
        )
      ) WHERE r <= 256
      GROUP BY grp
    )
    -- r9: incremental HLL sketch rollup replay (operators/sketch.py
    -- register algebra, p=8) over the full supplier key set per grp —
    -- the maintained rollup (bootstrap + one delta) must match
    UNION ALL
    SELECT grp AS s_suppkey,
           'HLL_' || CAST(grp AS VARCHAR) AS s_name,
           round(CASE WHEN raw <= 640.0 AND v > 0
                      THEN 256.0 * ln(256.0 / v)
                      ELSE raw END, 4) AS s_acctbal,
           'sketch_rollup_hll' AS change_tag
    FROM (
      SELECT grp, 256 - count(*) AS v,
             (0.7213 / (1 + 1.079 / 256)) * 256 * 256
               * 144115188075855872
               / CAST(sum(1::BIGINT << (57 - mr))
                      + (256 - count(*)) * (1::HUGEINT << 57)
                      AS DOUBLE) AS raw
      FROM (
        SELECT grp, bucket, max(r) AS mr FROM (
          SELECT s_suppkey % 10 AS grp,
                 hi // 16777216 AS bucket,
                 57 - CASE WHEN (hi % 16777216) * 4294967296 + lo = 0
                           THEN 0
                           ELSE length(bin((hi % 16777216) * 4294967296
                                           + lo))
                      END AS r
          FROM (
            SELECT s_suppkey,
                   CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)),
                                       1, 8) AS BIGINT) AS hi,
                   CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)),
                                       9, 8) AS BIGINT) AS lo
            FROM supplier
          )
        ) GROUP BY grp, bucket
      ) GROUP BY grp
    )
    -- r12: DELETE with an UNTYPED timestamp-string predicate, replayed
    -- as plain SQL DELETE semantics: rows where the predicate is TRUE
    -- are gone, NULL-evaluating rows survive (NOT coalesce(p, false)).
    -- The Spark side runs txlog.delete through its typed-bounds
    -- footer-stats pruning (_coerce_bound) on range-clustered files —
    -- the r11 lexical-compare bug silently RETAINED matching rows,
    -- which this replay turns hash-red.
    UNION ALL
    SELECT s_suppkey % 10 AS s_suppkey,
           'DEL_' || CAST(s_suppkey % 10 AS VARCHAR) AS s_name,
           CAST(sum(s_suppkey) AS DOUBLE) AS s_acctbal,
           'delete_survivors_n=' || CAST(count(*) AS VARCHAR)
             AS change_tag
    FROM supplier
    WHERE NOT coalesce(
      (TIMESTAMP '2020-01-01 00:00:00'
         + to_hours(CAST((s_suppkey * 7) % 96 AS BIGINT)))
        <= TIMESTAMP '2020-01-03 00:00:00', false)
    GROUP BY s_suppkey % 10
    """,
)
def txlog_merge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-log table format under external verification: a
    real txlog table is created from ``supplier``, a deterministic
    MERGE batch (acctbal bump for every 3rd key + 5 inserted keys) is
    upserted through the footer-stats-pruned MERGE path
    (sources/txlog.py::merge), and the output is the change report
    between ``VERSION AS OF 0`` (time travel) and HEAD: rows only in
    the new snapshot vs rows only in the old, as a tagged union of
    both-direction anti-joins (the J8 NOT-IN-both-directions + U1
    tagged-UNION shape, previously covered by union_only_in). The
    oracle reconstructs MERGE semantics in pure SQL.

    Round 6 additionally folds txlog.incremental_rollup under the same
    hash: a SUM/COUNT rollup grouped on a derived ``grp`` column is
    bootstrapped at version 0 (full scan) and then maintained through
    the CDF-delta path after the MERGE (only added/removed files are
    read; deletions contribute negated partials). The rollup rows are
    unioned into the report and the oracle recomputes them as a plain
    GROUP BY over the reconstructed head — the hash match is the
    external proof that bootstrap + delta maintenance ≡ full rescan.

    Round 9 folds two more maintenance families under this hash:
    (1) per-file Bloom skipping (sources/bloom_skip.py) — the sidecar
    is built pre-merge, probed post-merge with a batched IN list
    (stale: merged files uncovered, always kept), then incrementally
    refreshed and probed again (fresh: dead files dropped, pruning
    real); both probes must equal the oracle's plain IN over the
    reconstructed head. (2) incremental_sketch_rollup — a second
    txlog table takes the same supplier rows in two commits
    (even-key create, odd-key append) with an HLL rollup bootstrapped
    then delta-maintained between them; the per-grp estimates are
    replayed register-for-register by the oracle, proving sketch
    bootstrap + delta ≡ full rescan.

    Round 10 routes the refresh through ``maintain_table``
    (sources/maintenance.py — reference surface: the backup/
    maintenance lifecycle src/survey_metadata_update.py:202-221): one
    call compacts the table and refreshes BOTH Bloom sidecars it now
    carries (s_suppkey and s_name — the multi-column
    refresh_all_blooms shape), and the fresh probe exercises
    post-compaction pruning. A third probe hits the s_name sidecar
    (merge-inserted name + untouched name + miss), replayed by the
    oracle's IN-subquery. The CDF window is bounded to the merge head
    so compaction churn stays out of the row-level change report —
    the documented consumer contract for OPTIMIZE cadences.

    Each invocation builds its table in a fresh temp dir: commits,
    data-file writes, log replay, and both snapshot reads all execute
    for real; the returned frame lazily reads the committed files."""
    import tempfile

    from mpg_data_warehouse_spark.sources import txlog

    supplier = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        (F.col("s_suppkey") % 10).alias("grp"),
    )
    table = tempfile.mkdtemp(prefix="txlog_contract_")
    rollup_path = tempfile.mkdtemp(prefix="txlog_rollup_")
    txlog.create(spark, table, supplier)
    # r9 fold: per-file Bloom sidecar built over the PRE-merge files —
    # the merge below rewrites/adds files the sidecar does not cover,
    # so the stale probe exercises the always-keep-uncovered invariant
    # before the refreshed probe exercises real pruning
    from mpg_data_warehouse_spark.sources.bloom_skip import (
        build_file_blooms,
        read_bloom_pruned,
    )

    build_file_blooms(spark, table, "s_suppkey")
    # r10: a SECOND sidecar on s_name — the realistic maintenance
    # shape is a table carrying sidecars on several point-lookup
    # columns, all of which maintain_table below must refresh in one
    # call (refresh_all_blooms multi-column, r9 VERDICT item 7)
    build_file_blooms(spark, table, "s_name")
    rollup_args = (["grp"], {"key_sum": "s_suppkey", "n": "1"})
    # bootstrap the rollup over version 0 (full scan)...
    txlog.incremental_rollup(spark, table, rollup_path, *rollup_args)
    updates = (
        supplier.filter(F.col("s_suppkey") % 3 == 0)
        .withColumn("s_acctbal", F.round(F.col("s_acctbal") + 1000.0, 2))
        .unionByName(
            supplier.filter(F.col("s_suppkey") < 5).select(
                (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
                F.concat(F.lit("NEW_"), F.col("s_name")).alias("s_name"),
                F.lit(0.0).alias("s_acctbal"),
                F.col("grp"),
            )
        )
    )
    txlog.merge(spark, table, updates, keys=["s_suppkey"])
    # the CDF window below is bounded to the merge head: the
    # maintain_table compaction further down is maintenance churn a
    # row-level change consumer must NOT see (read_changes documents
    # exactly this — bound the window, or snapshot-diff instead)
    merge_head = txlog.latest_version(table)
    # ...then maintain it through the CDF-delta path: only the files
    # the MERGE added/removed are read, deletes as negated partials
    txlog.incremental_rollup(spark, table, rollup_path, *rollup_args)

    # r9 fold: batched IN-list Bloom point lookup (bloom_skip.py),
    # TWICE under the hash — first against the stale (pre-merge)
    # sidecar, where every merged file is uncovered and must be kept
    # (false negatives impossible), then after an incremental refresh
    # (dead files dropped, new files sketched) where pruning is real.
    # The residual IN filter keeps both exact; the oracle reconstructs
    # the same IN over the head — one silently pruned row goes red.
    probe_keys = [3, 4, 1000001, 999999999]

    def _bloom_rows(tag: str) -> DataFrame:
        return read_bloom_pruned(
            spark, table, "s_suppkey", values=probe_keys
        ).select(
            "s_suppkey", "s_name", "s_acctbal", F.lit(tag).alias("change_tag")
        )

    bloom_stale = _bloom_rows("bloom_probe_stale")
    # read_bloom_pruned decides the file list eagerly (driver-side
    # maybe-set), so the stale probe is already resolved before the
    # maintenance below rewrites files and sidecars (compaction only
    # un-references data files from the log — it never deletes them —
    # so the resolved stale file list stays readable).
    # r10: the refresh routes through maintain_table (sources/
    # maintenance.py) — ONE call compacts the table and refreshes
    # EVERY sidecar it carries (s_suppkey AND s_name), the OPTIMIZE
    # cadence a 100 TB table actually runs. The fresh probe below now
    # exercises post-compaction pruning: dead files dropped, the two
    # compacted files sketched fresh — and must still equal the
    # oracle's plain IN over the reconstructed head.
    from mpg_data_warehouse_spark.sources.maintenance import maintain_table

    maintained = maintain_table(spark, table, target_partitions=2)
    # explicit raise, not assert: the contract check must survive
    # `python -O` (the sibling folds' rule)
    if set(maintained["blooms"]) != {"s_suppkey", "s_name"}:
        raise AssertionError(
            f"maintain_table refreshed {sorted(maintained['blooms'])}, "
            "expected both sidecars ['s_name', 's_suppkey']"
        )
    bloom_fresh = _bloom_rows("bloom_probe_fresh")
    # second-sidecar probe (r10): one merge-inserted name (lives only
    # in post-merge files), one untouched name, one miss — replayed by
    # the oracle's IN-subquery over the same supplier rows
    name1, name2 = (
        r.s_name
        for r in supplier.filter(F.col("s_suppkey").isin(1, 2))
        .orderBy("s_suppkey")
        .select("s_name")
        .collect()
    )
    bloom_name = read_bloom_pruned(
        spark,
        table,
        "s_name",
        values=[f"NEW_{name1}", name2, "NO_SUCH_SUPPLIER"],
    ).select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.lit("bloom_probe_name").alias("change_tag"),
    )

    # r9 fold: incremental HLL sketch rollup (txlog.py) on a second
    # txlog table built from the SAME supplier rows in two commits —
    # bootstrap over the even-key half, one incremental catch-up after
    # the odd-key append. The emitted per-grp estimates are replayed
    # register-for-register by the oracle over the full supplier set,
    # so the hash proves bootstrap + delta maintenance ≡ full rescan
    # for sketch state (the monotone sibling of the SUM rollup above).
    from mpg_data_warehouse_spark.operators.sketch import hll_estimate

    t2 = tempfile.mkdtemp(prefix="txlog_sketch_src_")
    roll2 = tempfile.mkdtemp(prefix="txlog_sketch_roll_")
    roll3 = tempfile.mkdtemp(prefix="txlog_qs_roll_")
    sk_args = (["grp"], "s_suppkey")
    # r10: a QUANTILE rollup rides the same two-commit lifecycle —
    # bootstrapped on the even half, delta-maintained after the odd
    # append (kind="quantile" reads ONLY the appended files; the
    # bottom-k-by-id-hash sample is insert-monotone like KMV), its
    # p50 + sample size replayed by the oracle over the full set
    qs_kw = dict(kind="quantile", id_cols=["s_suppkey"])
    txlog.create(spark, t2, supplier.filter(F.col("s_suppkey") % 2 == 0))
    txlog.incremental_sketch_rollup(spark, t2, roll2, *sk_args, kind="hll")
    txlog.incremental_sketch_rollup(spark, t2, roll3, ["grp"],
                                    "s_acctbal", **qs_kw)
    txlog.append(spark, t2, supplier.filter(F.col("s_suppkey") % 2 != 0))
    txlog.incremental_sketch_rollup(spark, t2, roll2, *sk_args, kind="hll")
    txlog.incremental_sketch_rollup(spark, t2, roll3, ["grp"],
                                    "s_acctbal", **qs_kw)
    sketch_rows = txlog.read(spark, roll2).select(
        F.col("grp").cast("bigint").alias("s_suppkey"),
        F.concat(F.lit("HLL_"), F.col("grp").cast("string")).alias("s_name"),
        hll_estimate(F.col("hll_registers")).alias("s_acctbal"),
        F.lit("sketch_rollup_hll").alias("change_tag"),
    )
    from mpg_data_warehouse_spark.operators.sketch import quantile_estimate

    qs_sketch_rows = txlog.read(spark, roll3).select(
        F.col("grp").cast("bigint").alias("s_suppkey"),
        F.concat(F.lit("QS_"), F.col("grp").cast("string")).alias("s_name"),
        quantile_estimate(F.col("qs_sample"), 0.5).alias("s_acctbal"),
        F.concat(
            F.lit("sketch_rollup_qs_n="),
            F.size("qs_sample").cast("string"),
        ).alias("change_tag"),
    )
    # r12 fold (r11 VERDICT 2): DELETE stats-pruning under the hash.
    # A third txlog table carries a TIMESTAMP column (2020-01-01 +
    # (key*7)%96 hours — the *7 stride spreads every key range across
    # the 4-day cycle at every SF) with files RANGE-CLUSTERED on ts,
    # so per-file footer stats are tight and the typed-bounds pruning
    # (txlog._coerce_bound, the r11 soundness fix) actually binds.
    # The predicate's literal is deliberately an UNTYPED string: the
    # pre-fix lexical compare against the stats encoding silently
    # LEFT ROWS BEHIND on exactly this shape (right-to-be-forgotten
    # violation) — the oracle replays the same DELETE as
    # NOT coalesce(pred, false) over supplier, so retained-row drift
    # goes hash-red. The boundary (hour 48) lands exactly on stored
    # values, pricing <= inclusivity too. Reference surface: the
    # fix-flow truncate lifecycle
    # notebooks/fix_gridVeg_additional_species_na_rows.ipynb:913-926.
    t3 = tempfile.mkdtemp(prefix="txlog_delete_")
    with_ts = supplier.select(
        "s_suppkey",
        "grp",
        (
            F.to_timestamp(F.lit("2020-01-01 00:00:00"))
            + F.expr(
                "make_interval(0, 0, 0, 0, "
                "CAST((s_suppkey * 7) % 96 AS INT), 0, 0)"
            )
        ).alias("ts"),
    ).repartitionByRange(4, "ts")
    txlog.create(spark, t3, with_ts)
    txlog.delete(spark, t3, "ts <= '2020-01-03 00:00:00'")
    del_rows = (
        txlog.read(spark, t3)
        .groupBy("grp")
        .agg(
            F.sum("s_suppkey").cast("double").alias("s_acctbal"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            F.col("grp").alias("s_suppkey"),
            F.concat(F.lit("DEL_"), F.col("grp").cast("string")).alias(
                "s_name"
            ),
            "s_acctbal",
            F.concat(
                F.lit("delete_survivors_n="), F.col("_n").cast("string")
            ).alias("change_tag"),
        )
    )
    rollup = txlog.read(spark, rollup_path).select(
        F.col("grp").alias("s_suppkey"),
        F.concat(F.lit("ROLLUP_"), F.col("grp").cast("string")).alias(
            "s_name"
        ),
        F.col("key_sum").cast("double").alias("s_acctbal"),
        F.concat(F.lit("rollup_n="), F.col("n").cast("string")).alias(
            "change_tag"
        ),
    )
    pay = ["s_suppkey", "s_acctbal"]
    # new_or_changed side derives from the CHANGE DATA FEED (r6):
    # read_changes surfaces only the files the MERGE touched as
    # insert/delete rows; rewritten-but-unchanged neighbor rows
    # appear on both sides and self-cancel under the payload
    # anti-join, so the surviving inserts are exactly the
    # head-minus-v0 snapshot diff (s_suppkey is unique, so a payload
    # match can only pair a row with itself). The hash is the
    # external proof the CDF is complete and minimal. Both diffs are
    # null-safe (eqNullSafe / IS NOT DISTINCT FROM): a NULL payload
    # equal on both sides is "unchanged", which is what makes the CDF
    # derivation layout-independent — an untouched NULL row never
    # enters the feed and is correctly absent from the report, and a
    # rewritten-but-unchanged NULL row self-cancels.
    changes = txlog.read_changes(
        spark, table, from_version=0, to_version=merge_head
    )
    ins = changes.filter(F.col("_change_type") == "insert").drop(
        "_change_type"
    )
    dels = changes.filter(F.col("_change_type") == "delete").drop(
        "_change_type"
    )

    def _null_safe_on():
        cond = None
        for c in pay:
            eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
            cond = eq if cond is None else cond & eq
        return cond

    d = dels.select(*pay).alias("r")
    new_or_changed = ins.alias("l").join(d, _null_safe_on(), "left_anti").select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.lit("new_or_changed").alias("change_tag"),
    )
    # replaced side keeps the TIME-TRAVEL read (VERSION AS OF 0 vs
    # HEAD) so both change-tracking mechanisms execute under the one
    # hash
    v0 = txlog.read(spark, table, version=0)
    head = txlog.read(spark, table)
    h = head.select(*pay).alias("r")
    replaced = v0.alias("l").join(h, _null_safe_on(), "left_anti").select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.lit("replaced").alias("change_tag"),
    )
    return (
        new_or_changed.unionByName(replaced)
        .unionByName(rollup)
        .unionByName(bloom_stale)
        .unionByName(bloom_fresh)
        .unionByName(bloom_name)
        .unionByName(sketch_rows)
        .unionByName(qs_sketch_rows)
        .unionByName(del_rows)
    )


@_q(
    "bm25_doc_search",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    qt AS (
      SELECT * FROM (VALUES
        (0, 'table'), (0, 'scan'), (0, 'merge'),
        (1, 'window'), (1, 'join'), (1, 'batch')
      ) AS q(query_id, term)
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE term IN (SELECT term FROM qt) GROUP BY term
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
             ), 6) AS score
      FROM tf
      JOIN qt q ON q.term = tf.term
      JOIN dfreq d ON d.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked keyword search under external verification: build the
    real BM25 index (term-hash-bucket postings + corpus stats
    sidecar, operators/search.py::build_ranked_index) in a fresh temp
    dir, then score two queries through the partition-pruned
    bm25_search_many probe. The oracle recomputes Lucene/Robertson
    BM25 from the documents table directly — tf, df, doc length,
    avgdl, idf, saturation — so the index build, the stats sidecar,
    the bucket-pruned probe, and the scoring algebra are all under
    the hash."""
    import tempfile

    from mpg_data_warehouse_spark.operators.search import (
        bm25_search_many,
        build_ranked_index,
    )

    docs = _docs(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="bm25_contract_")
    build_ranked_index(docs, idx)
    return bm25_search_many(
        spark, idx, ["table scan merge", "window join batch"], k=10
    )


def _pq_fixed_codebooks(m=4, k=8, sub_dim=16):
    """Pinned PQ codebooks for the contract query: a deterministic
    grid of exact binary fractions (n/4 for small n), so the literal
    values parse to IDENTICAL doubles in Spark, Python, and DuckDB —
    the cross-engine replay needs no float-text round-trip slack. The
    judge-relevant path (pq_encode argmin + ADC fold) is exactly the
    trained-codebook path; only the training loop is pinned out."""
    return [
        [
            (
                c,
                [
                    (((j * 8 + c + p * 3) % 7) - 3) / 4.0
                    for p in range(sub_dim)
                ],
            )
            for c in range(k)
        ]
        for j in range(m)
    ]


def _pq_codebook_values_sql() -> str:
    """The same codebooks as SQL VALUES rows (j, code, cvec, n2)."""
    rows = []
    for j, book in enumerate(_pq_fixed_codebooks()):
        for code, cvec in book:
            n2 = sum(x * x for x in cvec)
            vec = "[" + ", ".join(repr(x) for x in cvec) + "]::DOUBLE[]"
            rows.append(f"({j}, {code}, {vec}, {n2!r})")
    return ",\n        ".join(rows)


@_q(
    "pq_adc_topk",
    f"""
    WITH cb(j, code, cvec, n2) AS (
      VALUES
        {_pq_codebook_values_sql()}
    ),
    subs AS (
      SELECT e.vec_id, cb.j,
             list_slice(e.embedding, cb.j * 16 + 1, cb.j * 16 + 16) AS sv
      FROM embeddings e
      CROSS JOIN (SELECT DISTINCT j FROM cb) cb
    ),
    -- encode: argmax of 2*(sv.c) - |c|^2 (= argmin L2), ties -> low code
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, cb.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY 2 * list_sum(list_transform(
                     list_zip(s.sv, cb.cvec),
                     x -> CAST(x[1] AS DOUBLE) * x[2])) - cb.n2 DESC,
                   cb.code
               ) AS rk
        FROM subs s JOIN cb ON cb.j = s.j
      ) WHERE rk = 1
    ),
    -- per-(query, j, code) ADC lookup |q_j - c|^2
    lut AS (
      SELECT s.vec_id AS query_id, s.j, cb.code,
             list_sum(list_transform(
               list_zip(s.sv, cb.cvec),
               x -> (CAST(x[1] AS DOUBLE) - x[2])
                    * (CAST(x[1] AS DOUBLE) - x[2]))) AS d2
      FROM subs s JOIN cb ON cb.j = s.j
      WHERE s.vec_id < 5
    ),
    parts AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, l.j, l.d2
      FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
      WHERE e.vec_id <> l.query_id
    ),
    -- j-ascending fold, matching the engine's zip_with aggregate
    adc AS (
      SELECT query_id, neighbor_id,
             round(list_sum(list(d2 ORDER BY j)), 6) AS adc_dist
      FROM parts GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, adc_dist,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id
           ) AS BIGINT) AS rank
    FROM adc
    QUALIFY rank <= 10
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization under external verification: encode the
    embeddings to m=4 codes against pinned codebooks (map-only
    argmin, operators/similarity.py::pq_encode) and ADC-rank the
    first 5 vectors' queries over the CODES ONLY
    (similarity.py::pq_topk — the corpus vectors are never read at
    query time). The oracle re-derives codes and ADC distances from
    the same pinned codebooks in SQL, so quantization argmin
    tie-breaks, the LUT algebra, and the distance fold are all under
    the hash."""
    from mpg_data_warehouse_spark.operators.similarity import (
        pq_encode,
        pq_topk,
    )

    books = _pq_fixed_codebooks()
    emb = _t(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5)
    return pq_topk(codes, queries, books, k=10)


@_q(
    "dsir_select",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, unnest(list_concat(
        t,
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])
             ELSE [] END
      )) AS g
      FROM toks
    ),
    feats AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 512 AS bucket
      FROM grams
    ),
    t_counts AS (
      SELECT bucket, count(*) AS cnt FROM feats WHERE lang = 'en'
      GROUP BY bucket
    ),
    r_counts AS (
      SELECT bucket, count(*) AS cnt FROM feats GROUP BY bucket
    ),
    totals AS (
      SELECT (SELECT sum(cnt) FROM t_counts) AS t_total,
             (SELECT sum(cnt) FROM r_counts) AS r_total
    ),
    lrt AS (
      SELECT r.bucket,
             ln((COALESCE(t.cnt, 0) + 1.0) / (tt.t_total + 512.0))
             - ln((r.cnt + 1.0) / (tt.r_total + 512.0)) AS lr
      FROM r_counts r
      LEFT JOIN t_counts t ON t.bucket = r.bucket
      CROSS JOIN totals tt
    ),
    logw AS (
      SELECT f.doc_id, sum(l.lr) AS logw
      FROM feats f JOIN lrt l ON l.bucket = f.bucket
      GROUP BY f.doc_id
    ),
    weighted AS (
      SELECT d.doc_id, COALESCE(lw.logw, 0.0) AS logw
      FROM documents d LEFT JOIN logw lw ON lw.doc_id = d.doc_id
    ),
    keyed AS (
      SELECT doc_id, logw,
             logw + (-ln(-ln(
               (CAST('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 10)
                     AS BIGINT) + 0.5) / 1099511627776.0
             ))) AS gkey
      FROM weighted
    )
    SELECT doc_id, round(logw, 6) AS dsir_logw
    FROM keyed ORDER BY gkey DESC LIMIT 50
    """,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling under external verification
    (operators/sampling.py::dsir_resample, md5 hash mode so the
    hashed-n-gram feature space and the Gumbel draw replay in SQL):
    target = the English slice, raw = the whole corpus, select 50
    docs by Gumbel-top-k over the smoothed log-likelihood-ratio
    weights. The oracle recomputes the unigram+bigram hashed-bucket
    distributions, the log-ratio table, per-doc weights, and the
    deterministic Gumbel keys end to end."""
    from mpg_data_warehouse_spark.operators.sampling import dsir_resample

    docs = _docs(spark, sf_dir, cols=("doc_id", "lang", "text"))
    target = docs.filter(F.col("lang") == "en")
    picked = dsir_resample(
        docs,
        target,
        n=50,
        n_buckets=512,
        max_n=2,
        smoothing=1.0,
        seed=0,
        hash_fn="md5",
    )
    return picked.select(
        "doc_id", F.round("dsir_logw", 6).alias("dsir_logw")
    )


@_q(
    "quality_classifier_scores",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(
               regexp_split_to_array(lower(trim(text)), '\s+'),
               t -> t <> '')) AS t
      FROM documents
    ),
    pos_df AS (
      SELECT tok AS term, count(*) AS df_pos
      FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
      GROUP BY term
    ),
    neg_df AS (
      SELECT tok AS term, count(*) AS df_neg
      FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'zh')
      GROUP BY term
    ),
    sizes AS (
      SELECT (SELECT count(*) FROM toks WHERE lang = 'en') AS n_pos,
             (SELECT count(*) FROM toks WHERE lang = 'zh') AS n_neg
    ),
    weights AS (
      SELECT COALESCE(p.term, n.term) AS term,
             ln((COALESCE(p.df_pos, 0) + 1.0) / (s.n_pos + 2.0))
             - ln((COALESCE(n.df_neg, 0) + 1.0) / (s.n_neg + 2.0))
               AS weight
      FROM pos_df p FULL OUTER JOIN neg_df n ON p.term = n.term
      CROSS JOIN sizes s
    ),
    doc_w AS (
      SELECT d.doc_id, sum(COALESCE(w.weight, 0.0)) AS w_sum
      FROM (SELECT doc_id, unnest(t) AS term FROM toks) d
      LEFT JOIN weights w ON w.term = d.term
      GROUP BY d.doc_id
    )
    ,nb AS (
      SELECT 'nb' AS kind, t.doc_id,
             round(COALESCE(dw.w_sum, 0.0)
                   + (SELECT ln(CAST(n_pos AS DOUBLE) / n_neg) FROM sizes),
                   6) AS score,
             (COALESCE(dw.w_sum, 0.0)
              + (SELECT ln(CAST(n_pos AS DOUBLE) / n_neg) FROM sizes))
               >= 0.0 AS keep
      FROM toks t LEFT JOIN doc_w dw ON dw.doc_id = t.doc_id
    ),
    -- unigram LM replay (text.py::unigram_lm, vocab 200, alpha 0.5,
    -- trained on the English slice; model logp rounded 6 at the
    -- model boundary, exactly like the operator)
    ut AS (
      SELECT doc_id, lang,
             unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> x <> '')) AS term
      FROM documents
    ),
    ucounts AS (
      SELECT term, count(*) AS n FROM ut WHERE lang = 'en' GROUP BY term
    ),
    uvocab AS (SELECT term, n FROM ucounts ORDER BY n DESC, term LIMIT 200),
    ustats AS (
      SELECT (SELECT sum(n) FROM ucounts) AS n_total,
             (SELECT count(*) FROM uvocab) AS v
    ),
    umodel AS (
      SELECT term,
             round(ln((n + CAST(0.5 AS DOUBLE))
                      / (CAST(n_total AS DOUBLE)
                         + CAST(0.5 AS DOUBLE) * (v + 1))), 6) AS logp
      FROM uvocab CROSS JOIN ustats
    ),
    uoov AS (
      SELECT round(ln(CAST(0.5 AS DOUBLE)
                      / (CAST(n_total AS DOUBLE)
                         + CAST(0.5 AS DOUBLE) * (v + 1))), 6) AS logp
      FROM ustats
    ),
    udtc AS (SELECT doc_id, term, count(*) AS tf FROM ut GROUP BY doc_id, term),
    -- micro-nat quantization before the doc sum (exact integer
    -- algebra; mirrors doc_logprob_score's order-independent sum)
    uscore AS (
      SELECT doc_id,
             CAST((-2 * sum(tf * CAST(round(
                     COALESCE(m.logp, (SELECT logp FROM uoov)) * 1000000)
                     AS BIGINT)) + sum(tf)) // (2 * sum(tf))
                  AS DOUBLE) / 1000000 AS score
      FROM udtc LEFT JOIN umodel m USING (term)
      GROUP BY doc_id
    ),
    lmu AS (
      SELECT 'lm_uni' AS kind, doc_id, score, score <= 3.45 AS keep
      FROM uscore
    ),
    -- bigram LM replay (text.py::bigram_lm + doc_logprob_score_bigram,
    -- bigram table 400, lambda 0.75 — dyadic, so 1-lambda is exact in
    -- every IEEE engine; p's rounded 12 at the model boundary)
    bt AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    bpairs AS (
      SELECT doc_id, lang,
             ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
      FROM bt, UNNEST(range(1, len(ts))) AS u(i)
      WHERE len(ts) >= 2
    ),
    bc AS (
      SELECT w1, w2, count(*) AS c12 FROM bpairs
      WHERE lang = 'en' GROUP BY w1, w2
    ),
    bctx AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
    btop AS (SELECT w1, w2, c12 FROM bc ORDER BY c12 DESC, w1, w2 LIMIT 400),
    bmodel AS (
      SELECT t.w1, t.w2,
             round(CAST(t.c12 AS DOUBLE) / x.c1, 12) AS p_ml
      FROM btop t JOIN bctx x USING (w1)
    ),
    bprob AS (
      SELECT term,
             round((n + CAST(0.5 AS DOUBLE))
                   / (CAST(n_total AS DOUBLE)
                      + CAST(0.5 AS DOUBLE) * (v + 1)), 12) AS p_uni
      FROM uvocab CROSS JOIN ustats
    ),
    boov AS (
      SELECT round(CAST(0.5 AS DOUBLE)
                   / (CAST(n_total AS DOUBLE)
                      + CAST(0.5 AS DOUBLE) * (v + 1)), 12) AS p FROM ustats
    ),
    bdtc AS (
      SELECT doc_id, w1, w2, count(*) AS tf FROM bpairs
      GROUP BY doc_id, w1, w2
    ),
    bscore AS (
      SELECT d.doc_id,
             CAST((-2 * sum(d.tf * CAST(round(ln(
               CAST(0.75 AS DOUBLE) * COALESCE(m.p_ml, 0.0)
               + CAST(0.25 AS DOUBLE)
                 * COALESCE(p.p_uni, (SELECT p FROM boov))
             ) * 1000000) AS BIGINT)) + sum(d.tf)) // (2 * sum(d.tf))
                  AS DOUBLE) / 1000000 AS score
      FROM bdtc d
      LEFT JOIN bmodel m ON m.w1 = d.w1 AND m.w2 = d.w2
      LEFT JOIN bprob p ON p.term = d.w2
      GROUP BY d.doc_id
    ),
    lmb AS (
      SELECT 'lm_bi' AS kind, doc_id, score, score <= 3.9 AS keep
      FROM bscore
    )
    SELECT * FROM nb
    UNION ALL SELECT * FROM lmu
    UNION ALL SELECT * FROM lmb
    """,
)
def quality_classifier_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained quality-gate family as one tagged union, every
    model under external verification:

    - ``nb``: closed-form Naive-Bayes log-odds (pos = English slice,
      neg = Chinese slice; operators/text.py::nb_term_weights +
      quality_classifier_scores) — the oracle recomputes binarized
      per-class document frequencies, smoothed weights, prior bias,
      and the per-doc logit sum; ``keep`` is the unrounded logit ≥ 0.
    - ``lm_uni`` (folded r8): the CCNet-style unigram perplexity gate
      (unigram_lm vocab 200 trained on English + doc_logprob_score
      over every doc) — vocabulary cap with deterministic ties,
      Lidstone smoothing, OOV mass, and the tf-weighted mean NLL all
      replayed.
    - ``lm_bi`` (new r8): the Jelinek–Mercer interpolated bigram
      upgrade (bigram_lm, table 400 / λ = 0.75 — dyadic so both
      engines' 1−λ is exact) — the word-ORDER-sensitive gate; the
      oracle replays in-doc pair extraction, the capped conditional
      table with pre-cap context totals, the probability-space
      interpolation, and the mean NLL."""
    from mpg_data_warehouse_spark.operators.text import (
        bigram_lm,
        doc_logprob_score,
        doc_logprob_score_bigram,
        nb_term_weights,
        quality_classifier_scores,
        unigram_lm,
    )

    from mpg_data_warehouse_spark.operators.text import norm_tokens

    # three models train and score over ONE corpus: tokenize once into
    # a persisted array column and let every leg consume it via
    # tokens_col — without the share each train/score leg re-runs the
    # regex split over the full token stream (6-8 corpus tokenizations
    # measured ≈ 3× this query's wall at sf0.1)
    # the raw text column is DEAD after tokenization (every leg
    # consumes _toks; the emitted rows carry only doc_id/score/keep),
    # so it is dropped before the persist — the cache builds and
    # spills roughly half the bytes (r13, guide §5.2)
    docs = (
        _docs(spark, sf_dir, cols=("doc_id", "lang", "text"))
        .select("doc_id", "lang", norm_tokens("text").alias("_toks"))
        .persist()
    )
    pos = docs.filter(F.col("lang") == "en")
    neg = docs.filter(F.col("lang") == "zh")
    # materialize the shared tokenization ONCE, then train the three
    # models from separate driver threads (the hybrid-retrieval /
    # BM25-lifecycle playbook): each training is an independent
    # driver-side collect over the same persisted cache, so wall cost
    # is max(leg) not sum — r10 measured the sequential form paying
    # ~2× the slowest training. The pre-count keeps the threads from
    # racing to compute the persist itself.
    docs.count()
    from mpg_data_warehouse_spark.concurrency import await_all

    (weights, bias), (umodel, uoov), (bmodel, bprob, boov) = await_all(
        lambda: nb_term_weights(pos, neg, alpha=1.0, tokens_col="_toks"),
        lambda: unigram_lm(
            pos, vocab_size=200, alpha=0.5, tokens_col="_toks"
        ),
        lambda: bigram_lm(
            pos,
            vocab_size=200,
            bigram_size=400,
            alpha=0.5,
            tokens_col="_toks",
        ),
    )
    scored = quality_classifier_scores(
        docs, weights, bias=bias, threshold=0.5, tokens_col="_toks"
    )
    nb = scored.select(
        F.lit("nb").alias("kind"),
        "doc_id",
        F.round("quality_logit", 6).alias("score"),
        F.col("quality_keep").alias("keep"),
    )
    lmu = doc_logprob_score(
        docs, umodel, uoov, tokens_col="_toks"
    ).select(
        F.lit("lm_uni").alias("kind"),
        "doc_id",
        F.col("nll_per_token").alias("score"),
        (F.col("nll_per_token") <= 3.45).alias("keep"),
    )
    lmb = doc_logprob_score_bigram(
        docs, bmodel, bprob, boov, lam=0.75, tokens_col="_toks"
    ).select(
        F.lit("lm_bi").alias("kind"),
        "doc_id",
        F.col("nll_per_token").alias("score"),
        (F.col("nll_per_token") <= 3.9).alias("keep"),
    )
    return nb.unionByName(lmu).unionByName(lmb)


# ---------------------------------------------------------------------------
# Retrieval oracles share the chunk-grid + hashed-feature-encoder CTEs
# (single source of truth — the dense-only and hybrid oracles can never
# drift from each other). Chunk grid: 32-token windows, stride 24
# (overlap 8); encoder: md5-mode feature hashing into 64 buckets with
# a parity sign.
# ---------------------------------------------------------------------------

_RETRIEVAL_QUERY_TEXTS = ["table scan merge fast", "window join batch order"]


def _retrieval_vec_cte(src: str, out: str) -> str:
    """Hashed-feature embedding of (key, txt) rows in ``src`` as a
    64-dim list column — the DuckDB mirror of
    plans/retrieval.py::hashed_feature_embedding (md5 mode)."""
    return f"""
    {out} AS (
      SELECT key, list(val ORDER BY i) AS emb
      FROM (
        SELECT g.key, g.i, COALESCE(cm.v, 0.0) AS val
        FROM (SELECT k.key, r.i
              FROM (SELECT DISTINCT key FROM {src}) k
              CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r) g
        LEFT JOIN (
          SELECT key,
                 CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS b,
                 sum(CASE WHEN CAST('0x' || substr(md5(tok), 9, 8)
                               AS BIGINT) % 2 = 0
                          THEN 1.0 ELSE -1.0 END) AS v
          FROM (SELECT key,
                       unnest(list_filter(
                         regexp_split_to_array(lower(trim(txt)), '\\s+'),
                         x -> x <> '')) AS tok
                FROM {src})
          GROUP BY key, b
        ) cm ON cm.key = g.key AND cm.b = g.i
      )
      GROUP BY key
)"""


def _retrieval_base_ctes() -> str:
    """td/cn/ch/chunks/cin/cvecs/qin/qvecs — corpus chunking, chunk
    store, and both embedding sides, parameterized by the module's
    pinned query texts."""
    qvalues = ",\n        ".join(
        f"(CAST({i} AS BIGINT), '{t}')"
        for i, t in enumerate(_RETRIEVAL_QUERY_TEXTS)
    )
    return f"""
    WITH td AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    cn AS (
      SELECT doc_id, t,
             CASE WHEN len(t) <= 32 THEN 1
                  ELSE 1 + (len(t) - 32 + 23) // 24 END AS n_chunks
      FROM td
    ),
    ch AS (
      SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_id FROM cn
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             doc_id * 1048576 + chunk_id AS chunk_key,
             array_to_string(
               list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32),
               ' ') AS chunk_text
      FROM ch
    ),
    cin AS (SELECT chunk_key AS key, chunk_text AS txt FROM chunks),
    {_retrieval_vec_cte("cin", "cvecs").strip()},
    qin AS (
      SELECT * FROM (VALUES
        {qvalues}
      ) AS q(key, txt)
    ),
    {_retrieval_vec_cte("qin", "qvecs").strip()}"""


_COS = (
    "round(list_sum(list_transform(list_zip(q.emb, c.emb), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(list_zip(q.emb, q.emb), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(list_zip(c.emb, c.emb), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))), 6)"
)


def _retrieval_dense_oracle_sql() -> str:
    return f"""{_retrieval_base_ctes()},
    scored AS (
      SELECT q.key AS query_id, c.key AS chunk_key,
             {_COS} AS cos_sim
      FROM qvecs q CROSS JOIN cvecs c
    ),
    topk AS (
      SELECT query_id, chunk_key, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, chunk_key
             ) AS BIGINT) AS rank
      FROM scored
      QUALIFY rank <= 5
    )
    SELECT t.query_id, qt.txt AS query_text, t.chunk_key,
           k.doc_id, k.chunk_id, k.chunk_text, t.cos_sim, t.rank
    FROM topk t
    JOIN chunks k ON k.chunk_key = t.chunk_key
    JOIN qin qt ON qt.key = t.query_id
    """


@_q("retrieval_dense_topk", _retrieval_dense_oracle_sql())
def retrieval_dense_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense retrieval pipeline end to end under external
    verification (plans/retrieval.py): chunk the corpus (32-token
    windows, 8 overlap), embed every chunk with the md5-mode hashed-
    feature encoder, persist the chunk store + IVF index in a fresh
    temp dir, then retrieve two queries probing ALL 8 cells — with
    nprobe = n_centroids the probe is exhaustive, so the oracle can
    verify against brute-force cosine without replicating k-means:
    chunk grid, chunk_key composition, encoder algebra, index
    round-trip, scoring, ranking, and text hydration are all under
    the hash."""
    import tempfile

    from mpg_data_warehouse_spark.plans.retrieval import (
        build_retrieval_index,
        retrieve,
    )

    base = tempfile.mkdtemp(prefix="retrieval_contract_")
    docs = _docs(spark, sf_dir)
    build_retrieval_index(
        docs,
        f"{base}/idx",
        f"{base}/chunks",
        dim=64,
        max_tokens=32,
        overlap=8,
        n_centroids=8,
        hash_fn="md5",
    )
    return retrieve(
        spark,
        f"{base}/idx",
        f"{base}/chunks",
        _RETRIEVAL_QUERY_TEXTS,
        k=5,
        dim=64,
        nprobe=8,
        hash_fn="md5",
    )


def _hybrid_rrf_oracle_sql() -> str:
    """Both retrieval legs + reciprocal-rank fusion + the rerank
    stage: the dense leg is the exhaustive cosine rank above, the
    lexical leg is Lucene BM25 over the SAME chunk store (mirroring
    bm25_doc_search's algebra at chunk grain), fused as
    sum(1/(60 + rank)) over each leg's top-20 pool with missing
    sides contributing zero (plans/retrieval.py::hybrid_retrieve),
    and the fused top-10 pool re-ranked by the deterministic
    token-overlap F1 (rerank_token_f1's cross-encoder stand-in) with
    (score desc, previous rank, chunk_key) tie-breaks down to 5."""
    return f"""{_retrieval_base_ctes()},
    dense_scored AS (
      SELECT q.key AS query_id, c.key AS chunk_key,
             {_COS} AS cos_sim
      FROM qvecs q CROSS JOIN cvecs c
    ),
    dense_rank AS (
      SELECT query_id, chunk_key,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, chunk_key
             ) AS BIGINT) AS rd
      FROM dense_scored
      QUALIFY rd <= 20
    ),
    ctoks AS (
      SELECT chunk_key,
             list_filter(regexp_split_to_array(lower(trim(chunk_text)),
                                               '\\s+'),
                         t -> t <> '') AS t
      FROM chunks
    ),
    tf AS (
      SELECT chunk_key, tok AS term, count(*) AS tf
      FROM (SELECT chunk_key, unnest(t) AS tok FROM ctoks)
      GROUP BY chunk_key, term
    ),
    dl AS (SELECT chunk_key, sum(tf) AS dl FROM tf GROUP BY chunk_key),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    qt AS (
      SELECT key AS query_id,
             unnest(list_distinct(list_filter(
               regexp_split_to_array(lower(trim(txt)), '\\s+'),
               x -> x <> ''))) AS term
      FROM qin
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE term IN (SELECT term FROM qt) GROUP BY term
    ),
    lex_scored AS (
      SELECT q.query_id, tf.chunk_key,
             round(sum(
               ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
             ), 6) AS score
      FROM tf
      JOIN qt q ON q.term = tf.term
      JOIN dfreq d ON d.term = tf.term
      JOIN dl ON dl.chunk_key = tf.chunk_key
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.chunk_key
    ),
    lex_rank AS (
      SELECT query_id, chunk_key,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, chunk_key
             ) AS BIGINT) AS rl
      FROM lex_scored
      QUALIFY rl <= 20
    ),
    fused AS (
      SELECT COALESCE(d.query_id, l.query_id) AS query_id,
             COALESCE(d.chunk_key, l.chunk_key) AS chunk_key,
             round(COALESCE(1.0 / (60 + d.rd), 0.0)
                   + COALESCE(1.0 / (60 + l.rl), 0.0), 6) AS rrf_score
      FROM dense_rank d
      FULL OUTER JOIN lex_rank l
        ON d.query_id = l.query_id AND d.chunk_key = l.chunk_key
    ),
    top AS (
      SELECT query_id, chunk_key, rrf_score,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, chunk_key
             ) AS BIGINT) AS rank
      FROM fused
      QUALIFY rank <= 10
    ),
    pool AS (
      SELECT t.query_id, qt2.txt AS query_text, t.chunk_key,
             k.doc_id, k.chunk_id, k.chunk_text, t.rrf_score,
             t.rank AS prev_rank,
             list_distinct(list_filter(
               regexp_split_to_array(lower(trim(qt2.txt)), '\\s+'),
               xq -> xq <> '')) AS qt,
             list_distinct(list_filter(
               regexp_split_to_array(lower(trim(k.chunk_text)), '\\s+'),
               xc -> xc <> '')) AS ct
      FROM top t
      JOIN chunks k ON k.chunk_key = t.chunk_key
      JOIN qin qt2 ON qt2.key = t.query_id
    ),
    rescored AS (
      SELECT query_id, query_text, chunk_key, doc_id, chunk_id,
             chunk_text, rrf_score, prev_rank,
             round(CASE
               WHEN len(ct) = 0 OR len(qt) = 0 THEN 0.0
               WHEN (CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(ct)
                     + CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(qt))
                    = 0 THEN 0.0
               ELSE 2.0
                    * (CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(ct))
                    * (CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(qt))
                    / (CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(ct)
                       + CAST(len(list_intersect(qt, ct)) AS DOUBLE) / len(qt))
             END, 6) AS rerank_score
      FROM pool
    )
    SELECT query_id, query_text, chunk_key, doc_id, chunk_id,
           chunk_text, rrf_score, rerank_score,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY rerank_score DESC, prev_rank, chunk_key
           ) AS BIGINT) AS rank
    FROM rescored
    QUALIFY rank <= 5
    """


@_q("hybrid_rrf_retrieval", _hybrid_rrf_oracle_sql())
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retrieve→rerank stack under external verification
    (plans/retrieval.py, rotated in r6): one build lays down the
    chunk store, the IVF dense index, AND the BM25 ranked index over
    the same chunk keys; the probe fuses both retrievers' top-20
    pools with RRF (Cormack et al. 2009) into a top-10 candidate
    pool, which the rerank stage re-scores with the deterministic
    token-F1 stand-in and cuts to 5. nprobe = n_centroids makes the
    dense leg exhaustive, so the oracle mirrors everything exactly:
    cosine ranks, chunk-grain BM25 ranks, the 1/(60+rank) fusion
    arithmetic, the F1 algebra, and the rerank tie-breaks are all
    under the hash."""
    import tempfile

    from mpg_data_warehouse_spark.plans.retrieval import (
        build_hybrid_index,
        hybrid_retrieve,
        rerank_token_f1,
    )

    base = tempfile.mkdtemp(prefix="hybrid_contract_")
    docs = _docs(spark, sf_dir)
    # refine_iters=0: with nprobe = n_centroids the probe is
    # exhaustive, so centroid refinement cannot change a single output
    # row (it only shapes the partition layout) — the Lloyd iteration
    # itself stays oracle-verified under ivf_ann_topk's hash, where
    # nprobe < n_centroids makes it load-bearing. Skipping it here
    # removes two corpus passes from the contract slot's build.
    build_hybrid_index(
        docs,
        f"{base}/idx",
        f"{base}/chunks",
        f"{base}/bm25",
        dim=64,
        max_tokens=32,
        overlap=8,
        n_centroids=8,
        hash_fn="md5",
        refine_iters=0,
    )
    pool = hybrid_retrieve(
        spark,
        f"{base}/idx",
        f"{base}/chunks",
        f"{base}/bm25",
        _RETRIEVAL_QUERY_TEXTS,
        k=10,
        dim=64,
        nprobe=8,
        k_rrf=60,
        pool=20,
        hash_fn="md5",
    )
    return rerank_token_f1(pool, k=5)


REGISTRY_DOC = "queries: " + ", ".join(sorted(QUERIES))
