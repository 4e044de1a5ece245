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
from mpg_data_warehouse_spark.operators.complete import complete

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as a usable timestamp.

    The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; ``nanosAsLong`` (session conf, safe to
    set at runtime) reads it as nanos-since-epoch, converted here to a
    microsecond TIMESTAMP via integer division (exact — double math
    would lose precision above 2^53 ns). Oracle queries must likewise
    avoid emitting raw nanosecond timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


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
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    agg = lineitem.groupBy("l_orderkey", "l_returnflag").agg(
        (F.count(F.lit(1)) / F.lit(2.0)).alias("intercepts_pct")
    )
    filled = complete(
        agg,
        expand=["l_returnflag"],
        nesting=["l_orderkey"],
        fill={"intercepts_pct": 0.0},
    )
    dim = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    return (
        filled.join(dim, filled.l_orderkey == dim.o_orderkey, "left")
        .filter(F.col("o_year") > 1995)
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
    survey_sequence derivation, src/survey_metadata_update.py:45-81)."""
    orders = _t(spark, sf_dir, "orders")
    year = F.year("o_orderdate").cast("long")
    return orders.select(
        F.col("o_orderkey").alias("survey_id"),
        F.col("o_custkey").alias("grid_point"),
        year.alias("year"),
        F.when(year.isin(1995, 1996), F.lit("1995-96"))
        .otherwise(year.cast("string"))
        .alias("survey_sequence"),
        F.col("o_orderpriority").alias("surveyor"),
    )


# --- J6: the signature anti-join (new-minus-existing) ---


@_q(
    "anti_join_new_keys",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- P9/J9: semi-join membership ---


@_q(
    "semi_join_existing",
    """
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    """,
)
def semi_join_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, part.p_partkey == lineitem.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


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
    broadcast — at 100 TB the fact side never shuffles for them."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
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
    "distinct_count_per_year",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY year(o_orderdate)
    """,
)
def distinct_count_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("year")
    ).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- A5: conditional counts (COUNTIF) ---


@_q(
    "conditional_counts",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_high_discount,
           count(*) FILTER (WHERE l_tax = 0)         AS n_no_tax,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_discount"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_no_tax"),
        F.count(F.lit(1)).alias("n_rows"),
    )


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


@_q(
    "distinct_dedup",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem",
)
def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus", "l_suppkey").distinct()


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
           ) AS category_count
    FROM events
    """,
)
def window_partition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only window function (W1:
    COUNT(*) OVER (PARTITION BY CASE ...),
    src/analyze_gridveg_dates_pattern.py:73-79)."""
    events = _events(spark, sf_dir)
    category = (
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
    )
    df = events.withColumn("category", category)
    return df.select(
        "event_id",
        "category",
        F.count(F.lit(1))
        .over(W.partitionBy("category"))
        .alias("category_count"),
    )


# --- U1/J8: both-direction anti-join + tagged union ---


@_q(
    "union_only_in",
    """
    SELECT c_custkey AS entity_key, 'Only in Customer' AS location
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT DISTINCT o_custkey AS entity_key, 'Only in Orders' AS location
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def union_only_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    only_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("entity_key"))
        .withColumn("location", F.lit("Only in Customer"))
    )
    only_ord = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .select(F.col("o_custkey").alias("entity_key"))
        .distinct()
        .withColumn("location", F.lit("Only in Orders"))
    )
    return only_cust.unionByName(only_ord)


# --- P11: one-pass per-column null audit ---


@_q(
    "null_audit_events",
    """
    SELECT count(*) FILTER (WHERE event_id IS NULL)   AS event_id_nulls,
           count(*) FILTER (WHERE ts IS NULL)         AS ts_nulls,
           count(*) FILTER (WHERE user_id IS NULL)    AS user_id_nulls,
           count(*) FILTER (WHERE event_type IS NULL) AS event_type_nulls,
           count(*) FILTER (WHERE value IS NULL)      AS value_nulls,
           count(*) FILTER (WHERE props IS NULL)      AS props_nulls,
           count(*) AS total_rows
    FROM events
    """,
)
def null_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    aggs = [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls")
        for c in events.columns
    ]
    return events.agg(*aggs, F.count(F.lit(1)).alias("total_rows"))


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
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE regexp_matches(lang, '^[a-z]{2}$') AND lang <> 'zh'
    """,
)
def regex_sentinel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format validation (reference P10 ^[NSEW]\\d{1,2}$) + sentinel
    value removal (P6 key_plant_code != 'NV') — 3-valued-logic `!=`
    drops NULLs on both engines, matching the dplyr/SQL sites."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("lang").rlike(r"^[a-z]{2}$") & (F.col("lang") != "zh")
    ).select("doc_id", "lang", "source")


# --- A10/F2: frequency tables over date components ---


@_q(
    "value_counts_by_month",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT)  AS year,
           CAST(month(o_orderdate) AS BIGINT) AS month,
           count(*) AS n
    FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
    """,
)
def value_counts_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("long").alias("month"),
    ).agg(F.count(F.lit(1)).alias("n"))


# --- O1-O3: deterministic top-k ---


@_q(
    "top_k_orders",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT plans as TakeOrderedAndProject — no global
    sort materialization (reference O3). Tie-broken on the key so the
    row set is engine-independent."""
    orders = _t(spark, sf_dir, "orders")
    return orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(10).select("o_orderkey", "o_totalprice", "o_orderpriority")


REGISTRY_DOC = "queries: " + ", ".join(sorted(QUERIES))
