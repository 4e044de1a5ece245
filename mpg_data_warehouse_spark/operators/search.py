"""Persisted inverted index + keyword search over the corpus.

The retrieval complement to the dedup family's transient inverted
indexes (``dedup.exploded_shingles``): a (term → doc ids) posting
table laid out on disk partitioned by a hash bucket of the term, so a
keyword query reads ONLY its terms' buckets (partition-filter
pushdown) and then exact-matches inside them — a point lookup over
plain parquet, same layout trick as ``append.write_keybucket_table``.

Scale shape (100 TB corpus): the index build is one explode +
distinct (the only corpus-sized shuffle, keyed by (term, doc));
postings are ~16 B/row. Queries touch |terms| buckets of
|postings|/n_buckets each — independent of corpus text size. Hot
terms ("the") make hot postings lists; index AFTER stopword-ish
filtering (``min_term_len``/``max_df``) like every real search
engine, or the posting list for a stopword IS the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.text import norm_tokens

N_BUCKETS = 64


def term_bucket(term, n_buckets: int = N_BUCKETS):
    return F.pmod(F.xxhash64(term), F.lit(n_buckets))


def build_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    min_term_len: int = 1,
    max_df: int | None = None,
) -> None:
    """Write the posting table partitioned by term-hash bucket.

    ``min_term_len`` drops short tokens; ``max_df`` drops terms whose
    document frequency exceeds the cap (the stopword guard — at corpus
    scale a capped term's posting list is useless for retrieval and
    dominates index size). Distinct (term, doc) postings: one shuffle.
    """
    toks = docs.select(
        F.col(id_col), F.explode(norm_tokens(text_col)).alias("term")
    ).filter(F.length("term") >= min_term_len)
    postings = toks.distinct()
    cached = None
    if max_df is not None:
        # persist the distinct postings: they feed both the df-count
        # aggregate and the join — without it the corpus-sized
        # explode+distinct shuffle would execute twice
        cached = postings.persist()
        dfreq = cached.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        postings = cached.join(
            dfreq.filter(F.col("_df") <= max_df).select("term"), "term"
        )
    (
        postings.withColumn("bucket", term_bucket(F.col("term"), n_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    if cached is not None:
        cached.unpersist()


def search_terms(
    spark: SparkSession,
    index_path: str,
    terms: list[str],
    mode: str = "any",
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc ids matching the query terms — ``mode='any'`` (OR) or
    ``'all'`` (AND, via a per-doc distinct-term count equal to the
    query's). Query strings are run through the INDEX's tokenization
    (lowercase + whitespace split), so a phrase like "machine
    learning" becomes the two terms it was indexed as — a raw
    whitespace-containing term could never match any posting, and in
    'all' mode would poison the whole query empty.

    The bucket predicate is a literal IN-list over the partition
    column: the scan plans with PartitionFilters and never opens
    non-matching buckets (pinned by test). Scale: |terms| bucket
    scans + one small aggregate; the corpus is untouched.
    """
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    norm = sorted(
        {w for t in terms if t for w in t.strip().lower().split()}
    )
    if not norm:
        raise ValueError("no non-empty query terms")
    postings = spark.read.parquet(index_path)
    # bucket values computed engine-side from the same xxhash64 —
    # evaluated as literals through a tiny local DataFrame to avoid
    # reimplementing xxhash64 in Python
    bucket_rows = (
        spark.createDataFrame([(t,) for t in norm], "term string")
        .select(term_bucket(F.col("term"), n_buckets).alias("b"))
        .collect()
    )
    buckets = sorted({r["b"] for r in bucket_rows})
    hits = postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(norm)
    )
    if mode == "any":
        return hits.select(id_col).distinct()
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(norm))
        .select(id_col)
    )
