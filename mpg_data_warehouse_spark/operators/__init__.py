"""Engine operators: compositions the DataFrame API lacks as single
primitives — tidyr-style grid completion, idempotent anti-join append,
mutation ops, dedup families, similarity search, text analysis,
temporal joins, join-strategy helpers."""

from mpg_data_warehouse_spark.operators.append import (
    anti_join_append,
    merge_upsert,
    merge_upsert_bucketed,
    merge_upsert_partitioned,
    overwrite_partitions,
    read_keybucket_table,
    truncate_replace,
    write_keybucket_table,
)
from mpg_data_warehouse_spark.operators.chunking import pack_sequences
from mpg_data_warehouse_spark.operators.complete import complete
from mpg_data_warehouse_spark.operators.dedup import (
    connected_components,
    contamination_report,
    exact_dedup,
    incremental_minhash_pairs,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    duplicate_spans,
    span_duplication_stats,
    strip_duplicate_spans,
    retain_representatives,
    simhash_near_pairs,
)
from mpg_data_warehouse_spark.operators.joins import salted_join, write_bucketed
from mpg_data_warehouse_spark.operators.ranking import topk_per_group
from mpg_data_warehouse_spark.operators.sampling import (
    budget_rebalance_sample,
    deterministic_sample,
    deterministic_shuffle,
    split_train_holdout,
    stratified_sample,
)
from mpg_data_warehouse_spark.operators.scd import scd2_apply, scd2_init
from mpg_data_warehouse_spark.operators.similarity import (
    cosine_topk,
    embedding_centroids,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from mpg_data_warehouse_spark.operators.temporal import (
    asof_join,
    funnel_conversion,
    range_join_binned,
)
from mpg_data_warehouse_spark.operators.text import (
    normalize_text,
    redact,
    term_counts,
    text_profile,
    tfidf,
)
from mpg_data_warehouse_spark.operators.validate import validate

__all__ = [
    "anti_join_append",
    "asof_join",
    "budget_rebalance_sample",
    "complete",
    "connected_components",
    "contamination_report",
    "cosine_topk",
    "deterministic_sample",
    "deterministic_shuffle",
    "duplicate_spans",
    "embedding_centroids",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "funnel_conversion",
    "incremental_minhash_pairs",
    "ivf_topk",
    "lsh_topk",
    "merge_upsert",
    "merge_upsert_bucketed",
    "merge_upsert_partitioned",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "normalize_text",
    "overwrite_partitions",
    "pack_sequences",
    "range_join_binned",
    "read_keybucket_table",
    "redact",
    "retain_representatives",
    "salted_join",
    "scd2_apply",
    "scd2_init",
    "simhash_near_pairs",
    "span_duplication_stats",
    "split_train_holdout",
    "stratified_sample",
    "strip_duplicate_spans",
    "term_counts",
    "text_profile",
    "tfidf",
    "topk_per_group",
    "truncate_replace",
    "validate",
    "write_bucketed",
    "write_keybucket_table",
]
