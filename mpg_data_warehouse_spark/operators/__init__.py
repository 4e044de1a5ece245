"""Engine operators: compositions the DataFrame API lacks as single
primitives — tidyr-style grid completion, idempotent anti-join append,
mutation ops, dedup families, similarity search, text analysis,
temporal joins, join-strategy helpers."""

from mpg_data_warehouse_spark.operators.append import (
    anti_join_append,
    merge_upsert,
    overwrite_partitions,
    truncate_replace,
)
from mpg_data_warehouse_spark.operators.complete import complete
from mpg_data_warehouse_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    retain_representatives,
    simhash_near_pairs,
)
from mpg_data_warehouse_spark.operators.joins import salted_join, write_bucketed
from mpg_data_warehouse_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from mpg_data_warehouse_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)
from mpg_data_warehouse_spark.operators.text import text_profile
from mpg_data_warehouse_spark.operators.validate import validate

__all__ = [
    "anti_join_append",
    "asof_join",
    "complete",
    "connected_components",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "ivf_topk",
    "lsh_topk",
    "merge_upsert",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "overwrite_partitions",
    "range_join_binned",
    "retain_representatives",
    "salted_join",
    "simhash_near_pairs",
    "text_profile",
    "truncate_replace",
    "validate",
    "write_bucketed",
]
