"""Engine operators: compositions the DataFrame API lacks as single
primitives — tidyr-style grid completion, idempotent anti-join append,
ordered-limited string agg, date repair, dedup families, similarity
search, text analysis."""

from mpg_data_warehouse_spark.operators.complete import complete
from mpg_data_warehouse_spark.operators.append import anti_join_append

__all__ = ["complete", "anti_join_append"]
