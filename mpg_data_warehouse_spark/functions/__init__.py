"""Scalar function layer (reference §2.8): date parsing with pandas
pivot parity, derived columns, null-sentinel cleaning, composite keys.
All JVM-side column expressions — zero Python UDFs."""

from mpg_data_warehouse_spark.functions.dates import (
    parse_date_mdyy,
    survey_sequence,
)
from mpg_data_warehouse_spark.functions.cleaning import (
    clean_null_sentinels,
    composite_key,
    rename_columns,
)

__all__ = [
    "parse_date_mdyy",
    "survey_sequence",
    "clean_null_sentinels",
    "composite_key",
    "rename_columns",
]
