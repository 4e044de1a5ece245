"""Data-repair operators (reference §2 J4/J5, P7+S12 — the
fix-gridveg-dates and fix-NA-rows flows).

Vanilla Spark has no in-place UPDATE; the engine expresses repairs as
recompute-and-overwrite plans (Delta MERGE would be the transactional
fast path where available). Both repairs are single-pass, shuffle
only on the join key, and broadcast the dimension side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fix_dates_from_dim(
    fact: DataFrame,
    dim: DataFrame,
    key: str = "survey_ID",
    date_col: str = "date",
    year_col: str = "year",
    only_when: Column | None = None,
) -> DataFrame:
    """Repair fact dates from the authoritative dimension.

    Reference J5 (src/fix_gridveg_dates.py:85-133) replaces ALL fact
    dates via a survey_ID → date lookup map, then re-derives year;
    reference J4 (docs/fix_gridveg_dates.md:44-52) is the selective
    UPDATE…FROM variant gated on ``date > '2024-12-31'``. Pass
    ``only_when`` for the selective form; default repairs every row
    that has a dimension match (rows without a match keep their date,
    like the SQL UPDATE's implicit no-match behavior).
    """
    lookup = dim.select(
        F.col(key), F.col(date_col).alias("__dim_date")
    )
    joined = fact.join(F.broadcast(lookup), on=key, how="left")
    replace = F.col("__dim_date").isNotNull()
    if only_when is not None:
        replace = replace & only_when
    new_date = F.when(replace, F.col("__dim_date")).otherwise(F.col(date_col))
    return (
        joined.withColumn(date_col, new_date)
        .withColumn(year_col, F.year(F.col(date_col)).cast("long"))
        .drop("__dim_date")
    )


def drop_null_rows(df: DataFrame, required: list[str]) -> DataFrame:
    """Remove rows with NULL in required columns (reference fix-NA
    flow: keep notna rows then truncate-replace,
    notebooks/fix_gridVeg_additional_species_na_rows.ipynb:826-846).
    """
    out = df
    for c in required:
        out = out.filter(F.col(c).isNotNull())
    return out
