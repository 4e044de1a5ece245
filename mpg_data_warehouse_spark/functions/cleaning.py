"""Cleaning / derivation column functions (reference §2.8 F5-F13, §2.2 P1-P2).

All pure column expressions (JVM-side, codegen'd). The reference does
these with pandas ``.replace``/``.apply``/string concatenation; here
they compose into one narrow (shuffle-free) projection stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINELS = ("", "NA")


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename source headers → warehouse names (reference P1,
    e.g. 'Survey Data::__kp_Survey' → 'survey_ID',
    src/survey_metadata_update.py:49-58). Single select keeps it one
    projection node; columns not in the mapping are dropped, which
    also covers P2 (drop zModificationTimestamp etc.). An empty
    mapping is a no-op (nothing to rename, nothing to drop)."""
    if not mapping:
        return df
    return df.select(
        [F.col(f"`{src}`").alias(dst) for src, dst in mapping.items() if src in df.columns]
    )


def clean_null_sentinels(
    col: Column | str, sentinels: tuple[str, ...] = NULL_SENTINELS
) -> Column:
    """Replace ""/"NA" with NULL before casting (reference F11:
    src/point_intercepts_update.py:118-120)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c).isin(*sentinels), F.lit(None)).otherwise(c)


def coerce_long(col: Column | str) -> Column:
    """``pd.to_numeric(errors="coerce").astype("Int64")`` parity
    (reference F5: src/point_intercepts_update.py:107-130): sentinel
    cleanup then null-on-failure cast (try_cast — Spark 4 runs ANSI
    mode by default, where a plain cast of "abc" THROWS). Handles
    "12.0"-style floats in integer columns the way pandas does."""
    return clean_null_sentinels(col).try_cast("double").try_cast("long")


def coerce_double(col: Column | str) -> Column:
    """``pd.to_numeric(errors="coerce", downcast="float")`` parity
    (reference F5: src/point_intercepts_update.py:121-125)."""
    return clean_null_sentinels(col).try_cast("double")


def composite_key(*cols: str, sep: str = "_") -> Column:
    """Composite string key (reference F8: survey_ID + '_' +
    transect_point, notebooks/update_gridVeg_point_intercepts.ipynb:
    1130-1137; R unite() gridVeg_species_richness_WRANGLE.ipynb:746).
    Engine code prefers multi-column join keys — this exists for
    output parity where the reference materializes the key."""
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])


def uuid_prefix(col: Column | str, n: int = 8) -> Column:
    """UUID → first-n-chars key (reference F6:
    src/additional_species_update.py:95-96)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def image_url(image_id: Column | str, base: str) -> Column:
    """image_url = base + image_ID + ".jpg" (reference F8:
    notebooks/update_gridVeg_image_metadata.ipynb:447-450)."""
    c = F.col(image_id) if isinstance(image_id, str) else image_id
    return F.concat(F.lit(base), c, F.lit(".jpg"))
