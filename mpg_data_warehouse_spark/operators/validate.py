"""Validation gates (reference §2 P10-P13, §5 — the reference's
embedded operational checks become first-class engine ops).

All validators aggregate to a single driver-side row (one job, one
pass), so a 100 TB validation is one scan with map-side partial
aggregation — never a per-column job or a collect of failing rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSECT_POINT_PATTERN = r"^[NSEW]\d{1,2}$"


@dataclass
class ValidationReport:
    ok: bool
    null_violations: dict[str, int] = field(default_factory=dict)
    pattern_violations: dict[str, int] = field(default_factory=dict)
    total_rows: int = 0


def validate(
    df: DataFrame,
    required: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> ValidationReport:
    """Required-field null gate + regex format gate in ONE aggregate.

    Reference P13 loops ``col.notnull().all()`` per column
    (src/survey_metadata_update.py:103-114) and P10 checks
    ``transect_point`` against ^[NSEW]\\d{1,2}$
    (src/point_intercepts_update.py:229-231). Here both families fold
    into a single conditional-count aggregation row.
    """
    required = required or []
    patterns = patterns or {}
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in required:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"null__{c}"))
    for c, pat in patterns.items():
        aggs.append(
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).rlike(pat), 1)
            ).alias(f"pat__{c}")
        )
    row = df.agg(*aggs).collect()[0].asDict()
    nulls = {c: row[f"null__{c}"] for c in required if row[f"null__{c}"]}
    pats = {c: row[f"pat__{c}"] for c in patterns if row[f"pat__{c}"]}
    return ValidationReport(
        ok=not nulls and not pats,
        null_violations=nulls,
        pattern_violations=pats,
        total_rows=row["__total"],
    )
