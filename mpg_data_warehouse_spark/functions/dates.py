"""Date functions (reference §2.8 F1-F4).

The hard part (SURVEY §7.4 #1): FileMaker exports carry ``m/d/yy``
dates. pandas parses ``%y`` with a fixed pivot — 00-68 → 2000s,
69-99 → 1900s (the reference relies on this:
notebooks/update_gridVeg_survey_metadata.ipynb:342-345). Spark/Java
``to_date(col, "M/d/yy")`` anchors two-digit years to 2000 (00-99 →
2000-2099), so e.g. "6/15/99" parses to 2099 in Spark but 1999 in
pandas. We pin the pandas semantics explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PANDAS_TWO_DIGIT_PIVOT = 68  # yy <= 68 → 20yy, else 19yy


def parse_date_mdyy(col: Column | str) -> Column:
    """Parse ``m/d/yy`` strings with pandas pivot semantics.

    ``to_date(_, "M/d/yy")`` maps yy → 20yy for all yy; subtract 100
    years when the pandas pivot says 19yy. Pure column expression —
    whole-stage-codegen friendly, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.to_date(c, "M/d/yy")
    return F.when(
        F.year(parsed) % 100 > PANDAS_TWO_DIGIT_PIVOT,
        F.add_months(parsed, -1200),
    ).otherwise(parsed)


def survey_sequence(year_col: Column | str) -> Column:
    """Derive ``survey_sequence``: "2011-12" for the two merged pilot
    years, else the year as string (reference UD1/F10:
    notebooks/update_gridVeg_survey_metadata.ipynb:368-376 — a Python
    ``.apply`` there; a native conditional here)."""
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    return F.when(y.isin(2011, 2012), F.lit("2011-12")).otherwise(
        y.cast("string")
    )


def rebuild_swapped_date(date_col: Column | str) -> Column:
    """Reconstruct a date whose components were written in the wrong
    order (DD-MM-YY read as YY-MM-DD), producing impossible future
    dates — the gridVeg date-corruption incident (reference
    docs/gridveg_date_issue.md:13-28, repair math
    src/investigate_further_gridveg_dates.py:203-214):
    corrupt year 2000+DD, month MM, day YY-2000 → real (DD, MM, YY).
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.make_date(
        F.dayofmonth(d) + 2000, F.month(d), F.year(d) - 2000
    )
