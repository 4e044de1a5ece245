"""tidyr-style ``complete()`` — the reference's most distinctive op
(SURVEY §2 A8; reference sites
notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:660-663 and
notebooks/gridVeg_plant_functional_groups_WRANGLE.ipynb:748-752).

Semantics (pinned by the reference's 1,242 × 23 = 28,556-row
invariant): the output key space is the CROSS of

  * the distinct values of the ``expand`` columns (taken jointly —
    their observed combinations, matching tidyr's behavior when the
    columns are listed together), and
  * the distinct observed combinations of the ``nesting`` columns
    (tidyr ``nesting(...)`` — NOT their full cross),

left-joined back to the data, missing measures filled with constants.
NULL values in the expand/nesting columns are kept as categories
(tidyr behavior) — callers filter them first if unwanted.

Scale design: the expand side is tiny by construction (a code domain —
18 ground-cover codes, 23 functional-group triples), so we broadcast
it into the crossJoin, making the grid build shuffle-free: the nesting
distinct is one shuffle, the crossJoin is map-side, and the final left
join shuffles on the full key once. No driver-side collection at any
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def complete(
    df: DataFrame,
    expand: list[str],
    nesting: list[str] | None = None,
    fill: dict[str, object] | None = None,
    expand_values: DataFrame | None = None,
    nesting_values: DataFrame | None = None,
    cache_input: bool = False,
) -> DataFrame:
    """Ensure every expand-combo × observed nesting-combo exists.

    Parameters
    ----------
    df : input frame.
    expand : columns whose joint distinct combinations define the
        grid axis to complete over (e.g. ``["intercept_ground_code"]``
        or the three pfg columns).
    nesting : columns whose only-observed combinations anchor the
        grid (e.g. ``["survey_ID", "grid_point"]``). Defaults to all
        remaining non-measure columns... which cannot be inferred, so
        it is required in practice; None means a plain cross of
        expand values with nothing (just reindex to the domain).
    fill : {measure column: fill value} for rows created by the
        completion (tidyr ``fill = list(...)``).
    expand_values : optional explicit domain for the expand columns
        (e.g. the full 18-code ground-cover dimension) instead of the
        observed distinct — useful when the domain is a dimension
        table and some codes were never observed.
    nesting_values : optional explicit anchor set for the nesting
        columns. Scale lever: when ``df`` is itself an expensive
        join+aggregate, deriving the anchors from it re-executes that
        pipeline; a cheaper equivalent source (e.g. the single key
        column of the base fact, when referential integrity makes the
        distinct sets equal) turns the grid build into one narrow
        column scan.
    """
    fill = fill or {}
    nesting = nesting or []

    if cache_input:
        # The plan references df three times (expand-distinct,
        # nesting-distinct, and the grid left-join's data side);
        # without reuse Catalyst re-executes the upstream pipeline for
        # each — three passes over the fact scan + aggregate at 100 TB.
        # Caching (or, cross-job, checkpointing to parquet) makes it
        # one pass. Opt-in: tiny inputs don't repay materialization.
        df = df.cache()

    codes = (
        expand_values.select(*expand).distinct()
        if expand_values is not None
        else df.select(*expand).distinct()
    )
    if nesting:
        anchors = (
            nesting_values.select(*nesting).distinct()
            if nesting_values is not None
            else df.select(*nesting).distinct()
        )
        # Code domains are small (≤ a few thousand combos); broadcast
        # keeps the grid build free of a cross-shuffle.
        grid = anchors.crossJoin(F.broadcast(codes))
        join_keys = nesting + expand
    else:
        grid = codes
        join_keys = list(expand)

    out = grid.join(df, on=join_keys, how="left")
    if fill:
        out = out.na.fill(fill)
    return out
