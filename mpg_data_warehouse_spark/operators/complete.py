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


def _null_safe_left_join(
    left: DataFrame, right: DataFrame, keys: list[str], prefix: str,
    how: str = "left", keep_right_keys: bool = False,
) -> DataFrame:
    """left ⟕ right on ``keys`` with NA-matching (eqNullSafe)
    equality — dplyr/tidyr join semantics; a bare equi-join never
    matches NULL keys and silently replaces their measures with the
    fill. Shared by both completion strategies. ``how="full"`` +
    ``keep_right_keys`` backs the strict-domain guard below, which
    must still see the key values of right-only (out-of-domain)
    rows to report them."""
    renames = {k: f"{prefix}{k}" for k in keys}
    for k, rk in renames.items():
        right = right.withColumnRenamed(k, rk)
    cond = None
    for k, rk in renames.items():
        c = F.col(k).eqNullSafe(F.col(rk))
        cond = c if cond is None else cond & c
    out = left.join(right, cond, how)
    if not keep_right_keys:
        out = out.drop(*renames.values())
    return out


_GRID_MARK = "__complete_in_grid"


def _weave_guard(guard, out: DataFrame, col_name: str) -> DataFrame:
    """Force per-row evaluation of ``guard`` (an ``assert_true``
    column) by threading it through ``col_name``'s projection.
    A bare ``withColumn + drop`` is pruned by Catalyst and never
    evaluates (verified on 4.1) — wrapping a kept column in
    ``when(guard.isNull(), col)`` is the cheapest construction the
    optimizer cannot elide."""
    wrapped = F.when(guard.isNull(), F.col(col_name)).alias(col_name)
    return out.select(
        *[wrapped if c == col_name else F.col(c) for c in out.columns]
    )


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

    # tidyr keeps NULL as a category AND dplyr/tidyr joins match NA
    # keys (na_matches="na"), so an existing (anchor, NULL-code) row
    # must keep its measures (the map strategy's struct-keyed lookup
    # is null-safe by construction).
    #
    # Strict-domain guard: with an EXPLICIT domain (expand_values /
    # nesting_values) a caller can pass a set NARROWER than the
    # observed combos; a plain grid-left-join would then silently
    # drop those aggregate rows (tidyr's full-join semantics keep
    # every observed row). Instead of a separate validation job —
    # which would re-execute df's upstream pipeline — the join
    # becomes a full outer with a grid-side marker, and a lazy
    # ``assert_true`` raises in-plan on any df-only row. Zero extra
    # jobs, zero cost on the default (observed-domain) path.
    strict = expand_values is not None or nesting_values is not None
    if strict:
        grid = grid.withColumn(_GRID_MARK, F.lit(True))
        out = _null_safe_left_join(
            grid, df, join_keys, "__complete_", how="full",
            keep_right_keys=True,
        )
        guard = F.assert_true(
            F.col(_GRID_MARK).isNotNull(),
            F.concat(
                F.lit(
                    "complete(): input combo outside the explicit "
                    "expand_values/nesting_values domain (would be "
                    "silently dropped): "
                ),
                F.to_json(
                    F.struct(
                        *[
                            F.col(f"__complete_{k}").alias(k)
                            for k in join_keys
                        ]
                    )
                ),
            ),
        )
        out = _weave_guard(guard, out, join_keys[0]).drop(
            _GRID_MARK, *[f"__complete_{k}" for k in join_keys]
        )
    else:
        out = _null_safe_left_join(grid, df, join_keys, "__complete_")
    if fill:
        out = out.na.fill(fill)
    return out


def complete_map(
    df: DataFrame,
    expand: list[str],
    nesting: list[str],
    fill: dict[str, object] | None = None,
    expand_values: DataFrame | None = None,
    nesting_values: DataFrame | None = None,
    max_domain: int = 4096,
) -> DataFrame:
    """``complete()`` for POST-AGGREGATION frames with a SMALL expand
    domain — same output contract, different physical shape.

    The grid strategy above shuffles the |anchors| × |domain| grid
    AND the data frame into a sort-merge join: at sf1.0 the
    functional-groups wrangle's ~37 M-row grid join was the engine's
    most memory-intense (GC-bimodal) plan. Here the grid is never
    materialized pre-join: the frame collapses to one map per anchor
    (``map_from_entries`` keyed by the expand combo — ONE shuffle of
    |df| narrow rows on the nesting key), anchors outside the frame
    left-join in, and the domain is exploded map-side from a literal
    array with an ``element_at`` lookup per combo. Output rows are
    produced inside the final stage, so peak shuffle volume drops
    from O(grid + df) to O(df) and the plan references ``df`` ONCE
    (the grid path reads it up to three times — no ``cache_input``
    needed).

    Requirements (both loud):
    - (nesting + expand) must be UNIQUE in ``df`` (true for any
      grouped aggregate — the reference's only complete() callers);
      duplicates raise Spark's duplicate-map-key error.
    - The expand domain must fit a literal array: ≤ ``max_domain``
      combos (collected driver-side — bounded by construction: the
      domain is a code table, 18 ground-cover codes / 23 functional
      groups / 25 brands). Larger domains belong on the grid path.
    """
    fill = fill or {}
    if not nesting:
        raise ValueError("complete_map requires nesting columns")
    others = [c for c in df.columns if c not in set(expand) | set(nesting)]

    dom_src = expand_values if expand_values is not None else df
    dom_df = dom_src.select(*expand).distinct()
    dom_rows = dom_df.limit(max_domain + 1).collect()
    if len(dom_rows) > max_domain:
        raise ValueError(
            f"expand domain exceeds max_domain={max_domain}; use the "
            "grid-strategy complete() for large domains"
        )
    dom_types = {f.name: f.dataType for f in dom_df.schema.fields}
    dom_lit = F.array(
        *[
            F.struct(
                *[
                    F.lit(r[c]).cast(dom_types[c]).alias(c)
                    for c in expand
                ]
            )
            for r in dom_rows
        ]
    )

    per_anchor = df.groupBy(*nesting).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.struct(*[F.col(c) for c in expand]).alias("key"),
                    F.struct(*[F.col(c) for c in others]).alias("value"),
                )
            )
        ).alias("_m")
    )
    if nesting_values is not None:
        # a NULL anchor key must still pick up its data's map instead
        # of silently taking the fill. Full outer + marker: an anchor
        # present in the DATA but absent from the explicit anchor set
        # must raise (it would otherwise be silently dropped — the
        # same strict-domain contract as the grid strategy above).
        anchors = (
            nesting_values.select(*nesting)
            .distinct()
            .withColumn(_GRID_MARK, F.lit(True))
        )
        base = _null_safe_left_join(
            anchors, per_anchor, nesting, "__cm_", how="full",
            keep_right_keys=True,
        )
        anchor_guard = F.assert_true(
            F.col(_GRID_MARK).isNotNull(),
            F.concat(
                F.lit(
                    "complete_map(): observed anchor outside the "
                    "explicit nesting_values set (would be silently "
                    "dropped): "
                ),
                F.to_json(
                    F.struct(
                        *[F.col(f"__cm_{k}").alias(k) for k in nesting]
                    )
                ),
            ),
        )
        # woven into nesting[0] (NOT the marker/renamed keys, which
        # are dropped — a guard inside a dropped column is pruned)
        base = _weave_guard(anchor_guard, base, nesting[0]).drop(
            _GRID_MARK, *[f"__cm_{k}" for k in nesting]
        )
    else:
        base = per_anchor

    if expand_values is not None:
        # Strict-domain guard, map flavor: every combo observed in the
        # data (a key of the per-anchor map) must appear in the
        # explicit domain literal, else the element_at lookups below
        # would silently drop it. array_except on struct arrays is
        # null-safe field-wise (verified on 4.1: a struct holding
        # NULL matches its literal twin), so NULL categories guard
        # correctly. _m is NULL for anchor-only rows — skip those.
        extra = F.array_except(F.map_keys(F.col("_m")), dom_lit)
        expand_guard = F.assert_true(
            F.col("_m").isNull() | (F.size(extra) <= 0),
            F.concat(
                F.lit(
                    "complete_map(): observed expand combos missing "
                    "from expand_values (would be silently dropped): "
                ),
                F.to_json(extra),
            ),
        )
        # woven BELOW the explode (a guard inside the post-explode
        # projection re-evaluates the O(|domain| × |map|) array_except
        # once per domain row — measured 3× on the functional-groups
        # bench query; here it runs once per anchor)
        base = base.withColumn(
            "_m", F.when(expand_guard.isNull(), F.col("_m"))
        )
    looked_up = F.element_at(F.col("_m"), F.col("_k"))
    out = base.select(
        *nesting, F.explode(dom_lit).alias("_k"), F.col("_m")
    ).select(
        *nesting,
        *[F.col("_k")[c].alias(c) for c in expand],
        *[looked_up[c].alias(c) for c in others],
    )
    if fill:
        out = out.na.fill(fill)
    return out
