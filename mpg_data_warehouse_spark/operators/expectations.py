"""Declarative data-quality expectations — the generalized form of
``validate.py``'s two hard-wired gates (reference P10/P13 null +
regex checks, src/survey_metadata_update.py:103-114,
src/point_intercepts_update.py:229-231), shaped like the public
Deequ / Great Expectations rule families.

A suite is a list of ``Rule``s; ``run_suite`` compiles every row-level
rule into ONE conditional-count aggregate (single scan, map-side
partial aggregation — at 100 TB the whole suite costs one pass no
matter how many rules), plus at most one extra shuffle-light job per
*relational* rule (``unique`` needs a key-grouped count; ``foreign_key``
an anti-join probe). Results come back as a DataFrame so suites can be
stored, unioned across tables, and trended over time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, unique, in_set, in_range,
    matches, custom, foreign_key}; ``threshold`` is the max tolerated
    violation FRACTION (0.0 = strict)."""

    kind: str
    column: str = ""
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str = ""
    predicate: Column | None = None
    ref: DataFrame | None = None
    ref_keys: tuple[str, ...] = ()
    broadcast_ref: bool = True
    threshold: float = 0.0
    name: str = ""

    def label(self) -> str:
        target = self.column or ",".join(str(v) for v in self.values)
        return self.name or f"{self.kind}({target})"


def not_null(column: str, threshold: float = 0.0) -> Rule:
    return Rule(kind="not_null", column=column, threshold=threshold)


def unique(*columns: str, threshold: float = 0.0) -> Rule:
    return Rule(kind="unique", values=tuple(columns), threshold=threshold)


def in_set(column: str, allowed, threshold: float = 0.0) -> Rule:
    return Rule(kind="in_set", column=column, values=tuple(allowed),
                threshold=threshold)


def in_range(
    column: str, lo: float | None = None, hi: float | None = None,
    threshold: float = 0.0,
) -> Rule:
    return Rule(kind="in_range", column=column, lo=lo, hi=hi,
                threshold=threshold)


def matches(column: str, pattern: str, threshold: float = 0.0) -> Rule:
    return Rule(kind="matches", column=column, pattern=pattern,
                threshold=threshold)


def custom(name: str, predicate: Column, threshold: float = 0.0) -> Rule:
    """``predicate`` is a boolean Column; rows where it is false (or
    null) count as violations."""
    return Rule(kind="custom", predicate=predicate, name=name,
                threshold=threshold)


def foreign_key(
    columns, ref: DataFrame, ref_keys=None, threshold: float = 0.0,
    broadcast_ref: bool = True,
) -> Rule:
    """``broadcast_ref=False`` for reference tables too big to
    broadcast — the probe becomes a shuffled anti-join on the keys
    (still key-width bytes only, never payloads)."""
    cols = tuple([columns] if isinstance(columns, str) else columns)
    return Rule(kind="foreign_key", values=cols, ref=ref,
                ref_keys=tuple(ref_keys or cols), threshold=threshold,
                broadcast_ref=broadcast_ref)


def _violation_expr(rule: Rule) -> Column:
    """Boolean column: True when the row VIOLATES the rule. Null
    column values violate everything except ``matches``/``in_set``
    (which follow SQL semantics and gate on not-null, mirroring
    validate.py's pattern gate)."""
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.values))
    if rule.kind == "in_range":
        # try_cast, not cast: under ANSI (Spark 4 default) a plain
        # cast THROWS on 'N/A'-style strings, killing the whole
        # suite/quarantine job — a malformed value is a VIOLATION to
        # count, not a crash. The null result lands in v.isNull().
        v = c.try_cast("double")
        # NaN sorts above every double, so "v < lo" alone never flags
        # it — treat NaN as out of range explicitly
        cond = F.isnan(v)
        if rule.lo is not None:
            cond = cond | (v < rule.lo)
        if rule.hi is not None:
            cond = cond | (v > rule.hi)
        return v.isNull() | cond
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "custom":
        return ~F.coalesce(rule.predicate, F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


def run_suite(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; return one result row per rule:
    ``(rule, violations, total, violation_frac, passed)`` — row-level
    rules first (in suite order), then relational rules.

    Cost model: all row-level rules fold into ONE aggregate over one
    scan. Each ``unique`` adds one key-grouped count (partial-agg
    collapses unique keys map-side, so shuffle bytes ≈ distinct dup
    keys). Each ``foreign_key`` adds one left-anti probe against the
    (broadcast when small) reference keys. Nothing collects row-level
    data to the driver — only per-rule counters."""
    spark = df.sparkSession
    row_rules = [r for r in rules
                 if r.kind not in ("unique", "foreign_key")]
    results: list[tuple] = []

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(row_rules):
        aggs.append(F.count(F.when(_violation_expr(r), 1)).alias(f"v{i}"))
    row = df.agg(*aggs).collect()[0]
    total = row["__total"]
    for i, r in enumerate(row_rules):
        results.append(_result(r, row[f"v{i}"], total))

    for r in rules:
        if r.kind == "unique":
            keys = list(r.values)
            # SQL UNIQUE semantics: NULL keys are pairwise distinct
            # (and the FK rule already exempts nulls) — grouping them
            # together would report N null-keyed rows as N duplicates.
            # not_null is the rule for nulls; this one ignores them.
            non_null = df
            for k in keys:
                non_null = non_null.filter(F.col(k).isNotNull())
            dup = (
                non_null.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )
            results.append(_result(r, int(dup), total))
        elif r.kind == "foreign_key":
            cols = list(r.values)
            ref = r.ref.select(
                *[F.col(k).alias(c) for c, k in zip(cols, r.ref_keys)]
            ).distinct()
            probe = F.broadcast(ref) if r.broadcast_ref else ref
            orphans = (
                df.select(*cols)
                .na.drop()
                .join(probe, cols, "left_anti")
                .count()
            )
            results.append(_result(r, int(orphans), total))

    return spark.createDataFrame(results, schema=", ".join(
        ["rule string", "violations long", "total long",
         "violation_frac double", "passed boolean"]
    ))


def _result(rule: Rule, violations: int, total: int) -> tuple:
    frac = (violations / total) if total else 0.0
    return (
        rule.label(),
        int(violations),
        int(total),
        round(frac, 6),
        frac <= rule.threshold,
    )


def assert_suite(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """``run_suite`` that raises on any failed rule — the CI /
    pre-write gate form. The raised message lists every failing rule
    with its violation count."""
    res = run_suite(df, rules)
    failed = [r for r in res.collect() if not r.passed]
    if failed:
        detail = "; ".join(
            f"{r.rule}: {r.violations}/{r.total}" for r in failed
        )
        raise AssertionError(f"expectation suite failed — {detail}")
    return res


def split_by_rules(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Row-routing form of a suite: ``(good, quarantined)`` where a
    row is quarantined if it violates ANY row-level rule; the
    quarantine side carries a ``_violated`` array naming the rules it
    failed (the same shape as the CSV quarantine-splitting reader, so
    bad rows land in a reviewable side table instead of dying or
    passing silently). Relational rules (unique / foreign_key) are
    table-level facts, not row routings — they raise here.

    One narrow map over the data, evaluated lazily twice (once per
    side); persist upstream or write both sides from one pass via
    ``partitionBy`` on a derived ok-flag when the input is expensive.
    """
    bad = [r for r in rules if r.kind in ("unique", "foreign_key")]
    if bad:
        raise ValueError(
            f"row-level rules only; got {[r.kind for r in bad]}"
        )
    flags = F.array_compact(
        F.array(
            *[
                F.when(_violation_expr(r), F.lit(r.label()))
                for r in rules
            ]
        )
    )
    tagged = df.withColumn("_violated", flags)
    good = tagged.filter(F.size("_violated") == 0).drop("_violated")
    quarantined = tagged.filter(F.size("_violated") > 0)
    return good, quarantined
