"""Pipeline observability via Spark's Observation API: stage-level
row/volume counters collected as a SIDE EFFECT of the job's one
action, instead of per-stage ``count()`` calls that each re-execute
the plan.

At 100 TB this is the difference between metrics-for-free and
doubling the pipeline cost: ``df.observe(...)`` attaches accumulator-
backed aggregates to a point IN the plan, the normal action drives
them, and the observed values arrive on the driver when the action
finishes. The curation pipeline uses it to answer "how many documents
survived each gate?" from the same job that wrote the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observe_stage", "stage_metrics"]


def observe_stage(
    df: DataFrame,
    observation: Observation,
    weight_col: str | None = None,
) -> DataFrame:
    """Attach a row-count (and optional weight-sum, e.g. tokens)
    observation at this point in the plan. Returns the same DataFrame;
    after any action runs, ``observation.get`` holds
    ``{"rows": n, "weight": w}``.

    Each ``Observation`` object can be attached once — make one per
    stage (see :func:`stage_metrics`)."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col)).alias("weight"))
    return df.observe(observation, *aggs)


def stage_metrics(names: list[str]) -> dict[str, Observation]:
    """One named Observation per pipeline stage. Read results after
    the action: ``{k: o.get for k, o in obs.items()}``."""
    return {name: Observation(name) for name in names}
