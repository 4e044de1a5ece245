"""Long-lived-driver contract at PIPELINE grain (r9 VERDICT item 6):
one session composing curate → maintain → rollup stage CYCLES under
the engine's operating cadence (``run_scoped`` for corpus-sized
intermediates, caller-released result checkpoints,
``release_session_debris`` between stages) must not degrade with
session age — the r8/r9 session-age artifact, previously pinned only
at bench-harness grain (BENCH_SCALE.md), here as an engine-level
regression test.

Pinned properties:
  * per-stage wall time in later cycles stays within 1.5× of the
    first cycle (the fresh-session cycle is the stage-solo proxy),
    with an absolute floor so sub-second stages don't flake on
    scheduler jitter;
  * RDD storage returns to the test's baseline after EVERY cycle —
    nothing a stage created survives it.

Scale: runs at ``$SPARK_GRAFT_PIPELINE_SF_DIR`` (default sf0.01 so the
suite stays fast); the builder re-runs the same composition at sf1.0
via the env override and records the numbers in BENCH_SCALE.md.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.session import (
    persistent_rdd_ids,
    release_rdd_storage,
    release_session_debris,
    run_scoped,
)
from mpg_data_warehouse_spark.sources import txlog

SF_DIR = os.environ.get(
    "SPARK_GRAFT_PIPELINE_SF_DIR", "/root/testdata/sf0.01"
)
CYCLES = 3
# later-cycle budget relative to cycle 1: 1.5× (the VERDICT bound)
# with a +2 s absolute floor so a 0.3 s stage can't flake on jitter
REL, ABS = 1.5, 2.0


def _docs(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(
            "doc_id",
            "text",
            "source",
            (F.col("doc_id") % 10).alias("grp"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .repartition(4)
    )


def _stage_curate(spark) -> None:
    """Corpus curation — persists tokenization/shingle intermediates
    internally, so it runs under run_scoped and the CALLER releases
    the consumed result checkpoint (the bench.py contract)."""
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    before = persistent_rdd_ids(spark)
    out = run_scoped(
        spark,
        lambda: curate_corpus_pipeline(
            _docs(spark).select("doc_id", "text", "source"),
            min_quality=0.5,
            max_tokens=64,
            overlap=8,
        ),
    )
    assert out.count() > 0
    release_rdd_storage(spark, persistent_rdd_ids(spark) - before)


def _stage_maintain(spark, base: str) -> None:
    """Table lifecycle: create + sidecar + append + one maintain_table
    call (compaction + every-sidecar refresh)."""
    from mpg_data_warehouse_spark.sources.bloom_skip import (
        build_file_blooms,
        read_bloom_pruned,
    )
    from mpg_data_warehouse_spark.sources.maintenance import maintain_table

    docs = _docs(spark)
    t = os.path.join(base, "t")
    txlog.create(spark, t, docs.filter(F.col("doc_id") % 2 == 0))
    build_file_blooms(spark, t, "doc_id")
    txlog.append(spark, t, docs.filter(F.col("doc_id") % 2 != 0))
    maintain_table(spark, t, target_partitions=2)
    # post-maintenance point lookup still answers
    assert (
        read_bloom_pruned(spark, t, "doc_id", values=[0, 1]).count() == 2
    )


def _stage_rollup(spark, base: str) -> None:
    """Incremental rollup maintenance over a fresh two-commit table:
    SUM/COUNT (retractable) + HLL and quantile sketches (insert-only)
    each bootstrapped then delta-maintained."""
    docs = _docs(spark)
    t = os.path.join(base, "rt")
    sroll = os.path.join(base, "sroll")
    hroll = os.path.join(base, "hroll")
    qroll = os.path.join(base, "qroll")
    txlog.create(spark, t, docs.filter(F.col("doc_id") % 2 == 0))
    txlog.incremental_rollup(
        spark, t, sroll, ["grp"], {"chars": "n_chars", "n": "1"}
    )
    txlog.incremental_sketch_rollup(
        spark, t, hroll, ["grp"], "doc_id", kind="hll"
    )
    txlog.incremental_sketch_rollup(
        spark, t, qroll, ["grp"], "n_chars",
        kind="quantile", id_cols=["doc_id"],
    )
    txlog.append(spark, t, docs.filter(F.col("doc_id") % 2 != 0))
    txlog.incremental_rollup(
        spark, t, sroll, ["grp"], {"chars": "n_chars", "n": "1"}
    )
    txlog.incremental_sketch_rollup(
        spark, t, hroll, ["grp"], "doc_id", kind="hll"
    )
    txlog.incremental_sketch_rollup(
        spark, t, qroll, ["grp"], "n_chars",
        kind="quantile", id_cols=["doc_id"],
    )
    assert txlog.read(spark, sroll).count() > 0


def test_pipeline_composition_no_session_age_degradation(spark, tmp_path):
    stages = {
        "curate": lambda base: _stage_curate(spark),
        "maintain": lambda base: _stage_maintain(spark, base),
        "rollup": lambda base: _stage_rollup(spark, base),
    }
    baseline = persistent_rdd_ids(spark)
    times: dict[str, list[float]] = {name: [] for name in stages}
    for cycle in range(CYCLES):
        base = str(tmp_path / f"cycle{cycle}")
        for name, fn in stages.items():
            t0 = time.monotonic()
            fn(base)
            times[name].append(time.monotonic() - t0)
            # the operating cadence: debris pulse BETWEEN stages,
            # never inside one
            release_session_debris(spark)
        # storage-clean after every cycle — nothing a stage created
        # survives it (the run_scoped / caller-release contract)
        leaked = persistent_rdd_ids(spark) - baseline
        assert not leaked, (
            f"cycle {cycle} leaked RDD storage: {sorted(leaked)}"
        )
    for name, ts in times.items():
        budget = max(ts[0] * REL, ts[0] + ABS)
        worst = max(ts[1:])
        assert worst <= budget, (
            f"stage {name!r} degraded with session age: cycle times "
            f"{[round(t, 2) for t in ts]} — worst later cycle "
            f"{worst:.2f}s exceeds {budget:.2f}s "
            f"(1.5× / +{ABS}s of the fresh-session cycle)"
        )
