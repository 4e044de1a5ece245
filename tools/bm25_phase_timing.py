"""Per-phase wall-clock breakdown of the `bm25_incremental_index`
contract slot (r12 VERDICT next-round 5): the slot is the most
expensive in every sweep, and its cost is a PRICED lifecycle —
build → injected crash → repair ×2 → full-batch retry → replayed
no-op → delete → search. This tool times each phase separately so
BENCH_SCALE.md can attribute the slot's seconds to genuinely-required
work vs anything avoidable.

Mirrors the contract slot's exact calls (same filters, same
SF-invariant crashed slice) — see
`plans/driver_queries.py::bm25_incremental_index`. Kept OUT of the
slot itself: per-phase `time.time()` fencing would add driver
synchronization the production path doesn't need.

Usage::

    python tools/bm25_phase_timing.py [SF_DIR]   # default sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import statistics

    from mpg_data_warehouse_spark.session import (
        get_spark,
        persistent_rdd_ids,
        release_rdd_storage,
    )

    spark = get_spark()
    reps: list[dict[str, float]] = []
    phases: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                phases[name] = round(time.time() - self.t0, 2)

        return _T()

    # bench-protocol parity: the swept slot runs SCOPED — every
    # persist/checkpoint the lifecycle creates is released after each
    # measurement, so nothing accumulates across reps (the first cut
    # of this tool skipped the release and the leaked checkpoints
    # inflated later reps ~3x). Rep 0 additionally pays JVM/codegen
    # warmup (the bench warms up at sf0.001 first), so it is reported
    # separately and the MEDIAN of the warm reps is the number
    # comparable to the swept slot.
    for _rep in range(4):
        ids0 = persistent_rdd_ids(spark)
        phases = {}
        run_lifecycle(spark, sf_dir, phases, timed, F)
        release_rdd_storage(spark, persistent_rdd_ids(spark) - ids0)
        reps.append(phases)

    warm = reps[1:]
    med = {
        k: round(statistics.median(r[k] for r in warm), 2)
        for k in warm[0]
    }
    out = {
        "sf_dir": sf_dir,
        "total_cold": round(sum(reps[0].values()), 2),
        "total_warm_median": round(sum(med.values()), 2),
        "phases_warm_median": med,
        "phases_cold": reps[0],
    }
    print(json.dumps(out))


def run_lifecycle(spark, sf_dir, phases, timed, F) -> None:
    from mpg_data_warehouse_spark.operators import search as _search
    from mpg_data_warehouse_spark.operators.search import (
        bm25_append_index,
        bm25_delete_index,
        bm25_repair_index,
        bm25_search_many,
        build_ranked_index,
    )
    from mpg_data_warehouse_spark.operators.text import norm_tokens
    from mpg_data_warehouse_spark.plans.driver_queries import _docs

    with timed("corpus_materialize"):
        docs = _docs(spark, sf_dir).persist()
        docs.count()
    idx = tempfile.mkdtemp(prefix="bm25_phase_timing_")
    with timed("initial_build"):
        build_ranked_index(docs.filter(F.col("doc_id") % 3 != 0), idx)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    crashed = batch.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 500)
    )

    class _InjectedCrash(Exception):
        pass

    def _boom(*a, **k):
        raise _InjectedCrash()

    real = _search._write_manifest
    _search._write_manifest = _boom
    try:
        with timed("crashed_partial_append"):
            try:
                bm25_append_index(crashed, idx)
            except _InjectedCrash:
                pass
    finally:
        _search._write_manifest = real

    with timed("expected_orphans_count"):
        expected = crashed.filter(F.size(norm_tokens("text")) > 0).count()
    with timed("repair_scrub"):
        n1 = bm25_repair_index(spark, idx)
    with timed("repair_clean_probe"):
        n2 = bm25_repair_index(spark, idx)
    assert (n1, n2) == (expected, 0), (n1, n2, expected)
    with timed("retry_full_batch_append"):
        bm25_append_index(batch, idx)
    with timed("replayed_noop_append"):
        n3 = bm25_append_index(batch, idx)
    assert n3 == 0
    with timed("delete_mod7"):
        bm25_delete_index(
            docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), idx
        )
    with timed("search_many"):
        bm25_search_many(
            spark, idx, ["table scan merge", "window join batch"], k=10
        ).count()
    docs.unpersist()


if __name__ == "__main__":
    main()
