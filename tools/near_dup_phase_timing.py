"""Per-phase wall-clock fencing for the near_dup_retention contract
slot (r13 measurement aid, mirrors tools/hybrid_phase_timing.py):
exact-dedup + base checkpoint, shingle+signature pass, LSH candidate
pairs, Jaccard verify, connected components + retention. Fencing
materializes each phase boundary, so the phase sum exceeds the fused
slot time — the numbers attribute cost, they are not the slot. Usage:

    python tools/near_dup_phase_timing.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mpg_data_warehouse_spark.session import get_spark
from mpg_data_warehouse_spark.plans.driver_queries import _docs
from mpg_data_warehouse_spark.operators.dedup import (
    exact_dedup,
    exploded_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    retain_representatives,
)
from mpg_data_warehouse_spark.operators.text import tokens


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("near-dup-phase-timing")
    results: list[dict[str, float]] = []
    for rep in range(reps + 1):  # rep 0 = warmup
        t: dict[str, float] = {}
        docs = _docs(spark, sf_dir)
        perturbed = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(" ", F.slice(tokens("text"), 3, 100000)).alias(
                "text"
            ),
        )
        copies = docs.filter(F.col("doc_id") % 17 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
        raw = docs.unionByName(perturbed).unionByName(copies)

        t0 = time.perf_counter()
        keep = exact_dedup(raw).select("doc_id")
        base = raw.join(keep, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
        t["exact_base_ckpt"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        sh = exploded_shingles(base, "doc_id", "text", 3).cache()
        sigs = minhash_signatures(
            base, "doc_id", "text", 8, 3, shingles=sh
        ).localCheckpoint(eager=True)
        t["shingle_sigs"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        cands = lsh_candidate_pairs(sigs, "doc_id", 8, 4, 1000)
        cands = cands.localCheckpoint(eager=True)
        t["lsh_candidates"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = jaccard_pairs(
            base, cands, "doc_id", "text", 3, shingles=sh
        ).filter(F.col("jaccard") >= 0.5)
        pairs = pairs.localCheckpoint(eager=True)
        t["jaccard_verify"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        retain_representatives(base, pairs).select("doc_id").write.format(
            "noop"
        ).mode("overwrite").save()
        t["cc_retention"] = time.perf_counter() - t0

        spark.catalog.clearCache()
        if rep:
            results.append(t)
    keys = results[0].keys()
    print(f"{'phase':18s} " + " ".join(f"rep{i+1:d}" for i in range(reps)))
    for k in keys:
        vals = [r[k] for r in results]
        med = sorted(vals)[len(vals) // 2]
        print(
            f"{k:18s} " + " ".join(f"{v:6.2f}" for v in vals)
            + f"   med {med:6.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
