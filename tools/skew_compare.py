"""Salting-on-vs-off on a zipf-skewed shuffle join (r10 verdict
demand 5: the salting in operators/joins.py is implemented but was
never exercised under bench).

Shape: the zipf events stream (user 1 owns ~half the rows — generate
with ``make_scale_data.py k src dst --zipf``) equi-joined to a
per-user dimension, then aggregated. The dimension is forced OFF the
broadcast path (autoBroadcastJoinThreshold=-1) to model the 100 TB
case where the dim exceeds the broadcast limit — with broadcast
available, broadcast IS the answer to skew and salting is moot.

Three runs of the identical logical join (ONLY
spark.sql.adaptive.skewJoin.enabled is toggled — AQE itself, incl.
partition coalescing, stays on in all three, so the deltas isolate
the skew-SPLIT mechanism, not AQE wholesale):
  plain_skewjoin_off  — baseline sort-merge join; the hot key lands
                        in ONE task (the stragglers a 1000-executor
                        cluster pays)
  plain_skewjoin_on   — the engine default: AQE's skew-join rule may
                        split the skewed partition at runtime
  salted_skewjoin_off — operators.joins.salted_join: the hot key is
                        pre-split across n_salts shuffle partitions
                        (the fallback for cases the advisory-size
                        heuristic misses)

Prints one JSON line with the three medians; results are recorded in
BENCH_SCALE.md.

Usage: python tools/skew_compare.py [zipf_dir] [n_salts] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.joins import salted_join
from mpg_data_warehouse_spark.session import get_spark


def main() -> None:
    zdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1.0-zipf"
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("skew-compare")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    events = spark.read.parquet(f"{zdir}/events.parquet").select(
        "user_id", "value", "event_type"
    )
    dim = (
        spark.read.parquet(f"{zdir}/events.parquet")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod("user_id", F.lit(7)))
    )

    def measure(join_fn, skew_rule: bool) -> float:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_rule).lower()
        )
        t0 = time.time()
        (
            join_fn(events, dim)
            .groupBy("segment", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sv"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    plain = lambda b, s: b.join(s, "user_id")  # noqa: E731
    salted = lambda b, s: salted_join(b, s, ["user_id"], n_salts=n_salts)  # noqa: E731

    # verify identical results once before timing (salting is a
    # physical rewrite, never a semantic one)
    a = plain(events, dim).groupBy("segment", "event_type").count()
    b = salted(events, dim).groupBy("segment", "event_type").count()
    if a.exceptAll(b).count() or b.exceptAll(a).count():
        raise AssertionError("salted_join result differs from plain join")

    # INTERLEAVE reps across variants (bench.py's protocol): a
    # transient load spike then degrades one rep of every variant
    # instead of every rep of one variant — back-to-back per-variant
    # timing inverted the comparison under ambient load.
    variants = [
        ("plain_skewjoin_off", plain, False),
        ("plain_skewjoin_on", plain, True),
        ("salted_skewjoin_off", salted, False),
    ]
    samples = {name: [] for name, _, _ in variants}
    for _ in range(reps):
        for name, fn, rule in variants:
            samples[name].append(measure(fn, rule))
    out = {
        "metric": "skew_join_compare",
        "zipf_dir": zdir,
        "n_salts": n_salts,
        "reps": reps,
        **{n: round(statistics.median(ts), 3) for n, ts in samples.items()},
        "spread": {
            n: [round(min(ts), 3), round(max(ts), 3)]
            for n, ts in samples.items()
        },
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
