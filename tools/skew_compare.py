"""Salting-on-vs-off on a zipf-skewed shuffle join (r10 verdict
demand 5: the salting in operators/joins.py is implemented but was
never exercised under bench).

Shape: the zipf events stream (user 1 owns ~half the rows — generate
with ``make_scale_data.py k src dst --zipf``) equi-joined to a
per-user dimension, then aggregated. The dimension is forced OFF the
broadcast path (autoBroadcastJoinThreshold=-1) to model the 100 TB
case where the dim exceeds the broadcast limit — with broadcast
available, broadcast IS the answer to skew and salting is moot.

Three runs of the identical logical join:
  plain_aqe_off  — baseline sort-merge join; the hot key lands in ONE
                   task (the stragglers a 1000-executor cluster pays)
  plain_aqe_on   — the engine default: AQE splits the skewed
                   partition at runtime (no code change)
  salted_aqe_off — operators.joins.salted_join: the hot key is
                   pre-split across n_salts shuffle partitions
                   (the fallback for join types AQE can't split)

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

    def run(join_fn, skew_aqe: bool) -> float:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower()
        )
        ts = []
        for _ in range(reps):
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
            ts.append(time.time() - t0)
        return round(statistics.median(ts), 3)

    plain = lambda b, s: b.join(s, "user_id")  # noqa: E731
    salted = lambda b, s: salted_join(b, s, ["user_id"], n_salts=n_salts)  # noqa: E731

    # verify identical results once before timing (salting is a
    # physical rewrite, never a semantic one)
    a = plain(events, dim).groupBy("segment", "event_type").count()
    b = salted(events, dim).groupBy("segment", "event_type").count()
    if a.exceptAll(b).count() or b.exceptAll(a).count():
        raise AssertionError("salted_join result differs from plain join")

    out = {
        "metric": "skew_join_compare",
        "zipf_dir": zdir,
        "n_salts": n_salts,
        "reps": reps,
        "plain_aqe_off": run(plain, False),
        "plain_aqe_on": run(plain, True),
        "salted_aqe_off": run(salted, False),
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
