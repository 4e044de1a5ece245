"""Derive a larger scale factor from the driver's sf0.1 tables by
key-offset replication: replica i adds ``i * OFFSET`` to every
surrogate key, so referential integrity (orders→customer,
lineitem→{orders,part,supplier}, embeddings/doc ids) is preserved and
every query stays semantically valid at k× the rows. region/nation
are fixed-size dimensions and are copied once, unchanged — exactly
how TPC-H itself scales.

Replicated document texts are byte-identical across replicas on
purpose: web-scale corpora are full of exact duplicates, so the
derived set stress-tests the dedup operators' bucket caps rather than
flattering them.

Usage: python tools/make_scale_data.py [k] [src_dir] [dst_dir]
Defaults: k=10, src=/root/testdata/sf0.1, dst=/tmp/scale/sf1.0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.session import get_spark

OFFSET = 10_000_000

# Per-table key columns that get the replica offset. Tables absent
# here (region, nation) are copied once, unchanged.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale/sf1.0"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-scale-data")

    for t in COPY_ONCE:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        replicas = []
        for i in range(k):
            r = base
            for c in keys:
                r = r.withColumn(c, (F.col(c) + F.lit(i * OFFSET)).cast("long"))
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{k}")

    spark.stop()
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
