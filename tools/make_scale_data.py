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

``--zipf`` additionally SKEWS the derived set (after any replication):
every bench corpus is uniform-synthetic, but at 100× the realistic
hazard for the dedup/LSH bucket joins and the shuffle-heavy event
aggregations is a zipf-like key distribution — a handful of texts
duplicated across a large share of the corpus, one user owning a
fat slice of the event stream. The skew map is deterministic
(xxhash64-derived uniform → rank = min(cap, floor(1/u)), a discrete
power law with P(rank=r) ≈ 1/r(r+1): rank 1 captures ~half the rows):

* ``documents.text``  → the text of the zipf-ranked doc id (exact-dup
  heavy corpus; shingle/minhash/simhash buckets go hot)
* ``embeddings.embedding`` → the vector of the zipf-ranked vec id
  (LSH buckets / IVF cells go hot)
* ``events.user_id``  → zipf rank (hot-user stream: skewed groupBys,
  window partitions, asof keys; NOTE: NULL user_ids are remapped to
  ranks too — the skewed set trades the null-population stress for
  key-skew stress, deliberately)

Keys themselves stay unique and referential integrity holds, so every
query remains semantically valid on the skewed set.

Usage: python tools/make_scale_data.py [k] [src_dir] [dst_dir] [--zipf]
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


def zipf_rank(col, cap: int):
    """Deterministic discrete power-law rank in [1, cap] from any key:
    u = xxhash64-derived uniform in (0, 1], rank = min(cap, floor(1/u))
    — P(rank = r) ≈ 1/(r(r+1)), so rank 1 takes ~half the mass (the
    aggressive end of web-corpus duplication skew). No rand(): the map
    is a pure function of the key, stable across retries/engines."""
    u = (F.pmod(F.xxhash64(col), F.lit(1_000_000)) + 1) / F.lit(1_000_000.0)
    return F.least(F.lit(cap), F.floor(1.0 / u)).cast("long")


def _skew_payload(
    df, id_col: str, payload_cols: list[str], cap: int
):
    """Replace each row's payload columns with those of the
    zipf-ranked id (rank r → the r-th smallest id), keeping the row's
    own key and all other columns — a corpus where a handful of
    payloads dominate, exactly the exact/near-dup distribution the
    bucket-capped dedup operators must survive."""
    from pyspark.sql import Window as W

    cap = min(cap, df.count())  # every rank must resolve to a payload
    # head = the cap smallest ids, fetched via distributed
    # TakeOrdered; the row_number window then runs over cap rows, not
    # the corpus (a corpus-wide global window would single-partition)
    ranked = (
        df.select(
            F.col(id_col).alias("_src_id"),
            *[F.col(c).alias(f"_src_{c}") for c in payload_cols],
        )
        .orderBy("_src_id")
        .limit(cap)
        .withColumn(
            "_rank", F.row_number().over(W.orderBy("_src_id")).cast("long")
        )
    )
    out = (
        df.withColumn("_rank", zipf_rank(F.col(id_col), cap))
        .join(F.broadcast(ranked.drop("_src_id")), "_rank")
        .drop("_rank")
    )
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"_src_{c}")).drop(f"_src_{c}")
    return out.select(*df.columns)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--zipf"]
    zipf = "--zipf" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = args[2] if len(args) > 2 else "/tmp/scale/sf1.0"
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
        if zipf:
            if t == "documents":
                # ~512 distinct head texts over the whole corpus
                out = _skew_payload(out, "doc_id", ["text"], 512)
            elif t == "embeddings":
                out = _skew_payload(out, "vec_id", ["embedding"], 512)
            elif t == "events":
                out = out.withColumn(
                    "user_id", zipf_rank(F.col("user_id"), 100_000)
                )
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{k}" + (" zipf" if zipf else ""))

    spark.stop()
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
