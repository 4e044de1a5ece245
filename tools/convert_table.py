"""Table format migration: read a table in one format, rewrite it in
another, verify, and atomically swap into place.

    python tools/convert_table.py SRC DST --from parquet --to orc
    python tools/convert_table.py SRC DST --to jsonl --partitions 8

The reference's workflow equivalent is the CSV→BigQuery load + backup
export cycle; here any pair of (parquet, orc, jsonl, csv) converts in
one distributed job. Safety contract:

* the converted copy is STAGED next to the destination and verified
  (row count, and schema when the target format preserves types)
  BEFORE the two-rename atomic swap installs it — the destination
  never holds a half-written table;
* the source is never touched, so a bad conversion costs nothing.

Text targets (jsonl/csv) are verified by COUNT only — they erase type
nuance by design (that is why the engine's readers demand explicit
schemas for them); converting TO a text format is an export, and
converting BACK requires the schema contract, same as any ingest.

Scale: the job is scan → write, no shuffle unless --partitions
forces a coalesce-style rebalance; at 100 TB run it per-partition
(convert one year directory at a time) and swap each directory.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FORMATS = ("parquet", "orc", "jsonl", "csv")


def convert_table(
    spark,
    src: str,
    dst: str,
    src_fmt: str = "parquet",
    dst_fmt: str = "orc",
    partitions: int | None = None,
) -> int:
    """Run the staged convert+verify+swap. Returns the row count."""
    from mpg_data_warehouse_spark.sources.writers import swap_into_place

    if src_fmt not in FORMATS or dst_fmt not in FORMATS:
        raise ValueError(f"formats must be one of {FORMATS}")

    readers = {
        "parquet": lambda p: spark.read.parquet(p),
        "orc": lambda p: spark.read.orc(p),
        # schema-less reads are acceptable HERE because the verify
        # step only counts; typed round-trips go through the engine's
        # schema-mandatory readers.
        "jsonl": lambda p: spark.read.json(p),
        "csv": lambda p: spark.read.option("header", True).csv(p),
    }
    # Staged-copy readers: CSV must be read back with multiLine (and
    # the writer's own quote/escape defaults) — a quoted value holding
    # a newline is VALID output, but a non-multiLine read splits it
    # into extra records and flunks the count check spuriously.
    verify_readers = dict(
        readers,
        csv=lambda p: (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("escape", "\\")
            .csv(p)
        ),
    )

    df = readers[src_fmt](src)
    if partitions is not None:
        df = df.repartition(partitions)

    # The row count rides the conversion job itself (Observation on
    # the written frame): one source scan total, and the verified
    # number is what was WRITTEN — a source modified mid-conversion
    # can neither spuriously fail nor wrongly pass the check.
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("convert_rows")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))

    staged = dst.rstrip("/") + "__staging"
    writer = observed.write.mode("overwrite")
    if dst_fmt == "jsonl":
        writer.json(staged)
    elif dst_fmt == "csv":
        writer.option("header", True).csv(staged)
    else:
        writer.format(dst_fmt).save(staged)
    n_src = obs.get["n"]

    try:
        back = verify_readers["jsonl" if dst_fmt == "jsonl" else dst_fmt](
            staged
        )
        n_dst = back.count()
        if n_dst != n_src:
            raise RuntimeError(
                f"verification failed: wrote {n_src} rows, staged read "
                f"back {n_dst}"
            )
        if dst_fmt in ("parquet", "orc") and src_fmt in ("parquet", "orc"):
            if back.schema != df.schema:
                raise RuntimeError(
                    "verification failed: staged schema differs from source"
                )
    except BaseException:
        # a failed verification must not leave the staging copy behind
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        raise
    swap_into_place(staged, dst)
    return n_src


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--from", dest="src_fmt", default="parquet", choices=FORMATS)
    ap.add_argument("--to", dest="dst_fmt", default="orc", choices=FORMATS)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from mpg_data_warehouse_spark.session import get_spark

    spark = get_spark("convert_table")
    n = convert_table(
        spark, args.src, args.dst, args.src_fmt, args.dst_fmt, args.partitions
    )
    print(f"converted {n} rows: {args.src} ({args.src_fmt}) -> "
          f"{args.dst} ({args.dst_fmt})")
    spark.stop()


if __name__ == "__main__":
    main()
