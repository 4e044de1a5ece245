"""One-call table maintenance: OPTIMIZE (+ optional clustering) with
the index upkeep that file rewrites make necessary.

The operational gap this closes at 100 TB: ``txlog.compact`` rewrites
every live row into fresh files, and every per-file Bloom sidecar
then covers only DEAD files — reads stay correct (uncovered files are
always kept) but silently degrade to full scans until each sidecar is
refreshed. An OPTIMIZE cadence that forgets the sidecars erases the
point-lookup story compaction was run to improve (clustered footers
for ranges, fresh blooms for points). This module makes the pairing
one call, mirroring how Delta's OPTIMIZE cooperates with its bloom
index maintenance.

Deliberately NOT here: ``incremental_rollup`` (CDF-driven — it
catches up on its own next call, compaction included, via negated
partials) and ``incremental_sketch_rollup`` (REFUSES windows with
file removals by design — sketch state cannot retract; rebuild those
on the rebuild cadence, not the compaction cadence).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mpg_data_warehouse_spark.sources import txlog
from mpg_data_warehouse_spark.sources.bloom_skip import refresh_all_blooms


def maintain_table(
    spark: SparkSession,
    table: str,
    target_partitions: int | None = None,
    cluster_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
    zorder_bits: int = 16,
) -> dict:
    """Compact (optionally clustered / z-ordered) and refresh every
    Bloom sidecar the table carries. Returns
    ``{"compacted_version": int, "blooms": {col: version}}``."""
    v = txlog.compact(
        spark,
        table,
        target_partitions=target_partitions,
        cluster_by=cluster_by,
        zorder_by=zorder_by,
        zorder_bits=zorder_bits,
    )
    blooms = refresh_all_blooms(spark, table)
    return {"compacted_version": v, "blooms": blooms}
