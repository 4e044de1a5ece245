"""Catalog operations (reference §2 S6-S8).

The reference lists tables with ``dbListTables`` / an
``INFORMATION_SCHEMA.TABLES`` query
(src/investigate_gridveg_dates.py:180-192), introspects schemas via
``client.get_table(id).schema`` (src/investigate_gridveg_dates.py:12-17)
and reads ``table.num_rows`` without a scan
(notebooks/fix_gridVeg_additional_species_na_rows.ipynb:161). Spark's
catalog + parquet footers provide all three.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.schemas import TESTDATA_TABLES


def register_sf_dir(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> list[str]:
    """Register every parquet table under ``sf_dir`` as a temp view —
    the engine's 'dataset' namespace; afterwards ``spark.sql`` and
    ``spark.table`` work by name."""
    registered = []
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        if name == "events":
            # TIMESTAMP(NANOS) parquet: read as long nanos, convert
            # to a µs timestamp (exact integer division).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path).withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        else:
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered


def list_tables(spark: SparkSession) -> list[str]:
    """Reference S6 ``dbListTables`` analog."""
    return sorted(t.name for t in spark.catalog.listTables())


def describe_table(spark: SparkSession, name: str) -> list[tuple[str, str, bool]]:
    """Reference S7 schema introspection: (name, type, nullable) per
    column, from catalog metadata — no data scan."""
    return [
        (f.name, f.dataType.simpleString(), f.nullable)
        for f in spark.table(name).schema.fields
    ]


def row_count(spark: SparkSession, path: str) -> int:
    """Reference S8 metadata row count. A column-less parquet
    ``count()`` is satisfied from row-group metadata (the scan reads
    no column pages) — the Spark analog of BigQuery ``num_rows``."""
    return spark.read.parquet(path).count()


def schema_matches(df: DataFrame, expected) -> bool:
    """Reference §1.3 schema verification: exact StructType equality
    (names, types, order). The engine's pre-append gate."""
    return df.schema == expected
