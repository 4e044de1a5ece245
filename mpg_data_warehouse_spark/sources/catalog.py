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
from mpg_data_warehouse_spark.sources.readers import read_events


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
            # ts layout varies between driver generations; normalize
            # to a UTC TIMESTAMP whatever the physical encoding.
            df = read_events(spark, path)
        else:
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered


def list_tables(spark: SparkSession) -> list[str]:
    """Reference S6 ``dbListTables`` analog."""
    return sorted(t.name for t in spark.catalog.listTables())


# ---------------------------------------------------------------------------
# Catalog databases (SURVEY §1.3: the reference's BigQuery datasets —
# `vegetation`, `grid_point_summaries`, ... — map to catalog
# databases). Spark's catalog API is identical across backing stores:
# in-memory per-session here; a Hive metastore / Unity / Glue catalog
# on a production cluster persists the same objects across sessions
# with no code change. Reference catalog ops:
# src/investigate_gridveg_dates.py:180-192 (INFORMATION_SCHEMA.TABLES
# listing), client.get_table(id).schema introspection.
# ---------------------------------------------------------------------------


def create_database(
    spark: SparkSession, name: str, location: str | None = None
) -> None:
    """``CREATE DATABASE IF NOT EXISTS`` — the dataset namespace.

    ``location`` pins the database directory explicitly; without it
    Spark places it under ``spark.sql.warehouse.dir`` (cwd-relative
    by default, so callers that can't control cwd should pass one).
    """
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def register_external_table(
    spark: SparkSession, db: str, name: str, path: str
) -> None:
    """Register an existing parquet directory as a catalog table
    (``USING parquet LOCATION ...`` — metadata only, zero data copy,
    exactly how a 100 TB lake table enters the catalog). Re-pointing
    an existing name at a new location drops and recreates the
    metadata entry; the files are never touched."""
    spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    spark.sql(
        f"CREATE TABLE {db}.{name} USING parquet LOCATION '{path}'"
    )


def save_as_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    path: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """``saveAsTable`` round-trip: managed (data lives under the
    warehouse dir, DROP TABLE deletes it) or, with ``path``, external
    (catalog holds only metadata). ``spark.table(table)`` resolves it
    afterwards — the engine's CREATE TABLE AS SELECT."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def describe_table_sql(spark: SparkSession, table: str) -> DataFrame:
    """``DESCRIBE TABLE`` through SQL — (col_name, data_type, comment)
    rows straight from catalog metadata, no data scan; the SQL-surface
    twin of :func:`describe_table`."""
    return spark.sql(f"DESCRIBE TABLE {table}")


def register_sf_database(
    spark: SparkSession,
    sf_dir: str,
    db: str | None = None,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> str:
    """Expose an sf-dir as a catalog DATABASE of external parquet
    tables (vs :func:`register_sf_dir`'s session temp views). The
    database name derives from the path (md5-suffixed) so different
    scale factors coexist in one catalog; repeated calls are
    idempotent. Returns the database name."""
    import hashlib
    import tempfile

    if db is None:
        digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        db = f"mpgdw_{digest}"
    # Every table here is external (explicit LOCATION), so the db dir
    # holds no data; pin it under tmp so the call never depends on a
    # writable cwd-relative spark-warehouse.
    create_database(
        spark, db, os.path.join(tempfile.gettempdir(), "mpgdw_catalog", db)
    )
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            register_external_table(spark, db, name, path)
    return db


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


def analyze_table(
    spark: SparkSession, table: str, columns: tuple[str, ...] = ()
) -> dict[str, str]:
    """Collect cost-based-optimizer statistics for a catalog table —
    ``ANALYZE TABLE ... COMPUTE STATISTICS`` (row count + size), plus
    per-column NDV/null/min/max when ``columns`` are named. Returns
    the recorded table-level statistics parsed out of ``DESCRIBE
    EXTENDED`` (e.g. ``{"rowCount": "60000", "sizeInBytes": ...}``).

    This is what makes `spark.sql.cbo.enabled` join reordering and
    accurate broadcast decisions WORK at 100 TB: without stats the
    planner falls back to file-size guesses, which miss badly on
    filtered or highly-compressed inputs. Run it at write time (the
    table was just scanned anyway); stats persist in the metastore
    with the table."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    stats: dict[str, str] = {}
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r["col_name"] == "Statistics":
            # "N bytes, M rows" → structured dict
            for part in r["data_type"].split(","):
                words = part.strip().split()
                if len(words) == 2 and words[1] == "bytes":
                    stats["sizeInBytes"] = words[0]
                elif len(words) == 2 and words[1] == "rows":
                    stats["rowCount"] = words[0]
    return stats


def schema_matches(df: DataFrame, expected) -> bool:
    """Reference §1.3 schema verification: exact StructType equality
    (names, types, order). The engine's pre-append gate."""
    return df.schema == expected
