"""Readers (reference §2 S1-S8).

The reference reads FileMaker CSV exports from local disk and GCS
(``pd.read_csv``, sometimes ``encoding='latin-1'``) and round-trips
whole BigQuery tables to pandas. Spark subsumes all of it: one CSV
reader with explicit schema + encoding option (object stores are
native — the same call reads ``gs://``/``s3a://`` on a cluster), and
``spark.read.parquet`` for warehouse tables with Catalyst doing
column pruning and predicate pushdown down to the file footers.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mpg_data_warehouse_spark.schemas import TESTDATA_TABLES


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encoding: str = "UTF-8",
    null_values: tuple[str, ...] = ("", "NA"),
    header: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema and null-sentinel handling.

    Reference: local scan src/survey_metadata_update.py:35-42; GCS +
    latin-1 scan notebooks/update_plant_species_metadata.ipynb:250-253;
    null sentinels src/point_intercepts_update.py:118-120 (replaces
    ""/"NA" with null before casting). Spark's reader supports a single
    ``nullValue`` natively; for additional sentinels we read as
    declared types with ``nullValue`` set to the first sentinel and
    handle the rest in the cleaning layer when reading all-string.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("encoding", encoding)
        .option("nullValue", null_values[0] if null_values else "")
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Schema-less reads stay all-string (no inference): typing is
        # the cleaning layer's job, exactly like the reference's
        # read-then-coerce flow.
        reader = reader.option("inferSchema", "false")
    df = reader.csv(path)
    if len(null_values) > 1:
        string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
        for c in string_cols:
            df = df.withColumn(
                c, F.when(F.col(c).isin(*null_values), F.lit(None)).otherwise(F.col(c))
            )
    return df


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    encoding: str = "UTF-8",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Schema-checked CSV read that splits rows into (good, bad)
    instead of silently nulling malformed ones: PERMISSIVE mode with a
    ``_corrupt_record`` capture column, so every row that failed the
    declared schema lands in the quarantine frame with its RAW line
    intact (the re-ingest worklist — the reference triages these by
    hand; fix sites notebooks/fix_gridVeg_*_na_rows.ipynb).

    The returned ``good`` frame has exactly ``schema``'s columns;
    ``bad`` is (raw_line). The scan is cached before splitting —
    Spark cannot lazily filter on only the corrupt-record column (a
    documented restriction: the column exists only while parse state
    is live), and the cache also makes good/bad one physical pass."""
    capture = "_corrupt_record"
    schema_plus = T.StructType(
        list(schema.fields) + [T.StructField(capture, T.StringType())]
    )
    df = (
        spark.read.option("header", str(header).lower())
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", capture)
        .schema(schema_plus)
        .csv(path)
        .cache()
    )
    good = df.filter(F.col(capture).isNull()).drop(capture)
    bad = df.filter(F.col(capture).isNotNull()).select(
        F.col(capture).alias("raw_line")
    )
    return good, bad


def read_csv_with_fallback(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encodings: tuple[str, ...] = ("UTF-8", "ISO-8859-1"),
    probe_rows: int = 100,
    **kwargs,
) -> DataFrame:
    """Encoding-fallback CSV read (reference S2 variant: try UTF-8,
    on decode failure fall back to latin-1 —
    notebooks/append_csv_to_bq.ipynb:265-270). Spark's reader does not
    raise on bad bytes at plan time, so the probe materializes
    ``probe_rows`` rows (a LocalLimit — the scan stops after the first
    partition yields enough, it never reads the full file) and checks
    for the U+FFFD replacement character that signals a wrong decode.
    ``probe_rows`` bounds driver memory: it is a constant per candidate
    encoding regardless of file size."""
    last = None
    for enc in encodings:
        df = read_csv(spark, path, schema=schema, encoding=enc, **kwargs)
        try:
            sample = df.limit(probe_rows).collect()
        except Exception as exc:  # malformed for this encoding
            last = exc
            continue
        bad = any(
            "�" in str(v)
            for row in sample
            for v in row
            if isinstance(v, str)
        )
        if not bad:
            return df
        last = ValueError(f"replacement chars under {enc}")
    raise ValueError(f"no encoding in {encodings} decodes {path}: {last}")


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to a UTC TIMESTAMP regardless of
    the physical parquet layout it was read from.

    The events table is externally owned and its ``ts`` layout has
    varied (TIMESTAMP(NANOS) → INT64 nanos under the ``nanosAsLong``
    legacy conf; timestamp[us] → TIMESTAMP_NTZ), so the engine applies
    the same schema-verification discipline the reference uses on its
    externally-owned inputs (notebooks/append_csv_to_bq.ipynb:316-323,
    src/investigate_gridveg_dates.py:12-17): branch on the READ dtype,
    never assume one layout.

    - LongType (nanos-since-epoch) → exact integer division to µs then
      ``timestamp_micros`` (double math would lose precision > 2^53 ns);
    - TIMESTAMP_NTZ → cast to TIMESTAMP (identity on stored micros with
      the session tz pinned UTC, matching DuckDB's ``epoch_us`` naive-
      timestamp treatment);
    - TIMESTAMP → pass through.
    """
    ts_type = df.schema[ts_col].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn(
            ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)")
        )
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """events-table scan with ``ts`` normalized to a UTC TIMESTAMP
    (see ``normalize_event_ts``). Sets the ``nanosAsLong`` legacy conf
    (runtime-safe) so TIMESTAMP(NANOS) files read as longs instead of
    failing the vectorized reader, and pins the session timezone UTC so
    the NTZ cast and downstream unix_micros/date_trunc agree with a
    UTC-naive oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_event_ts(spark.read.parquet(path))


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    """Warehouse table scan (reference S4: ``SELECT * FROM t`` →
    client download). Here: a lazy parquet/Delta scan — projections
    and filters applied later still push down into this scan, so the
    'manual pushdown' the reference does by editing SQL strings (S5)
    is automatic."""
    if os.path.sep in path_or_name or path_or_name.endswith(".parquet"):
        return spark.read.parquet(path_or_name)
    return spark.table(path_or_name)


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def cached_or_compute(
    spark: SparkSession, cache_path: str, compute: "callable[[], DataFrame]"
) -> DataFrame:
    """Read-through interim cache (reference S15: if interim CSV
    exists load it, else query the warehouse and persist —
    src/explore_gridveg.py:9-36). Cross-session caching → parquet
    checkpoint; intra-session reuse should prefer ``df.cache()``."""
    try:
        return spark.read.parquet(cache_path)
    except Exception:
        df = compute()
        df.write.mode("overwrite").parquet(cache_path)
        return spark.read.parquet(cache_path)


def null_audit(df: DataFrame) -> DataFrame:
    """Per-column null counts in ONE pass (reference P11 runs
    ``df.isnull().sum()`` — src/survey_metadata_update.py:91-93).
    Single aggregate row; no per-column jobs."""
    return df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns]
    )


def any_null_rows(df: DataFrame) -> DataFrame:
    """Rows with any NULL (reference P12:
    notebooks/fix_gridVeg_additional_species_na_rows.ipynb:453-454)."""
    cond = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in df.columns])
    return df.filter(cond)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC table scan — the second columnar warehouse format Spark
    ships natively (vectorized reader, predicate pushdown and column
    pruning reach the stripe footers exactly as with parquet). Schema
    optional: ORC files self-describe; pass one to pin a contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """JSON-Lines reader with an EXPLICIT schema — the canonical
    interchange format of training-data pipelines.

    The schema argument is mandatory on purpose: without it Spark runs
    a full inference pass over the data (a second 100 TB scan) and
    dirty rows silently widen columns to string. Malformed lines land
    in nulls under the default PERMISSIVE mode rather than failing the
    job; pair with ``null_audit`` for a quarantine report."""
    return spark.read.schema(schema).json(path)
