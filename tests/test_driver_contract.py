"""Driver-contract smoke: entry() yields rows, every oracle key has a
query, oracle SQL parses in DuckDB, column names align (the driver
hash sorts columns by name — names must match exactly)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from mpg_data_warehouse_spark.schemas import TESTDATA_TABLES

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 17


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    return con


def test_columns_align_with_oracle(spark, duck):
    """Spark result column names == oracle result column names."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name, sql in o.items():
        spark_cols = sorted(q[name](spark, SF).columns)
        duck_cols = sorted(
            duck.execute(f"SELECT * FROM ({sql}) LIMIT 0").df().columns
        )
        assert spark_cols == duck_cols, f"{name}: {spark_cols} != {duck_cols}"
