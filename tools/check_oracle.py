"""Local mimic of the driver's correctness gate: run every
``queries()`` entry in Spark AND its ``oracle_sql()`` in DuckDB on the
same parquet, compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from __spark_entry__ import oracle_sql, queries
from mpg_data_warehouse_spark.schemas import TESTDATA_TABLES
from mpg_data_warehouse_spark.session import get_spark


def normalize(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash).

    Values are stringified cell-by-cell; floats formatted via repr of
    round-trip float() so 0.0 == -0.0 and int-valued floats match.
    """
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    def cell(v) -> str:
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v + 0.0)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dirs (make_scale_data)
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = queries(), oracle_sql()
    failures = []
    checked = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        s_n, s_cols, s_hash = normalize(sdf)
        if name not in oracles:
            print(f"  {name}: rows={s_n} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if s_n < 0:
                failures.append(name)
            continue
        ddf = con.execute(oracles[name]).df()
        d_n, d_cols, d_hash = normalize(ddf)
        ok = (s_n, s_cols, s_hash) == (d_n, d_cols, d_hash)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} spark={s_n} duck={d_n} "
              f"hash {'==' if s_hash == d_hash else s_hash + ' != ' + d_hash} "
              f"[{time.time()-t0:.1f}s]")
        if not ok:
            if s_cols != d_cols:
                print(f"    cols spark={s_cols}\n    cols duck ={d_cols}")
            failures.append(name)
    print(f"{checked - len(failures)}/{checked} matched")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
