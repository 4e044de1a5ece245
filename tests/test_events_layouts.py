"""Pin `_events` against BOTH physical layouts of events.parquet's
``ts`` column that the driver has shipped across rounds:

- INT64 TIMESTAMP(NANOS) (read as LongType under the ``nanosAsLong``
  legacy conf) — round-1 testdata;
- timestamp[us] (read as TIMESTAMP_NTZ) — round-2+ testdata.

Round 2 lost 14 contract queries and the whole bench because `_events`
assumed one layout; this test writes a tiny parquet in each layout
with identical logical instants and asserts `_events` normalizes both
to the same TIMESTAMP values.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mpg_data_warehouse_spark.plans.driver_queries import _events

_US = [
    1_672_531_200_000_000,  # 2023-01-01T00:00:00Z
    1_672_534_800_500_000,  # +1h and 0.5s
    1_700_000_000_123_456,
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}', "{}"]),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "events.parquet"))


def _collect(spark, sf_dir):
    rows = _events(spark, sf_dir).orderBy("event_id").collect()
    return [(r.event_id, r.ts, r.user_id, r.event_type, r.value) for r in rows]


def test_events_handles_nanos_and_micros_layouts(spark, tmp_path):
    nanos_dir = str(tmp_path / "nanos")
    micros_dir = str(tmp_path / "micros")
    _write_events(
        nanos_dir,
        pa.array([us * 1000 for us in _US], pa.timestamp("ns")),
    )
    _write_events(micros_dir, pa.array(_US, pa.timestamp("us")))

    got_nanos = _collect(spark, nanos_dir)
    got_micros = _collect(spark, micros_dir)
    assert got_nanos == got_micros

    df = _events(spark, micros_dir)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    us_vals = [
        r.us
        for r in df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
    ]
    assert us_vals == sorted(_US)


def test_events_passthrough_when_already_timestamp(spark, tmp_path):
    """A third layout — plain TIMESTAMP (UTC-adjusted) parquet — must
    pass through unchanged."""
    tz_dir = str(tmp_path / "tz")
    _write_events(tz_dir, pa.array(_US, pa.timestamp("us", tz="UTC")))
    got = _collect(spark, tz_dir)
    micros_dir = str(tmp_path / "micros2")
    _write_events(micros_dir, pa.array(_US, pa.timestamp("us")))
    assert got == _collect(spark, micros_dir)
