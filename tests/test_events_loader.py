"""The events fixture's ts encoding has changed between driver
generations (TIMESTAMP(NANOS) → timestamp[us]); `_t` must normalize
either encoding to a proper TimestampType column with identical epoch
values. Regression test for the round-3 breakage where the loader
hard-coded the nanos path."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from lcmap_blackmagic_spark.registry import _t

EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([10, 11], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(['{"k":1}', '{"k":2}']),
    })
    pq.write_table(table, path)


@pytest.mark.parametrize("encoding", ["us", "ns", "us_utc"])
def test_t_events_normalizes_ts(spark, tmp_path, encoding):
    if encoding == "us":
        ts = pa.array(EPOCH_US, pa.timestamp("us"))
    elif encoding == "us_utc":  # tz-adjusted instant → Spark reads LTZ
        ts = pa.array(EPOCH_US, pa.timestamp("us", tz="UTC"))
    else:
        ts = pa.array([v * 1000 for v in EPOCH_US], pa.timestamp("ns"))
    _write_events(str(tmp_path / "events.parquet"), ts)
    df = _t(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r.ts for r in df.select("ts").collect())
    micros = [int(t.timestamp() * 1_000_000) for t in got]
    # both encodings must land on identical microsecond epochs
    assert micros == EPOCH_US


def test_t_events_on_driver_fixture(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.count() > 0
