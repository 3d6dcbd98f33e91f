"""Chipmunk Python DataSource: chip-grain partitions, key pushdown
pruning on the driver, deterministic per-chip payloads."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from lcmap_blackmagic_spark.sources.chipmunk import (GRID_M,
                                                     ChipmunkDataSource,
                                                     ChipmunkReader)

CX0, CY0 = -2061585, 1922805


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ChipmunkDataSource)
    return spark


def _reader(**opts):
    defaults = {"cx0": CX0, "cy0": CY0, "nx": 3, "ny": 3}
    return ChipmunkReader({k: str(v) for k, v in (defaults | opts).items()})


def test_pushdown_prunes_partitions():
    r = _reader()
    unhandled = list(r.pushFilters([
        EqualTo(("cx",), CX0 + GRID_M),
        EqualTo(("cy",), CY0),
        GreaterThan(("acquired",), "2000-01-01"),
    ]))
    # cx/cy handled by the source; the acquired filter is returned to
    # Spark for post-scan evaluation
    assert len(unhandled) == 1 and isinstance(unhandled[0], GreaterThan)
    parts = r.partitions()
    assert [(p.cx, p.cy) for p in parts] == [(CX0 + GRID_M, CY0)]


def test_no_filters_full_grid():
    assert len(_reader().partitions()) == 9


def test_read_roundtrip_and_chip_counts(registered):
    df = (registered.read.format("chipmunk")
          .options(cx0=CX0, cy0=CY0, nx=2, ny=2, side=5, n_acq=7).load())
    # 4 chips × 8 ubids × 7 acquisitions
    assert df.count() == 4 * 8 * 7
    got = (df.groupBy("cx", "cy").count().orderBy("cx", "cy").collect())
    assert all(r["count"] == 56 for r in got)
    assert len(got) == 4
    # payload shape: side*side values per row
    assert df.select(F.size("data")).distinct().first()[0] == 25


def test_filtered_read_returns_single_chip(registered):
    df = (registered.read.format("chipmunk")
          .options(cx0=CX0, cy0=CY0, nx=2, ny=2, side=5, n_acq=7).load()
          .filter((F.col("cx") == CX0) & (F.col("cy") == CY0 - GRID_M)))
    rows = df.select("cx", "cy").distinct().collect()
    assert [(r.cx, r.cy) for r in rows] == [(CX0, CY0 - GRID_M)]
    assert df.count() == 56


def test_stream_reader_drains_grid(registered, tmp_path):
    """readStream over the chip grid: offsets advance one chip per
    micro-batch and availableNow drains exactly the whole grid."""
    import time
    stream = (registered.readStream.format("chipmunk")
              .options(cx0=CX0, cy0=CY0, nx=2, ny=2, side=4, n_acq=3)
              .load())
    # Python stream sources don't support availableNow — run
    # continuous micro-batches (1 chip each) and stop when drained
    q = (stream.writeStream.format("memory").queryName("chips_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    want = 4 * 8 * 3  # chips × ubids × acquisitions
    deadline = time.time() + 120
    while time.time() < deadline:
        if registered.table("chips_stream").count() >= want:
            break
        time.sleep(1)
    q.stop()
    got = registered.table("chips_stream")
    assert got.count() == want
    chips = {(r["cx"], r["cy"]) for r in
             got.select("cx", "cy").distinct().collect()}
    assert chips == {(CX0, CY0), (CX0 + GRID_M, CY0),
                     (CX0, CY0 - GRID_M), (CX0 + GRID_M, CY0 - GRID_M)}


def test_deterministic_across_reads(registered):
    opts = dict(cx0=CX0, cy0=CY0, nx=1, ny=1, side=4, n_acq=5)
    a = (registered.read.format("chipmunk").options(**opts).load()
         .orderBy("ubid", "acquired").collect())
    b = (registered.read.format("chipmunk").options(**opts).load()
         .orderBy("ubid", "acquired").collect())
    assert a == b
