"""Streaming reads over the snapshot store: append deltas per
version, overwrite re-emission, checkpoint-restart resume, and the
start_version knob."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage
from lcmap_blackmagic_spark.sources.snapshotstream import (
    read_snapshot_stream)


def _rows(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("v"), (F.col("id") * 10).alias("w"))


def _drain(spark, table_dir, checkpoint, name, start_version=0):
    q = (read_snapshot_stream(spark, table_dir,
                              start_version=start_version)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)   # False = timeout, not an error
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}")
            .collect()}


def test_append_versions_stream_as_deltas(spark):
    t = tempfile.mkdtemp(prefix="snapstream_")
    storage.write_snapshot(_rows(spark, 0, 3), t)               # v1
    storage.write_snapshot(_rows(spark, 100, 2), t, mode="append")  # v2
    got = _drain(spark, t, tempfile.mkdtemp(), "snapstream_a")
    want = {(i, i * 10, 1) for i in range(3)} | \
           {(i, i * 10, 2) for i in (100, 101)}
    assert got == want  # each row exactly once, tagged by version


def test_checkpoint_restart_resumes_at_new_versions_only(spark):
    t = tempfile.mkdtemp(prefix="snapstream_")
    ckpt = tempfile.mkdtemp(prefix="snapstream_ck_")
    out = tempfile.mkdtemp(prefix="snapstream_out_")
    storage.write_snapshot(_rows(spark, 0, 2), t)               # v1

    def run():
        # file sink: the one sink that supports checkpoint RECOVERY
        # (memory sink rejects it), which is the property under test
        q = (read_snapshot_stream(spark, t)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)
        return {tuple(r) for r in spark.read.parquet(out).collect()}

    first = run()
    assert first == {(0, 0, 1), (1, 10, 1)}
    # two more commits while the stream is down — the restarted query
    # must emit exactly their deltas (offsets from the checkpoint)
    storage.write_snapshot(_rows(spark, 10, 2), t, mode="append")   # v2
    storage.write_snapshot(_rows(spark, 20, 1), t, mode="append")   # v3
    both = run()
    assert both - first == {(10, 100, 2), (11, 110, 2), (20, 200, 3)}
    assert len(both) == 5                       # no duplicates either


def test_overwrite_version_reemits_full_content(spark):
    t = tempfile.mkdtemp(prefix="snapstream_")
    storage.write_snapshot(_rows(spark, 0, 2), t)               # v1
    storage.write_snapshot(_rows(spark, 50, 2), t)              # v2 (overwrite)
    got = _drain(spark, t, tempfile.mkdtemp(), "snapstream_c")
    assert got == {(0, 0, 1), (1, 10, 1), (50, 500, 2), (51, 510, 2)}


def test_start_version_skips_history(spark):
    t = tempfile.mkdtemp(prefix="snapstream_")
    storage.write_snapshot(_rows(spark, 0, 2), t)               # v1
    storage.write_snapshot(_rows(spark, 5, 2), t, mode="append")    # v2
    got = _drain(spark, t, tempfile.mkdtemp(), "snapstream_d",
                 start_version=1)
    assert got == {(5, 50, 2), (6, 60, 2)}


def test_schema_includes_evolved_columns_and_version(spark):
    t = tempfile.mkdtemp(prefix="snapstream_")
    storage.write_snapshot(_rows(spark, 0, 2).drop("w"), t)     # v1: v only
    storage.write_snapshot(_rows(spark, 9, 1), t, mode="append")    # v2: +w
    df = read_snapshot_stream(spark, t)
    assert df.columns == ["v", "w", "_snapshot_version"]
    got = _drain(spark, t, tempfile.mkdtemp(), "snapstream_e")
    # v1 rows surface NULL for the evolved column
    assert got == {(0, None, 1), (1, None, 1), (9, 90, 2)}


def test_snapshot_to_snapshot_pipeline_composes(spark):
    """Medallion composition: a BRONZE snapshot table is tailed by
    the streaming reader and each micro-batch's rollup is committed
    to a SILVER snapshot table through write_snapshot_tagged — the
    store's reader and writer halves composing into an incremental
    pipeline.  The silver latest must equal the one-shot batch
    rollup of bronze, and replaying the whole stream from a fresh
    checkpoint must publish ZERO new silver versions (tag-level
    exactly-once end to end)."""
    bronze = tempfile.mkdtemp(prefix="snap_bronze_")
    silver = tempfile.mkdtemp(prefix="snap_silver_")
    storage.write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, g string, x int"),
        bronze)                                                 # v1
    storage.write_snapshot(
        spark.createDataFrame(
            [(3, "a", 5), (4, "a", 7)], "k int, g string, x int"),
        bronze, mode="append")                                  # v2

    def run(ckpt):
        def fb(batch_df, batch_id):
            part = (batch_df.groupBy("g")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum("x").alias("sx")))
            storage.write_snapshot_tagged(part, silver,
                                          f"batch-{batch_id}",
                                          collect_stats=False)
        q = (read_snapshot_stream(spark, bronze)
             .writeStream.foreachBatch(fb)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    run(tempfile.mkdtemp())
    v_after = storage.latest_version(silver)
    rolled = (storage.read_snapshot(spark, silver)
              .groupBy("g").agg(F.sum("n").alias("n"),
                                F.sum("sx").alias("sx")))
    assert sorted(map(tuple, rolled.collect())) == \
        [("a", 3, 22), ("b", 1, 20)]
    # full replay from a FRESH checkpoint: same batch ids, same tags,
    # zero new versions
    run(tempfile.mkdtemp())
    assert storage.latest_version(silver) == v_after


def test_vacuumed_diff_base_raises_instead_of_duplicating(spark):
    """Vacuuming the stream's diff-base manifest must FAIL the read,
    never silently re-emit carried-forward dirs (the duplicate-
    delivery bug a review reproduced live): computing version v's
    delta requires manifest v-1."""
    t = tempfile.mkdtemp(prefix="snapstream_")
    ckpt = tempfile.mkdtemp(prefix="snapstream_ck_")
    out = tempfile.mkdtemp(prefix="snapstream_out_")
    storage.write_snapshot(_rows(spark, 0, 2), t)               # v1

    def run():
        q = (read_snapshot_stream(spark, t)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError
        return {tuple(r) for r in spark.read.parquet(out).collect()}

    assert run() == {(0, 0, 1), (1, 10, 1)}
    storage.write_snapshot(_rows(spark, 10, 1), t, mode="append")   # v2
    storage.write_snapshot(_rows(spark, 20, 1), t, mode="append")   # v3
    # vacuum keeps v2/v3 but removes v1 — v2's diff base is gone
    # (its DATA survives via carry-forward, which is exactly why the
    # nearest-survivor diff would re-emit it)
    storage.vacuum_snapshots(t, keep=2, min_age_s=0.0)
    with pytest.raises(Exception):
        run()

    # a FRESH stream on the vacuumed table must still bootstrap:
    # v2's full carried-forward content once (tagged v2), then v3's
    # delta — every row exactly once
    out2 = tempfile.mkdtemp(prefix="snapstream_out2_")
    q2 = (read_snapshot_stream(spark, t)
          .writeStream.format("parquet").option("path", out2)
          .option("checkpointLocation", tempfile.mkdtemp())
          .trigger(availableNow=True).start())
    assert q2.awaitTermination(300)
    got2 = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert got2 == {(0, 0, 2), (1, 10, 2), (10, 100, 2),
                    (20, 200, 3)}


def test_timestamp_columns_keep_instant_semantics(spark):
    """TimestampType (instant) columns — Spark's default INT96
    parquet encoding AND the TIMESTAMP_MICROS writer — must stream
    back as TimestampType with identical instants, so the streamed
    frame unions cleanly with the batch read_snapshot; NTZ columns
    must stay NTZ.  (First cut mapped INT96 to NTZ — caught by a
    live review reproduction.)"""
    from pyspark.sql import types as T

    for writer_type in ("INT96", "TIMESTAMP_MICROS"):
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       writer_type)
        try:
            t = tempfile.mkdtemp(prefix="snapstream_ts_")
            src = spark.range(2).select(
                F.col("id").alias("v"),
                F.timestamp_micros(F.lit(1_700_000_000_000_000)
                                   + F.col("id")).alias("ts"),
                F.expr("make_timestamp_ntz(2024, 1, 2, 3, 4, 5)")
                .alias("tsn"))
            storage.write_snapshot(src, t)
            sdf = read_snapshot_stream(spark, t)
            types = dict((f.name, f.dataType) for f in sdf.schema.fields)
            assert isinstance(types["ts"], T.TimestampType), writer_type
            assert isinstance(types["tsn"], T.TimestampNTZType), \
                writer_type
            got = _drain(spark, t, tempfile.mkdtemp(),
                         f"snapstream_ts_{writer_type.lower()}")
            want = {tuple(r) + (1,)
                    for r in storage.read_snapshot(spark, t).collect()}
            assert got == want, writer_type
            # and the union the type fidelity exists for:
            (sdf.drop("_snapshot_version")
             .unionByName(storage.read_snapshot(spark, t)))
        finally:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
