"""Compaction must collapse a streaming-accreted pile of small files
into one file per partition without changing the data."""

from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage


def test_compact_collapses_files_and_preserves_rows(spark, tmp_path):
    root = str(tmp_path)
    base = storage.path(root, "segment")
    # simulate 5 micro-batch appends: each adds a file per partition
    for batch in range(5):
        df = spark.createDataFrame(
            [(cx, cy, batch * 100 + i, float(i))
             for cx in (0, 3000) for cy in (0, 3000) for i in range(10)],
            "cx long, cy long, seq long, v double")
        (df.write.mode("append")
           .partitionBy("cx", "cy").parquet(base))

    before_rows = sorted(
        tuple(r) for r in storage.read(spark, root, "segment").collect())
    before, after = storage.compact_partitions(spark, root, "segment")

    assert before >= 4 * 5          # ≥1 file per partition per batch
    assert after == 4               # one file per (cx, cy) partition
    after_rows = sorted(
        tuple(r) for r in storage.read(spark, root, "segment").collect())
    assert after_rows == before_rows

    # partition pruning still works on the compacted layout
    pruned = storage.read_partition(spark, root, "segment", cx=0, cy=3000)
    assert pruned.count() == 50


def test_zorder_compaction_prunes_on_both_columns(spark):
    """OPTIMIZE ZORDER: after compact_snapshot_zorder the MANIFEST
    pruner skips most commit dirs for a point predicate on EITHER
    key column, and the content is the identical multiset (deletes
    materialized away)."""
    import tempfile

    from pyspark.sql import functions as F

    from lcmap_blackmagic_spark import storage

    t = tempfile.mkdtemp(prefix="zcomp_")
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
        F.col("id").alias("v"))
    storage.write_snapshot(df, t)
    storage.delete_from_snapshot(
        spark, t, spark.range(5).select(F.col("id").alias("v")), "v")
    want = sorted((r["x"], r["y"], r["v"]) for r in
                  storage.read_snapshot(spark, t).collect())
    v = storage.compact_snapshot_zorder(spark, t, "x", "y", n_dirs=8)
    assert v == storage.latest_version(t)
    import json
    import os
    with open(os.path.join(t, storage.SNAP_MANIFESTS,
                           f"v{v}.json")) as fh:
        man = json.load(fh)
    assert len(man["dirs"]) == 8 and "deletes" not in man
    got = sorted((r["x"], r["y"], r["v"]) for r in
                 storage.read_snapshot(spark, t).collect())
    assert got == want and len(got) == n - 5
    # manifest pruning is now selective on BOTH columns
    for col, val in (("x", 3), ("y", 60)):
        pruned = storage.read_snapshot(spark, t, where=(col, "=", val))
        scanned = {f.split("/data/")[-1].split("/")[0]
                   for f in pruned.inputFiles()}
        assert 0 < len(scanned) < 8, (col, scanned)
        want_rows = sorted(r for r in got if r[0 if col == "x" else 1]
                           == val)
        assert sorted((r["x"], r["y"], r["v"])
                      for r in pruned.collect()) == want_rows
    # prior versions still time-travel
    assert len(storage.read_snapshot(spark, t, version=1).collect()) == n


def test_where_list_prunes_on_both_columns_at_once(spark):
    """AND-combined predicate list: a two-column point read on a
    z-ordered table intersects both columns' dir sets and applies
    both residual filters."""
    import tempfile

    from pyspark.sql import functions as F

    from lcmap_blackmagic_spark import storage

    t = tempfile.mkdtemp(prefix="zcomp_")
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
        F.col("id").alias("v"))
    storage.write_snapshot(df, t)
    storage.compact_snapshot_zorder(spark, t, "x", "y", n_dirs=8)
    got = storage.read_snapshot(
        spark, t, where=[("x", "=", 3), ("y", "=", 60)])
    rows = [(r["x"], r["y"], r["v"]) for r in got.collect()]
    assert rows == [(3, 60, 60 * 64 + 3)]
    both = {f.split("/data/")[-1].split("/")[0] for f in got.inputFiles()}
    one = {f.split("/data/")[-1].split("/")[0] for f in
           storage.read_snapshot(spark, t,
                                 where=("x", "=", 3)).inputFiles()}
    assert both <= one and len(both) < 8
