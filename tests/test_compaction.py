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
