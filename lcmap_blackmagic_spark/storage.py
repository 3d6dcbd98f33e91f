"""Partition-level storage — the Spark equivalent of
``blackmagic/data/ceph.py``.

The reference stores one gzip-JSON object per chip under
``bucket/{entity}/{x}-{y}.json`` (ceph.py:17-49, 338-351) and gets
idempotency by delete-then-write (ceph.py:250-263). Here every entity
is a Parquet dataset partitioned by its spatial key; idempotent rewrite
is dynamic partition overwrite (one atomic job, no separate delete).

Scale notes: partition pruning on (cx, cy) / (tx, ty) makes the
single-chip reads of the reference (select_segments ceph.py:125-129)
metadata-only lookups; a whole-tile read is 2500 pruned partitions
scanned in parallel. Writers sort within partitions so parquet
row-group stats enable pixel-range skipping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# entity → partition columns (mirrors the URL scheme ceph.py:17-49)
PARTITION_KEYS = {
    "chip": ("cx", "cy"),
    "pixel": ("cx", "cy"),
    "segment": ("cx", "cy"),
    "prediction": ("cx", "cy"),
    "tile": ("tx", "ty"),
}


def path(root: str, entity: str) -> str:
    return os.path.join(root, entity)


def read(spark: SparkSession, root: str, entity: str) -> DataFrame:
    return spark.read.parquet(path(root, entity))


def read_partition(spark: SparkSession, root: str, entity: str,
                   **key_values) -> DataFrame:
    """Partition-pruned scan — parity with select_* (ceph.py:107-135).
    e.g. ``read_partition(spark, root, 'segment', cx=-2061585, cy=1922805)``.
    """
    df = read(spark, root, entity)
    for k, v in key_values.items():
        df = df.filter(F.col(k) == v)
    return df


def overwrite_partitions(df: DataFrame, root: str, entity: str) -> None:
    """Idempotent per-partition rewrite — replaces the reference's
    delete-then-put pairs (ceph.py:250-263 + insert_*). With
    ``partitionOverwriteMode=dynamic`` only partitions present in ``df``
    are replaced, concurrently-safe at the job level.

    The mode is set on the writer itself, not inherited from session
    conf: on a session without the dynamic default, a plain
    ``mode('overwrite') + partitionBy`` would statically truncate the
    ENTIRE entity dataset."""
    keys = list(PARTITION_KEYS[entity])
    (df.repartition(*[F.col(k) for k in keys])
       .sortWithinPartitions(*keys)
       .write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*keys)
       .parquet(path(root, entity)))


def delete_partitions(spark: SparkSession, root: str, entity: str,
                      **key_values) -> None:
    """Explicit partition delete for parity with ceph.py:250-263 —
    normally unnecessary (overwrite_partitions covers the idempotent
    rewrite); provided for retention-style maintenance."""
    import shutil
    keys = PARTITION_KEYS[entity]
    base = path(root, entity)
    sub = os.path.join(base, *[f"{k}={key_values[k]}" for k in keys
                               if k in key_values])
    if os.path.exists(sub):
        shutil.rmtree(sub)


def write_json_gzip(df: DataFrame, out_dir: str) -> None:
    """Byte-parity sink: gzip JSON, the reference's at-rest format
    (ceph.py:265-333). Kept for interop only — Parquet is the engine
    format."""
    df.write.mode("overwrite").option("compression", "gzip").json(out_dir)
