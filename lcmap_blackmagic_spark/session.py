"""SparkSession factory tuned for the engine.

Local test shape: one JVM, ``local[$SPARK_GRAFT_CPUS]``. Cluster shape:
same conf minus master/driver-memory, which come from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import ENGINE_CONF


def get_session(app_name: str = "lcmap-blackmagic-spark",
                shuffle_partitions: int | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver-provided synthetic tables as DataFrames."""
    names = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
            for n in names}
