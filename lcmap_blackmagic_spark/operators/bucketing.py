"""Bucketed (co-located) joins — the zero-shuffle path for repeated
fact⋈fact joins at 100 TB.

A broadcast join dies when neither side fits in memory; a shuffle join
moves both fact tables every query. Bucketing pays the shuffle ONCE at
write time: both tables hash-partitioned into the same number of
buckets on the join key, so every subsequent join is a local
per-bucket sort-merge with NO Exchange in the plan (verified by
``assert_no_shuffle`` in tests). This is how a 100 TB
lineitem⋈orders pipeline avoids re-shuffling 100 TB per run.

Spark bucketing requires catalog tables (the bucket metadata lives in
the metastore), hence ``saveAsTable`` with an explicit path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   n_buckets: int, path: str | None = None,
                   sort_by: Sequence[str] | None = None) -> None:
    """Persist ``df`` as a bucketed catalog table. ``sort_by``
    pre-sorts within buckets so the join needs no sort either."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, *keys))
    w = w.sortBy(*(sort_by or keys))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket
    specs Catalyst plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=list(on), how=how)


def shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan — 0 for
    a properly co-located join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(line.strip().startswith(("Exchange", "+- Exchange",
                                        ":- Exchange"))
               or "Exchange hashpartitioning" in line
               for line in plan.splitlines())
