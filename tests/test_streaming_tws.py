"""transformWithStateInPandas (Spark 4's arbitrary-state API) twin:
ewma_stream_tws must emit EXACTLY the rows of the existing
applyInPandasWithState ewma_stream over the same event files — the
two stateful surfaces are interchangeable.  transformWithState
requires the RocksDB state store provider (Spark 4 constraint), so
the test pins it for both queries."""

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark.streaming.jobs import (configure_state_store,
                                                   events_stream,
                                                   ewma_stream,
                                                   ewma_stream_tws,
                                                   have_transform_with_state)

pytestmark = pytest.mark.skipif(
    not have_transform_with_state(),
    reason="transformWithStateInPandas needs python protobuf (its "
           "state-API client); absent in this environment — the "
           "xgboost/pyccd class of gate")


@pytest.fixture()
def events_dir(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="events_tws_")
    from lcmap_blackmagic_spark.registry import _t
    df = _t(spark, sf_dir, "events").cache()
    qs = (df.selectExpr("cast(ts as double) t")
          .approxQuantile("t", [0.25, 0.5, 0.75], 0.0))
    bounds = [float("-inf")] + qs + [float("inf")]
    for i in range(4):
        part = df.filter((F.col("ts").cast("double") > bounds[i])
                         & (F.col("ts").cast("double") <= bounds[i + 1]))
        part.coalesce(1).write.mode("append").parquet(out)
    return out


def _run(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return name


def test_tws_ewma_equals_applyinpandaswithstate(spark, events_dir):
    configure_state_store(spark, "rocksdb")
    try:
        old = ewma_stream(
            events_stream(spark, events_dir, max_files_per_trigger=1))
        new = ewma_stream_tws(
            events_stream(spark, events_dir, max_files_per_trigger=1))
        _run(old, "ewma_old_api")
        _run(new, "ewma_new_api")
        a = sorted(tuple(r) for r in
                   spark.table("ewma_old_api").collect())
        b = sorted(tuple(r) for r in
                   spark.table("ewma_new_api").collect())
        assert a, "streams emitted nothing"
        assert a == b
    finally:
        configure_state_store(spark, "hdfs")
