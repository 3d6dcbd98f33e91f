"""Cassandra sink layer: the DDL/key mapping is pure and fully
tested; the actual connector write is gated on the jar being present
(it is not in this environment) and must fail with a clear message."""

import pytest

from lcmap_blackmagic_spark import cassandra, schemas


def test_ddl_segment_key_scheme():
    cql = cassandra.ddl("segment", schemas.SEGMENTS)
    assert "PRIMARY KEY ((cx, cy), px, py, sday)" in cql
    assert "blcoef list<double>" in cql
    assert cql.startswith("CREATE TABLE IF NOT EXISTS lcmap.segment")


def test_ddl_tile_no_clustering():
    cql = cassandra.ddl("tile", schemas.TILE, keyspace="ks")
    assert "PRIMARY KEY ((tx, ty))" in cql
    assert "ks.tile" in cql


def test_ddl_every_entity_maps(spark):
    for entity, schema in [("chip", schemas.CHIP),
                           ("pixel", schemas.PIXELS),
                           ("segment", schemas.SEGMENTS),
                           ("prediction", schemas.PREDICTIONS),
                           ("tile", schemas.TILE)]:
        cql = cassandra.ddl(entity, schema)
        # every column of the schema appears with a CQL type
        for f in schema.fields:
            assert f" {f.name} " in f" {cql} "


def test_write_without_connector_raises(spark):
    df = spark.createDataFrame([(1, 2)], "cx long, cy long")
    if cassandra.connector_available(spark):
        pytest.skip("connector unexpectedly present")
    with pytest.raises(RuntimeError, match="spark-cassandra-connector"):
        cassandra.write(df, "chip")


# ---- protocol-level contract (no connector required) ---------------
#
# A minimal CQL "endpoint": parses the generated DDL the way a
# Cassandra schema validator would, and receives the prepared write's
# partition batches, asserting the token-aware grouping contract —
# the two halves of the sink protocol the connector jar would
# otherwise exercise.  Runs identically with or without the jar.

import re

_CQL_SCALARS = {"bigint", "int", "smallint", "tinyint", "double",
                "float", "text", "blob", "date", "timestamp",
                "boolean", "decimal"}


def _fake_cql_validate(cql: str) -> dict:
    """Parse CREATE TABLE CQL like a schema endpoint: returns the
    table name, column->type map and (partition, clustering) keys;
    raises on anything a real parser would reject."""
    m = re.match(
        r"CREATE TABLE IF NOT EXISTS (\w+)\.(\w+) \(\n(.*)\n\)$",
        cql, re.S)
    assert m, f"unparseable DDL:\n{cql}"
    keyspace, table, body = m.groups()
    lines = [ln.strip().rstrip(",") for ln in body.split("\n")]
    cols, key = {}, None
    for ln in lines:
        pk = re.match(r"PRIMARY KEY \(\((.*?)\)(?:, (.*))?\)$", ln)
        if pk:
            part = tuple(c.strip() for c in pk.group(1).split(","))
            clus = tuple(c.strip() for c in pk.group(2).split(",")) \
                if pk.group(2) else ()
            key = (part, clus)
            continue
        cm = re.match(r"(\w+) (\w+(?:<\w+>)?)$", ln)
        assert cm, f"bad column line: {ln!r}"
        name, ctype = cm.groups()
        base = re.match(r"list<(\w+)>$", ctype)
        assert (base.group(1) if base else ctype) in _CQL_SCALARS, \
            f"unknown CQL type {ctype!r}"
        cols[name] = ctype
    assert key is not None, "no PRIMARY KEY clause"
    for k in key[0] + key[1]:
        assert k in cols, f"key column {k} not declared"
    return {"keyspace": keyspace, "table": table, "cols": cols,
            "key": key}


def test_contract_ddl_accepted_by_fake_endpoint():
    """Every entity's generated DDL must parse cleanly and carry the
    reference's key scheme (ceph.py:17-49 partition grain)."""
    for entity, schema in [("chip", schemas.CHIP),
                           ("pixel", schemas.PIXELS),
                           ("segment", schemas.SEGMENTS),
                           ("prediction", schemas.PREDICTIONS),
                           ("tile", schemas.TILE)]:
        got = _fake_cql_validate(cassandra.ddl(entity, schema))
        assert got["table"] == entity
        want_pk, want_ck = cassandra.TABLE_KEYS[entity]
        assert got["key"] == (tuple(want_pk), tuple(want_ck))
        assert set(f.name for f in schema.fields) == set(got["cols"])


def test_contract_batches_grouped_by_partition_key(spark):
    """The prepared write must deliver each CQL partition's rows in
    exactly ONE Spark partition (the token-aware batching contract:
    one task → one replica set, no partition split across tasks)."""
    from pyspark.sql import functions as F

    rows = [(cx, cy, px, py, 100 + px)
            for cx in (0, 100, 200) for cy in (0, 100)
            for px in range(4) for py in range(2)]
    df = spark.createDataFrame(
        rows, "cx long, cy long, px long, py long, sday long")
    prepared = cassandra.prepare_write(df, "segment")
    plan = prepared._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(cx" in plan, plan
    # the fake endpoint's view: which Spark partitions does each CQL
    # partition key arrive in?
    spread = (prepared
              .withColumn("pid", F.spark_partition_id())
              .groupBy("cx", "cy")
              .agg(F.countDistinct("pid").alias("n_tasks"))
              .collect())
    assert spread and all(r["n_tasks"] == 1 for r in spread)
