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
