"""Cassandra sink layer (BASELINE.json north-star: "Structured
Streaming ingestion + Cassandra sink").

Maps every storage entity to a CQL table whose PRIMARY KEY mirrors the
reference's partition scheme (``ceph.py:17-49``): the Cassandra
partition key is the chip/tile key — so a single-chip read is one
partition fetch, exactly like the reference's ``{x}-{y}.json`` object
get — and the clustering key orders rows within the chip for range
scans.

The spark-cassandra-connector jar is not present in this environment,
so ``write``/``read`` raise a clear error unless the connector is on
the session's classpath; ``ddl`` and the key mapping are pure and
tested. At scale the writer relies on the connector's token-aware
routing: a DataFrame repartitioned by the partition key columns sends
each Spark partition to the replica set that owns it, no coordinator
fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CONNECTOR_FORMAT = "org.apache.spark.sql.cassandra"

# entity → (partition key, clustering key) — chip-grain entities
# partition by chip, cluster by pixel/date so per-pixel time ranges
# are contiguous on disk.
TABLE_KEYS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "chip":       (("cx", "cy"), ()),
    "pixel":      (("cx", "cy"), ("px", "py")),
    "segment":    (("cx", "cy"), ("px", "py", "sday")),
    "prediction": (("cx", "cy"), ("px", "py", "sday", "pday")),
    "tile":       (("tx", "ty"), ()),
}

_CQL_TYPES = {
    T.LongType(): "bigint",
    T.IntegerType(): "int",
    T.ShortType(): "smallint",
    T.ByteType(): "tinyint",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.StringType(): "text",
    T.BinaryType(): "blob",
    T.DateType(): "date",
    T.TimestampType(): "timestamp",
    T.BooleanType(): "boolean",
}


def _cql_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return f"list<{_cql_type(dt.elementType)}>"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    try:
        return _CQL_TYPES[dt]
    except KeyError:
        raise TypeError(f"no CQL mapping for Spark type {dt}")


def ddl(entity: str, schema: T.StructType, keyspace: str = "lcmap") -> str:
    """CREATE TABLE CQL for an entity with the reference's key scheme."""
    pk, ck = TABLE_KEYS[entity]
    cols = ",\n  ".join(f"{f.name} {_cql_type(f.dataType)}"
                        for f in schema.fields)
    key = f"(({', '.join(pk)})" + (f", {', '.join(ck)})" if ck else ")")
    return (f"CREATE TABLE IF NOT EXISTS {keyspace}.{entity} (\n"
            f"  {cols},\n  PRIMARY KEY {key}\n)")


def connector_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.cassandra.DefaultSource")
        return True
    except Exception:
        return False


def prepare_write(df: DataFrame, entity: str) -> DataFrame:
    """The connector-independent half of the write protocol: the
    DataFrame repartitioned on the entity's Cassandra PARTITION KEY,
    so every CQL partition's rows arrive in exactly one Spark task
    and the connector's token-aware routing sends that task's batch
    to the replica set owning the token — no coordinator fan-out.
    Split out from ``write`` so the grouping contract is testable
    without the connector jar (tests/test_cassandra_sink.py drives a
    fake endpoint over these partitions)."""
    pk, _ = TABLE_KEYS[entity]
    return df.repartition(*pk)


def write(df: DataFrame, entity: str, keyspace: str = "lcmap") -> None:
    """Token-aware bulk write: repartition on the Cassandra partition
    key so each Spark task lands on one replica set."""
    spark = df.sparkSession
    if not connector_available(spark):
        raise RuntimeError(
            "spark-cassandra-connector not on classpath; add "
            "com.datastax.spark:spark-cassandra-connector and set "
            "spark.cassandra.connection.host")
    (prepare_write(df, entity)
       .write.format(CONNECTOR_FORMAT)
       .options(table=entity, keyspace=keyspace)
       .mode("append").save())


def read(spark: SparkSession, entity: str, keyspace: str = "lcmap",
         **key_values) -> DataFrame:
    """Partition-key-pruned read (the connector pushes equality
    predicates on partition/clustering keys down to CQL)."""
    if not connector_available(spark):
        raise RuntimeError("spark-cassandra-connector not on classpath")
    df = (spark.read.format(CONNECTOR_FORMAT)
          .options(table=entity, keyspace=keyspace).load())
    for k, v in key_values.items():
        df = df.filter(df[k] == v)
    return df
