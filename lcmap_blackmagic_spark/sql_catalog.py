"""SQL query surface: temp-view catalog + plain-SQL registry queries.

The engine's primary API is the DataFrame registry, but a Spark
engine is also a SQL engine — `register_views` publishes every
fixture table as a temp view (through the same `_t` loaders, so the
events timestamp handling stays consistent), and the queries below
run as `spark.sql(...)` TEXT. They hit the same Catalyst planner as
the DataFrame forms (views are lazy plans, filters/pruning push into
the parquet scans identically), and the driver checks them against
DuckDB oracles like every other registry entry — proving a user can
point BI-style SQL at this engine without touching Python.

The SQL here sticks to the ANSI subset both engines parse, so each
query's oracle is intentionally near-identical text — the check is
then purely about ENGINE semantics (types, aggregation, windows),
not dialect translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import _t

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Publish every fixture table as a session temp view (idempotent;
    re-registering swaps the underlying sf_dir)."""
    for t in TABLES:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


SQL_TEXT_REVENUE = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.00 AS DECIMAL(18,2))
                   - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_sql_text_revenue(spark, sf_dir) -> DataFrame:
    """Revenue-by-nation as PLAIN SQL TEXT over the registered views —
    the same join/agg the DataFrame form (`revenue_by_nation`) plans,
    arriving through the SQL parser instead. Money stays in
    DECIMAL(18,2) until one final double cast (the repo float
    policy)."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_TEXT_REVENUE)


SQL_TEXT_TOPN = """
SELECT *
FROM (SELECT o_custkey,
             o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_totalprice
                                              AS DECIMAL(18,2)) DESC,
                                         o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
"""


def q_sql_text_topn(spark, sf_dir) -> DataFrame:
    """Top-2 orders per customer as SQL text: the windowed top-n
    shape through the SQL parser, DECIMAL ordering with a unique
    tie-break (the determinism rule for every window)."""
    register_views(spark, sf_dir)
    df = spark.sql(SQL_TEXT_TOPN)
    return df.selectExpr("o_custkey", "o_orderkey",
                         "CAST(price AS DOUBLE) AS price", "rn")


QUERIES_SQL: dict[str, dict] = {
    # oracles: the same text (shared ANSI subset)
    "sql_text_revenue": {
        "fn": q_sql_text_revenue,
        "sql": SQL_TEXT_REVENUE},
    "sql_text_topn": {
        "fn": q_sql_text_topn,
        "sql": f"""
SELECT o_custkey, o_orderkey, CAST(price AS DOUBLE) AS price, rn
FROM ({SQL_TEXT_TOPN.strip()})
"""},
}
