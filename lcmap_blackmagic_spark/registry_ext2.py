"""Second extension wave: embedding near-dup, BPE-ish token counting,
CUBE, INTERSECT/EXCEPT, PIVOT, and RANGE-frame windows.

Same determinism contract as the rest of the registry: money/quantity
sums in DECIMAL with one final double cast, threshold filters on
unrounded values, every output column aliased identically in Spark
and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .llm.similarity import _plane_weights, lsh_neardup_pairs
from .registry import _t

# ---------------------------------------------- embedding near-dup --

NEARDUP_THRESHOLD = 0.42  # synthetic vectors have no true dups; this
                          # exercises the operator on a non-empty set

NEARDUP_TABLES = 8
NEARDUP_PLANES = 8


def q_embed_neardup(spark, sf_dir):
    """Registered form is the scale path: sign-LSH banded candidates
    + exact verify (no n² nested loop anywhere in the plan). The
    all-pairs exact form stays as a cross-check test
    (tests/test_similarity.py) rather than the registered query."""
    e = _t(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(e, threshold=NEARDUP_THRESHOLD,
                             n_tables=NEARDUP_TABLES,
                             n_planes=NEARDUP_PLANES)


_DOT = ("list_sum(list_transform(generate_series(1, 64), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def _sql_bucket(table: int, n_planes: int) -> str:
    """One LSH table's bucket key in DuckDB SQL, generated from the
    SAME ±1 weights as the Spark expression (left-to-right chain, so
    the double summation is bit-identical on both engines)."""
    bits = []
    for p in range(n_planes):
        ws = _plane_weights(table, p)
        chain = "".join(
            ("+" if w > 0 else "-") + f"v[{d + 1}]"
            for d, w in enumerate(ws)).lstrip("+")
        bits.append(f"CASE WHEN {chain} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def _sql_embed_neardup() -> str:
    keyed = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, v, {t} AS tbl, {_sql_bucket(t, NEARDUP_PLANES)} AS bucket FROM e"
        for t in range(NEARDUP_TABLES))
    cos = (f"{_DOT.format(a='x.v', b='y.v')} / "
           f"(sqrt({_DOT.format(a='x.v', b='x.v')}) * "
           f"sqrt({_DOT.format(a='y.v', b='y.v')}))")
    return f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
k AS (
  {keyed}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM k a JOIN k b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine
FROM cand c JOIN e x ON x.vec_id = c.id_a JOIN e y ON y.vec_id = c.id_b
WHERE {cos} >= {NEARDUP_THRESHOLD}
"""


SQL_EMBED_NEARDUP = _sql_embed_neardup()


# -------------------------------------------------- token counting --

# GPT-2-ish coarse pretokenizer: letter runs, single digits, single
# non-alphanumeric marks. Same semantics in Java regex and RE2.
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


def q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), " ")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_tokens"),
        F.length("text").cast("bigint").alias("chars"))


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS chars
FROM documents
"""


# --------------------------------------------------------- CUBE -----

def q_cube_agg(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 4 grouping sets in one
    pass — Spark plans this as a single expand + hash aggregate, so
    the fact table is scanned once however many sets there are."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"),
                 F.grouping_id().cast("bigint").alias("gid")))


SQL_CUBE_AGG = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ----------------------------------------------- GROUPING SETS -----

def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP sugar):
    three chosen sets in one Expand + single hash aggregate — one
    scan regardless of set count."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                 AS BIGINT) AS gid
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus), ())
    """)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
         AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


# --------------------------------------------- INTERSECT / EXCEPT ---

def q_intersect_except(spark, sf_dir):
    """Customers active in both 1995 and 1996 (INTERSECT) vs only
    1995 (EXCEPT), tagged and unioned. Spark plans both as hash
    left-semi/left-anti joins on the distinct key sets."""
    o = _t(spark, sf_dir, "orders")
    y95 = (o.filter(F.year("o_orderdate") == 1995)
           .select("o_custkey").distinct())
    y96 = (o.filter(F.year("o_orderdate") == 1996)
           .select("o_custkey").distinct())
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), "o_custkey")
    only95 = (y95.subtract(y96)
              .select(F.lit("only_1995").alias("tag"), "o_custkey"))
    return both.unionByName(only95)


SQL_INTERSECT_EXCEPT = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996)
SELECT 'both' AS tag, o_custkey
FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995' AS tag, o_custkey
FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
"""


# -------------------------------------------------------- PIVOT -----

def q_pivot_agg(spark, sf_dir):
    """Pivot linestatus into columns. The pivot values are declared
    explicitly so the plan is a single-pass conditional aggregation —
    no values-discovery pre-query, mandatory at scale."""
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (l.groupBy("l_returnflag")
            .pivot("l_linestatus", ["F", "O"])
            .agg(F.sum(qty))
            .select("l_returnflag",
                    F.col("F").cast("double").alias("qty_f"),
                    F.col("O").cast("double").alias("qty_o")))


SQL_PIVOT_AGG = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------ RANGE-frame window

def q_trailing_spend(spark, sf_dir):
    """Per-customer trailing-30-day spend: a RANGE frame over the
    order date (value-based, so duplicate dates are peers — identical
    frame semantics in any engine, no tie-break needed for the SUM)."""
    o = _t(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date"))
    w = (Window.partitionBy("o_custkey").orderBy(day)
         .rangeBetween(-30, 0))
    return o.select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("date").alias("o_day"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double").alias("trailing_30d"))


SQL_TRAILING_SPEND = """
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        AS DOUBLE) AS trailing_30d
FROM orders
"""


# ---------------------------------------------- ranking functions ---

def q_window_ranks(spark, sf_dir):
    """The full ranking-function family in one pass: rank, dense_rank,
    percent_rank, ntile, cume_dist — one window spec, so Spark plans a
    single sort+shuffle for all five."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return o.select(
        "o_orderkey", "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"))


SQL_WINDOW_RANKS = """
SELECT o_orderkey, o_custkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       ROUND(percent_rank() OVER w, 6) AS prnk,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey)
"""


# ----------------------------------------------- string functions ---

def q_string_funcs(spark, sf_dir):
    """String-function family over customer names: case, substring,
    padding, reverse, char ops, edit distance — all JVM-side."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.lpad("c_name", 22, "#").alias("padded"),
        F.reverse(F.col("c_name")).alias("rev"),
        F.length("c_name").cast("int").alias("len"),
        F.ascii("c_name").alias("first_code"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001"))
        .cast("int").alias("edit_dist"),
        F.translate("c_name", "0", "_").alias("translated"))


SQL_STRING_FUNCS = """
SELECT c_custkey,
       upper(c_name) AS up,
       substr(c_name, 1, 8) AS prefix,
       lpad(c_name, 22, '#') AS padded,
       reverse(c_name) AS rev,
       CAST(length(c_name) AS INT) AS len,
       ascii(c_name) AS first_code,
       CAST(levenshtein(c_name, 'Customer#000000001') AS INT) AS edit_dist,
       replace(c_name, '0', '_') AS translated
FROM customer
"""


# ------------------------------------------------- date functions ---

def q_date_funcs(spark, sf_dir):
    """Date-function family: truncation, month arithmetic (with
    end-of-month clamping), calendar parts, diffs."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("eom"),
        F.weekday(d).cast("int").alias("wd"),       # 0 = Monday
        F.quarter(d).cast("int").alias("qtr"),
        F.datediff(F.lit("2002-01-01").cast("date"), d)
        .cast("int").alias("days_to_2002"))


SQL_DATE_FUNCS = """
SELECT o_orderkey,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       last_day(CAST(o_orderdate AS DATE)) AS eom,
       CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INT) AS wd,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
            AS INT) AS days_to_2002
FROM orders
"""


# ------------------------------------------------ array functions ---

def q_array_funcs(spark, sf_dir):
    """Array-function family over the embedding column: indexing,
    slicing, extrema, sort, reverse — all JVM-side, exact element
    values (no float arithmetic).

    The slice/sort/reverse results are array-valued; the driver's
    pandas canonicalization cannot hash list cells (round-1 red), so
    the three arrays are concatenated and pos-exploded into scalar
    (pos, val) rows: pos 0-3 = mid4, 4-8 = sorted5, 9-11 = rev3.
    Values stay exact doubles — no engine-dependent float formatting.
    """
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mid4 = F.slice(v, 3, 4)
    sorted5 = F.sort_array(F.slice(v, 1, 5))
    rev3 = F.reverse(F.slice(v, 1, 3))
    return (e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at(v, 1).alias("first"),
        F.element_at(v, -1).alias("last"),
        F.array_max(v).alias("vmax"),
        F.array_min(v).alias("vmin"),
        F.concat(mid4, sorted5, rev3).alias("arr"))
        .select("vec_id", "dim", "first", "last", "vmax", "vmin",
                F.posexplode("arr").alias("pos", "val"))
        .withColumn("pos", F.col("pos").cast("int")))


SQL_ARRAY_FUNCS = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id,
             CAST(len(v) AS INT) AS dim,
             v[1] AS first,
             v[-1] AS last,
             list_max(v) AS vmax,
             list_min(v) AS vmin,
             list_concat(list_concat(v[3:6], list_sort(v[1:5])),
                         list_reverse(v[1:3])) AS arr
      FROM e)
SELECT vec_id, dim, first, last, vmax, vmin,
       CAST(u.i - 1 AS INT) AS pos, arr[u.i] AS val
FROM s, UNNEST(generate_series(1, len(arr))) AS u(i)
"""


# ------------------------------------------- correlated subquery ----

def q_scalar_subquery(spark, sf_dir):
    """Correlated scalar subqueries (orders above the customer's own
    average) — Catalyst decorrelates these into an aggregate + join;
    no per-row re-execution.

    The above-average predicate is phrased as
    ``price * COUNT(*) > SUM(price)`` — algebraically identical to
    ``price > AVG(price)`` but exact in DECIMAL on both engines
    (AVG would be DECIMAL(22,6) HALF_UP in Spark vs DOUBLE in
    DuckDB, so a price within rounding distance of the average
    could flip membership between engines).
    """
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM v_orders i
               WHERE i.o_custkey = o.o_custkey) >
              (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
               FROM v_orders i WHERE i.o_custkey = o.o_custkey)
    """).withColumn("price", F.col("price").cast("double"))


SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
      (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey) >
      (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
       FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


# ------------------------------------------------ lateral explode ---

def q_lateral_explode(spark, sf_dir):
    """Row-generating lateral explode with ordinality (the Generate
    operator): one row per token with its position. Pipelined — no
    shuffle, row multiplication happens inside the scan stage."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), " ")
    return (d.filter(F.col("doc_id") < 100)
            .select("doc_id", F.posexplode(toks).alias("pos", "tok"))
            .withColumn("pos", F.col("pos").cast("int")))


SQL_LATERAL_EXPLODE = """
WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
           FROM documents WHERE doc_id < 100)
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, d.toks[u.i] AS tok
FROM d, UNNEST(generate_series(1, len(d.toks))) AS u(i)
"""


# -------------------------------------------------- null handling ---

def q_null_funcs(spark, sf_dir):
    """Null-semantics family: nullif / coalesce / null-safe equality /
    null-aware aggregation, over synthesized nulls (the base tables
    have none)."""
    o = _t(spark, sf_dir, "orders")
    # P-status orders become NULL to exercise the null paths
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (o.select("o_orderkey", st.alias("st"),
                     F.coalesce(st, F.lit("UNKNOWN")).alias("st_filled"),
                     st.eqNullSafe(F.lit("F")).alias("is_f_safe"))
            .groupBy("st_filled")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count("st").alias("n_nonnull"),
                 F.sum(F.when(F.col("is_f_safe"), 1).otherwise(0))
                 .alias("n_f")))


SQL_NULL_FUNCS = """
WITH x AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
         coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS st_filled,
         nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS is_f_safe
  FROM orders)
SELECT st_filled, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(st) AS BIGINT) AS n_nonnull,
       CAST(SUM(CASE WHEN is_f_safe THEN 1 ELSE 0 END) AS BIGINT) AS n_f
FROM x GROUP BY st_filled
"""


# ------------------------------------------------ regex functions ---

# patterns restricted to the Java-regex ∩ RE2 common subset
_RE_NUM = "[0-9]+"
_RE_PUNCT = "[.,;:!?]"


def q_regex_funcs(spark, sf_dir):
    """Regex family: extract, replace, match, count — over document
    text (patterns valid identically in Java regex and RE2)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", _RE_NUM, 0).alias("first_num"),
        F.regexp_replace("text", _RE_PUNCT, "").alias("no_punct"),
        F.col("text").rlike("the [a-z]+ ").alias("has_the_phrase"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_NUM), F.lit(0)))
        .cast("int").alias("n_nums"))


SQL_REGEX_FUNCS = f"""
SELECT doc_id,
       coalesce(regexp_extract(text, '{_RE_NUM}'), '') AS first_num,
       regexp_replace(text, '{_RE_PUNCT}', '', 'g') AS no_punct,
       regexp_matches(text, 'the [a-z]+ ') AS has_the_phrase,
       CAST(len(regexp_extract_all(text, '{_RE_NUM}')) AS INT) AS n_nums
FROM documents
"""


QUERIES_EXT2: dict[str, dict] = {
    "llm_embed_neardup": {"fn": q_embed_neardup,    "sql": SQL_EMBED_NEARDUP},
    "llm_token_count":   {"fn": q_token_count,      "sql": SQL_TOKEN_COUNT},
    "cube_agg":          {"fn": q_cube_agg,         "sql": SQL_CUBE_AGG},
    "grouping_sets":     {"fn": q_grouping_sets,    "sql": SQL_GROUPING_SETS},
    "intersect_except":  {"fn": q_intersect_except, "sql": SQL_INTERSECT_EXCEPT},
    "pivot_agg":         {"fn": q_pivot_agg,        "sql": SQL_PIVOT_AGG},
    "trailing_spend":    {"fn": q_trailing_spend,   "sql": SQL_TRAILING_SPEND},
    "window_ranks":      {"fn": q_window_ranks,     "sql": SQL_WINDOW_RANKS},
    "string_funcs":      {"fn": q_string_funcs,     "sql": SQL_STRING_FUNCS},
    "date_funcs":        {"fn": q_date_funcs,       "sql": SQL_DATE_FUNCS},
    "array_funcs":       {"fn": q_array_funcs,      "sql": SQL_ARRAY_FUNCS},
    "scalar_subquery":   {"fn": q_scalar_subquery,  "sql": SQL_SCALAR_SUBQUERY},
    "lateral_explode":   {"fn": q_lateral_explode,  "sql": SQL_LATERAL_EXPLODE},
    "null_funcs":        {"fn": q_null_funcs,       "sql": SQL_NULL_FUNCS},
    "regex_funcs":       {"fn": q_regex_funcs,      "sql": SQL_REGEX_FUNCS},
}
