"""Seeded differential fuzzing: random predicates from a shared ANSI
grammar run through BOTH engines (Spark SQL and DuckDB) over the same
parquet, and the integer aggregates must agree exactly. The reference
has no fuzzing at all (SURVEY §5: "no sqllogictest/TPC corpus, no
fuzzing"); this closes that gap for the filter/boolean/comparison
surface, where hand-written oracle queries only cover the shapes
someone thought of.

Integer-only aggregates (COUNT, SUM of ints, MIN/MAX of a key) keep
the comparison exact — float SUM order may differ across engines and
is deliberately out of scope here (the hand-written oracles pin float
behavior through the DECIMAL policy instead)."""

import random

import duckdb
import pytest

# grammar: (column, kind) — comparisons draw literals sized to the
# column's actual value range at any SF
NUM_COLS = [
    ("l_orderkey", 1, 6_000_000),
    ("l_partkey", 1, 200_000),
    ("l_suppkey", 1, 10_000),
    ("l_linenumber", 1, 7),
    ("l_quantity", 1, 50),
]
STR_COLS = [
    ("l_returnflag", ["A", "N", "R"]),
    ("l_linestatus", ["F", "O"]),
]
CMP = ["<", "<=", ">", ">=", "=", "<>"]

N_CASES = 30
SEED = 20260813


def _rand_pred(rng: random.Random, depth: int = 0) -> str:
    roll = rng.random()
    if depth < 2 and roll < 0.45:
        op = rng.choice(["AND", "OR"])
        a = _rand_pred(rng, depth + 1)
        b = _rand_pred(rng, depth + 1)
        neg = "NOT " if rng.random() < 0.2 else ""
        return f"{neg}(({a}) {op} ({b}))"
    if roll < 0.75:
        col, lo, hi = rng.choice(NUM_COLS)
        if rng.random() < 0.25:
            a = rng.randint(lo, hi)
            b = rng.randint(lo, hi)
            return f"{col} BETWEEN {min(a, b)} AND {max(a, b)}"
        return f"{col} {rng.choice(CMP)} {rng.randint(lo, hi)}"
    if roll < 0.9:
        col, vals = rng.choice(STR_COLS)
        if rng.random() < 0.5:
            picks = ", ".join(f"'{v}'" for v in
                              rng.sample(vals, rng.randint(1, len(vals))))
            return f"{col} IN ({picks})"
        return f"{col} {rng.choice(['=', '<>'])} '{rng.choice(vals)}'"
    # date comparison — TIMESTAMP literal parses identically in both
    y = rng.randint(1992, 1998)
    m = rng.randint(1, 12)
    return (f"l_shipdate {rng.choice(['<', '>='])} "
            f"TIMESTAMP '{y}-{m:02d}-15 00:00:00'")


def _cases():
    rng = random.Random(SEED)
    return [(i, _rand_pred(rng)) for i in range(N_CASES)]


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .createOrReplaceTempView("fuzz_lineitem")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW fuzz_lineitem AS "
                f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')")
    return spark, con


@pytest.mark.parametrize("i,pred", _cases())
def test_predicate_agrees_across_engines(engines, i, pred):
    spark, con = engines
    sql = (f"SELECT COUNT(*) AS n, "
           f"COALESCE(SUM(l_linenumber), 0) AS s1, "
           f"COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS s2, "
           f"COALESCE(MIN(l_orderkey), -1) AS mn, "
           f"COALESCE(MAX(l_orderkey), -1) AS mx "
           f"FROM fuzz_lineitem WHERE {pred}")
    got = tuple(spark.sql(sql).first())
    want = con.execute(sql).fetchone()
    assert got == tuple(want), f"case {i}: {pred}"


@pytest.mark.parametrize("i,pred", _cases())
def test_grouped_aggregate_agrees_across_engines(engines, i, pred):
    """Same predicates, grouped shape: filter → GROUP BY two
    low-cardinality keys → integer aggregates, compared row-by-row."""
    spark, con = engines
    sql = (f"SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
           f"SUM(l_linenumber) AS s1, "
           f"COUNT(DISTINCT l_suppkey) AS d1 "
           f"FROM fuzz_lineitem WHERE {pred} "
           f"GROUP BY l_returnflag, l_linestatus")
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"case {i}: {pred}"


# ---- MERGE (CDC upsert) differential fuzz -------------------------

MERGE_CASES = 10


def _merge_case(rng: random.Random):
    """A random U/D/I change set spec: modulus/remainder selectors
    drawn so update/delete/insert sets overlap sometimes (D wins on
    overlap by construction in both engines)."""
    mu, md, mi = (rng.randint(3, 19) for _ in range(3))
    ru, rd, ri = rng.randrange(mu), rng.randrange(md), rng.randrange(mi)
    bump = rng.randint(1, 9)
    return mu, ru, md, rd, mi, ri, bump


@pytest.mark.parametrize("j", range(MERGE_CASES))
def test_merge_agrees_with_sql_fixpoint(engines, j):
    """merge_into (operators/merge.py) vs a plain-SQL FULL OUTER
    twin in DuckDB over a randomized change set: same survivors,
    same updated values, same inserts."""
    import pyspark.sql.functions as F

    from lcmap_blackmagic_spark.operators.merge import merge_into

    spark, con = engines
    rng = random.Random(SEED + 31 * j)
    mu, ru, md, rd, mi, ri, bump = _merge_case(rng)
    target = (spark.table("fuzz_lineitem")
              .filter(F.col("l_linenumber") == 1)
              .select(F.col("l_orderkey").alias("k"),
                      F.col("l_suppkey").alias("v")))
    k = F.col("k")
    upd = (target.filter((k % mu == ru) & (k % md != rd))
           .select("k", (F.col("v") + bump).alias("v"),
                   F.lit("U").alias("op")))
    dele = (target.filter(k % md == rd)
            .select("k", "v", F.lit("D").alias("op")))
    ins = (target.filter(k % mi == ri)
           .select((k + 100_000_000).alias("k"),
                   F.lit(-7).cast("long").alias("v"),
                   F.lit("I").alias("op")))
    merged = merge_into(target, upd.unionByName(dele).unionByName(ins),
                        "k")
    got = sorted(tuple(r) for r in merged.collect())
    sql = f"""
WITH base AS (SELECT l_orderkey AS k, l_suppkey AS v
              FROM fuzz_lineitem WHERE l_linenumber = 1),
chg AS (
  SELECT k, v + {bump} AS v, 'U' AS op FROM base
  WHERE k % {mu} = {ru} AND k % {md} <> {rd}
  UNION ALL
  SELECT k, v, 'D' FROM base WHERE k % {md} = {rd}
  UNION ALL
  SELECT k + 100000000, CAST(-7 AS BIGINT), 'I' FROM base
  WHERE k % {mi} = {ri})
SELECT COALESCE(c.k, b.k) AS k, COALESCE(c.v, b.v) AS v
FROM base b FULL OUTER JOIN chg c ON b.k = c.k
WHERE c.op IS NULL OR c.op <> 'D'
"""
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"merge case {j}: {(mu, ru, md, rd, mi, ri)}"


# ---- window-function differential fuzz ----------------------------

WINDOW_CASES = 40

# a nullable integer both engines derive identically — the
# IGNORE NULLS cases need real null gaps to skip over
_NULLABLE = "(CASE WHEN l_partkey % 3 = 0 THEN NULL ELSE l_suppkey END)"


def _window_case(rng: random.Random) -> tuple[str, str]:
    """One random window expression, rendered PER ENGINE: the ANSI
    dialects disagree on where IGNORE NULLS sits (Spark:
    ``f(args) IGNORE NULLS OVER``; DuckDB: ``f(args IGNORE NULLS)
    OVER``), so each case is a (spark_sql, duck_sql) pair — identical
    strings except for that clause."""
    part = rng.choice(["l_returnflag", "l_linestatus",
                       "l_returnflag, l_linestatus", "l_suppkey % 10"])
    # total order with full tie-break: the synthetic fixture has
    # duplicate (orderkey, linenumber) pairs (not true TPC-H PK), so
    # the order extends over every column the window functions read —
    # remaining ties are complete duplicates, interchangeable for all
    # outputs
    order = ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
             "l_quantity")
    k1, k2 = rng.randint(0, 5), rng.randint(0, 5)
    frame = rng.choice([
        f"ROWS BETWEEN {k1} PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN CURRENT ROW AND {k2} FOLLOWING",
        f"ROWS BETWEEN {k1} PRECEDING AND {k2} FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ])
    over = f"PARTITION BY {part} ORDER BY {order}"
    roll = rng.random()
    if roll < 0.18:
        # RANGE frame over a single integer order key: peers (tied
        # orderkeys) enter the frame together in both engines, and
        # the integer SUM over the peer set is order-free
        r1, r2 = rng.randint(0, 40), rng.randint(0, 40)
        rframe = rng.choice([
            f"RANGE BETWEEN {r1} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {r2} FOLLOWING",
            f"RANGE BETWEEN {r1} PRECEDING AND {r2} FOLLOWING",
        ])
        agg = rng.choice(["SUM(CAST(l_quantity AS BIGINT))", "COUNT(*)",
                          "MIN(l_partkey)", "MAX(l_partkey)"])
        e = (f"{agg} OVER (PARTITION BY {part} "
             f"ORDER BY l_orderkey {rframe})")
        return e, e
    if roll < 0.40:
        # IGNORE NULLS offset/positional functions over null gaps
        fn, args = rng.choice([
            ("LAG", f"{_NULLABLE}, {rng.randint(1, 3)}"),
            ("LEAD", f"{_NULLABLE}, {rng.randint(1, 3)}"),
            ("FIRST_VALUE", _NULLABLE),
            ("LAST_VALUE", _NULLABLE),
            ("NTH_VALUE", f"{_NULLABLE}, {rng.randint(1, 3)}"),
        ])
        suffix = "" if fn in ("LAG", "LEAD") else f" {frame}"
        spark_e = f"{fn}({args}) IGNORE NULLS OVER ({over}{suffix})"
        duck_e = f"{fn}({args} IGNORE NULLS) OVER ({over}{suffix})"
        return spark_e, duck_e
    if roll < 0.55:
        # positional functions with explicit frames, nulls respected
        fn, args = rng.choice([
            ("FIRST_VALUE", "l_partkey"),
            ("LAST_VALUE", "l_partkey"),
            ("NTH_VALUE", f"l_suppkey, {rng.randint(1, 4)}"),
        ])
        e = f"{fn}({args}) OVER ({over} {frame})"
        return e, e
    if roll < 0.72:
        e = rng.choice([
            f"SUM(CAST(l_quantity AS BIGINT)) OVER ({over} {frame})",
            f"COUNT(*) OVER ({over} {frame})",
            f"MIN(l_partkey) OVER ({over} {frame})",
            f"MAX(l_partkey) OVER ({over} {frame})",
        ])
        return e, e
    if roll < 0.85:
        e = rng.choice([
            f"LAG(l_suppkey, {rng.randint(1, 3)}, -1) OVER ({over})",
            f"LEAD(l_suppkey, {rng.randint(1, 3)}, -1) OVER ({over})",
            f"ROW_NUMBER() OVER ({over})",
            f"NTILE({rng.randint(2, 7)}) OVER ({over})",
        ])
        return e, e
    # rank family under HEAVY ties (l_quantity has ~50 distinct
    # values): peer rows share a rank in both engines, so the
    # per-row output is deterministic even without a total order
    tie_order = rng.choice(["l_partkey", "l_quantity",
                            "l_quantity, l_partkey"])
    e = (f"{rng.choice(['RANK', 'DENSE_RANK'])}() "
         f"OVER (PARTITION BY {part} ORDER BY {tie_order})")
    return e, e


def _window_cases():
    rng = random.Random(SEED + 777)
    return [(i, *_window_case(rng)) for i in range(WINDOW_CASES)]


@pytest.mark.parametrize("i,spark_expr,duck_expr", _window_cases())
def test_window_function_agrees_across_engines(engines, i, spark_expr,
                                               duck_expr):
    """Random window specs (ROWS and RANGE frames, offsets,
    IGNORE NULLS, positional and ranking functions, tie-heavy rank
    orders) — integer outputs compared row-by-row. The hand-written
    oracle queries cover the shapes someone thought of; this sweeps
    the frame/function grid."""
    spark, con = engines
    body = (" FROM fuzz_lineitem WHERE l_orderkey % 7 = 0")
    # None-safe sort: NTH_VALUE / IGNORE NULLS legitimately emit NULL
    # when the frame runs dry
    key = (lambda t: tuple((v is None, v if v is not None else 0)
                           for v in t))
    got = sorted((tuple(r) for r in spark.sql(
        f"SELECT l_orderkey, l_linenumber, {spark_expr} AS w{body}"
    ).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(
        f"SELECT l_orderkey, l_linenumber, {duck_expr} AS w{body}"
    ).fetchall()), key=key)
    assert got == want, f"window case {i}: {spark_expr}"


NTILE_TIE_CASES = 12


def _ntile_tie_cases():
    rng = random.Random(SEED + 1717)
    out = []
    for i in range(NTILE_TIE_CASES):
        part = rng.choice(["l_returnflag", "l_linestatus",
                           "l_suppkey % 5"])
        order = rng.choice(["l_quantity", "l_linenumber",
                            "l_partkey % 17"])
        out.append((i, part, order, rng.randint(2, 9),
                    rng.choice([2, 3, 5, 7, 11])))
    return out


@pytest.mark.parametrize("i,part,order,nb,mod", _ntile_tie_cases())
def test_ntile_ties_bucket_histogram_agrees(engines, i, part, order,
                                            nb, mod):
    """ntile over a NON-unique order splits tied rows across buckets
    in an engine-chosen (row-order-dependent) way — the per-row
    assignment is legitimately nondeterministic, but the bucket
    SIZES are fully determined by the partition sizes.  Compare the
    (partition, bucket) histogram, the strongest tie-invariant
    check."""
    spark, con = engines
    sql = (f"SELECT p, w, COUNT(*) AS n FROM ("
           f"SELECT {part} AS p, NTILE({nb}) OVER "
           f"(PARTITION BY {part} ORDER BY {order}) AS w "
           f"FROM fuzz_lineitem WHERE l_orderkey % {mod} = 0) "
           f"GROUP BY p, w")
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"ntile-tie case {i}: {part}/{order}/{nb}"


# ---- grouping-sets differential fuzz ------------------------------

GSETS_CASES = 15

_GS_DIMS = ["l_returnflag", "l_linestatus", "l_suppkey % 5",
            "l_linenumber"]


def _gsets_cases():
    rng = random.Random(SEED + 2626)
    out = []
    for i in range(GSETS_CASES):
        a, b = rng.sample(_GS_DIMS, 2)
        shape = rng.choice([
            f"ROLLUP({a}, {b})",
            f"CUBE({a}, {b})",
            f"GROUPING SETS (({a}), ({a}, {b}), ())",
            f"GROUPING SETS (({a}, {b}), ({b}))",
        ])
        out.append((i, a, b, shape, _rand_pred(rng)))
    return out


@pytest.mark.parametrize("i,a,b,shape,pred", _gsets_cases())
def test_grouping_sets_agree_across_engines(engines, i, a, b, shape,
                                            pred):
    """Random ROLLUP/CUBE/GROUPING SETS shapes with GROUPING()
    markers (so a NULL super-aggregate key is distinguishable from a
    NULL data key) — integer aggregates compared row-by-row under a
    repr sort (rows mix None with ints/strings).

    KNOWN DIVERGENCE (found by this fuzzer): over EMPTY input,
    DuckDB emits the SQL-standard grand-total row for the ()
    grouping set (COUNT=0) while Spark emits no rows at all.  The
    case is asserted explicitly rather than papered over — registry
    queries must not rely on the grand-total row existing when a
    filter can empty the input."""
    spark, con = engines
    sql = (f"SELECT {a} AS ka, {b} AS kb, "
           f"CAST(GROUPING({a}) AS BIGINT) AS ga, "
           f"CAST(GROUPING({b}) AS BIGINT) AS gb, "
           f"COUNT(*) AS n, "
           f"COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS s "
           f"FROM fuzz_lineitem WHERE {pred} "
           f"GROUP BY {shape}")
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=repr)
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                  key=repr)
    if not got:
        n_in = con.execute(
            f"SELECT COUNT(*) FROM fuzz_lineitem WHERE {pred}"
        ).fetchone()[0]
        assert n_in == 0, f"gsets case {i}: spark empty on data"
        assert all(r[4] == 0 for r in want), \
            f"gsets case {i}: duckdb grand-total rows should count 0"
        return
    assert got == want, f"gsets case {i}: {shape} / {pred}"


# ---- aggregate-function differential fuzz -------------------------

AGG_CASES = 12


def _agg_cases():
    rng = random.Random(SEED + 6363)
    out = []
    for i in range(AGG_CASES):
        m = rng.choice([2, 3, 5, 7])
        agg = rng.choice([
            f"count_if(l_quantity > {rng.randint(5, 45)})",
            f"CAST(bool_and(l_quantity > {rng.randint(1, 10)}) AS INT)",
            f"CAST(bool_or(l_quantity > {rng.randint(40, 49)}) AS INT)",
            "CAST(SUM(DISTINCT l_suppkey) AS BIGINT)",
            # arg-min/max over a UNIQUE ordering key (the full
            # composite) — ties would be engine-chosen otherwise
            "min_by(l_partkey, l_orderkey * 10 + l_linenumber)",
            "max_by(l_partkey, l_orderkey * 10 + l_linenumber)",
            "CAST(COUNT(DISTINCT l_quantity) AS BIGINT)",
        ])
        out.append((i, agg, m, _rand_pred(rng)))
    return out


@pytest.mark.parametrize("i,agg,m,pred", _agg_cases())
def test_aggregate_functions_agree_across_engines(engines, i, agg, m,
                                                  pred):
    """Random portable aggregates (count_if, bool_and/or, DISTINCT
    sums, arg-min/max over a unique key) grouped by a derived key —
    the aggregate surface beyond the plain SUM/COUNT families the
    oracles already pin."""
    spark, con = engines
    sql = (f"SELECT l_suppkey % {m} AS g, {agg} AS a, COUNT(*) AS n "
           f"FROM fuzz_lineitem WHERE {pred} GROUP BY l_suppkey % {m}")
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=repr)
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                  key=repr)
    assert got == want, f"agg case {i}: {agg} / {pred}"


# ---- set-operation differential fuzz ------------------------------

SETOP_CASES = 12


def _setop_cases():
    rng = random.Random(SEED + 5151)
    out = []
    for i in range(SETOP_CASES):
        op = rng.choice(["INTERSECT", "INTERSECT ALL", "EXCEPT",
                         "EXCEPT ALL", "UNION", "UNION ALL"])
        out.append((i, op, _rand_pred(rng), _rand_pred(rng)))
    return out


@pytest.mark.parametrize("i,op,p1,p2", _setop_cases())
def test_set_ops_agree_across_engines(engines, i, op, p1, p2):
    """Random INTERSECT/EXCEPT/UNION [ALL] between two filtered
    projections of the same relation — bag vs set semantics and the
    duplicate-count arithmetic behind them, compared exactly through
    an integer aggregate over the result."""
    spark, con = engines
    proj = "l_orderkey AS k, l_linenumber AS ln, l_returnflag AS f"
    sql = (f"SELECT COUNT(*) AS n, COALESCE(SUM(k), 0) AS sk, "
           f"COALESCE(SUM(ln), 0) AS sl "
           f"FROM (SELECT {proj} FROM fuzz_lineitem WHERE {p1} "
           f"{op} SELECT {proj} FROM fuzz_lineitem WHERE {p2})")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"setop case {i} [{op}]: {p1} / {p2}"


# ---- join-family differential fuzz --------------------------------

JOIN_CASES = 24


@pytest.fixture(scope="module")
def engines2(engines, sf_dir):
    """engines + the orders view on both sides (join fuzz needs a
    second relation)."""
    spark, con = engines
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .createOrReplaceTempView("fuzz_orders")
    con.execute(f"CREATE VIEW IF NOT EXISTS fuzz_orders AS "
                f"SELECT * FROM read_parquet('{sf_dir}/orders.parquet')")
    return spark, con


ORD_NUM = [("o_orderkey", 1, 6_000_000), ("o_custkey", 1, 150_000)]


def _rand_orders_pred(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.4:
        col, lo, hi = rng.choice(ORD_NUM[:2])
        return f"{col} {rng.choice(CMP)} {rng.randint(lo, hi)}"
    if roll < 0.7:
        vals = ["F", "O", "P"]
        picks = ", ".join(f"'{v}'" for v in
                          rng.sample(vals, rng.randint(1, 3)))
        return f"o_orderstatus IN ({picks})"
    return (f"o_orderpriority "
            f"{rng.choice(['=', '<>'])} "
            f"'{rng.choice(['1-URGENT', '2-HIGH', '3-MEDIUM'])}'")


def _join_cases():
    rng = random.Random(SEED + 777)
    cases = []
    for i in range(JOIN_CASES):
        shape = rng.choice(["INNER JOIN", "LEFT JOIN", "FULL JOIN",
                            "SEMI", "ANTI"])
        cases.append((i, shape, _rand_pred(rng), _rand_orders_pred(rng)))
    return cases


@pytest.mark.parametrize("i,shape,p1,p2", _join_cases())
def test_join_agrees_across_engines(engines2, i, shape, p1, p2):
    """Random join shapes over randomly-filtered sides, integer
    aggregates compared exactly. Semi/anti run as EXISTS/NOT EXISTS —
    the one spelling both engines parse identically."""
    spark, con = engines2
    a = (f"(SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS v "
         f"FROM fuzz_lineitem WHERE {p1})")
    b = (f"(SELECT o_orderkey AS k, o_custkey % 7 + 1 "
         f"AS w FROM fuzz_orders WHERE {p2})")
    if shape in ("SEMI", "ANTI"):
        neg = "NOT " if shape == "ANTI" else ""
        sql = (f"SELECT COUNT(*) AS n, COALESCE(SUM(v), 0) AS sv, "
               f"COALESCE(MIN(k), -1) AS mn, COALESCE(MAX(k), -1) AS mx "
               f"FROM {a} a WHERE {neg}EXISTS "
               f"(SELECT 1 FROM {b} b WHERE b.k = a.k)")
    else:
        sql = (f"SELECT COUNT(*) AS n, COALESCE(SUM(a.v), 0) AS sv, "
               f"COALESCE(SUM(b.w), 0) AS sw, "
               f"COALESCE(MIN(a.k), -1) AS mn, "
               f"COALESCE(MAX(b.k), -1) AS mx "
               f"FROM {a} a {shape} {b} b ON a.k = b.k")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"case {i} [{shape}]: {p1} / {p2}"


# ---- string-function differential fuzz ----------------------------

STR_CASES = 20


@pytest.fixture(scope="module")
def engines3(engines, sf_dir):
    spark, con = engines
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("fuzz_docs")
    con.execute(f"CREATE VIEW IF NOT EXISTS fuzz_docs AS "
                f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    return spark, con


def _rand_str_expr(rng: random.Random, depth: int = 0) -> str:
    """A random string expression from the ANSI-shared function set —
    spelled once, parsed by both engines."""
    base = rng.choice(["text", "lang", "source", "lower(text)"])
    if depth >= 2:
        return base
    roll = rng.random()
    inner = _rand_str_expr(rng, depth + 1)
    if roll < 0.2:
        return f"upper({inner})"
    if roll < 0.4:
        i = rng.randint(1, 8)
        n = rng.randint(1, 30)
        return f"substr({inner}, {i}, {n})"
    if roll < 0.55:
        return f"trim({inner})"
    if roll < 0.7:
        a = rng.choice(["a", "e", "row", "the", " "])
        b = rng.choice(["", "X", "zz"])
        return f"replace({inner}, '{a}', '{b}')"
    if roll < 0.85:
        other = _rand_str_expr(rng, depth + 1)
        return f"({inner} || '_' || {other})"
    return f"lower({inner})"


def _str_cases():
    rng = random.Random(SEED + 4242)
    out = []
    for i in range(STR_CASES):
        e = _rand_str_expr(rng)
        pat = rng.choice(["%row%", "%a%", "sp%", "%" + "z%", "%er%"])
        out.append((i, e, pat))
    return out


@pytest.mark.parametrize("i,expr,pat", _str_cases())
def test_string_funcs_agree_across_engines(engines3, i, expr, pat):
    spark, con = engines3
    sql = (f"SELECT COUNT(*) AS n, "
           f"CAST(SUM(length({expr})) AS BIGINT) AS sl, "
           f"CAST(SUM(CASE WHEN {expr} LIKE '{pat}' THEN 1 ELSE 0 END) "
           f"AS BIGINT) AS nl, "
           f"MIN(length({expr})) AS mn, MAX(length({expr})) AS mx "
           f"FROM fuzz_docs")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"case {i}: {expr} LIKE {pat}"


# ---- date-function differential fuzz ------------------------------

DATE_CASES = 15


def _date_cases():
    rng = random.Random(SEED + 909)
    parts = ["year", "month", "day"]
    out = []
    for i in range(DATE_CASES):
        p = rng.choice(parts)
        y = rng.randint(1992, 1998)
        out.append((i, p, y))
    return out


@pytest.mark.parametrize("i,part,year", _date_cases())
def test_date_funcs_agree_across_engines(engines2, i, part, year):
    """Calendar extraction and date arithmetic over the NTZ-read
    orders dates — the functions whose TZ semantics diverge first
    when an engine localizes (the events LTZ column is deliberately
    excluded; its contract is epoch-integer only, see the verify
    skill)."""
    spark, con = engines2
    sql = (f"SELECT CAST({part}(CAST(o_orderdate AS DATE)) AS BIGINT)"
           f" AS p, COUNT(*) AS n, "
           f"CAST(SUM(CAST(o_orderdate AS DATE) - DATE '{year}-01-01'"
           f") AS BIGINT) AS dsum "
           f"FROM fuzz_orders "
           f"WHERE year(CAST(o_orderdate AS DATE)) = {year} "
           f"GROUP BY 1 ORDER BY 1")
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want, f"case {i}: {part}/{year}"


# ---- subquery differential fuzz -----------------------------------

SUBQ_CASES = 12


def _subq_cases():
    rng = random.Random(SEED + 7272)
    out = []
    for i in range(SUBQ_CASES):
        neg = rng.choice(["", "NOT "])
        # the inner side sometimes yields NULLs — NOT IN over a NULL
        # set must return no rows (three-valued logic), the classic
        # cross-engine divergence minefield
        nullable = rng.random() < 0.4
        inner = ("CASE WHEN o_custkey % 11 = 0 THEN NULL "
                 "ELSE o_orderkey END" if nullable else "o_orderkey")
        out.append((i, neg, inner, _rand_pred(rng),
                    _rand_orders_pred(rng)))
    return out


@pytest.mark.parametrize("i,neg,inner,p1,p2", _subq_cases())
def test_in_subqueries_agree_across_engines(engines2, i, neg, inner,
                                            p1, p2):
    """[NOT] IN (subquery) with and without NULLs on the inner side,
    plus a correlated EXISTS twin — three-valued logic compared
    exactly through integer aggregates."""
    spark, con = engines2
    sql = (f"SELECT COUNT(*) AS n, "
           f"COALESCE(SUM(l_linenumber), 0) AS s "
           f"FROM fuzz_lineitem WHERE ({p1}) AND l_orderkey {neg}IN "
           f"(SELECT {inner} FROM fuzz_orders WHERE {p2})")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"subq case {i} [{neg}IN]: {p1} / {p2}"
    # correlated EXISTS over the same predicate pair
    sql2 = (f"SELECT COUNT(*) AS n FROM fuzz_lineitem l "
            f"WHERE ({p1.replace('l_shipdate', 'l.l_shipdate')}) "
            f"AND {neg}EXISTS (SELECT 1 FROM fuzz_orders o "
            f"WHERE o.o_orderkey = l.l_orderkey AND ({p2}))")
    got2 = spark.sql(sql2).first()[0]
    want2 = con.execute(sql2).fetchone()[0]
    assert got2 == want2, f"subq case {i} [{neg}EXISTS]"


# ---- collection-function differential fuzz ------------------------

COLL_CASES = 52


def _coll_elems(rng: random.Random, n: int, nullable: bool):
    """n element expressions spelled ONCE (shared ANSI), each a
    BIGINT derived from lineitem columns; nullable ones gap out on a
    per-element modulus so null positions differ across elements."""
    out = []
    for j in range(n):
        if nullable and rng.random() < 0.5:
            m = rng.randint(2, 4)
            out.append(f"(CASE WHEN (l_partkey + {j}) % {m} = 0 "
                       f"THEN CAST(NULL AS BIGINT) "
                       f"ELSE CAST(l_suppkey % 50 + {j} AS BIGINT) END)")
        else:
            k = rng.randint(1, 7)
            out.append(f"CAST((l_partkey + {j * k}) % 40 AS BIGINT)")
    return out


def _coll_arrays(rng: random.Random, n: int, nullable: bool):
    elems = _coll_elems(rng, n, nullable)
    return ("array(" + ", ".join(elems) + ")",
            "[" + ", ".join(elems) + "]")


def _coll_case(rng: random.Random) -> tuple[str, str, str]:
    """One random collection expression, rendered PER ENGINE. The
    dialects disagree on far more than spelling here — probed and
    encoded below: Spark ``try_element_at`` ≡ DuckDB ``arr[i]`` for
    OOB (both NULL) but NOT for index 0 (Spark raises, DuckDB NULL —
    kept out of the generator, pinned in the divergence test);
    ``array_distinct`` keeps NULL, ``list_distinct`` drops it (the
    DuckDB rendering compensates); Spark ``aggregate`` is
    null-strict, ``list_sum`` null-skipping (both sides spell the
    skip-null policy explicitly); set-op output order is unspecified
    in DuckDB (canonicalised via sort + join-to-string)."""
    n = rng.randint(3, 6)
    sa, da = _coll_arrays(rng, n, nullable=True)
    va, wa = _coll_arrays(rng, n, nullable=False)
    roll = rng.random()
    if roll < 0.14:
        # extract: raw / reversed / transformed, OOB and negative
        k = rng.choice([-3, -2, -1, 1, 2, 3, 4, n, n + 1, n + 2])
        v = rng.random()
        if v < 0.4:
            return (f"try_element_at({sa}, {k})", f"({da})[{k}]",
                    f"extract[{k}]")
        if v < 0.7:
            return (f"try_element_at(reverse({sa}), {k})",
                    f"(list_reverse({da}))[{k}]", f"rev-extract[{k}]")
        c = rng.randint(0, 9)
        return (f"try_element_at(transform({sa}, x -> x * 2 + {c}), {k})",
                f"(list_transform({da}, x -> x * 2 + {c}))[{k}]",
                f"transform-extract[{k}]")
    if roll < 0.30:
        # sorted extract — all four (direction × null-placement)
        # corners; Spark's array_sort/sort_array defaults map to
        # explicit DuckDB list_sort null orders
        k = rng.choice([-2, -1, 1, 2, 3, n])
        v = rng.random()
        if v < 0.34:
            return (f"try_element_at(array_sort({sa}), {k})",
                    f"(list_sort({da}, 'ASC', 'NULLS LAST'))[{k}]",
                    f"array_sort[{k}]")
        if v < 0.67:
            return (f"try_element_at(sort_array({sa}), {k})",
                    f"(list_sort({da}, 'ASC', 'NULLS FIRST'))[{k}]",
                    f"sort_array-asc[{k}]")
        return (f"try_element_at(sort_array({sa}, false), {k})",
                f"(list_sort({da}, 'DESC', 'NULLS LAST'))[{k}]",
                f"sort_array-desc[{k}]")
    if roll < 0.42:
        # null-skipping sum, whole array or slice; DuckDB list_sum
        # yields HUGEINT and skips NULLs, Spark aggregate is strict —
        # both sides pin the skip-null policy explicitly
        if rng.random() < 0.5:
            return (f"aggregate({sa}, 0L, (a, x) -> a + coalesce(x, 0L))",
                    f"CAST(coalesce(list_sum({da}), 0) AS BIGINT)",
                    "sum-skip-null")
        s, ln = rng.randint(1, 4), rng.randint(1, 4)
        return (f"aggregate(slice({sa}, {s}, {ln}), 0L, "
                f"(a, x) -> a + coalesce(x, 0L))",
                f"CAST(coalesce(list_sum(list_slice({da}, {s}, "
                f"{s + ln - 1})), 0) AS BIGINT)",
                f"slice-sum[{s},{ln}]")
    if roll < 0.54:
        # filter / size / slice cardinalities
        t = rng.randint(5, 45)
        v = rng.random()
        if v < 0.4:
            return (f"size(filter({sa}, x -> x > {t}))",
                    f"len(list_filter({da}, x -> x > {t}))",
                    f"filter-size[>{t}]")
        if v < 0.7:
            s, ln = rng.randint(1, 5), rng.randint(1, 4)
            return (f"size(slice({sa}, {s}, {ln}))",
                    f"len(list_slice({da}, {s}, {s + ln - 1}))",
                    f"slice-size[{s},{ln}]")
        # array_distinct keeps NULL; list_distinct drops it — the
        # DuckDB side compensates by counting null presence
        return (f"size(array_distinct({sa}))",
                f"len(list_distinct({da})) + (CASE WHEN "
                f"len(list_filter({da}, x -> x IS NULL)) > 0 "
                f"THEN 1 ELSE 0 END)",
                "distinct-size-null-compensated")
    if roll < 0.66:
        # membership on non-null arrays (null elements flip both
        # engines into three-valued territory — pinned separately)
        val = f"CAST(l_partkey % 40 AS BIGINT)"
        if rng.random() < 0.5:
            return (f"array_position({va}, {val})",
                    f"list_position({wa}, {val})", "position")
        return (f"CASE WHEN array_contains({va}, {val}) THEN 1 ELSE 0 END",
                f"CASE WHEN list_contains({wa}, {val}) THEN 1 ELSE 0 END",
                "contains")
    if roll < 0.80:
        # set ops canonicalised to a sorted joined string (DuckDB's
        # output order is unspecified; Spark's is first-occurrence)
        vb, wb = _coll_arrays(rng, rng.randint(2, 5), nullable=False)
        v = rng.random()
        if v < 0.34:
            return (f"array_join(transform(array_sort("
                    f"array_intersect({va}, {vb})), "
                    f"x -> CAST(x AS STRING)), ',')",
                    f"array_to_string(list_sort("
                    f"list_intersect({wa}, {wb})), ',')",
                    "intersect")
        if v < 0.67:
            return (f"array_join(transform(array_sort("
                    f"array_except({va}, {vb})), "
                    f"x -> CAST(x AS STRING)), ',')",
                    f"array_to_string(list_sort(list_filter("
                    f"list_distinct({wa}), "
                    f"x -> NOT list_contains({wb}, x))), ',')",
                    "except")
        return (f"array_join(transform(array_sort("
                f"array_union({va}, {vb})), "
                f"x -> CAST(x AS STRING)), ',')",
                f"array_to_string(list_sort(list_distinct("
                f"{wa} || {wb})), ',')",
                "union")
    if roll < 0.92:
        # zip_with dot product (list_zip structs are positional-only
        # in DuckDB: t[1] * t[2])
        sb, db = _coll_arrays(rng, n, nullable=True)
        return (f"aggregate(zip_with({sa}, {sb}, "
                f"(x, y) -> coalesce(x, 0L) * coalesce(y, 0L)), "
                f"0L, (a, x) -> a + x)",
                f"CAST(coalesce(list_sum(list_transform("
                f"list_zip({da}, {db}), "
                f"t -> coalesce(t[1], 0) * coalesce(t[2], 0))), 0) "
                f"AS BIGINT)",
                "zip-dot")
    # map lookup: constant int keys, row-derived values; missing key
    # (incl. 0, legal for MAPS in both) → NULL.  DuckDB element_at on
    # a map returns a LIST — peeled with [1]
    m = rng.randint(2, 4)
    velems = _coll_elems(rng, m, nullable=False)
    k = rng.randint(0, m + 2)
    return (f"try_element_at(map_from_arrays(sequence(1, {m}), "
            f"array({', '.join(velems)})), {k})",
            f"(element_at(map(range(1, {m + 1}), "
            f"[{', '.join(velems)}]), {k}))[1]",
            f"map-lookup[{k}]")


def _coll_cases():
    rng = random.Random(SEED + 31337)
    return [(i, *_coll_case(rng)) for i in range(COLL_CASES)]


@pytest.mark.parametrize("i,spark_expr,duck_expr,label", _coll_cases())
def test_collection_funcs_agree_across_engines(engines, i, spark_expr,
                                               duck_expr, label):
    """Random array/map expressions — extraction (OOB, negative,
    post-sort under every null-placement corner), null-policy-pinned
    sums, filters, slices, set ops, zip products, map lookups —
    compared row-by-row across engines. The repo's feature packing,
    minhash banding, and 69-slot formats all lean on this function
    family."""
    spark, con = engines
    body = " FROM fuzz_lineitem WHERE l_orderkey % 13 = 1"
    key = (lambda t: tuple((v is None, v if v is not None else 0)
                           for v in t))
    got = sorted((tuple(r) for r in spark.sql(
        f"SELECT l_orderkey, l_linenumber, {spark_expr} AS v{body}"
    ).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(
        f"SELECT l_orderkey, l_linenumber, {duck_expr} AS v{body}"
    ).fetchall()), key=key)
    assert got == want, f"collection case {i} [{label}]: {spark_expr}"


def test_collection_divergences_pinned(engines):
    """The cross-engine gaps the fuzz generator deliberately routes
    around, asserted HEAD-ON so a behavior change in either engine
    (or a wrong assumption in the oracles above) fails loudly:

    1. index 0 on an ARRAY: Spark raises INVALID_INDEX_OF_ZERO even
       under try_element_at; DuckDB arr[0] is NULL.
    2. array_distinct keeps NULL; list_distinct drops it.
    3. Spark higher-order aggregate() is null-STRICT; DuckDB
       list_sum SKIPS nulls.
    4. duplicate map keys raise in BOTH engines (Spark
       DUPLICATED_MAP_KEY, DuckDB 'Map keys must be unique').
    """
    spark, con = engines
    with pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO"):
        spark.sql("SELECT try_element_at(array(1, 2, 3), 0)").collect()
    assert con.execute("SELECT [1, 2, 3][0]").fetchone()[0] is None

    assert spark.sql(
        "SELECT array_distinct(array(3, 1, 3, CAST(NULL AS INT), 1))"
    ).first()[0] == [3, 1, None]
    assert sorted(con.execute(
        "SELECT list_distinct([3, 1, 3, NULL, 1])").fetchone()[0]
    ) == [1, 3]

    assert spark.sql(
        "SELECT aggregate(array(1, CAST(NULL AS INT), 2), 0, "
        "(a, x) -> a + x)").first()[0] is None
    assert con.execute(
        "SELECT list_sum([1, NULL, 2])").fetchone()[0] == 3

    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql("SELECT map(1, 10, 1, 20)").collect()
    with pytest.raises(Exception, match="unique"):
        con.execute("SELECT map([1, 1], [10, 20])").fetchone()


# ---- JSON / VARIANT differential fuzz -----------------------------

JSON_CASES = 24


def _json_doc(rng: random.Random, cast: str) -> str:
    """A per-row JSON document expression built from lineitem columns
    — identical JSON semantics in both engines, differing only in the
    cast keyword (Spark STRING / DuckDB VARCHAR). Integer and string
    fields only: float rendering ('5' vs '5.0') is engine-specific
    and deliberately excluded."""
    n = rng.randint(2, 4)
    arr = ", ".join(
        f"', ', CAST(l_partkey % {rng.randint(7, 99)} AS {cast})"
        for _ in range(n - 1))
    parts = [f"'{{\"a\": ', CAST(l_suppkey % 50 AS {cast})",
             f"', \"b\": [', CAST(l_quantity AS {cast})"]
    if n > 1:
        parts.append(arr)
    parts.append("'], \"c\": {\"d\": \"', l_returnflag, '\"}'")
    if rng.random() < 0.5:
        # a JSON-null field: extracted-as-string it is NULL in both
        parts.append("', \"e\": null'")
    parts.append("'}'")
    return "concat(" + ", ".join(parts) + ")"


def _json_cases():
    """(i, spark_expr, duck_expr, label): Spark get_json_object /
    json_array_length / json_object_keys / VARIANT parse_json +
    try_variant_get vs DuckDB json_extract[_string] / json_array_length
    / json_keys. The two documents per case are field-for-field
    identical (same rng state replayed per cast spelling). Negative
    array indices in paths are excluded (Spark → NULL, DuckDB →
    from-the-end — pinned in the divergence test)."""
    rng = random.Random(SEED + 909090)
    out = []
    for i in range(JSON_CASES):
        state = rng.getstate()
        sdoc = _json_doc(rng, "STRING")
        rng.setstate(state)
        ddoc = _json_doc(rng, "VARCHAR")
        roll = rng.random()
        if roll < 0.25:
            p = rng.choice(["$.a", "$.c.d", "$.zz", "$.e",
                            f"$.b[{rng.randint(0, 5)}]"])
            out.append((i, f"get_json_object({sdoc}, '{p}')",
                        f"json_extract_string({ddoc}, '{p}')",
                        f"string[{p}]"))
        elif roll < 0.45:
            p = rng.choice(["$.a", f"$.b[{rng.randint(0, 5)}]", "$.zz"])
            out.append((i,
                        f"CAST(get_json_object({sdoc}, '{p}') AS BIGINT)",
                        f"CAST(json_extract({ddoc}, '{p}') AS BIGINT)",
                        f"bigint[{p}]"))
        elif roll < 0.65:
            # VARIANT path (Spark's binary JSON type) against plain
            # JSON extraction in DuckDB
            if rng.random() < 0.5:
                p = rng.choice(["$.a", f"$.b[{rng.randint(0, 5)}]"])
                out.append((i,
                            f"try_variant_get(parse_json({sdoc}), "
                            f"'{p}', 'bigint')",
                            f"CAST(json_extract({ddoc}, '{p}') AS BIGINT)",
                            f"variant-bigint[{p}]"))
            else:
                p = rng.choice(["$.c.d", "$.zz"])
                out.append((i,
                            f"try_variant_get(parse_json({sdoc}), "
                            f"'{p}', 'string')",
                            f"json_extract_string({ddoc}, '{p}')",
                            f"variant-string[{p}]"))
        elif roll < 0.80:
            out.append((i,
                        f"json_array_length(get_json_object({sdoc}, "
                        f"'$.b'))",
                        f"json_array_length({ddoc}, '$.b')",
                        "array-length"))
        elif roll < 0.92:
            out.append((i,
                        f"array_join(array_sort(json_object_keys("
                        f"{sdoc})), ',')",
                        f"array_to_string(list_sort(json_keys({ddoc})"
                        f"), ',')",
                        "keys"))
        else:
            # whole-array text: both engines render compact [1,2,3]
            out.append((i, f"get_json_object({sdoc}, '$.b')",
                        f"CAST(json_extract({ddoc}, '$.b') AS VARCHAR)",
                        "array-text"))
    return out


@pytest.mark.parametrize("i,spark_expr,duck_expr,label", _json_cases())
def test_json_variant_agree_across_engines(engines, i, spark_expr,
                                           duck_expr, label):
    """Random JSON documents built per-row from lineitem columns,
    probed through scalar/array/nested/missing/JSON-null paths, the
    VARIANT type, array lengths, key sets, and compact array
    re-rendering — exact row-by-row agreement."""
    spark, con = engines
    body = " FROM fuzz_lineitem WHERE l_orderkey % 17 = 1"
    key = (lambda t: tuple((v is None, v if v is not None else 0)
                           for v in t))
    got = sorted((tuple(r) for r in spark.sql(
        f"SELECT l_orderkey, l_linenumber, {spark_expr} AS v{body}"
    ).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(
        f"SELECT l_orderkey, l_linenumber, {duck_expr} AS v{body}"
    ).fetchall()), key=key)
    assert got == want, f"json case {i} [{label}]: {spark_expr}"


def test_json_divergences_pinned(engines):
    """Cross-engine JSON gaps the generator routes around:

    1. negative array index in a path: Spark get_json_object → NULL,
       DuckDB json_extract counts from the end.
    2. invalid JSON: Spark try_parse_json → NULL (and get_json_object
       → NULL); DuckDB json_valid → false, json_extract raises.
    """
    spark, con = engines
    js = '\'{"b": [1, 2, 3]}\''
    assert spark.sql(
        f"SELECT get_json_object({js}, '$.b[-1]')").first()[0] is None
    assert con.execute(
        f"SELECT CAST(json_extract({js}, '$.b[-1]') AS BIGINT)"
    ).fetchone()[0] == 3

    assert spark.sql(
        "SELECT try_parse_json('{oops')").first()[0] is None
    assert spark.sql(
        "SELECT get_json_object('{oops', '$.a')").first()[0] is None
    assert con.execute(
        "SELECT json_valid('{oops')").fetchone()[0] is False
    with pytest.raises(Exception):
        con.execute("SELECT json_extract('{oops', '$.a')").fetchone()


# ---- decimal-arithmetic differential fuzz -------------------------

DEC_CASES = 28

# the repo's determinism contract routes ALL money/moment math
# through DECIMAL — this family fuzzes the shared-safe surface and
# pins the corners where the engines' decimal systems genuinely
# diverge (division, AVG, downscale casts — excluded from the
# generator, asserted head-on below)

_DEC_TERMS = [
    "CAST(l_quantity AS DECIMAL(18,2))",
    "CAST(l_linenumber AS DECIMAL(10,4))",
    "CAST(l_suppkey % 97 AS DECIMAL(18,3))",
    "CAST(3 - l_linenumber AS DECIMAL(18,2))",      # sign changes
]
_DEC_LITS = ["0.125", "2.75", "1.5", "0.04", "12.25", "3"]


def _dec_term(rng: random.Random) -> str:
    if rng.random() < 0.25:
        return f"CAST({rng.choice(_DEC_LITS)} AS DECIMAL(18,3))"
    return rng.choice(_DEC_TERMS)


def _dec_expr(rng: random.Random, depth: int = 0) -> str:
    """Random decimal expression over the CROSS-ENGINE-SAFE ops:
    +, -, term×term (scale ≤ 7, products ≤ ~1.6e3 — inside both
    engines' precision), explicit ROUND (HALF_UP away-from-zero in
    BOTH, probed incl. the 2.125/-2.345 halfway cases), %, unary
    minus.  Division, AVG, and downscaling CASTs are deliberately
    absent — they diverge (pinned in the divergence test)."""
    if depth >= 2:
        return _dec_term(rng)
    roll = rng.random()
    a = _dec_expr(rng, depth + 1)
    if roll < 0.25:
        return f"({a} + {_dec_expr(rng, depth + 1)})"
    if roll < 0.45:
        return f"({a} - {_dec_expr(rng, depth + 1)})"
    if roll < 0.60:
        # multiplication of two TERMS only: nesting products would
        # push past DuckDB's width-preserving DECIMAL(18) precision
        return f"({_dec_term(rng)} * {_dec_term(rng)})"
    if roll < 0.75:
        k = rng.choice([-1, 0, 1, 2, 3])
        return f"ROUND({a}, {k})"
    if roll < 0.88:
        m = rng.choice(["2", "2.5", "-3", "7.25"])
        return f"({a} % CAST({m} AS DECIMAL(18,2)))"
    return f"(- {a})"


def _dec_cases():
    rng = random.Random(SEED + 616161)
    out = []
    for i in range(DEC_CASES):
        e = _dec_expr(rng)
        # ROUND(·, 6) before the final widening cast: inner scales
        # can reach 7, and a downscaling CAST rounds HALF_UP in
        # Spark but not in DuckDB — explicit ROUND is the one
        # downscale both engines agree on
        v = f"CAST(ROUND({e}, 6) AS DECIMAL(38,6))"
        out.append((i, v, rng.random() < 0.3))
    return out


@pytest.mark.parametrize("i,expr,grouped", _dec_cases())
def test_decimal_arithmetic_agrees_across_engines(engines, i, expr,
                                                  grouped):
    """One spelling, both engines, exact Decimal equality — per-row
    chains and grouped integer-exact SUMs."""
    spark, con = engines
    if grouped:
        sql = (f"SELECT l_returnflag, CAST(SUM({expr}) AS "
               f"DECIMAL(38,6)) AS v FROM fuzz_lineitem "
               f"GROUP BY l_returnflag")
    else:
        sql = (f"SELECT l_orderkey, l_linenumber, {expr} AS v "
               f"FROM fuzz_lineitem WHERE l_orderkey % 19 = 1")
    key = (lambda t: tuple((v is None, v if v is not None else 0)
                           for v in t))
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                  key=key)
    assert got == want, f"decimal case {i}: {expr}"


def test_decimal_divergences_pinned(engines):
    """The decimal corners the contract (and the generator above)
    must route around, asserted head-on:

    1. decimal ÷ decimal: Spark → DECIMAL(38,20), DuckDB → DOUBLE.
       Same mathematical value here, but a hash-compared result
       column would type-mismatch — the contract's 'cast to DOUBLE
       before dividing' rule exists because of this.
    2. downscaling CAST: Spark rounds HALF_UP (2.5 → 3,
       2.345 → 2.35), DuckDB does not (2.5 → 2, 2.345 → 2.34).
       Scale reduction must go through explicit ROUND, never CAST.
    3. AVG of a decimal: Spark → DECIMAL(s+4), DuckDB → DOUBLE.
    4. Widening overflow past 38 digits errors in BOTH engines
       (Spark ANSI arithmetic, DuckDB range check) — neither wraps.
    """
    spark, con = engines
    s_div = spark.sql("SELECT CAST(1 AS DECIMAL(18,2)) / "
                      "CAST(3 AS DECIMAL(18,2))").first()[0]
    d_div = con.execute("SELECT CAST(1 AS DECIMAL(18,2)) / "
                        "CAST(3 AS DECIMAL(18,2))").fetchone()[0]
    import decimal
    assert isinstance(s_div, decimal.Decimal)
    assert isinstance(d_div, float)

    assert spark.sql("SELECT CAST(CAST(2.5 AS DECIMAL(18,1)) "
                     "AS DECIMAL(18,0))").first()[0] == 3
    assert con.execute("SELECT CAST(CAST(2.5 AS DECIMAL(18,1)) "
                       "AS DECIMAL(18,0))").fetchone()[0] == 2
    assert spark.sql("SELECT CAST(CAST(2.345 AS DECIMAL(18,3)) "
                     "AS DECIMAL(18,2))").first()[0] == \
        decimal.Decimal("2.35")
    assert con.execute("SELECT CAST(CAST(2.345 AS DECIMAL(18,3)) "
                       "AS DECIMAL(18,2))").fetchone()[0] == \
        decimal.Decimal("2.34")

    s_avg = spark.sql("SELECT AVG(x) FROM VALUES "
                      "(CAST(1.25 AS DECIMAL(18,2))) t(x)").first()[0]
    d_avg = con.execute("SELECT AVG(CAST(1.25 AS DECIMAL(18,2)))"
                        ).fetchone()[0]
    assert isinstance(s_avg, decimal.Decimal)
    assert isinstance(d_avg, float)

    with pytest.raises(Exception):
        spark.sql("SELECT CAST(REPEAT('9', 38) AS DECIMAL(38,0)) * "
                  "CAST(10 AS DECIMAL(38,0))").collect()
    with pytest.raises(Exception):
        con.execute("SELECT CAST(repeat('9', 38) AS DECIMAL(38,0)) * "
                    "CAST(10 AS DECIMAL(38,0))").fetchone()


# ---- regex-function differential fuzz -----------------------------

REGEX_CASES = 22

# shared-safe subset of Java regex (Spark) ∩ RE2 (DuckDB): classes,
# quantifiers, anchors, \b, alternation, groups, inline (?i).
# Lookaround / possessive quantifiers / pattern backreferences are
# Java-only (RE2 rejects them) — pinned in the divergence test.
_RE_ATOMS = ["[a-z]", "[aeiou]", "[0-9]", "[^ ]", "[a-m]", "\\w",
             "[rst]", "e", "th", "a"]
_RE_QUANT = ["", "+", "*", "?", "{1,3}", "{2}"]


def _rand_regex(rng: random.Random, groups: int = 0) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        atom = rng.choice(_RE_ATOMS)
        if rng.random() < 0.25:
            atom = f"({rng.choice(_RE_ATOMS)}|{rng.choice(_RE_ATOMS)})"
        parts.append(atom + rng.choice(_RE_QUANT))
    pat = "".join(parts)
    for _ in range(groups):
        pat = f"({pat})"
    if rng.random() < 0.15:
        pat = "\\b" + pat
    if rng.random() < 0.1:
        pat = "(?i)" + pat
    return pat


def _spark_lit(pat: str) -> str:
    # Spark SQL string literals process backslash escapes; DuckDB's
    # standard-conforming strings do not
    return pat.replace("\\", "\\\\")


def _regex_cases():
    rng = random.Random(SEED + 787878)
    out = []
    for i in range(REGEX_CASES):
        p = _rand_regex(rng)
        roll = rng.random()
        if roll < 0.3:
            out.append((i,
                        f"size(regexp_extract_all(text, "
                        f"'{_spark_lit(p)}', 0))",
                        f"len(regexp_extract_all(text, '{p}'))",
                        f"count[{p}]"))
        elif roll < 0.5:
            out.append((i,
                        f"CASE WHEN regexp_like(text, "
                        f"'{_spark_lit(p)}') THEN 1 ELSE 0 END",
                        f"CASE WHEN regexp_matches(text, '{p}') "
                        f"THEN 1 ELSE 0 END",
                        f"like[{p}]"))
        elif roll < 0.7:
            g = _rand_regex(rng, groups=1)
            idx = rng.choice([0, 1])
            out.append((i,
                        f"regexp_extract(text, '{_spark_lit(g)}', {idx})",
                        f"regexp_extract(text, '{g}', {idx})",
                        f"extract[{g}#{idx}]"))
        else:
            r = rng.choice(["_", "", "XX"])
            out.append((i,
                        f"length(regexp_replace(text, "
                        f"'{_spark_lit(p)}', '{r}'))",
                        f"length(regexp_replace(text, '{p}', "
                        f"'{r}', 'g'))",
                        f"replace[{p}->{r}]"))
    return out


@pytest.mark.parametrize("i,spark_expr,duck_expr,label", _regex_cases())
def test_regex_funcs_agree_across_engines(engines3, i, spark_expr,
                                          duck_expr, label):
    """Random patterns from the Java∩RE2-safe grammar over the
    documents text: match counts, boolean matches, group extraction,
    replace-all lengths — row-by-row agreement.  The PII scrub,
    normalize, lang-id, and token-count operators all ride this
    function family."""
    spark, con = engines3
    body = " FROM fuzz_docs WHERE doc_id % 3 = 0"
    key = (lambda t: tuple((v is None, v if v is not None else 0)
                           for v in t))
    got = sorted((tuple(r) for r in spark.sql(
        f"SELECT doc_id, {spark_expr} AS v{body}").collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(
        f"SELECT doc_id, {duck_expr} AS v{body}").fetchall()), key=key)
    assert got == want, f"regex case {i} [{label}]"


def test_regex_divergences_pinned(engines):
    """Java-regex constructs RE2 rejects — anything the repo's
    operators use must stay out of this set:

    1. lookahead: Spark matches, DuckDB raises 'invalid perl
       operator'.
    2. possessive quantifiers: Spark ok, DuckDB raises.
    3. pattern backreferences: Spark ok, DuckDB raises.
    4. regexp_replace default: Spark replaces ALL occurrences,
       DuckDB only the FIRST without the 'g' flag.
    5. replacement backrefs are spelled $1 (Spark/Java) vs
       \\1 (DuckDB/RE2).
    """
    spark, con = engines
    assert spark.sql(
        "SELECT regexp_like('abc', 'a(?=b)')").first()[0] is True
    with pytest.raises(Exception, match="perl|Invalid"):
        con.execute("SELECT regexp_matches('abc', 'a(?=b)')")

    assert spark.sql(
        "SELECT regexp_like('aaa', 'a*+')").first()[0] is True
    with pytest.raises(Exception):
        con.execute("SELECT regexp_matches('aaa', 'a*+')")

    assert spark.sql(
        "SELECT regexp_like('abab', '(ab)\\\\1')").first()[0] is True
    with pytest.raises(Exception):
        con.execute("SELECT regexp_matches('abab', '(ab)\\1')")

    assert spark.sql(
        "SELECT regexp_replace('a1b2', '[0-9]', 'X')"
    ).first()[0] == "aXbX"
    assert con.execute(
        "SELECT regexp_replace('a1b2', '[0-9]', 'X')"
    ).fetchone()[0] == "aXb2"

    assert spark.sql(
        "SELECT regexp_replace('ab', '(a)(b)', '$2$1')"
    ).first()[0] == "ba"
    assert con.execute(
        "SELECT regexp_replace('ab', '(a)(b)', '\\2\\1')"
    ).fetchone()[0] == "ba"


# ---- date/interval-arithmetic differential fuzz -------------------

INTERVAL_CASES = 24

# (label, spark expr, duckdb expr) with D0 = the NTZ orders date.
# Probed live before encoding (2026-08-15): month addition CLAMPS
# identically in both engines (Jan 31 + 1 mo = Feb 29/28 on both),
# trunc('WEEK') and date_trunc('week') are both Monday-start, and
# dayofweek numbering differs by exactly one (Spark Sunday=1, DuckDB
# Sunday=0) — compensated in the DuckDB rendering.  DuckDB's DATE +
# BIGINT has no overload (INT works); its renderings cast.
_IV_TRANSFORMS = [
    ("add_months{k}", "add_months(D0, {k})",
     "CAST(D0 + INTERVAL ({k}) MONTH AS DATE)"),
    ("add_months_eom{k}", "add_months(last_day(D0), {k})",
     "CAST(last_day(D0) + INTERVAL ({k}) MONTH AS DATE)"),
    ("date_add{j}", "date_add(D0, {j})", "D0 + CAST({j} AS INT)"),
    ("chain{k}_{j}", "date_add(add_months(D0, {k}), {j})",
     "CAST(D0 + INTERVAL ({k}) MONTH AS DATE) + CAST({j} AS INT)"),
    ("trunc_mm", "trunc(D0, 'MM')",
     "CAST(date_trunc('month', D0) AS DATE)"),
    ("trunc_week", "trunc(D0, 'WEEK')",
     "CAST(date_trunc('week', D0) AS DATE)"),
    ("trunc_quarter", "trunc(D0, 'QUARTER')",
     "CAST(date_trunc('quarter', D0) AS DATE)"),
    ("last_day_shift{j}", "last_day(date_add(D0, {j}))",
     "last_day(D0 + CAST({j} AS INT))"),
]
_IV_EXTRACTS = [
    ("dow", "CAST(dayofweek(X0) AS BIGINT)",
     "CAST(dayofweek(X0) + 1 AS BIGINT)"),
    ("doy", "CAST(dayofyear(X0) AS BIGINT)",
     "CAST(dayofyear(X0) AS BIGINT)"),
    ("woy", "CAST(weekofyear(X0) AS BIGINT)",
     "CAST(weekofyear(X0) AS BIGINT)"),
    ("q", "CAST(quarter(X0) AS BIGINT)", "CAST(quarter(X0) AS BIGINT)"),
    ("ddiff", "CAST(datediff(X0, D0) AS BIGINT)",
     "CAST(date_diff('day', D0, X0) AS BIGINT)"),
    ("epochday", "CAST(unix_date(X0) AS BIGINT)",
     "CAST(date_diff('day', DATE '1970-01-01', X0) AS BIGINT)"),
]


def _interval_cases():
    rng = random.Random(SEED + 515)
    out = []
    for i in range(INTERVAL_CASES):
        label, st, dt = rng.choice(_IV_TRANSFORMS)
        k, j = rng.randint(-30, 30), rng.randint(-900, 900)
        st, dt = st.format(k=k, j=j), dt.format(k=k, j=j)
        elabel, se, de = rng.choice(_IV_EXTRACTS)
        out.append((i, f"{label.format(k=k, j=j)}/{elabel}",
                    se.replace("X0", st), de.replace("X0", dt)))
    return out


@pytest.mark.parametrize("i,label,sexpr,dexpr", _interval_cases())
def test_interval_arithmetic_agrees_across_engines(engines2, i, label,
                                                   sexpr, dexpr):
    """Random (interval transform ∘ calendar extraction) pipelines
    over the orders dates, compared as exact grouped integer
    aggregates.  This is the surface SCD2 intervals, cohort
    retention, and seasonality profiles stand on — clamping month
    addition, Monday-anchored week truncation, and day-difference
    conventions all inside one composed expression."""
    spark, con = engines2
    D = "CAST(o_orderdate AS DATE)"
    ssql = (f"SELECT {sexpr.replace('D0', D)} AS x, COUNT(*) AS n, "
            f"CAST(SUM(o_orderkey % 1000) AS BIGINT) AS ck "
            f"FROM fuzz_orders GROUP BY 1 ORDER BY 1")
    dsql = (f"SELECT {dexpr.replace('D0', D)} AS x, COUNT(*) AS n, "
            f"CAST(SUM(o_orderkey % 1000) AS BIGINT) AS ck "
            f"FROM fuzz_orders GROUP BY 1 ORDER BY 1")
    got = [(str(r[0]), r[1], r[2]) for r in spark.sql(ssql).collect()]
    want = [(str(r[0]), r[1], r[2]) for r in con.execute(dsql).fetchall()]
    assert got == want, f"case {i} ({label})"


def test_interval_divergences_pinned(engines2):
    """The corners the generator must NOT wander into, pinned so a
    Spark/DuckDB upgrade that moves them is caught:

    - months_between is NOT the inverse of add_months: Spark
      day-clamps the END of the walk, so months_between(add_months(
      d, 5), d) < 5 whenever d's day exceeds the target month's
      length (31st → 30-day month).  DuckDB has no months_between;
      an oracle must derive month counts from clamped add_months
      chains, never from months_between.
    - DuckDB DATE + BIGINT has no overload (DATE + INT does); Spark
      coerces both.  Generated SQL must CAST day literals AS INT.
    - dayofweek: Spark Sunday=1..Saturday=7; DuckDB Sunday=0..6.
    """
    spark, con = engines2
    mb = spark.sql("SELECT months_between(add_months(DATE '1992-09-29'"
                   ", 5), DATE '1992-09-29')").first()[0]
    assert abs(mb - 4.96774194) < 1e-6   # clamped walk: not 5
    # DuckDB rejects an UNQUOTED negative interval literal; the
    # parenthesized form binds — generated SQL must parenthesize
    with pytest.raises(Exception):
        con.execute("SELECT DATE '1992-03-15' + INTERVAL -12 MONTH")
    assert str(con.execute(
        "SELECT CAST(DATE '1992-03-15' + INTERVAL (-12) MONTH AS DATE)"
    ).fetchone()[0]) == "1992-03-15".replace("1992", "1991")
    assert spark.sql(
        "SELECT add_months(DATE '1992-01-31', 1)").first()[0].day == 29
    with pytest.raises(Exception):
        con.execute("SELECT DATE '1992-01-01' + CAST(1 AS BIGINT)")
    assert con.execute(
        "SELECT DATE '1992-01-01' + CAST(1 AS INT)").fetchone()[0] \
        .isoformat() == "1992-01-02"
    # Sunday 1992-01-05: Spark says 1, DuckDB says 0
    assert spark.sql(
        "SELECT dayofweek(DATE '1992-01-05')").first()[0] == 1
    assert con.execute(
        "SELECT dayofweek(DATE '1992-01-05')").fetchone()[0] == 0


# ---------------------------------------------------------------------
# decimal-arithmetic / cast family (round 9): generated DECIMAL(18,2)
# expression trees reduced to exact BIGINT cents in both engines, a
# TRY_CAST string battery, and the pinned cast-semantics divergences
# the repo's DECIMAL money policy exists to sidestep.

_DEC_COLS = ["l_extendedprice", "l_discount", "l_tax", "l_quantity"]


def _dec(col):
    return f"CAST({col} AS DECIMAL(18,2))"


def _money_round_expr(rng: random.Random) -> tuple[str, int]:
    """One random money expression and the ROUND scale: at most one
    multiplication (keeps the result inside DECIMAL(37,4) — past 38
    Spark silently REDUCES scale while DuckDB errors, a divergence
    the generated family must stay clear of), +,-,ABS,GREATEST,
    LEAST, CASE."""
    a, b = rng.choice(_DEC_COLS), rng.choice(_DEC_COLS)
    kind = rng.randrange(7)
    if kind == 0:
        e = f"({_dec(a)} + {_dec(b)})"
    elif kind == 1:
        e = f"({_dec(a)} - {_dec(b)})"
    elif kind == 2:
        e = f"({_dec(a)} * {_dec(b)})"
    elif kind == 3:
        e = f"ABS({_dec(a)} - {_dec(b)})"
    elif kind == 4:
        e = f"GREATEST({_dec(a)}, {_dec(b)})"
    elif kind == 5:
        e = f"LEAST({_dec(a)}, {_dec(b)})"
    else:
        lo = rng.randint(1, 40)
        e = (f"(CASE WHEN l_quantity <= {lo} THEN {_dec(a)} "
             f"ELSE {_dec(b)} END)")
    return e, rng.randint(0, 2)


def _money_round_cases():
    rng = random.Random(SEED + 9)
    return [(i, *_money_round_expr(rng)) for i in range(24)]


@pytest.mark.parametrize("i,expr,r", _money_round_cases())
def test_decimal_round_battery_agrees_across_engines(engines, i, expr,
                                                     r):
    """SUM/MIN/MAX of ROUND(<money expr>, r) scaled to integral
    cents: exact decimal arithmetic must agree bit-for-bit (both
    engines ROUND decimals HALF_UP — probed, and pinned below).  The
    final *100 of a ROUND(_, <=2) result is integral, so the BIGINT
    cast cannot hit the truncate-vs-round divergence."""
    spark, con = engines
    cents = f"CAST(ROUND({expr}, {r}) * 100 AS BIGINT)"
    sql = (f"SELECT COUNT(*) AS n, SUM({cents}) AS s, "
           f"MIN({cents}) AS mn, MAX({cents}) AS mx "
           f"FROM fuzz_lineitem WHERE l_orderkey % 7 = {i % 7}")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"case {i}: {expr} r={r}"


_TRYCAST_AGREE = ["42", " 42 ", "+7", "-12", "007", "", "  ", "abc",
                  "4 2", "99999999999999999999", "-2147483648",
                  "2147483647", "2147483648", "NaN", "inf"]


def test_try_cast_battery_agrees_across_engines(engines):
    """TRY_CAST of the agreed string battery to INTEGER / BIGINT /
    DECIMAL(10,2) / DOUBLE matches across engines (trimming, sign,
    leading zeros, overflow→NULL, NaN/inf)."""
    spark, con = engines
    for typ in ["INTEGER", "BIGINT", "DECIMAL(10,2)", "DOUBLE"]:
        sel = ", ".join(f"TRY_CAST('{v}' AS {typ})"
                        for v in _TRYCAST_AGREE)
        got = [repr(x) for x in spark.sql(f"SELECT {sel}").first()]
        want = [repr(x) for x in con.execute(f"SELECT {sel}").fetchone()]
        assert got == want, typ


def test_cast_divergences_pinned(engines):
    """The cast-semantics gaps this repo's oracle policy must never
    step on, pinned so a regression in EITHER engine (or a future
    oracle that forgets) fails loudly:

    - CAST(fractional AS BIGINT): Spark TRUNCATES toward zero,
      DuckDB rounds half-away — the reason every money reduction
      here does ROUND(_, s) to an integral decimal BEFORE the
      integer cast (registry.py determinism contract).
    - TRY_CAST('12.7'/'1e3' AS INTEGER): Spark requires an integral
      string; DuckDB parses-and-rounds.
    - DuckDB accepts '1_000' (digit separators) and '0x1A' (hex)
      where Spark yields NULL.
    """
    spark, con = engines
    for lit, s_want, d_want in [("1.5", 1, 2), ("2.5", 2, 2),
                                ("-1.5", -1, -2)]:
        assert spark.sql(f"SELECT CAST(CAST({lit} AS DOUBLE) "
                         f"AS BIGINT)").first()[0] == s_want
        assert con.execute(f"SELECT CAST(CAST({lit} AS DOUBLE) "
                           f"AS BIGINT)").fetchone()[0] == d_want
    # decimal→int hits the same divergence (Spark truncates)
    assert spark.sql("SELECT CAST(CAST(2.5 AS DECIMAL(5,1)) "
                     "AS BIGINT)").first()[0] == 2
    assert con.execute("SELECT CAST(CAST(2.5 AS DECIMAL(5,1)) "
                       "AS BIGINT)").fetchone()[0] == 3
    for s in ["12.7", "1e3", "1_000", "0x1A"]:
        assert spark.sql(f"SELECT TRY_CAST('{s}' AS INTEGER)") \
            .first()[0] is None
        assert con.execute(f"SELECT TRY_CAST('{s}' AS INTEGER)") \
            .fetchone()[0] is not None
    # both engines ROUND decimals half-UP (away from zero) — the
    # agreement the generated family leans on
    for eng_val in [spark.sql("SELECT ROUND(CAST(0.125 AS "
                              "DECIMAL(10,3)), 2)").first()[0],
                    con.execute("SELECT ROUND(CAST(0.125 AS "
                                "DECIMAL(10,3)), 2)").fetchone()[0]]:
        assert str(eng_val) == "0.13"


# ---------------------------------------------------------------------
# JSON-path extraction family (round 9): random documents from a
# shared generator, random paths, Spark get_json_object vs DuckDB
# json_extract_string — plus the pinned parser divergences.

def _rand_json(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth < 3 and roll < 0.35:
        return {k: _rand_json(rng, depth + 1)
                for k in rng.sample("abcde", rng.randint(1, 3))}
    if depth < 3 and roll < 0.55:
        return [_rand_json(rng, depth + 1)
                for _ in range(rng.randint(0, 3))]
    return rng.choice([
        rng.randint(-1000, 1000),
        round(rng.uniform(-10, 10), rng.randint(0, 4)),
        rng.choice([True, False]),
        None,
        "w" + str(rng.randint(0, 99)),
        "café tab\tend",            # unicode + control escape
    ])


def _rand_path(rng: random.Random) -> str:
    segs = []
    for _ in range(rng.randint(1, 3)):
        segs.append("." + rng.choice("abcde"))
        if rng.random() < 0.3:
            segs.append(f"[{rng.randint(0, 3)}]")
    return "$" + "".join(segs)


def _json_path_cases():
    import json as _json
    rng = random.Random(SEED + 10)
    out = []
    for i in range(40):
        doc = _json.dumps(_rand_json(rng, 0))
        out.append((i, doc, _rand_path(rng)))
    return out


def test_json_path_extraction_agrees_across_engines(engines):
    """40 generated (document, path) pairs in one projection per
    engine: value extraction, object/array re-serialization (both
    engines emit compact JSON), JSON null → SQL NULL, missing keys,
    unicode and control-character unescaping."""
    spark, con = engines
    cases = _json_path_cases()

    def lit(s):
        return s.replace("'", "''")

    sel_s = ", ".join(
        f"get_json_object('{lit(d)}', '{p}')" for _, d, p in cases)
    sel_d = ", ".join(
        f"json_extract_string('{lit(d)}', '{p}')" for _, d, p in cases)
    got = [repr(x) for x in spark.sql(f"SELECT {sel_s}").first()]
    want = [repr(x) for x in con.execute(f"SELECT {sel_d}").fetchone()]
    bad = [(i, d, p, g, w) for (i, d, p), g, w
           in zip(cases, got, want) if g != w]
    assert not bad, bad[:3]


def test_json_path_divergences_pinned(engines):
    """The JSON gaps an oracle must route around, pinned:

    - integers past int64: Spark returns the literal text, DuckDB
      re-serializes through a double ('1e20.0' class loss);
    - escaped quotes INSIDE a string value: Spark's get_json_object
      returns NULL, DuckDB unescapes;
    - negative array indexes and [*] wildcards: DuckDB-only (Spark
      NULL for [-1]; [*] list-typed vs Spark's JSON-text);
    - malformed JSON: Spark yields NULL, DuckDB RAISES — oracle SQL
      over dirty strings needs a json_valid() guard."""
    spark, con = engines
    big = '{"a": 99999999999999999999}'
    assert spark.sql(f"SELECT get_json_object('{big}', '$.a')") \
        .first()[0] == "99999999999999999999"
    assert con.execute(f"SELECT json_extract_string('{big}', '$.a')") \
        .fetchone()[0] == "100000000000000000000.0"
    esc = '{"a": "he said \\"hi\\""}'
    assert spark.sql(f"SELECT get_json_object('{esc}', '$.a')") \
        .first()[0] is None
    assert con.execute(f"SELECT json_extract_string('{esc}', '$.a')") \
        .fetchone()[0] == 'he said "hi"'
    arr = '{"a": [1,2,3]}'
    assert spark.sql(f"SELECT get_json_object('{arr}', '$.a[-1]')") \
        .first()[0] is None
    assert con.execute(f"SELECT json_extract_string('{arr}', "
                       f"'$.a[-1]')").fetchone()[0] == "3"
    assert spark.sql("SELECT get_json_object('not json', '$.a')") \
        .first()[0] is None
    with pytest.raises(Exception):
        con.execute("SELECT json_extract_string('not json', '$.a')")


# ---------------------------------------------------------------------
# RANGE-frame window family (round 9): value-based frames over an
# integer ORDER key — a distinct semantic from the ROWS frames the
# window family already fuzzes (peers enter by VALUE distance, ties
# share a frame), and a shape the trailing-window operators lean on.

def _range_frame_cases():
    rng = random.Random(SEED + 11)
    aggs = ["SUM(l_quantity)", "MIN(l_orderkey)", "MAX(l_orderkey)",
            "COUNT(*)"]
    out = []
    for i in range(15):
        lo, hi = rng.randint(0, 800), rng.randint(0, 800)
        frame = rng.choice([
            f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {hi} FOLLOWING",
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ])
        out.append((i, rng.choice(aggs), frame))
    return out


@pytest.mark.parametrize("i,agg,frame", _range_frame_cases())
def test_range_frame_windows_agree_across_engines(engines, i, agg,
                                                  frame):
    """Value-based frames: the window key is l_partkey (ties are
    real, so peer-inclusion semantics are exercised), partitioned by
    linestatus to keep partitions wide; integer aggregates compare
    exactly via an outer checksum."""
    spark, con = engines
    sql = (f"SELECT COUNT(*) AS n, "
           f"SUM(CAST(w AS BIGINT)) AS s, MIN(w) AS mn, MAX(w) AS mx "
           f"FROM (SELECT {agg} OVER (PARTITION BY l_linestatus "
           f"ORDER BY l_partkey {frame}) AS w "
           f"FROM fuzz_lineitem WHERE l_orderkey % 11 = {i % 11})")
    got = tuple(spark.sql(sql).first())
    want = tuple(con.execute(sql).fetchone())
    assert got == want, f"case {i}: {agg} {frame}"


# ---- round-12 primitive parity: floor(IEEE sqrt) and factorial -----
# The scaled-integer DCT/DFT oracles (phash64, mm_audio_descriptors_bp)
# and the pass@k estimator rest on two cross-engine assumptions:
# (1) floor(sqrt(CAST(x AS DOUBLE))) is bit-identical for any exact
#     int64 ≤ 2^53 — both engines call the correctly-rounded IEEE
#     sqrt, so even where the DOUBLE result differs from exact
#     integer sqrt (k²-1 at k ≈ 2^26 can round UP to k), it differs
#     IDENTICALLY;
# (2) factorial(n) for n ≤ 20 is the exact int64 in both engines.


def test_floor_sqrt_parity_across_engines(engines):
    import random as _r
    spark, con = engines
    rng = _r.Random(20260815)
    vals = ([0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 53) - 1]
            + [(1 << 26) ** 2 - 1, (1 << 26) ** 2]          # k²-1 edge
            + [rng.randrange(1 << 53) for _ in range(200)]
            + [k * k - 1 for k in (rng.randrange(1 << 26)
                                   for _ in range(50))])
    lst = ",".join(str(v) for v in vals)
    ssql = (f"SELECT collect_list(cast(floor(sqrt(cast(v as double)))"
            f" as bigint)) FROM "
            f"(SELECT explode(array({lst})) AS v)")
    got = list(spark.sql(ssql).first()[0])
    want = [r[0] for r in con.execute(
        f"SELECT CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) "
        f"FROM (SELECT UNNEST([{lst}]) AS v)").fetchall()]
    assert got == want
    # parity (above) is the load-bearing claim; divergence from EXACT
    # integer sqrt is allowed — but only ever by the one ulp the
    # k²-1 rounding edge can introduce
    import math
    assert all(abs(g - math.isqrt(v)) <= 1 for v, g in zip(vals, got))


def test_factorial_parity_across_engines(engines):
    spark, con = engines
    import math
    got = list(spark.sql(
        "SELECT collect_list(factorial(v)) FROM "
        "(SELECT explode(sequence(0, 20)) AS v)").first()[0])
    # DuckDB's factorial binds INTEGER only (range yields BIGINT) —
    # which is why the pass@k oracle casts every argument to INT
    want = [r[0] for r in con.execute(
        "SELECT factorial(CAST(v AS INT)) "
        "FROM (SELECT UNNEST(range(0, 21)) AS v)"
    ).fetchall()]
    assert [int(x) for x in got] == [int(x) for x in want] \
        == [math.factorial(n) for n in range(21)]


def test_round12_primitive_divergences_pinned(engines):
    """Cross-engine primitives the round-12 session leans on, pinned
    over randomized inputs in one batch per engine:

    - hex-literal cast: DuckDB ``CAST('0x'||substr(md5(t),1,8) AS
      BIGINT)`` must equal Spark ``conv(substr(md5(t),1,8),16,10)``
      (llm_dsir_score's feature hash);
    - md5-hex minimum: ``array_min``/``list_min`` over md5 hex
      strings agree lexicographically (winnowing's window min);
    - slice clamping: ``slice(a, p, w)``/``a[p:p+w-1]`` both clamp
      past the end (winnowing's boundary windows);
    - signed integral division: ``s div n`` / ``s // n`` truncate
      toward zero in both engines (the integer-Lloyd centroid
      update folds negative coordinate sums)."""
    import random as _r
    spark, con = engines
    rng = _r.Random(20260816)
    toks = ["".join(rng.choice("abcxyz019 _-") for _ in
                    range(rng.randint(1, 12))) for _ in range(60)]
    got = spark.sql(
        "SELECT t, CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)"
        " % 4096 AS f FROM VALUES "
        + ", ".join(f"('{t}')" for t in toks) + " AS v(t)").collect()
    want = con.execute(
        "SELECT t, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)"
        " % 4096 AS f FROM (SELECT UNNEST(["
        + ", ".join(f"'{t}'" for t in toks) + "]) AS t)").fetchall()
    assert sorted((r["t"], r["f"]) for r in got) == \
        sorted(tuple(w) for w in want)

    lists = [[rng.choice(toks) for _ in range(rng.randint(1, 9))]
             for _ in range(40)]

    def lit_s(xs):
        return "array(" + ", ".join(f"'{x}'" for x in xs) + ")"

    def lit_d(xs):
        return "[" + ", ".join(f"'{x}'" for x in xs) + "]"

    for xs in lists:
        p = rng.randint(1, len(xs) + 2)
        w = rng.randint(1, 5)
        g = spark.sql(
            f"SELECT array_min(transform({lit_s(xs)}, x -> md5(x)))"
            f" AS mn, slice(transform({lit_s(xs)}, x -> md5(x)),"
            f" {p}, {w}) AS sl").first()
        wnt = con.execute(
            f"SELECT list_min(list_transform({lit_d(xs)},"
            f" x -> md5(x))) AS mn,"
            f" list_transform({lit_d(xs)}, x -> md5(x))"
            f"[{p}:{p}+{w}-1] AS sl").fetchone()
        assert g["mn"] == wnt[0]
        assert list(g["sl"]) == list(wnt[1])

    pairs = [(rng.randint(-10**9, 10**9), rng.randint(1, 500))
             for _ in range(60)]
    gdiv = spark.sql(
        "SELECT s, n, s div n AS d FROM VALUES "
        + ", ".join(f"({s}, {n})" for s, n in pairs)
        + " AS v(s, n)").collect()
    wdiv = con.execute(
        "SELECT s, n, s // n AS d FROM (VALUES "
        + ", ".join(f"({s}, {n})" for s, n in pairs) + ") AS v(s, n)"
    ).fetchall()
    assert sorted((r["s"], r["n"], r["d"]) for r in gdiv) == \
        sorted(tuple(w) for w in wdiv)
