"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet, canonicalize the
way the driver does (through pandas), and compare.

Faithfulness notes (hardened after round 1, where lenient local
comparison hid two driver reds):

* Both sides go through pandas (`toPandas()` / `.df()`), so DuckDB
  HUGEINT becomes float64 here exactly as it does in the driver — an
  int64-vs-float64 type mismatch FAILS locally now.
* Values are compared type-strictly: int 42 != float 42.0.
* list / ndarray cells raise TypeError (the driver's pandas hash
  cannot canonicalize them) — queries must stringify or explode
  array outputs.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("f", round(float(v), 9))
    if isinstance(v, datetime.datetime):
        # DuckDB's .df() widens DATE to midnight datetime64; treat a
        # tz-naive midnight timestamp as the date it canonicalizes from
        if (v.tzinfo is None and v.hour == 0 and v.minute == 0
                and v.second == 0 and v.microsecond == 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # the driver's own compare normalizes list cells to tuples of
        # normalized elements (its rows come from collect()/fetchall(),
        # not pandas) — mirror it, so array-valued outputs like
        # mm_extract_features' feat column are hash-checkable here too
        return tuple(_norm(x) for x in v)
    if isinstance(v, (str, bytes)):
        return v
    if hasattr(v, "ndim") and getattr(v, "ndim") > 0:  # numpy array
        return tuple(_norm(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if v != v:  # pandas NaT / NA
        return None
    if hasattr(v, "to_pydatetime"):
        return _norm(v.to_pydatetime())
    return str(v)


def _canon(df):
    """Driver-style canonicalization: lower-case the columns, order
    columns by name, normalize every cell type-strictly, sort rows."""
    cols = [c.lower() for c in df.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = df.itertuples(index=False, name=None)
    out = [tuple(_norm(r[i]) for i in order) for r in raw]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x))
                                 for x in t))
    return [cols[i] for i in order], out


def compare(spark, sf_dir: str, fn, sql: str, name: str = "?"):
    sdf = fn(spark, sf_dir)
    s_pd = sdf.toPandas()

    con = duckdb_con(sf_dir)
    d_pd = con.execute(sql).df()
    con.close()

    s_cols = sorted(c.lower() for c in s_pd.columns)
    d_cols = sorted(c.lower() for c in d_pd.columns)
    assert s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}")
    assert len(s_pd) == len(d_pd), (
        f"{name}: rowcount mismatch spark={len(s_pd)} duckdb={len(d_pd)}")

    _, s_norm = _canon(s_pd)
    _, d_norm = _canon(d_pd)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, (
            f"{name}: first row mismatch at sorted index {i}:\n"
            f"  spark : {a}\n  duckdb: {b}")
    return len(s_pd)
