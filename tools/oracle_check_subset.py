"""Driver-parity oracle check for a NAMED SUBSET of registry queries
— the per-change verification loop of the optimization rounds
(tools/local_correctness.py covers the full registry; this reuses its
exact compare for fast iteration on the queries a change touched).

Usage: python tools/oracle_check_subset.py [--sf DIR] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.local_correctness import TABLES, _rows  # noqa: E402


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.memory", "16g")
             .getOrCreate())          # vanilla on purpose (driver parity)
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs, osql = m.queries(), m.oracle_sql()
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        scols = sdf.columns
        srows = _rows(scols, [tuple(r) for r in sdf.collect()])
        if name not in osql:
            print(f"{name}: rows_only ({len(srows)} rows)")
            continue
        res = con.execute(osql[name])
        dcols = [c[0] for c in res.description]
        drows = _rows(dcols, res.fetchall())
        ok = (srows == drows and sorted(scols) == sorted(dcols))
        print(f"{name}: {'HASH-MATCH' if ok else 'MISMATCH'} "
              f"({len(srows)} vs {len(drows)} rows)")
        if not ok:
            bad += 1
            for k in range(min(3, len(srows))):
                if k < len(drows) and srows[k] != drows[k]:
                    print("  spark :", srows[k])
                    print("  oracle:", drows[k])
                    break
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
