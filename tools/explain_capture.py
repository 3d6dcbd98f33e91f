"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit beside the bench numbers.

Usage:
    python tools/explain_capture.py --tag r14 --suffix before q1 [q2 ...]

Notes: building a pipeline query's DataFrame executes its staging
writes / model collects (that is the query contract), so this tool
does real work for those entries; run it on a quiet host.  The
captured text is the FINAL DataFrame's formatted physical plan.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    tag, suffix, sf = "r14", "before", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from lcmap_blackmagic_spark.registry import QUERIES
    from lcmap_blackmagic_spark.session import get_session

    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("lcmap-blackmagic-spark-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name]["fn"](spark, sf)
        plan = _formatted_plan(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


def _formatted_plan(df) -> str:
    """df.explain('formatted') as a string, without reaching into
    JVM internals when avoidable: prefer capturing explain()'s
    stdout (public API, works under Spark Connect), fall back to
    the classic py4j path on any failure (ADVICE r14)."""
    import contextlib
    import io
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        if text.strip():
            return text
    except Exception:  # noqa: BLE001 — fall back to the py4j path
        pass
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


if __name__ == "__main__":
    main()
