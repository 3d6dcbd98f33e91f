"""Solo re-measure harness — the bisect protocol SCALE.md's round-11
regression triage used, now checked in: median-of-N (default 5) for
named registry queries in ONE fresh JVM, with a warm-up pass at
sf0.001 and all three host anchors (JVM / Python-worker / disk), so a
suspect query can be compared across git checkouts on one host
without the full 82-query bench.

Usage:
    python tools/solo_measure.py q1 [q2 ...] [--sf DIR] [--n N]

Prints one JSON line: {"queries": {name: {"runs": [...], "median":
s}}, "anchor_sec": ..., "python_anchor_sec": ..., "disk_anchor_sec":
..., "sf": ...}.  Run it from a git worktree of the checkout under
test (the script imports the registry relative to its own repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 5
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]
            i += 2
        elif args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import bench
    from lcmap_blackmagic_spark.registry import QUERIES
    from lcmap_blackmagic_spark.session import get_session

    spark = get_session("lcmap-blackmagic-spark-solo")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": sf, "n": n, "queries": {}}
    # warm-up at the smallest sibling of the measured SF dir if one
    # exists (sf0.001 beside sf0.1), else the measured dir itself —
    # no hardcoded host path
    sib = os.path.join(os.path.dirname(sf.rstrip("/")), "sf0.001")
    warm_sf = sib if os.path.isdir(sib) else sf
    for name in names:
        fn = QUERIES[name]["fn"]
        bench.materialize(fn(spark, warm_sf))            # JVM warm-up
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            bench.materialize(fn(spark, sf))
            runs.append(round(time.monotonic() - t0, 3))
        s = sorted(runs)
        med = s[n // 2] if n % 2 else \
            round((s[n // 2 - 1] + s[n // 2]) / 2, 3)
        out["queries"][name] = {"runs": runs, "median": med}
    # anchors that exist at the checkout under test (disk_anchor_sec
    # only exists from round 11 on)
    for key, fn_name in (("anchor_sec", "host_anchor_sec"),
                         ("python_anchor_sec", "python_anchor_sec"),
                         ("disk_anchor_sec", "disk_anchor_sec")):
        anchor = getattr(bench, fn_name, None)
        if anchor is not None:
            out[key] = anchor(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
