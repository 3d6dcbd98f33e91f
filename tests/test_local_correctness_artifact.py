"""LOCAL_CORRECTNESS.json — the full-registry correctness artifact at
the DRIVER's scale factor (sf0.01), generated per round by
tools/local_correctness.py.  The driver gate samples the same 50
queries every round; this artifact covers the other ~150 at the same
SF with the same rows/schema/hash contract.  Spark-free: pure
artifact-shape checks, so adding a query without regenerating the
artifact fails fast."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact():
    p = os.path.join(REPO, "LOCAL_CORRECTNESS.json")
    assert os.path.exists(p), (
        "LOCAL_CORRECTNESS.json missing — run "
        "`python tools/local_correctness.py` and commit the result")
    with open(p) as fh:
        return json.load(fh)


def test_every_registry_key_appears():
    import sys
    sys.path.insert(0, REPO)
    from lcmap_blackmagic_spark.registry import QUERIES
    art = _artifact()
    assert sorted(art["queries"]) == sorted(QUERIES), (
        "registry changed since the artifact was generated — rerun "
        "tools/local_correctness.py")


def test_artifact_is_clean():
    art = _artifact()
    assert art["n_err"] == 0, {n: r["err"] for n, r in
                               art["queries"].items() if r["err"]}
    bad = [n for n, r in art["queries"].items()
           if r["rows_match"] not in (True, "rows_only")
           or (r["rows_match"] is True and not r["hash_match"])]
    assert not bad, bad
    # every rows-only entry actually has no oracle in the registry
    import sys
    sys.path.insert(0, REPO)
    from lcmap_blackmagic_spark.registry import QUERIES
    for n, r in art["queries"].items():
        if r["rows_match"] == "rows_only":
            assert QUERIES[n].get("sql") is None, n
