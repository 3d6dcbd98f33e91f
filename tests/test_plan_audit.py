"""Whole-registry physical-plan audit: EVERY registered query's plan
is swept for the anti-patterns that kill 100 TB runs, not just the
handful with hand-written guards in test_plan_shapes.py.

Rules:
- no CartesianProduct, ever (broadcast NLJ over a tiny side is fine
  and appears as BroadcastNestedLoopJoin instead);
- no row-at-a-time Python UDF (BatchEvalPython) — Python is allowed
  only through Arrow (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas), which the multimodal / detect / pack
  operators legitimately use.

An explicit allowlist documents any exception; additions to it should
be argued in the PR, not silently accumulated.
"""

import pytest

from lcmap_blackmagic_spark.registry import QUERIES

# queries whose plan legitimately contains a normally-banned node
CARTESIAN_OK: set[str] = set()
ROW_UDF_OK: set[str] = {
    # the Spark 4 Python UDTF surface demo: its whole point is the
    # table-function API (BatchEvalPythonUDTF); the DECLARATIVE twin
    # of the same operator is llm_chunk (one Generate, no Python)
    "udtf_chunks",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_udf(spark, sf_dir, name):
    df = QUERIES[name]["fn"](spark, sf_dir)
    plan = _plan(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, \
            f"{name}: CartesianProduct in physical plan"
    if name not in ROW_UDF_OK:
        assert "BatchEvalPython" not in plan, \
            f"{name}: row-at-a-time Python UDF in physical plan"
