"""Pins the round-15 winnow skew guard (VERDICT r14 item 5).

The grouped pair expansion must decide the fingerprint df cap with a
cheap COUNT aggregate and drop hot fingerprints BEFORE collect_list —
the r14 form buffered the full posting list of a stop-word-grade
fingerprint into one aggregation buffer and filtered on its size
afterwards, which is memory-unsafe at corpus scale.  Two pins:

- plan shape: a left-semi join on fp sits BELOW the collect_list
  aggregate (so hot postings never reach the list buffer),
- behavior: a fingerprint shared by > WIN_MAXDF docs contributes no
  pairs (identical to the r14 semantics), while a df-2 fingerprint
  group still pairs.
"""

from pyspark.sql import functions as F  # noqa: F401

from lcmap_blackmagic_spark.llm.dedup import (WIN_MAXDF, WIN_T,
                                              winnow_pairs)

# ≥ WIN_K + WIN_W - 1 distinct words so every doc yields ≥ 2 distinct
# fingerprints (enough to clear the WIN_T = 2 pair threshold)
_HOT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_DUP = "one two three four five six seven eight nine ten eleven"


def _fixture(spark):
    rows = [(i, _HOT) for i in range(WIN_MAXDF + 10)]
    rows += [(1000, _DUP), (1001, _DUP)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_fingerprint_dropped_before_collect(spark):
    out = winnow_pairs(_fixture(spark)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    # the hot group (every fp df = WIN_MAXDF + 10 > cap) pairs with
    # nobody; the df-2 group survives with all its shared fps
    assert pairs == {(1000, 1001)}
    n_shared = out[0]["n_shared"]
    assert n_shared >= WIN_T


def test_semi_join_sits_below_the_list_aggregate(spark):
    import re

    df = winnow_pairs(_fixture(spark))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "LeftSemi" in plan, "df cap no longer a pre-collect semi join"
    # operator numbers ascend leaf → output, so the semi join must
    # carry a SMALLER number than the collect_list aggregate (it
    # executes first and bounds what the aggregate buffers)
    m_join = re.search(r"\((\d+)\) \w*Join\w*", plan)
    assert m_join and "LeftSemi" in plan[m_join.start():
                                         m_join.start() + 600]
    m_coll = re.search(
        r"\((\d+)\) ObjectHashAggregate(?:[^(]|\((?!\d+\)))*?"
        r"partial_collect_list", plan, re.S)
    assert m_coll, "collect_list aggregate missing from the plan"
    n_join, n_coll = int(m_join.group(1)), int(m_coll.group(1))
    assert n_join < n_coll, (
        "collect_list runs below the semi join — hot postings would "
        "be buffered before the df cap applies")
    # and the aggregate reuses the join's fp partitioning: no
    # Exchange between the two (the posting data crosses the wire
    # exactly once)
    between = [int(n) for n in re.findall(r"\((\d+)\) Exchange", plan)
               if n_join < int(n) < n_coll]
    assert not between, (
        f"Exchange {between} between the df-cap semi join and the "
        "collect_list aggregate — the posting shuffle is paid twice")
