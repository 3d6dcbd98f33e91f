"""Every registry query must hash-match its DuckDB oracle — the local
version of the driver's CORRECTNESS gate (run at sf0.001 for speed;
the driver uses sf0.01)."""

import pytest

from lcmap_blackmagic_spark.registry import QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    if not spec.get("sql"):
        df = spec["fn"](spark, sf_dir)
        assert df.count() >= 0
        return
    n = compare(spark, sf_dir, spec["fn"], spec["sql"], name)
    assert n >= 0
