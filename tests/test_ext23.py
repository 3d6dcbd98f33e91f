"""Scheduling operators (registry_ext23): line-level corpus rewrite,
multi-epoch shuffle schedule, curriculum tiers.  Value parity with
DuckDB is covered by tests/test_oracle_parity.py; these pin the
SEMANTIC properties — a pure-Python independent recompute of the
line-dedup rewrite (a second oracle that shares nothing with either
engine's SQL), permutation/contiguity of the shuffle schedule, and
tie-collapsed tier monotonicity."""

import collections

import pytest
from pyspark.sql import functions as F

import lcmap_blackmagic_spark.registry  # noqa: F401  (import order)
from lcmap_blackmagic_spark.registry_ext23 import (
    CURR_TIERS, EPOCHS, LINE_MAXOCC, LINE_W, SHUFFLE_SHARDS,
    q_llm_curriculum, q_llm_epoch_shuffle, q_llm_line_dedup)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").collect()}


def _python_line_dedup(docs: dict) -> dict:
    """Independent reference: segment, count, excise, reassemble —
    pure Python, no SQL in common with either engine."""
    segs_by_doc = {}
    counts = collections.Counter()
    for did, text in docs.items():
        toks = text.strip().lower().split(" ")
        segs = [" ".join(toks[i:i + LINE_W])
                for i in range(0, len(toks), LINE_W)]
        segs_by_doc[did] = segs
        counts.update(segs)
    out = {}
    for did, segs in segs_by_doc.items():
        kept = [s for s in segs if counts[s] < LINE_MAXOCC]
        out[did] = (len(segs), len(kept), " ".join(kept))
    return out


def test_line_dedup_matches_python_reference(spark, sf_dir, docs):
    want = _python_line_dedup(docs)
    got = {r["doc_id"]: (r["n_segs"], r["n_kept"], r["cleaned"])
           for r in q_llm_line_dedup(spark, sf_dir).collect()}
    assert got == want


def test_line_dedup_actually_removes_boilerplate(spark, sf_dir):
    rows = q_llm_line_dedup(spark, sf_dir).collect()
    assert all(r["n_kept"] <= r["n_segs"] for r in rows)
    # the fixtures DO contain hot segments — the rewrite must bite
    assert any(r["n_kept"] < r["n_segs"] for r in rows)
    # intact docs reassemble to their normalized text exactly
    full = [r for r in rows if r["n_kept"] == r["n_segs"]]
    assert full, "expected some untouched documents"


def test_epoch_shuffle_is_a_permutation_per_epoch(spark, sf_dir):
    rows = q_llm_epoch_shuffle(spark, sf_dir).collect()
    n_docs = len({r["doc_id"] for r in rows})
    by_epoch = collections.defaultdict(list)
    for r in rows:
        by_epoch[r["epoch"]].append(r)
    assert sorted(by_epoch) == list(range(EPOCHS))
    orders = []
    for ep, rs in by_epoch.items():
        # every doc exactly once per epoch
        assert sorted(r["doc_id"] for r in rs) == sorted(
            set(r["doc_id"] for r in rs))
        assert len(rs) == n_docs
        # positions contiguous 1..k within every shard
        shard = collections.defaultdict(list)
        for r in rs:
            assert r["shard"] == r["shuffle_key"] % SHUFFLE_SHARDS
            shard[r["shard"]].append(r["pos"])
        for poss in shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        orders.append(tuple(r["doc_id"] for r in sorted(
            rs, key=lambda r: (r["shard"], r["pos"]))))
    # epochs genuinely reshuffle (keys differ ⇒ orders differ)
    assert len(set(orders)) == EPOCHS


def test_curriculum_tiers_are_monotone_in_length(spark, sf_dir):
    rows = q_llm_curriculum(spark, sf_dir).collect()
    assert {r["tier"] for r in rows} <= set(range(CURR_TIERS))
    by_tok = sorted(rows, key=lambda r: r["tok"])
    tiers = [r["tier"] for r in by_tok]
    assert tiers == sorted(tiers), "tier must be monotone in tok"
    # ties share a tier (collapsed rank)
    tier_of_tok = {}
    for r in rows:
        tier_of_tok.setdefault(r["tok"], set()).add(r["tier"])
    assert all(len(s) == 1 for s in tier_of_tok.values())
    # sizes balanced up to tie-group slack
    n = len(rows)
    sizes = collections.Counter(r["tier"] for r in rows)
    max_tie = max(collections.Counter(
        r["tok"] for r in rows).values())
    for t in range(CURR_TIERS):
        assert abs(sizes[t] - n / CURR_TIERS) <= max_tie
