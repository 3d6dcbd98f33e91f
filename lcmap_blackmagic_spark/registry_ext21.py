"""Twenty-second extension wave (round 14) — the IVF-PQ accuracy
story, measured instead of argued:

- ``llm_ann_recall_clustered``: recall@k of the EXISTING IVF-PQ
  index (same parameters as ``llm_ann_ivfpq_exact``) over a
  deterministic CLUSTERED embedding fixture.  Round 13 shipped the
  recall harness and honestly reported ~3% @k=3 on the near-uniform
  synthetic embeddings — the known worst case for quantized indexes
  (Jégou et al. 2011 §V evaluate on structured corpora for the same
  reason).  The claim "on clustered real-world embeddings the same
  parameters recover most of the ordering" was prose; this entry
  pins it as a measurement.
- ``llm_ann_ivfpq_resid``: the residual-encoding IVF-PQ variant
  (FAISS by_residual=True) on the standard embeddings table — PQ
  codebooks fit on x − coarse_centroid(x), so 8 codewords per
  subspace only span a cell's spread, not the whole space.
- ``llm_ann_recall_resid``: recall of the residual index on the
  same clustered fixture — the paired measurement showing residual
  encoding is never worse at the same probe budget (pinned by
  tests/test_ann_clustered.py).
- ``llm_ann_recall_refine``: exact re-ranking of the ADC shortlist
  (FAISS IndexRefine), completing the measured accuracy ladder —
  quantization misses are recoverable by better codes OR exact
  re-ranking (both 8666 → 9333 bp); what remains is the
  coarse-coverage ceiling only more probes can move.

The clustered fixture derives from the EXISTING embeddings table
(row count scales with SF) using only md5 arithmetic both engines
replay bit-identically: vectors come in GROUPS of 4 consecutive
vec_ids; each group gets a center drawn per-dimension from
md5("gc:<gid>:<j>") in [-1000, 1000], and each vector adds
per-dimension noise from md5("n:<vec_id>:<j>") in [-CLU_NOISE,
CLU_NOISE].  Tight groups far apart is exactly the neighbor
structure real embedding corpora have (the structure SemDeDup
exploits) and what "my nearest neighbors are meaningfully closer
than the bulk" means; the uniform fixture is its absence.

Reference anchor: nothing in lcmap-blackmagic — ANN is the engine's
own first-class addition (brief §LLM-ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t
from .registry_ext20 import (PQ_REFINE, _sql_ann_recall,
                             _sql_ivfpq_exact, recall_of)

CLU_GROUP = 4      # vectors per near-dup group (vec_id div 4)
CLU_SPAN = 2001    # center coordinates in [-1000, 1000]
CLU_NOISE = 450    # per-dim noise in [-450, 450]
CLU_DIM = 64       # = IVX_DIM
# CLU_NOISE was swept at sf0.01 (see SCALE.md round 14): 150/300 →
# both indexes saturate at 10000 bp (uninformative); 450 → plain
# 8666 bp vs residual 9333 bp — clusters still unambiguous (group
# radius² ≈ 8.6M vs inter-group ≈ 42.7M) but the codebooks are
# stressed enough that residual encoding's finer codewords are
# VISIBLE in the measurement, not just argued.


def _h48(col):
    """48-bit integer from an md5 hex prefix — the repo's standard
    cross-engine deterministic hash (identical hex in Spark and
    DuckDB; 48 bits stay exact through conv/CAST)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def clustered_embeddings(spark, sf_dir):
    """(vec_id, qa) integer frame: group center + per-vector noise,
    derived from the embeddings table's vec_ids only (row count — and
    therefore index pressure — scales with SF)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id")
    gid = F.expr(f"vec_id div {CLU_GROUP}").cast("string")
    vid = F.col("vec_id").cast("string")

    def coord(j):
        js = j.cast("string")
        center = (_h48(F.concat(F.lit("gc:"), gid, F.lit(":"), js))
                  % CLU_SPAN - (CLU_SPAN - 1) // 2)
        noise = (_h48(F.concat(F.lit("n:"), vid, F.lit(":"), js))
                 % (2 * CLU_NOISE + 1) - CLU_NOISE)
        return center + noise

    return e.select(
        "vec_id",
        F.transform(F.sequence(F.lit(1), F.lit(CLU_DIM)),
                    coord).alias("qa"))


# DuckDB twin of clustered_embeddings — inlined as the IVF-PQ
# oracle's src (qs_scale=None: qa is already integer)
SQL_CLU_SRC = (
    "(SELECT vec_id, list_transform(generate_series(1, "
    f"{CLU_DIM}), j -> "
    "(CAST('0x' || substr(md5('gc:' || (vec_id // "
    f"{CLU_GROUP}) || ':' || j), 1, 12) AS BIGINT) "
    f"% {CLU_SPAN} - {(CLU_SPAN - 1) // 2})"
    " + (CAST('0x' || substr(md5('n:' || vec_id || ':' || j), 1, 12) "
    f"AS BIGINT) % {2 * CLU_NOISE + 1} - {CLU_NOISE})) AS qa "
    "FROM embeddings)")


def q_llm_ann_recall_clustered(spark, sf_dir):
    """Recall@k of the standard (non-residual) IVF-PQ index on the
    clustered fixture — same IVX_*/PQ_* parameters, same probe
    budget, same exact-ground-truth protocol as ``llm_ann_recall``;
    only the corpus geometry changes.  The coarse quantizer keeps a
    group's members in one cell (group radius ≪ cell size), the
    query's own cell is always probed, and inter-group code
    collisions are rare across 8 subspaces — so the measured recall
    is dominated by real neighbor structure, not tie-break luck.
    See tests/test_ann_clustered.py for the pinned uniform-vs-
    clustered gap."""
    return recall_of(spark, sf_dir, source_fn=clustered_embeddings,
                     staging_key="ivfpq_clu_arr")


def q_llm_ann_recall_resid(spark, sf_dir):
    """Recall@k of the RESIDUAL IVF-PQ index on the clustered
    fixture — the paired measurement for ``llm_ann_ivfpq_resid``:
    at the same probe budget, quantizing x − coarse_centroid(x) must
    never rank worse than quantizing x (the codebooks describe a
    cell's spread instead of the whole space)."""
    return recall_of(spark, sf_dir, source_fn=clustered_embeddings,
                     staging_key="ivfpq_clu_arr", residual=True)


def q_llm_ann_recall_refine(spark, sf_dir):
    """Recall@k of the PLAIN IVF-PQ index plus exact re-ranking of
    the top PQ_REFINE ADC candidates (FAISS IndexRefine) on the
    clustered fixture — the third standard accuracy knob, measured.
    Refinement re-ranks a query's OWN candidate set by exact
    distance, so per query it can only add hits (the inequality
    tests/test_ann_clustered.py pins); on this fixture it recovers
    every one of the plain index's ADC-ranking misses: 8666 bp →
    9333 bp, the same ceiling residual encoding reaches.  9333 is
    the COARSE-COVERAGE ceiling — the remaining misses are true
    neighbors in unprobed cells (at noise ±450 a group can straddle
    a cell boundary), which no encoding or re-ranking can recover at
    IVX_PROBE=2; measured directly: residual+refine also lands on
    9333 bp.  The complete measured ladder at one probe budget:
    quantization misses (plain 8666) are recoverable by better codes
    (residual 9333) OR by exact re-ranking (refine 9333); coverage
    misses need more probes.  Per query the exact work is PQ_REFINE
    distances, not |corpus|."""
    return recall_of(spark, sf_dir, source_fn=clustered_embeddings,
                     staging_key="ivfpq_clu_arr", refine=PQ_REFINE)


def q_llm_ann_recall_probe4(spark, sf_dir):
    """Recall@k at a DOUBLED probe budget (IVX_PROBE 2 → 4) with
    exact re-ranking, on the clustered fixture — the measured proof
    of the coverage-ceiling diagnosis: the misses that survive every
    encoding/re-ranking improvement at probe=2 are true neighbors in
    unprobed cells, and only probing more cells moves them.  The
    full measured ladder (sf0.01, refine=12): probe 1 → 7000 bp,
    2 → 9333, 4 → 9667, 8 (all cells) → 10000 — graceful, monotone
    degradation toward exact search, the operating curve an ANN
    deployment tunes against.  Work scales linearly with probe: the
    candidate join fans out to probe/IVX_CELLS of the corpus per
    query."""
    from .registry_ext20 import PQ_REFINE
    return recall_of(spark, sf_dir, source_fn=clustered_embeddings,
                     staging_key="ivfpq_clu_arr", refine=PQ_REFINE,
                     probe=4)


def q_llm_ann_ivfpq_resid(spark, sf_dir):
    """Residual-encoding IVF-PQ top-k on the standard embeddings
    table — ``llm_ann_ivfpq_exact`` with by_residual=True; see
    ``_ivfpq_topk``'s docstring for the exact plan delta (codebooks
    fit on residuals; per-(query, probed-cell) distance tables)."""
    from .registry_ext20 import _ivfpq_topk
    return _ivfpq_topk(spark, sf_dir, residual=True)


QUERIES_EXT21: dict[str, dict] = {
    "llm_ann_ivfpq_resid": {
        "fn": q_llm_ann_ivfpq_resid,
        "sql": _sql_ivfpq_exact(residual=True)},
    "llm_ann_recall_clustered": {
        "fn": q_llm_ann_recall_clustered,
        "sql": _sql_ann_recall(src=SQL_CLU_SRC, qs_scale=None)},
    "llm_ann_recall_resid": {
        "fn": q_llm_ann_recall_resid,
        "sql": _sql_ann_recall(src=SQL_CLU_SRC, qs_scale=None,
                               residual=True)},
    "llm_ann_recall_refine": {
        "fn": q_llm_ann_recall_refine,
        "sql": _sql_ann_recall(src=SQL_CLU_SRC, qs_scale=None,
                               refine=PQ_REFINE)},
    "llm_ann_recall_probe4": {
        "fn": q_llm_ann_recall_probe4,
        "sql": _sql_ann_recall(src=SQL_CLU_SRC, qs_scale=None,
                               refine=PQ_REFINE, probe=4)},
}
