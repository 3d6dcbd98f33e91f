"""Twenty-first extension wave (round 13) — semantic dedup as a
first-class composed pipeline, under the full correctness gate:

- ``llm_semdedup``: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-
  efficient learning at web-scale through semantic deduplication")
  composed from this repo's own operators: integer k-means cells
  (ml/intlloyd — the same bit-exact Lloyd the exact-replay IVF
  runs) → WITHIN-CELL cosine near-dup pairs → keep-earliest
  representative selection → per-stage survival funnel.  The
  standard second dedup pass in public LLM-corpus pipelines
  (after MinHash lexical dedup — ``llm_curation``'s stage 2),
  exercising the IVF cells at their real job.

Reference anchor: nothing in lcmap-blackmagic — corpus curation is
the engine's own first-class addition (brief §LLM-ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

# ------------------------------------------------- SemDeDup ---------

# constants + shared building blocks live in llm/semdedup.py (shared
# with the streaming ingest twin, streaming/jobs.semdedup_stream)
from .llm.semdedup import (SEM_CELLS, SEM_DIM,  # noqa: E402,F401
                           SEM_ITERS, SEM_QS, SEM_TAU2_BP, quantize,
                           sem_cond)


def q_llm_semdedup(spark, sf_dir):
    """SemDeDup survival funnel — cluster, dedup within cluster, keep
    one representative — with every stage integer-exact so the WHOLE
    pipeline carries a composed DuckDB oracle:

      1. quantize embeddings by floor(x·2^10) (exact on doubles) and
         fit SEM_CELLS integer-Lloyd cells (ml/intlloyd: seeds are
         the vec_ids below SEM_CELLS — dense testdata ids — argmin
         exact squared-L2 with tie → smaller cell, ``sum div count``
         centroid updates, SEM_ITERS unrolled iterations),
      2. enumerate WITHIN-CELL pairs (a < b by vec_id) with cosine ≥
         τ, decided integer-exactly: dot ≥ 0 AND dot²·10⁴ ≥
         τ²bp·|a|²·|b|² — the products exceed int64 (dot² ≤ 2^52,
         ×10⁴ ≈ 4.5e19) so BOTH engines compare in wide integers
         (Spark DECIMAL(38,0), DuckDB HUGEINT); zero-norm vectors
         are excluded up front (NaN cosine orders differently
         across engines),
      3. keep-earliest representatives: drop b iff ANY same-cell
         a < b has cosine ≥ τ (the deterministic ε-ball rule —
         an anti-join on the pair table, no iterative components),
      4. emit the survival funnel: vectors → occupied cells →
         dup pairs → survivors.

    Scale shape — the SemDeDup argument: pair work is bounded
    WITHIN cells, Σ_c n_c·(n_c−1)/2, never a global all-pairs; at
    corpus scale SEM_CELLS grows ∝ N (the paper runs 110k clusters
    for 5B docs) so per-cell population — and therefore per-cell
    pair fan-out — stays a constant target, and the pair join is an
    equi-join on cell that AQE splits on skewed (hot-cell) keys.
    The Lloyd fit itself never shuffles the corpus: per iteration
    one (cell, dim) rollup of SEM_CELLS·SEM_DIM rows; the centroid
    table is a model constant (collect-audit-allowlisted).  The
    within-cell self-join re-reads the CHECKPOINTED quantized table
    (one lazy materialization inside the single final action — the
    r15 collect-free form; the r14 parquet staging paid a blocking
    write+read job for the same reuse), so the funnel is one
    hash-checked query, not four."""
    from .llm.semdedup import assign_cells, dot_over
    from .ml.intlloyd import integer_lloyd

    e = _t(spark, sf_dir, "embeddings")
    # lazy checkpoint instead of the r14 parquet staging — the
    # quantized table materializes under the Lloyd seed collect and
    # every later consumer reads its blocks (no write+read jobs)
    arrq = quantize(e).localCheckpoint(eager=False)

    cents = integer_lloyd(arrq, SEM_CELLS, SEM_ITERS, SEM_DIM)
    # 3 consumers (both pair sides + funnel) — lazy: materialized by
    # the caller's one action, reused from blocks thereafter
    vecs = assign_cells(arrq, cents).localCheckpoint(eager=False)

    a = vecs.select(F.col("vec_id").alias("ai"), F.col("qa").alias("aq"),
                    "cell", F.col("n2").alias("a2"))
    b = vecs.select(F.col("vec_id").alias("bi"), F.col("qa").alias("bq"),
                    "cell", F.col("n2").alias("b2"))
    cand = (a.join(b, "cell").filter(F.col("ai") < F.col("bi"))
            .select("ai", "bi", "a2", "b2",
                    dot_over("aq", "bq").alias("dot")))
    pairs = (cand.filter(sem_cond(F.col("dot"), F.col("a2"),
                                  F.col("b2"), SEM_TAU2_BP))
             # 2 consumers: funnel + drop set — lazy (same rationale)
             .localCheckpoint(eager=False))
    dropped = pairs.select(F.col("bi").alias("vec_id")).distinct()
    survivors = vecs.join(dropped, "vec_id", "left_anti")

    def stage(i, name, df):
        return df.agg(F.lit(i).alias("stage_id"),
                      F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n"))

    cells = vecs.select("cell").distinct()
    return (stage(1, "vectors", vecs)
            .unionByName(stage(2, "cells", cells))
            .unionByName(stage(3, "dup_pairs", pairs))
            .unionByName(stage(4, "survivors", survivors))
            .orderBy("stage_id"))


def _sql_sem_parts(prefix: str = "", src: str = "embeddings",
                   seed_smallest: bool = False) -> list[str]:
    """The composable DuckDB SemDeDup block: quantize + Lloyd (from
    ml/intlloyd) + final assignment (``<p>af``) + within-cell pairs
    above τ (``<p>pr``) + keep-earliest drop set (``<p>dr``).  With
    the default prefix this is exactly the standalone llm_semdedup
    oracle's prefix; llm_curation_sem composes it (prefix 's') over
    the lexical-dedup survivors."""
    from .ml.intlloyd import sql_l2, sql_lloyd_ctes
    p = prefix
    gs = f"generate_series(1, {SEM_DIM})"
    parts, prev = sql_lloyd_ctes(SEM_CELLS, SEM_ITERS, SEM_DIM,
                                 SEM_QS, src=src, prefix=p,
                                 seed_smallest=seed_smallest)
    parts.append(
        f"{p}af AS MATERIALIZED (SELECT vec_id, qa, cid, n2 FROM ("
        f"SELECT v.vec_id, v.qa, c.cid, "
        f"list_sum(list_transform(v.qa, x -> x * x)) AS n2, "
        f"ROW_NUMBER() OVER (PARTITION BY v.vec_id "
        f"ORDER BY {sql_l2(gs, 'v', 'c')}, c.cid) AS rn "
        f"FROM {p}q v, {prev} c) WHERE rn = 1 AND n2 > 0)")
    dot = f"list_sum(list_transform({gs}, i -> a.qa[i] * b.qa[i]))"
    parts.append(
        f"{p}pr AS MATERIALIZED (SELECT ai, bi FROM ("
        f"SELECT a.vec_id AS ai, b.vec_id AS bi, {dot} AS dot, "
        f"a.n2 AS a2, b.n2 AS b2 "
        f"FROM {p}af a JOIN {p}af b ON a.cid = b.cid "
        f"AND a.vec_id < b.vec_id)"
        f" WHERE dot >= 0 AND CAST(dot * dot AS HUGEINT) * 10000 >= "
        f"CAST(a2 * b2 AS HUGEINT) * {SEM_TAU2_BP})")
    parts.append(f"{p}dr AS (SELECT DISTINCT bi AS vec_id FROM {p}pr)")
    return parts


def _sql_semdedup() -> str:
    parts = _sql_sem_parts()
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT 1 AS stage_id, 'vectors' AS stage, "
            "COUNT(*) AS n FROM af\n"
            "UNION ALL SELECT 2, 'cells', COUNT(DISTINCT cid) FROM af\n"
            "UNION ALL SELECT 3, 'dup_pairs', COUNT(*) FROM pr\n"
            "UNION ALL SELECT 4, 'survivors', COUNT(*) FROM af "
            "WHERE vec_id NOT IN (SELECT vec_id FROM dr)\n"
            "ORDER BY stage_id")


SQL_LLM_SEMDEDUP = _sql_semdedup()


# --------------------------- curation with the semantic second pass -

def q_llm_curation_sem(spark, sf_dir):
    """END-TO-END modern corpus curation — ``llm_curation``'s lexical
    pipeline with the SEMANTIC second dedup pass public LLM-corpus
    pipelines run after MinHash (the SemDeDup position):

      1. quality cut (token count in [CURATE_TOK_MIN, CURATE_TOK_MAX]),
      2. lexical near-dup dedup: MinHash LSH pairs → connected
         components → one representative per cluster,
      3. SEMANTIC dedup over the lexical survivors: their embeddings
         (vec_id = doc_id) quantized, clustered with subset-safe
         integer Lloyd (seed_smallest — survivor ids are not dense),
         within-cell cosine ≥ τ keep-earliest, flagged docs dropped;
         docs with no embedding row (or a zero-norm one) pass through
         — no vector, no semantic evidence,
      4. decontamination: drop survivors sharing any word 5-gram with
         the 'src0' benchmark split.

    Emits the 5-stage survival funnel (docs + tokens).  Every stage
    is integer-exact, so the WHOLE pipeline carries one composed
    DuckDB oracle (the lexical block is llm_curation's; the semantic
    block is llm_semdedup's, namespaced and re-pointed at the
    survivor subset).  Scale shape: inherits each stage's argued
    shape — banded MinHash, within-cell pairs only, broadcast
    benchmark grams; the new joins are all keyed by doc id."""
    from pyspark.sql import Window

    from .llm.dedup import (dedup_components, minhash_pairs_staged,
                            shingles)
    from .llm.semdedup import assign_cells, dot_over
    from .ml.intlloyd import integer_lloyd
    from .registry import _staging
    from .registry_pipelines import CURATE_TOK_MAX, CURATE_TOK_MIN
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.trim("text")), " "))
    q = (d.withColumn("n_tok", ntok.cast("bigint"))
         .filter(ntok.between(CURATE_TOK_MIN, CURATE_TOK_MAX)))

    pairs = minhash_pairs_staged(
        q, _staging(sf_dir, "curation_sem_minhash"), threshold=0.2)
    comp = dedup_components(pairs, q.select("doc_id"))
    sized = comp.join(q.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"),
                                                "doc_id")
    # rep_ids feeds THREE consumers (the semantic subset join, the
    # dedup funnel row via repd, and the survivors' base) — the
    # llm_curation checkpoint argument verbatim
    rep_ids = (sized.select("doc_id", F.row_number().over(w).alias("rn"))
               .filter(F.col("rn") == 1).select("doc_id")
               # lazy (r15): all three consumers sit inside the one
               # final action — blocks persist at first touch there
               .localCheckpoint(eager=False))
    repd = q.join(rep_ids, "doc_id")

    emb = (_t(spark, sf_dir, "embeddings")
           .join(rep_ids.select(F.col("doc_id").alias("vec_id")),
                 "vec_id"))
    # lazy checkpoint replaces the r14 parquet staging (see
    # q_llm_semdedup) — the survivor-subset quantized table
    # materializes under the Lloyd seed collect (which also pulls
    # rep_ids' blocks into existence) and is reused by both pair
    # sides from blocks
    arrq = quantize(emb).localCheckpoint(eager=False)
    cents = integer_lloyd(arrq, SEM_CELLS, SEM_ITERS, SEM_DIM,
                          seed_smallest=True)
    vecs = assign_cells(arrq, cents).localCheckpoint(eager=False)
    a = vecs.select(F.col("vec_id").alias("ai"),
                    F.col("qa").alias("aq"), "cell",
                    F.col("n2").alias("a2"))
    b = vecs.select(F.col("vec_id").alias("bi"),
                    F.col("qa").alias("bq"), "cell",
                    F.col("n2").alias("b2"))
    dropped = (a.join(b, "cell").filter(F.col("ai") < F.col("bi"))
               .filter(sem_cond(dot_over("aq", "bq"), F.col("a2"),
                                F.col("b2"), SEM_TAU2_BP))
               .select(F.col("bi").alias("doc_id")).distinct())
    semd = repd.join(dropped, "doc_id", "left_anti")

    corpus = semd.filter(F.col("source") != "src0")
    bench = (q.filter(F.col("source") == "src0")
             .select(F.explode(shingles("text", 5)).alias("g"))
             .distinct())
    cont = (corpus.select("doc_id",
                          F.explode(shingles("text", 5)).alias("g"))
            .join(F.broadcast(bench), "g").select("doc_id").distinct())
    clean = corpus.join(cont, "doc_id", "left_anti")

    def stage(i, name, df):
        return df.agg(F.lit(i).alias("stage_id"),
                      F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.size(F.split(F.lower(F.trim("text")), " "))
                            .cast("bigint")).alias("n_tokens"))

    return (stage(1, "start", d)
            .unionByName(stage(2, "quality", q.drop("n_tok")))
            .unionByName(stage(3, "dedup", repd))
            .unionByName(stage(4, "semdedup", semd))
            .unionByName(stage(5, "decontam", clean))
            .orderBy("stage_id"))


def _sql_llm_curation_sem() -> str:
    from .registry_llm2 import sql_dedup_groups
    from .registry_pipelines import CURATE_TOK_MAX, CURATE_TOK_MIN
    groups = sql_dedup_groups().replace("FROM documents", "FROM qdocs")
    gram5 = ("UNNEST(list_transform(generate_series(1, len(ws) - 4), "
             "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' "
             "|| ws[i+3] || ' ' || ws[i+4]))")
    tok = "len(string_split(lower(trim(text)), ' '))"
    sem = ",\n".join(_sql_sem_parts(
        prefix="s",
        src=("(SELECT e.vec_id, e.embedding FROM embeddings e "
             "JOIN repd r ON r.doc_id = e.vec_id)"),
        seed_smallest=True))
    return f"""
WITH qdocs AS (
  SELECT * FROM documents
  WHERE {tok} BETWEEN {CURATE_TOK_MIN} AND {CURATE_TOK_MAX}),
comp AS (SELECT * FROM ({groups}) g),
reps AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comp c JOIN qdocs d USING (doc_id)),
repd AS (SELECT d.* FROM qdocs d
         JOIN reps r ON r.doc_id = d.doc_id AND r.rn = 1),
{sem},
semd AS (SELECT * FROM repd
         WHERE doc_id NOT IN (SELECT vec_id FROM sdr)),
corpus AS (SELECT * FROM semd WHERE source <> 'src0'),
bench AS (
  SELECT DISTINCT {gram5} AS g
  FROM (SELECT string_split(lower(trim(text)), ' ') AS ws
        FROM qdocs WHERE source = 'src0')),
cont AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, {gram5} AS g
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
              FROM corpus)) cg
  JOIN bench USING (g)),
clean AS (SELECT * FROM corpus
          WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT 1 AS stage_id, 'start' AS stage, COUNT(*) AS n_docs,
       CAST(SUM({tok}) AS BIGINT) AS n_tokens FROM documents
UNION ALL SELECT 2, 'quality', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM qdocs
UNION ALL SELECT 3, 'dedup', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM repd
UNION ALL SELECT 4, 'semdedup', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM semd
UNION ALL SELECT 5, 'decontam', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM clean
ORDER BY stage_id
"""


# ------------------------------------- multi-signal dup-graph k-core

KCORE_K = 16      # minimum induced degree to stay in the core
KCORE_ROUNDS = 5  # unrolled peel rounds (fixpoint at sf0.01: round 5
#                   re-peels 2 of 298; both engines replay the SAME
#                   rounds, so non-convergence at another SF is still
#                   bit-exact — the pagerank unrolling precedent)


def q_llm_dup_kcore(spark, sf_dir):
    """k-core decomposition of the MULTI-SIGNAL duplicate graph —
    vertices are documents, edges the union of the three lexical
    near-dup detectors this registry already oracle-checks (MinHash
    LSH pairs, SimHash hamming pairs, blocked n-gram Jaccard pairs).
    Peeling to the K-core keeps only documents embedded in DENSE dup
    neighborhoods — template/boilerplate farms where every member has
    ≥ K flagged partners even after weakly-attached docs are removed;
    the standard graph signal for cluster-level (not pairwise)
    dedup decisions.  Emits the peel profile: (round, n_core,
    n_edges) for round 0 (the full dup graph) through KCORE_ROUNDS.

    Fully oracle-checked: the three edge lists are the SAME md5-exact
    pair queries the registry pins individually, and the peel is
    KCORE_ROUNDS unrolled rounds (alive ← vertices whose
    alive-induced degree ≥ K) — deterministic set arithmetic both
    engines replay identically, converged or not.

    Scale shape: each round is one equi-join of the edge list against
    the frontier on each endpoint plus a count aggregate — no global
    structure, shuffles keyed by doc id; the edge list is built once
    and localCheckpointed (3 signal pipelines × 6 consumers would
    otherwise re-run per round), and each round's frontier is
    checkpointed (O(core) rows) because round t's plan would
    otherwise embed TWO copies of round t−1's — the standard
    materialize-the-frontier shape of distributed iterative graph
    algorithms.  Peel work only ever shrinks: round t touches the
    edges induced by round t−1's survivors."""
    from .registry_llm import (q_minhash_pairs, q_ngram_jaccard,
                               q_simhash_pairs)
    mh = q_minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    sh = q_simhash_pairs(spark, sf_dir).select("id_a", "id_b")
    ng = q_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    # ALL checkpoints in this query are lazy (r15): the peel rounds
    # are a FIXED count with no per-round driver decision (the
    # pagerank precedent), so every frontier/edge table materializes
    # under the caller's single action and is reused from blocks —
    # the r14 eager forms ran 7 blocking jobs before the action
    ep = (mh.unionByName(sh).unionByName(ng).distinct()
          .localCheckpoint(eager=False))
    und = ep.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")) \
        .unionByName(
            ep.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))

    def stage(t, alive):
        n_core = alive.agg(F.lit(t).alias("round"),
                           F.count(F.lit(1)).alias("n_core"))
        n_edges = (ep.join(alive.select(F.col("u").alias("id_a")),
                           "id_a")
                   .join(alive.select(F.col("u").alias("id_b")), "id_b")
                   .agg(F.lit(t).alias("round"),
                        F.count(F.lit(1)).alias("n_edges")))
        return n_core.join(n_edges, "round")

    alive = und.select("u").distinct().localCheckpoint(eager=False)
    out = stage(0, alive)
    for t in range(1, KCORE_ROUNDS + 1):
        deg = (und.join(alive, "u")
               .join(alive.select(F.col("u").alias("v")), "v")
               .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
        alive = (deg.filter(F.col("d") >= KCORE_K).select("u")
                 .localCheckpoint(eager=False))
        out = out.unionByName(stage(t, alive))
    return out.orderBy("round")


def _sql_dup_kcore() -> str:
    from .registry_llm import (SQL_MINHASH_PAIRS, SQL_NGRAM_JACCARD,
                               SQL_SIMHASH_PAIRS)
    parts = [
        f"ep AS MATERIALIZED (\n"
        f"  SELECT id_a, id_b FROM ({SQL_MINHASH_PAIRS})\n"
        f"  UNION SELECT id_a, id_b FROM ({SQL_SIMHASH_PAIRS})\n"
        f"  UNION SELECT id_a, id_b FROM ({SQL_NGRAM_JACCARD}))",
        "und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM ep "
        "UNION ALL SELECT id_b, id_a FROM ep)",
        "a0 AS MATERIALIZED (SELECT DISTINCT u FROM und)",
    ]
    prev = "a0"
    for t in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT u FROM ("
            f"SELECT g.u, COUNT(*) AS d FROM und g "
            f"JOIN {prev} x ON g.u = x.u JOIN {prev} y ON g.v = y.u "
            f"GROUP BY g.u) WHERE d >= {KCORE_K})")
        prev = f"a{t}"
    rounds = "\nUNION ALL ".join(
        f"SELECT {t} AS round, (SELECT COUNT(*) FROM a{t}) AS n_core, "
        f"(SELECT COUNT(*) FROM ep JOIN a{t} x ON ep.id_a = x.u "
        f"JOIN a{t} y ON ep.id_b = y.u) AS n_edges"
        for t in range(KCORE_ROUNDS + 1))
    return ("WITH " + ",\n".join(parts) + "\n" + rounds
            + "\nORDER BY round")


SQL_LLM_DUP_KCORE = _sql_dup_kcore()


SQL_LLM_CURATION_SEM = _sql_llm_curation_sem()


# ----------------------------------------- exact-replay IVF-PQ ------

PQ_M = 8       # subspaces
PQ_DS = 8      # dims per subspace (PQ_M · PQ_DS = the embedding dim)
PQ_CELLS = 8   # codewords per subspace (3-bit codes)
PQ_ITERS = 2   # unrolled integer Lloyd iterations per subspace


PQ_REFINE = 12  # exact-rerank shortlist size (4 × IVX_K)


def _ivfpq_topk(spark, sf_dir, *, source_fn=None,
                staging_key: str = "ivfpq_arr",
                residual: bool = False, refine: int = 0,
                probe: int | None = None,
                _share_out: dict | None = None):
    """IVF-PQ approximate nearest neighbors with a FULL oracle — the
    memory-bounded flagship of large-scale ANN (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"; the FAISS
    IVF-PQ shape with by_residual=False), composed from this repo's
    bit-exact integer machinery:

      1. coarse: the exact-IVF integer-Lloyd cells (registry_ext19's
         IVX_* config) partition the corpus; queries (every
         IVX_STRIDE-th id) probe their IVX_PROBE nearest cells —
         candidate generation is an equi-join on cell, never
         all-pairs,
      2. PQ codebooks: each of PQ_M = 8 subspaces of PQ_DS = 8 dims
         gets its own integer Lloyd (PQ_CELLS codewords, seeds =
         vec_ids below PQ_CELLS — dense testdata ids, so codeword
         ids are exactly 0..PQ_CELLS−1; the element_at lookup below
         relies on that),
      3. encode: every corpus vector compresses to PQ_M 3-bit codes
         (argmin exact squared-L2 per subspace, tie → smaller id) —
         the 64·int64 vector becomes 8 small ints, the 64× memory
         reduction that lets a 100 TB corpus's index fit in RAM,
      4. ADC ranking: per query, a distance TABLE (its subvector's
         exact L2² to each codeword, PQ_M × PQ_CELLS ints) is built
         once; a candidate's asymmetric distance is the sum of 8
         table lookups via its codes — never a full-vector distance
         at scan time.  Top IVX_K per query by (adc, nid).

    Every step is integer arithmetic both engines replay identically;
    the oracle unrolls the coarse Lloyd + all 8 subspace Lloyds as
    CTE pyramids (ml/intlloyd.sql_lloyd_ctes with prefixes).
    ``residual=True`` is that same pipeline with RESIDUAL encoding
    (FAISS by_residual=True): the PQ codebooks are fit on — and the
    codes/distance tables computed from — x − coarse_centroid(x)
    instead of x, so the 8 codewords per subspace only have to span
    a CELL's spread, not the whole space; differences of int64s stay
    exact, so the full oracle carries over unchanged in shape.  The
    query-side distance table then depends on the PROBED CELL (the
    query's residual differs per cell), which is why it is computed
    after the probe explode.

    ``source_fn(spark, sf_dir) -> DataFrame[(vec_id, qa)]`` swaps the
    corpus (already integer-quantized) — used by the clustered-
    fixture recall entries; ``staging_key`` is retained for call-site
    stability (the r14 parquet staging became a lazy localCheckpoint
    in r15 — same materialize-once reuse, zero blocking jobs).

    ``refine=R`` adds the third standard accuracy knob (FAISS
    IndexRefine): keep the top R candidates per query by ADC, then
    re-rank the shortlist by EXACT integer L2 on the stored vectors
    and emit the top k of that.  Per query the exact work is R
    distances instead of |corpus| — the re-rank join is an equi-join
    of an |queries|·R shortlist against the vector table.  Output
    column ``d`` is then the exact distance (``adc`` otherwise).
    Refined recall dominates unrefined BY CONSTRUCTION: any true
    neighbor that survives into the shortlist is, by definition of
    "true neighbor", among the shortlist's k exactly-smallest
    distances — so refinement can only add hits (pinned as a
    per-query inequality in tests/test_ann_clustered.py).

    Scale shape: codebook training collects only constants (8 ×
    PQ_CELLS × PQ_DS ints + the coarse table); encoding is a
    projection; the ADC join's fan-out is the probed cells'
    population with 8-lookup per-pair cost — the reason IVF-PQ is
    the standard at billion-vector scale."""
    from pyspark.sql import Window

    from .ml.intlloyd import (arr_sql, cell_of, dist_to_sql,
                              grouped_integer_lloyd, integer_lloyd)
    from .registry_ext19 import (IVX_CELLS, IVX_DIM, IVX_ITERS, IVX_K,
                                 IVX_PROBE, IVX_QS, IVX_STRIDE)
    if probe is None:
        probe = IVX_PROBE
    if source_fn is None:
        src = quantize(_t(spark, sf_dir, "embeddings"), IVX_QS)
    else:
        src = source_fn(spark, sf_dir)
    # localCheckpoint replaces the r14 parquet staging: the quantized
    # corpus is still materialized ONCE and reused by every consumer
    # (Lloyd seeds/iterations, encode, queries, refine) without the
    # blocking parquet write + read-back round trip (r15 driver-bound
    # fix).  Residual path: LAZY — materializes under the coarse
    # seed collect.  Non-residual path: EAGER, because the coarse
    # fit and the 8 PQ subspace fits are then INDEPENDENT consumers
    # run from two driver threads below (guide §2.6) — a lazy block
    # would be computed twice by their concurrent first jobs.
    arrq = src.localCheckpoint(eager=False if residual else True)

    if residual:
        coarse = integer_lloyd(arrq, IVX_CELLS, IVX_ITERS, IVX_DIM)
        subcents = None
    else:
        # the subspace codebooks are fit on the RAW vectors, so the
        # coarse fit (3 sequential jobs) and the grouped subspace fit
        # (3 sequential jobs) share no dependency — overlap them from
        # a 2-thread pool so the second fit back-fills the idle
        # executors of the first's small rollup jobs (§2.6); results
        # are collected constants, so scheduling cannot affect them
        from concurrent.futures import ThreadPoolExecutor
        sub_raw = arrq.select(
            "vec_id",
            F.posexplode(F.array(*[
                F.slice("qa", m * PQ_DS + 1, PQ_DS)
                for m in range(PQ_M)])).alias("g", "qa"))
        with ThreadPoolExecutor(max_workers=2) as pool:
            cf = pool.submit(integer_lloyd, arrq, IVX_CELLS,
                             IVX_ITERS, IVX_DIM)
            sf = pool.submit(grouped_integer_lloyd, sub_raw, PQ_M,
                             PQ_CELLS, PQ_ITERS, PQ_DS)
            coarse = cf.result()
            subcents = sf.result()
    # the ADC lookup below maps code m -> dtab[m][code + 1]; that is
    # only correct when codeword (and coarse-cell) ids are EXACTLY
    # 0..CELLS-1.  The dense-id seeding guarantees it on the test
    # tables, but on any id space missing a low vec_id the mapping
    # would silently shift — enforce rather than document.
    if [cid for cid, _ in coarse] != list(range(IVX_CELLS)):
        raise ValueError("IVF-PQ coarse cell ids are not dense "
                         "0..IVX_CELLS-1; refit with a dense id space")
    if _share_out is not None:
        # hand the fitted table + checkpointed corpus to recall_of so
        # the ground truth pays neither a bit-identical refit (2 more
        # corpus passes) nor the r14 staging re-read
        _share_out["coarse"] = coarse
        _share_out["arrq"] = arrq
    # all literal-heavy expressions below are ONE parsed SQL string
    # each (ml/intlloyd.dist_to_sql rationale: Column-algebra
    # construction was ~half this query's wall time)
    cent_arr_sql = ("array(" + ",".join(arr_sql(c) for _, c in coarse)
                    + ")")
    cent_arr = F.expr(cent_arr_sql)
    enc = arrq.withColumn("cell", cell_of(coarse))
    if residual:
        # encode x − coarse_centroid(cell): the codebooks below are
        # fit on — and the codes computed from — the residual frame.
        # Checkpoint it: the 8 subspace Lloyds below collect 3× over
        # their input, and the residual expression (an 8-way argmin
        # plus a 64-wide zip_with against an 8×64-literal centroid
        # array) would otherwise be recompiled and recomputed in
        # every one of those scans — measured 5× the whole query's
        # cost at sf0.1.  LAZY since r15: the grouped fit's seed
        # collect materializes it (the r14 parquet staging paid a
        # blocking write + read-back for the same reuse).
        enc = (enc.withColumn("qa", F.zip_with(
            F.col("qa"),
            F.element_at(cent_arr, (F.col("cell") + 1).cast("int")),
            lambda x, c: x - c))
            .localCheckpoint(eager=False))
    # all 8 subspace codebooks in ONE grouped fit: 1 + PQ_ITERS
    # corpus scans instead of 8 × (1 + PQ_ITERS) — bit-identical to
    # the per-subspace loop (grouped_integer_lloyd's contract).
    # Non-residual codebooks were already fit above (overlapped with
    # the coarse fit); the residual ones need the residual frame.
    if subcents is None:
        sub_all = enc.select(
            "vec_id",
            F.posexplode(F.array(*[
                F.slice("qa", m * PQ_DS + 1, PQ_DS)
                for m in range(PQ_M)])).alias("g", "qa"))
        subcents = grouped_integer_lloyd(sub_all, PQ_M, PQ_CELLS,
                                         PQ_ITERS, PQ_DS)
    for m in range(PQ_M):
        if [cid for cid, _ in subcents[m]] != list(range(PQ_CELLS)):
            raise ValueError(
                f"PQ subspace {m} codeword ids are not dense "
                "0..PQ_CELLS-1; the ADC element_at lookup would "
                "silently mis-map codes to distances")

    def dist_sub_sql(c, m):
        sub = f"slice(qa, {m * PQ_DS + 1}, {PQ_DS})"
        return dist_to_sql(c, qa=sub)

    def code_col_sql(m):
        structs = ",".join(
            f"named_struct('d', {dist_sub_sql(c, m)}, 'cid', {int(cid)})"
            for cid, c in subcents[m])
        return f"array_min(array({structs})).cid"

    corpus = enc.select(
        F.col("vec_id").alias("nid"), "cell",
        F.expr("array(" + ",".join(code_col_sql(m)
                                   for m in range(PQ_M)) + ")")
        .alias("codes"))

    dtab = F.expr("array(" + ",".join(
        "array(" + ",".join(dist_sub_sql(c, m)
                            for _, c in subcents[m]) + ")"
        for m in range(PQ_M)) + ")")
    pc = F.expr("slice(array_sort(array(" + ",".join(
        f"named_struct('d', {dist_to_sql(c)}, 'cid', {int(cid)})"
        for cid, c in coarse) + f")), 1, {probe})")
    # probe by the RAW query vector; under residual encoding the
    # distance table is per (query, probed cell) — the query residual
    # differs per cell — so dtab is evaluated AFTER the explode.
    # The probe list is projected BELOW the explode (a generator
    # re-evaluates its select-list per OUTPUT row, so inlining the
    # probe sort would pay the argmin sort ×probe).
    qs = (arrq.filter(F.col("vec_id") % IVX_STRIDE == 0)
          .withColumn("__pc", F.transform(pc, lambda s: s["cid"]))
          .select(F.col("vec_id").alias("qid"), F.col("qa"),
                  F.explode("__pc").alias("cell")))
    if residual:
        qs = qs.withColumn("qa", F.zip_with(
            F.col("qa"),
            F.element_at(cent_arr, (F.col("cell") + 1).cast("int")),
            lambda x, c: x - c))
    qs = qs.select("qid", "cell", dtab.alias("dtab"))
    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("dtab"),
                   lambda code, row:
                   F.element_at(row, (code + 1).cast("int"))),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    cand = (qs.join(corpus, "cell")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", adc.alias("adc")))
    w = Window.partitionBy("qid").orderBy("adc", "nid")
    if not refine:
        return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= IVX_K)
                .select("qid", "rank", "nid", "adc"))
    shortlist = (cand.withColumn("rr", F.row_number().over(w))
                 .filter(F.col("rr") <= refine).select("qid", "nid"))
    qv = arrq.select(F.col("vec_id").alias("qid"),
                     F.col("qa").alias("qqa"))
    nv = arrq.select(F.col("vec_id").alias("nid"),
                     F.col("qa").alias("nqa"))
    exact = F.aggregate(
        F.zip_with(F.col("qqa"), F.col("nqa"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    rer = (shortlist.join(qv, "qid").join(nv, "nid")
           .select("qid", "nid", exact.alias("d")))
    wr = Window.partitionBy("qid").orderBy("d", "nid")
    return (rer.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVX_K)
            .select("qid", "rank", "nid", "d"))


def _sql_ivfpq_parts(src: str = "embeddings",
                     qs_scale: int | None = None,
                     residual: bool = False,
                     refine: int = 0,
                     probe: int | None = None) -> tuple[list[str], str]:
    """(CTE parts, final ranked-top-k SELECT) — shared by the
    standalone IVF-PQ oracles and the recall oracles.  ``src`` /
    ``qs_scale`` flow into the quantize CTE (``qs_scale=None`` means
    the src already provides an integer ``qa``); ``residual=True``
    mirrors ``_ivfpq_topk(residual=True)``: codebooks/codes over
    x − coarse_centroid, per-(query, probed-cell) distance tables."""
    from .ml.intlloyd import sql_l2, sql_lloyd_ctes
    from .registry_ext19 import (IVX_CELLS, IVX_DIM, IVX_ITERS, IVX_K,
                                 IVX_PROBE, IVX_QS, IVX_STRIDE)
    if qs_scale is None and src == "embeddings":
        qs_scale = IVX_QS
    if probe is None:
        probe = IVX_PROBE
    gs64 = f"generate_series(1, {IVX_DIM})"
    gs8 = f"generate_series(1, {PQ_DS})"
    parts, coarse = sql_lloyd_ctes(IVX_CELLS, IVX_ITERS, IVX_DIM,
                                   qs_scale, src=src, prefix="c")
    parts.append(
        f"af AS MATERIALIZED (SELECT vec_id AS nid, cid AS cell FROM ("
        f"SELECT v.vec_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY v.vec_id ORDER BY {sql_l2(gs64, 'v', 'c')}, "
        f"c.cid) AS rn FROM cq v, {coarse} c) WHERE rn = 1)")
    if residual:
        parts.append(
            f"rc AS MATERIALIZED (SELECT a.nid AS vec_id, "
            f"list_transform({gs64}, j -> v.qa[j] - c.qa[j]) AS qa "
            f"FROM af a JOIN cq v ON v.vec_id = a.nid "
            f"JOIN {coarse} c ON c.cid = a.cell)")
    encsrc = "rc" if residual else "cq"
    subfinals = []
    for m in range(PQ_M):
        lo, hi = m * PQ_DS + 1, (m + 1) * PQ_DS
        sp, sf = sql_lloyd_ctes(
            PQ_CELLS, PQ_ITERS, PQ_DS, None,
            src=f"(SELECT vec_id, qa[{lo}:{hi}] AS qa FROM {encsrc})",
            prefix=f"s{m}")
        parts += sp
        subfinals.append(sf)
    # per-subspace encode: one code column per subspace, argmin with
    # the (distance, cid) tie rule
    for m in range(PQ_M):
        parts.append(
            f"e{m} AS MATERIALIZED (SELECT vec_id, cid AS code{m} "
            f"FROM (SELECT v.vec_id, c.cid, ROW_NUMBER() OVER ("
            f"PARTITION BY v.vec_id ORDER BY {sql_l2(gs8, 'v', 'c')}, "
            f"c.cid) AS rn FROM s{m}q v, {subfinals[m]} c) "
            f"WHERE rn = 1)")
    parts.append(
        f"qids AS MATERIALIZED (SELECT vec_id AS qid FROM cq "
        f"WHERE vec_id % {IVX_STRIDE} = 0)")
    parts.append(
        f"pr AS MATERIALIZED (SELECT qid, cid FROM ("
        f"SELECT v.vec_id AS qid, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY v.vec_id ORDER BY {sql_l2(gs64, 'v', 'c')}, "
        f"c.cid) AS rn FROM cq v JOIN qids ON v.vec_id = qids.qid, "
        f"{coarse} c) WHERE rn <= {probe})")
    if residual:
        # the query's residual differs per probed cell, so the
        # distance tables are per (qid, probed cell)
        parts.append(
            f"rq AS MATERIALIZED (SELECT p.qid, p.cid AS pcid, "
            f"list_transform({gs64}, j -> v.qa[j] - c.qa[j]) AS qa "
            f"FROM pr p JOIN cq v ON v.vec_id = p.qid "
            f"JOIN {coarse} c ON c.cid = p.cid)")
        for m in range(PQ_M):
            lo = m * PQ_DS
            parts.append(
                f"dt{m} AS MATERIALIZED (SELECT r.qid, r.pcid, c.cid, "
                f"list_sum(list_transform({gs8}, i -> "
                f"(r.qa[{lo} + i] - c.qa[i]) * "
                f"(r.qa[{lo} + i] - c.qa[i]))) AS d "
                f"FROM rq r, {subfinals[m]} c)")
        dt_joins = " ".join(
            f"JOIN dt{m} ON dt{m}.qid = p.qid AND dt{m}.pcid = p.cid "
            f"AND dt{m}.cid = e{m}.code{m}" for m in range(PQ_M))
    else:
        # per-query per-subspace distance tables
        for m in range(PQ_M):
            parts.append(
                f"dt{m} AS MATERIALIZED (SELECT v.vec_id AS qid, "
                f"c.cid, {sql_l2(gs8, 'v', 'c')} AS d "
                f"FROM s{m}q v JOIN qids ON v.vec_id = qids.qid, "
                f"{subfinals[m]} c)")
        dt_joins = " ".join(
            f"JOIN dt{m} ON dt{m}.qid = p.qid "
            f"AND dt{m}.cid = e{m}.code{m}" for m in range(PQ_M))
    code_joins = " ".join(
        f"JOIN e{m} ON e{m}.vec_id = a.nid" for m in range(PQ_M))
    adc = " + ".join(f"dt{m}.d" for m in range(PQ_M))
    parts.append(
        f"sc AS MATERIALIZED (SELECT p.qid, a.nid, {adc} AS adc "
        f"FROM pr p JOIN af a ON a.cell = p.cid AND a.nid <> p.qid "
        f"{code_joins} {dt_joins})")
    if refine:
        parts.append(
            f"sl AS MATERIALIZED (SELECT qid, nid FROM ("
            f"SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid "
            f"ORDER BY adc, nid) AS rr FROM sc) WHERE rr <= {refine})")
        parts.append(
            f"rf AS MATERIALIZED (SELECT s.qid, s.nid, "
            f"{sql_l2(gs64, 'v', 'n')} AS d FROM sl s "
            f"JOIN cq v ON v.vec_id = s.qid "
            f"JOIN cq n ON n.vec_id = s.nid)")
        final = ("SELECT qid, CAST(rn AS INT) AS rank, nid, "
                 "CAST(d AS BIGINT) AS d FROM ("
                 "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
                 "ORDER BY d, nid) AS rn FROM rf) "
                 f"WHERE rn <= {IVX_K}")
    else:
        final = ("SELECT qid, CAST(rn AS INT) AS rank, nid, "
                 "CAST(adc AS BIGINT) AS adc FROM ("
                 "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
                 "ORDER BY adc, nid) AS rn FROM sc) "
                 f"WHERE rn <= {IVX_K}")
    return parts, final


def _sql_ivfpq_exact(src: str = "embeddings",
                     qs_scale: int | None = None,
                     residual: bool = False,
                     refine: int = 0,
                     probe: int | None = None) -> str:
    parts, final = _sql_ivfpq_parts(src, qs_scale, residual, refine,
                                    probe)
    return "WITH " + ",\n".join(parts) + "\n" + final


SQL_LLM_ANN_IVFPQ_EXACT = _sql_ivfpq_exact()


def q_llm_ann_ivfpq_exact(spark, sf_dir):
    """See ``_ivfpq_topk`` — the registry entry returns its ranked
    top-k directly; ``llm_ann_recall`` composes the same helper
    against exact ground truth."""
    return _ivfpq_topk(spark, sf_dir)


QUERIES_EXT20: dict[str, dict] = {
    "llm_semdedup":     {"fn": q_llm_semdedup,
                         "sql": SQL_LLM_SEMDEDUP},
    "llm_dup_kcore":    {"fn": q_llm_dup_kcore,
                         "sql": SQL_LLM_DUP_KCORE},
    "llm_curation_sem": {"fn": q_llm_curation_sem,
                         "sql": SQL_LLM_CURATION_SEM},
    "llm_ann_ivfpq_exact": {"fn": q_llm_ann_ivfpq_exact,
                            "sql": SQL_LLM_ANN_IVFPQ_EXACT},
}


# ------------------------------------- snapshot schema evolution ----

EVO_SLICES = 3


def q_snapshot_evolution(spark, sf_dir):
    """SCHEMA EVOLUTION under the snapshot store, hash-checked
    end-to-end: v1 overwrites (o_orderkey, cents); v2 APPENDS a
    commit that ADDS column ``disc``; v3 appends one that adds
    ``qty`` — additive evolution, the contract
    ``read_snapshot(merge_schema=True)`` documents (older commits
    read the new columns as NULL).  Each version is then read back
    with merge_schema and aggregated: row/sum totals plus the NULL
    back-fill counts of both evolved columns.  A reader that dropped
    an evolved column, back-filled non-NULL, leaked a later commit
    into an earlier version (time travel × evolution), or unioned
    dirs positionally instead of by name could not hash-match.
    Pre-evolution versions genuinely lack the columns (their dirs
    predate them), so the reader treats a missing column as NULL —
    exactly what a production consumer of an evolving table does.

    Scale shape: the store's evolution is O(manifest) — no data
    rewrite ever happens; merge_schema costs one footer read per
    commit dir.  Re-run convention: aggregates are keyed to THIS
    run's returned versions (the snapshot_history precedent), so a
    second in-process run hash-matches."""
    from .registry import _staging
    from .storage import read_snapshot, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))

    def sl(s):
        return o.filter(F.col("o_orderkey") % EVO_SLICES == s)

    disc = (F.col("o_orderkey") % 97).cast("bigint").alias("disc")
    qty = (F.col("o_orderkey") % 7).cast("bigint").alias("qty")
    t = _staging(sf_dir, "evo_orders")
    v1 = write_snapshot(sl(0), t, mode="overwrite",
                        collect_stats=False)
    v2 = write_snapshot(sl(1).select("o_orderkey", "cents", disc),
                        t, mode="append", collect_stats=False)
    v3 = write_snapshot(sl(2).select("o_orderkey", "cents", disc, qty),
                        t, mode="append", collect_stats=False)

    def colw(df, name):
        return (F.col(name) if name in df.columns
                else F.lit(None).cast("bigint"))

    out = None
    for i, v in enumerate((v1, v2, v3), start=1):
        df = read_snapshot(spark, t, version=v, merge_schema=True)
        part = df.agg(
            F.lit(i).alias("step"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.when(colw(df, "disc").isNull(), 1).otherwise(0))
            .alias("n_disc_null"),
            F.sum(colw(df, "disc")).alias("sum_disc"),
            F.sum(F.when(colw(df, "qty").isNull(), 1).otherwise(0))
            .alias("n_qty_null"),
            F.sum(colw(df, "qty")).alias("sum_qty"))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("step")


SQL_SNAPSHOT_EVOLUTION = f"""
WITH c AS (
  SELECT o_orderkey % {EVO_SLICES} AS s,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         CAST(o_orderkey % 97 AS BIGINT) AS disc,
         CAST(o_orderkey % 7 AS BIGINT) AS qty
  FROM orders),
sel AS (
  -- step 1: slice 0, neither evolved column exists (all NULL);
  -- step 2: slices 0,1 — disc live on slice 1 only; step 3: all
  -- slices — disc live on 1,2, qty live on 2 only
  SELECT st.step, c.cents,
         CASE WHEN st.step >= 2 AND c.s >= 1 THEN c.disc END AS disc,
         CASE WHEN st.step = 3 AND c.s = 2 THEN c.qty END AS qty,
         c.s
  FROM (VALUES (1), (2), (3)) st(step)
  JOIN c ON c.s < st.step)
SELECT step,
       COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_disc_null,
       CAST(SUM(disc) AS BIGINT) AS sum_disc,
       CAST(SUM(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_qty_null,
       CAST(SUM(qty) AS BIGINT) AS sum_qty
FROM sel GROUP BY step ORDER BY step
"""


QUERIES_EXT20["snapshot_evolution"] = {"fn": q_snapshot_evolution,
                                       "sql": SQL_SNAPSHOT_EVOLUTION}


# --------------------------------------------- ANN recall eval ------

def q_llm_ann_recall(spark, sf_dir):
    """Recall@k of the IVF-PQ index against EXACT ground truth — the
    number every ANN system reports, and the missing half of building
    an index at all (an unmeasured index is a hope, not a component).
    Ground truth is the exact integer squared-L2 top-k over the FULL
    corpus for each sampled query, computed WITHOUT a cartesian: the
    query side probes ALL IVX_CELLS coarse cells, so the corpus is
    enumerated per query through the same cell equi-join the index
    uses (every vector lives in exactly one cell — coverage is exact
    regardless of clustering quality).  The enumeration is bounded by
    the query SAMPLE (every IVX_STRIDE-th id), the standard recall
    protocol at any corpus size: ground-truth cost scales with
    |sample|·|corpus|, never |corpus|².

    Emits (qid, hits, recall_bp): per-query overlap between the
    IVF-PQ top-k (``_ivfpq_topk`` — the llm_ann_ivfpq_exact entry
    verbatim) and the exact top-k, recall in integer basis points.
    Fully oracle-checked: both rankings replay bit-exactly (the PQ
    pyramid from the shared generator; ground truth by exact integer
    L2 with the (distance, nid) tie rule).

    Expect LOW absolute recall on the synthetic fixtures (~3% @k=3
    at sf0.01) and read it as signal, not breakage: the testdata
    embeddings are near-uniform random, the known worst case for
    quantized indexes (true nearest neighbors are barely closer than
    the bulk, so 3-bit codes and 2-of-8 probing destroy the
    ordering).  On clustered real-world embeddings the same
    parameters recover most of the ranking — and THIS query is how
    you'd verify that before trusting the index, which is the point
    of shipping the measurement next to the index."""
    return recall_of(spark, sf_dir)


def recall_of(spark, sf_dir, *, source_fn=None,
              staging_key: str = "ivfpq_arr", residual: bool = False,
              refine: int = 0, probe: int | None = None):
    """Recall@k harness shared by the uniform-fixture entry
    (``llm_ann_recall``), the clustered-fixture pin
    (``llm_ann_recall_clustered``), and the residual-encoding
    variant (``llm_ann_recall_resid``) — see ``q_llm_ann_recall``
    for the protocol.  Ground truth is ALWAYS exact integer L2 over
    the raw quantized vectors; only the index under test changes."""
    from pyspark.sql import Window

    from .ml.intlloyd import cell_of
    from .registry_ext19 import IVX_CELLS, IVX_K, IVX_STRIDE
    # localCheckpoint: the index result is |queries|·k rows, but its
    # PLAN is the whole unrolled index (9+ Lloyd pyramids, encode,
    # ADC); embedding that plan inside the recall join doubled the
    # query's compile cost — cut it here and let the recall side
    # start from the materialized shortlist.  This stays the round's
    # ONE eager barrier: everything upstream (staging, 9 Lloyd fits,
    # their seeds) rides this single materialization since r15.
    share: dict = {}
    pq = _ivfpq_topk(spark, sf_dir, source_fn=source_fn,
                     staging_key=staging_key, residual=residual,
                     refine=refine, probe=probe, _share_out=share) \
        .select("qid", "nid").localCheckpoint()
    # the helper checkpointed the quantized table and fit the coarse
    # cells; reuse BOTH for the ground-truth corpus assignment (the
    # r14 form re-read the staging parquet and refit bit-identically
    # — two more corpus passes for tables this query already has).
    # The probe-all-cells enumeration below explodes range(IVX_CELLS);
    # coverage is exact only when the fitted cell ids are exactly
    # that range — enforce, don't assume (mirrors _ivfpq_topk).
    arrq = share["arrq"]
    coarse = share["coarse"]
    if [cid for cid, _ in coarse] != list(range(IVX_CELLS)):
        raise ValueError("recall ground-truth coarse cell ids are "
                         "not dense 0..IVX_CELLS-1; corpus coverage "
                         "of the all-cells enumeration would be lost")
    corpus = arrq.select(F.col("vec_id").alias("nid"),
                         F.col("qa").alias("nqa"),
                         cell_of(coarse).alias("cell"))
    qs = (arrq.filter(F.col("vec_id") % IVX_STRIDE == 0)
          .select(F.col("vec_id").alias("qid"),
                  F.col("qa").alias("qqa"),
                  F.explode(F.array(*[F.lit(c) for c in
                                      range(IVX_CELLS)])).alias("cell")))
    d = F.aggregate(
        F.zip_with(F.col("qqa"), F.col("nqa"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    cand = (qs.join(corpus, "cell")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", d.alias("d")))
    w = Window.partitionBy("qid").orderBy("d", "nid")
    ex = (cand.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= IVX_K).select("qid", "nid"))
    hits = (pq.join(ex, ["qid", "nid"])
            .groupBy("qid").agg(F.count(F.lit(1)).alias("h")))
    qids = ex.select("qid").distinct()
    return (qids.join(hits, "qid", "left")
            .select("qid",
                    F.coalesce(F.col("h"), F.lit(0)).alias("hits"),
                    F.expr(f"CAST(coalesce(h, 0) * 10000 div {IVX_K} "
                           f"AS BIGINT)").alias("recall_bp"))
            .orderBy("qid"))


def _sql_ann_recall(src: str = "embeddings",
                    qs_scale: int | None = None,
                    residual: bool = False,
                    refine: int = 0,
                    probe: int | None = None) -> str:
    from .ml.intlloyd import sql_l2
    from .registry_ext19 import IVX_DIM, IVX_K
    gs64 = f"generate_series(1, {IVX_DIM})"
    parts, final = _sql_ivfpq_parts(src, qs_scale, residual, refine,
                                    probe)
    parts.append(f"pq AS MATERIALIZED (SELECT qid, nid FROM ({final}))")
    parts.append(
        f"exd AS MATERIALIZED (SELECT v.vec_id AS qid, n.vec_id AS "
        f"nid, {sql_l2(gs64, 'v', 'n')} AS d "
        f"FROM cq v JOIN qids ON v.vec_id = qids.qid, cq n "
        f"WHERE n.vec_id <> v.vec_id)")
    parts.append(
        f"ex AS MATERIALIZED (SELECT qid, nid FROM ("
        f"SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid "
        f"ORDER BY d, nid) AS rn FROM exd) WHERE rn <= {IVX_K})")
    parts.append(
        "hits AS (SELECT qid, COUNT(*) AS h FROM pq "
        "JOIN ex USING (qid, nid) GROUP BY qid)")
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT q.qid, CAST(COALESCE(h, 0) AS BIGINT) AS hits, "
            f"CAST(COALESCE(h, 0) * 10000 // {IVX_K} AS BIGINT) "
            "AS recall_bp "
            "FROM (SELECT DISTINCT qid FROM ex) q "
            "LEFT JOIN hits USING (qid) ORDER BY qid")


SQL_LLM_ANN_RECALL = _sql_ann_recall()

QUERIES_EXT20["llm_ann_recall"] = {"fn": q_llm_ann_recall,
                                   "sql": SQL_LLM_ANN_RECALL}
