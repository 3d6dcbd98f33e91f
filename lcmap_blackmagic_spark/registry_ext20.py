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
    within-cell self-join re-reads the STAGED quantized table (one
    parquet materialization, same as the exact IVF), so the funnel
    is one hash-checked query, not four."""
    from .llm.semdedup import assign_cells, dot_over
    from .ml.intlloyd import integer_lloyd
    from .registry import _staging

    e = _t(spark, sf_dir, "embeddings")
    staging = _staging(sf_dir, "semdedup_arr")
    quantize(e).write.mode("overwrite").parquet(staging)
    arrq = spark.read.parquet(staging)

    cents = integer_lloyd(arrq, SEM_CELLS, SEM_ITERS, SEM_DIM)
    vecs = (assign_cells(arrq, cents)
            .localCheckpoint())  # 3 consumers: both pair sides + funnel

    a = vecs.select(F.col("vec_id").alias("ai"), F.col("qa").alias("aq"),
                    "cell", F.col("n2").alias("a2"))
    b = vecs.select(F.col("vec_id").alias("bi"), F.col("qa").alias("bq"),
                    "cell", F.col("n2").alias("b2"))
    cand = (a.join(b, "cell").filter(F.col("ai") < F.col("bi"))
            .select("ai", "bi", "a2", "b2",
                    dot_over("aq", "bq").alias("dot")))
    pairs = (cand.filter(sem_cond(F.col("dot"), F.col("a2"),
                                  F.col("b2"), SEM_TAU2_BP))
             .localCheckpoint())  # 2 consumers: funnel + drop set
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


def _sql_semdedup() -> str:
    from .ml.intlloyd import sql_l2, sql_lloyd_ctes
    gs = f"generate_series(1, {SEM_DIM})"
    parts, prev = sql_lloyd_ctes(SEM_CELLS, SEM_ITERS, SEM_DIM, SEM_QS)
    parts.append(
        f"af AS MATERIALIZED (SELECT vec_id, qa, cid, n2 FROM ("
        f"SELECT v.vec_id, v.qa, c.cid, "
        f"list_sum(list_transform(v.qa, x -> x * x)) AS n2, "
        f"ROW_NUMBER() OVER (PARTITION BY v.vec_id "
        f"ORDER BY {sql_l2(gs, 'v', 'c')}, c.cid) AS rn "
        f"FROM q v, {prev} c) WHERE rn = 1 AND n2 > 0)")
    dot = f"list_sum(list_transform({gs}, i -> a.qa[i] * b.qa[i]))"
    parts.append(
        f"pr AS MATERIALIZED (SELECT ai, bi FROM ("
        f"SELECT a.vec_id AS ai, b.vec_id AS bi, {dot} AS dot, "
        f"a.n2 AS a2, b.n2 AS b2 "
        f"FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id)"
        f" WHERE dot >= 0 AND CAST(dot * dot AS HUGEINT) * 10000 >= "
        f"CAST(a2 * b2 AS HUGEINT) * {SEM_TAU2_BP})")
    parts.append("dr AS (SELECT DISTINCT bi AS vec_id FROM pr)")
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT 1 AS stage_id, 'vectors' AS stage, "
            "COUNT(*) AS n FROM af\n"
            "UNION ALL SELECT 2, 'cells', COUNT(DISTINCT cid) FROM af\n"
            "UNION ALL SELECT 3, 'dup_pairs', COUNT(*) FROM pr\n"
            "UNION ALL SELECT 4, 'survivors', COUNT(*) FROM af "
            "WHERE vec_id NOT IN (SELECT vec_id FROM dr)\n"
            "ORDER BY stage_id")


SQL_LLM_SEMDEDUP = _sql_semdedup()


QUERIES_EXT20: dict[str, dict] = {
    "llm_semdedup": {"fn": q_llm_semdedup, "sql": SQL_LLM_SEMDEDUP},
}
