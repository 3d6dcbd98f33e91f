"""Full k-means (Lloyd) fit, distributed and DETERMINISTIC — the
iteration harness over the E/M steps the registry exposes as
oracle-checked single-step queries (registry_ext7.q_kmeans_assign,
registry_ext8.q_kmeans_update).

Reproducibility is engineered, not hoped for:

- init = the k vectors with the smallest ids (no RNG),
- the E-step argmin breaks ties on (dist, cid) via a struct-min —
  one deterministic winner no matter the partitioning,
- the M-step means come from floor-quantized INTEGER coordinate
  sums (floor(x·2^20) — exact for doubles), so the new centroids
  are bit-identical across cluster sizes, shuffles, and reruns
  (float sums would drift with accumulation order and k-means
  amplifies any drift into different assignments).

Scale shape per iteration: the corpus stays in LONG FORM
(id, i, x) — staged to parquet once, scanned per step — joined to a
broadcast k·dim centroid table; both aggregates are map-side
combined; the only driver traffic is the k×dim centroid matrix (the
broadcast-model pattern, not a data collect)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_Q = 1 << 20


def _long_form(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return (df.select(F.col(id_col).alias("id"),
                      F.posexplode(vec_col).alias("i", "x"))
            .select("id", "i", F.col("x").cast("double").alias("x")))


def kmeans_fit(df: DataFrame, k: int = 8, max_iters: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               staging_dir: str | None = None) -> dict:
    """Lloyd iteration to convergence (or ``max_iters``).  Returns
    ``{"centroids": [[float]*dim]*k, "iters": n, "inertia": float,
    "assign": DataFrame(id, cid)}``.  Convergence = the quantized
    centroid matrix is EXACTLY unchanged (integer comparison — no
    epsilon tuning)."""
    spark = df.sparkSession
    long = _long_form(df, id_col, vec_col)
    if staging_dir:
        long.write.mode("overwrite").parquet(staging_dir)
        long = spark.read.parquet(staging_dir)

    # deterministic init: the k smallest ids
    seed_ids = [r["id"] for r in
                long.select("id").distinct().orderBy("id")
                .limit(k).collect()]
    cent = (long.filter(F.col("id").isin(seed_ids))
            .groupBy("id").agg(F.sort_array(
                F.collect_list(F.struct("i", "x"))).alias("s"))
            .orderBy("id").collect())
    centroids = [[float(p["x"]) for p in r["s"]] for r in cent]
    qprev = None
    assign = None
    inertia = None
    it = 0
    for it in range(1, max_iters + 1):
        cdf = F.broadcast(spark.createDataFrame(
            [(cid, i, c[i]) for cid, c in enumerate(centroids)
             for i in range(len(c))], "cid int, i int, c double"))
        d = F.col("x") - F.col("c")
        # E-step: min (dist, cid) struct per id — deterministic tie
        best = (long.join(cdf, "i")
                .groupBy("id", "cid").agg(F.sum(d * d).alias("dist"))
                .groupBy("id")
                .agg(F.min(F.struct("dist", "cid")).alias("b"))
                .select("id", F.col("b.cid").alias("cid"),
                        F.col("b.dist").alias("dist")))
        # M-step: exact integer coordinate sums per (cid, i)
        stats = (long.join(best.select("id", "cid"), "id")
                 .groupBy("cid", "i")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.floor(F.col("x") * KM_Q).cast("bigint"))
                      .alias("s"))
                 .collect())
        qnew: dict[tuple, int] = {}
        counts: dict[int, int] = {}
        for r in stats:
            # quantized mean: one exact integer division per cell
            qnew[(r["cid"], r["i"])] = r["s"] // r["n"]
            counts[r["cid"]] = r["n"]
        if qnew == qprev:
            break
        qprev = qnew
        dim = len(centroids[0])
        centroids = [[qnew.get((cid, i), int(centroids[cid][i] * KM_Q))
                      / KM_Q for i in range(dim)]
                     for cid in range(k)]
        assign = best
    inertia = (assign.agg(F.sum("dist")).collect()[0][0]
               if assign is not None else None)
    return {"centroids": centroids, "iters": it,
            "inertia": float(inertia) if inertia is not None else None,
            "assign": assign.select("id", "cid") if assign is not None
            else None}
