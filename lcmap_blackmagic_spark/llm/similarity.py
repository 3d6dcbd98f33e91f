"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exact baseline.
  Query set × corpus join; all arithmetic JVM-side (zip_with +
  aggregate), summation in index order so any engine reproduces the
  same doubles bit-for-bit.
- ``lsh_ann_topk``: the scale path — random-hyperplane (sign) LSH.
  Hyperplane weights are ±1 derived deterministically from md5, so
  the bucketing is reproducible anywhere. Candidates share ≥1 of
  ``n_tables`` bucket keys; exact cosine is computed on candidates
  only. At 100 TB the corpus is bucketed once (narrow shuffle on the
  bucket key) and each query probes its buckets instead of the full
  corpus.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spread

DIM = 64


def _dot(a: Column, b: Column, dim: int = DIM) -> Column:
    """Fixed-dimension UNROLLED dot product: 2·dim element_at calls
    stay inside whole-stage codegen, unlike aggregate/zip_with
    higher-order functions which fall back to interpreted eval and
    build an intermediate array per row. Summation is left-to-right in
    index order — bit-identical to the lambda form and to the oracle's
    list_sum."""
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1)
             for i in range(dim)]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(emb: DataFrame, query_filter: Column, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors by cosine for every row matching
    ``query_filter``. Output: (qid, nid, cosine) — k rows per query,
    deterministic tie-break by neighbor id.

    Plan shape: norms are computed ONCE per row before the join (not
    per pair), the corpus is broadcast, and the small query side is
    spread across the cluster so pair scoring parallelizes — with a
    handful of query rows in one scan partition the whole
    |Q|×|corpus| scoring would otherwise run in a single task."""
    from pyspark.sql import Window
    corpus = emb.select(F.col(id_col).alias("nid"),
                        _as_double(F.col(vec_col)).alias("nvec"))
    corpus = corpus.withColumn(
        "nnorm", F.sqrt(_dot(F.col("nvec"), F.col("nvec"))))
    queries = _spread(
        emb.filter(query_filter)
        .select(F.col(id_col).alias("qid"),
                _as_double(F.col(vec_col)).alias("qvec")))
    queries = queries.withColumn(
        "qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    cos = _dot(F.col("qvec"), F.col("nvec")) / (
        F.col("qnorm") * F.col("nnorm"))
    scored = (queries.join(F.broadcast(corpus), F.col("qid") != F.col("nid"))
              .select("qid", "nid", F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= k).drop("rn"))


def ivf_ann_topk(emb: DataFrame, query_filter: Column, k: int = 5,
                 n_cells: int = 16, n_probe: int = 4, seed: int = 42,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: partition
    the corpus into ``n_cells`` Voronoi cells (seeded k-means), then
    answer each query by probing only its ``n_probe`` nearest cells.

    Scale shape: the corpus is clustered/assigned ONCE (in production
    the cell id is a persisted partition column, so a probe is a
    partition-pruned scan); per query the candidate set shrinks by
    ~n_probe/n_cells. The centroid table is tiny (n_cells × dim) and
    broadcast. Exact cosine is computed on candidates only — identical
    arithmetic to ``cosine_topk``, so recall is the only difference.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    vec = _as_double(F.col(vec_col))
    base = emb.select(F.col(id_col), vec.alias("vec"),
                      array_to_vector(vec).alias("features"))
    km = KMeans(k=n_cells, seed=seed, maxIter=20)
    model = km.fit(base)
    corpus = (model.transform(base)
              .select(F.col(id_col).alias("nid"),
                      F.col("vec").alias("nvec"),
                      F.col(km.getPredictionCol()).alias("cell")))

    # centroid lookup table (n_cells rows) — crossJoin is broadcastable
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())], "cell int, cvec array<double>")

    q = (emb.filter(query_filter)
         .select(F.col(id_col).alias("qid"), vec.alias("qvec")))
    d2 = F.aggregate(F.zip_with(F.col("qvec"), F.col("cvec"),
                                lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    wc = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cell"))
    probes = (q.crossJoin(F.broadcast(cents))
              .select("qid", "qvec", "cell", d2.alias("d2"))
              .withColumn("rn", F.row_number().over(wc))
              .filter(F.col("rn") <= n_probe)
              .select("qid", "qvec", "cell"))

    cand = (probes.join(corpus, "cell")
            .filter(F.col("qid") != F.col("nid"))
            .withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
            .withColumn("nnorm", F.sqrt(_dot(F.col("nvec"), F.col("nvec")))))
    cos = _dot(F.col("qvec"), F.col("nvec")) / (
        F.col("qnorm") * F.col("nnorm"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid"))
    # each corpus vector lives in exactly one cell, so (qid, nid) is
    # already unique — no dedup shuffle needed (unlike multi-table LSH)
    return (cand.select("qid", "nid", F.round(cos, 6).alias("cosine"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).drop("rn"))


def cosine_neardup_pairs(emb: DataFrame, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ threshold. This exact all-pairs form is the oracle
    baseline; at 100 TB the same verification runs only on LSH-bucket
    candidates (``lsh_ann_topk``'s bucketing — sign-LSH collision
    probability is monotone in cosine, so banding bounds recall
    exactly as MinHash banding does for Jaccard). The filter is on the
    UNROUNDED cosine so the threshold decision is identical in any
    engine; rounding happens only on output."""
    a = _spread(emb.select(F.col(id_col).alias("id_a"),
                           _as_double(F.col(vec_col)).alias("va")))
    a = a.withColumn("na", F.sqrt(_dot(F.col("va"), F.col("va"))))
    b = emb.select(F.col(id_col).alias("id_b"),
                   _as_double(F.col(vec_col)).alias("vb"))
    b = b.withColumn("nb", F.sqrt(_dot(F.col("vb"), F.col("vb"))))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
             .filter(cos >= threshold)
             .select("id_a", "id_b", F.round(cos, 6).alias("cosine")))


@lru_cache(maxsize=None)
def _plane_weights(table: int, plane: int, dim: int = DIM) -> tuple[int, ...]:
    """±1 hyperplane weights, derived at build time: weight on dim d
    is +1 iff bit 0 (MSB-first) of md5('table:plane:d') is 1 — the
    exact value `_nibble(F.md5(...), 0)` would compute, but folded in
    Python so the Spark plan carries ±element_at arithmetic instead
    of thousands of md5 literal expressions."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()
        out.append(1 if (int(h[0], 16) >> 3) & 1 else -1)
    return tuple(out)


def _signed_sum(vec_col: Column, weights: tuple[int, ...]) -> Column:
    """Left-to-right ±element chain — bit-identical to the oracle's
    generated `+v[1]-v[2]...` expression (unary negation is an exact
    IEEE sign flip, so `s - e` ≡ `s + (-1)*e`)."""
    s = (F.element_at(vec_col, 1) if weights[0] > 0
         else -F.element_at(vec_col, 1))
    for d in range(1, len(weights)):
        e = F.element_at(vec_col, d + 1)
        s = (s + e) if weights[d] > 0 else (s - e)
    return s


def _sign_bits(vec_col: Column, table: int, n_planes: int, dim: int) -> Column:
    """Bucket key for one LSH table: n_planes sign bits. Plane p's
    weight on dim d is +1 iff bit 0 of md5('t:p:d') is 1 (weights
    precomputed by `_plane_weights`)."""
    bits = []
    for p in range(n_planes):
        s = _signed_sum(vec_col, _plane_weights(table, p, dim))
        bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_neardup_pairs(emb: DataFrame, threshold: float,
                      n_tables: int = 8, n_planes: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs, the 100 TB form: sign-LSH
    banded candidates + exact-cosine verify. Never builds the n²
    product — candidates are an equi-join on (table, bucket), exactly
    the MinHash-banding shape that is green for Jaccard dedup.

    Semantics: all (id_a < id_b) that share ≥1 of ``n_tables`` bucket
    keys AND have exact cosine ≥ threshold (filtered on the UNROUNDED
    value; rounding only on output). Recall vs the all-pairs form is
    the standard banding bound 1-(1-p^r)^b with p = 1-θ/π per plane:
    at a realistic near-dup operating point (cos ≥ 0.95, 8 planes,
    8 tables) ≈ 0.99; `cosine_neardup_pairs` remains the exact
    cross-check baseline at test scale.

    Sizing: buckets per table = 2^n_planes. Pick n_planes ≈ log2(n)
    − log2(wanted bucket size) so per-bucket pair work stays bounded;
    add tables to buy recall. The two knobs are independent, so the
    operator scales by config, not by code change.
    """
    vec = _as_double(F.col(vec_col))
    keyed = (_spread(emb.select(F.col(id_col).alias("id"),
                                vec.alias("v")))
             .select("id", "v", F.posexplode(F.array(*[
                 _sign_bits(F.col("v"), t, n_planes, DIM)
                 for t in range(n_tables)])).alias("tbl", "bucket")))
    a = keyed.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     "tbl", "bucket")
    b = keyed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     "tbl", "bucket")
    cand = (a.join(b, ["tbl", "bucket"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "va", "id_b", "vb")
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("na", F.sqrt(_dot(F.col("va"), F.col("va"))))
             .withColumn("nb", F.sqrt(_dot(F.col("vb"), F.col("vb")))))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (cand.filter(cos >= threshold)
                .select("id_a", "id_b", F.round(cos, 6).alias("cosine")))


def lsh_ann_topk(emb: DataFrame, query_filter: Column, k: int = 5,
                 n_tables: int = 4, n_planes: int = 8,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table;
    exact cosine on candidates only. Same output shape as
    ``cosine_topk`` (fewer than k rows possible for sparse buckets)."""
    from pyspark.sql import Window
    vec = _as_double(F.col(vec_col))
    keyed = emb.select(
        F.col(id_col), vec.alias("vec"),
        F.posexplode(F.array(*[
            _sign_bits(vec, t, n_planes, DIM) for t in range(n_tables)
        ])).alias("tbl", "bucket"))
    q = (keyed.join(emb.filter(query_filter).select(F.col(id_col)), id_col)
         .withColumnsRenamed({id_col: "qid", "vec": "qvec"}))
    c = keyed.withColumnsRenamed({id_col: "nid", "vec": "nvec"})
    cand = (q.join(c, ["tbl", "bucket"])
             .filter(F.col("qid") != F.col("nid"))
             .select("qid", "qvec", "nid", "nvec")
             .dropDuplicates(["qid", "nid"])
             .withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
             .withColumn("nnorm", F.sqrt(_dot(F.col("nvec"), F.col("nvec")))))
    cos = _dot(F.col("qvec"), F.col("nvec")) / (
        F.col("qnorm") * F.col("nnorm"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid"))
    return (cand.select("qid", "nid", F.round(cos, 6).alias("cosine"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).drop("rn"))
