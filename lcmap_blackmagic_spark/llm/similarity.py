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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _nibble, _spread

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


def _sign_bits(vec_col: Column, table: int, n_planes: int, dim: int) -> Column:
    """Bucket key for one LSH table: n_planes sign bits. Plane p's
    weight on dim d is +1 iff bit 0 of md5('t:p:d') is 1."""
    bits = []
    for p in range(n_planes):
        terms = []
        for d in range(dim):
            w = _nibble(F.md5(F.lit(f"{table}:{p}:{d}").cast("binary")), 0)
            terms.append((w * 2 - 1).cast("double")
                         * F.element_at(vec_col, d + 1))
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
