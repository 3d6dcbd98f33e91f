"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

All stages are DataFrame plans. The scale design:

- MinHash: per-doc signature is a narrow projection (no shuffle);
  candidate generation is an equi-join on (band, minhash) — a
  shuffle on a *small* exploded table (B rows per doc), never an
  all-pairs product. Verification (exact Jaccard) touches only the
  candidate pairs.
- SimHash: 32-bit signature via explode+aggregate (one shuffle on
  doc_id); near-dup candidates join on 8-bit blocks (pigeonhole: any
  pair with hamming ≤ 3 shares one of 4 blocks), then exact hamming
  on the candidates only.
- n-gram Jaccard: brute-force *within a blocking key* (e.g. lang) —
  the honest quadratic baseline, bounded by the block size.

Shared contract with the SQL oracles: tokens are
``split(lower(trim(text)), ' ')``; shingles are space-joined word
n-grams, de-duplicated; hashes are md5 hex (lexicographic min is
well-defined identically in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

N_BANDS = 8
SIMHASH_BITS = 32
HEX = "0123456789abcdef"


def shingles(text_col: Column | str = "text", n: int = 3) -> Column:
    """Distinct space-joined word n-grams; empty array when the doc
    has fewer than n tokens."""
    toks = tokens(text_col)
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>"))


def minhash_signature(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      bands: int = N_BANDS) -> DataFrame:
    """(id, band, minh): per band b, min over shingles of
    md5('b:' || shingle). One row per (doc, band)."""
    sh = shingles(text_col, n)

    def band_hasher(b: int):
        # NB: must be a single-argument lambda — PySpark dispatches on
        # lambda arity, so `lambda s, b=b` would receive (element, index).
        prefix = f"{b}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s).cast("binary"))

    sig = F.array(*[F.array_min(F.transform(sh, band_hasher(b)))
                    for b in range(bands)])
    return (df.select(F.col(id_col), F.posexplode(sig).alias("band", "minh"))
              .filter(F.col("minh").isNotNull()))


def minhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  bands: int = N_BANDS,
                  threshold: float = 0.5) -> DataFrame:
    """LSH candidate pairs (share ≥1 band minhash) verified by exact
    shingle Jaccard ≥ threshold. Output: (id_a, id_b, jaccard)."""
    sig = minhash_signature(df, id_col, text_col, n, bands)
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.minh") == F.col("b.minh"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    docs = df.select(F.col(id_col), shingles(text_col, n).alias("sh"))
    j = (cand
         .join(docs.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
         .join(docs.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (j.select("id_a", "id_b",
                     F.round(inter / union, 6).alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))


def _nibble(hexstr: Column, j: int) -> Column:
    """Bit j (0-based, MSB-first) of the hex string's bit expansion."""
    ch = F.substring(hexstr, j // 4 + 1, 1)
    val = F.instr(F.lit(HEX), ch) - F.lit(1)
    return F.shiftright(val, 3 - j % 4).bitwiseAND(F.lit(1))


def simhash_bits(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash) where simhash is a `bits`-char '0'/'1' string:
    bit j is the sign of sum over token occurrences of ±1 according
    to bit j of md5(token)."""
    tok = (df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
             .withColumn("h", F.md5(F.col("tok").cast("binary"))))
    aggs = [F.sum(_nibble(F.col("h"), j) * 2 - 1).alias(f"s{j}")
            for j in range(bits)]
    summed = tok.groupBy(id_col).agg(*aggs)
    bitstr = F.concat(*[
        F.when(F.col(f"s{j}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)])
    return summed.select(F.col(id_col), bitstr.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found by
    8-bit-block LSH (pigeonhole over 4 blocks) + exact verify."""
    sims = simhash_bits(df, id_col, text_col, bits)
    n_blocks = bits // 8
    blocks = (sims.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.substring("simhash", 8 * i + 1, 8) for i in range(n_blocks)
        ])).alias("blk", "blk_val")))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.blk_val") == F.col("b.blk_val"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    ham = F.size(F.filter(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.col("sh_a").substr(i, F.lit(1))
        != F.col("sh_b").substr(i, F.lit(1))))
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", block_col: str = "lang",
                        n: int = 3, threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard over all pairs *within a block* — the
    quadratic baseline, bounded by blocking. Output:
    (id_a, id_b, jaccard ≥ threshold)."""
    docs = df.select(F.col(id_col), F.col(block_col).alias("blk"),
                     shingles(text_col, n).alias("sh"))
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b")))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (pairs.select("id_a", "id_b",
                         F.round(inter / union, 6).alias("jaccard"))
                 .filter(F.col("jaccard") >= threshold))
