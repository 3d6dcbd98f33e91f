"""Fifth extension wave — the round-5 scale operators:

- ``hll_sketch``: deterministic HyperLogLog distinct counts — the
  mergeable, O(m)-state replacement for exact COUNT(DISTINCT) at
  100 TB, made oracle-checkable by integer-only register math
  (operators/sketches.py),
- ``llm_substr_dedup``: exact-substring duplication profiling (the
  character-gram dedup signal of Lee et al. 2022),
- ``merge_upsert``: CDC MERGE INTO semantics (U/D/I change set
  applied in one full-outer join — operators/merge.py),
- ``llm_rarity``: unigram-LM corpus-typicality quality score in the
  repo's log-free rational form.

Same determinism contract as the rest of the registry (registry.py
docstring): md5-slice hashes, integer arithmetic until one final
division, DECIMAL money, explicit BIGINT casts on DuckDB counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.merge import merge_into
from .operators.sketches import (H48, histogram_quantiles,
                                 hll_alpha_numerator, hll_distinct)
from .registry import _t

# ------------------------------------------------- HyperLogLog ------

HLL_P = 8  # 256 registers: ~6.5% standard error


def q_hll_sketch(spark, sf_dir):
    """Mergeable HLL distinct-order estimate per returnflag beside the
    exact-when-small KMV twin (registry_pipelines.q_kmv_sketch). Two
    map-side-combined shuffles, O(256) state per group — the pattern
    that replaces exact distinct counts at 100 TB (and, because
    registers merge by MAX, the same sketch runs under streaming
    update mode). Accuracy against exact counts is pinned by
    tests/test_ext4.py."""
    l = _t(spark, sf_dir, "lineitem")
    return hll_distinct(l, ["l_returnflag"], "l_orderkey", p=HLL_P)


def _sql_hll_sketch(p: int = HLL_P) -> str:
    m = 1 << p
    rest = 48 - p
    wmod = 1 << rest
    return f"""
WITH h AS (
  SELECT l_returnflag,
         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12)
              AS BIGINT) AS h
  FROM lineitem),
r AS (
  SELECT l_returnflag, h // {wmod} AS bucket,
         CASE WHEN h % {wmod} = 0 THEN {rest + 1}
              ELSE {rest + 1} - length(bin(h % {wmod})) END AS rho
  FROM h),
mx AS (SELECT l_returnflag, bucket, MAX(rho) AS mreg
       FROM r GROUP BY l_returnflag, bucket),
a AS (SELECT l_returnflag,
             SUM(CAST(1 AS BIGINT) << (48 - mreg)) AS s,
             COUNT(*) AS nb
      FROM mx GROUP BY l_returnflag)
SELECT l_returnflag,
       {hll_alpha_numerator(p)!r}
         / CAST(s + ({m} - nb) * {H48} AS DOUBLE) AS hll_distinct,
       CAST({m} - nb AS BIGINT) AS zero_buckets
FROM a
"""


# ---------------------------------------- exact-substring dedup -----

SUBSTR_K = 40
SUBSTR_STRIDE = 8


def q_llm_substr_dedup(spark, sf_dir):
    """Character-gram duplication profile over documents: the
    fraction of each doc covered by 40-char grams that appear
    verbatim in another doc (llm/dedup.substring_dup_stats)."""
    from .llm.dedup import substring_dup_stats
    d = _t(spark, sf_dir, "documents")
    return substring_dup_stats(d, k=SUBSTR_K, stride=SUBSTR_STRIDE)


SQL_SUBSTR_DEDUP = f"""
WITH g AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(substr(text, CAST(p AS INT) + 1,
                                        {SUBSTR_K})), 1, 12)
              AS BIGINT) AS h
  FROM (SELECT doc_id, text,
               unnest(range(0, length(text) - {SUBSTR_K} + 1,
                            {SUBSTR_STRIDE})) AS p
        FROM documents WHERE length(text) >= {SUBSTR_K})),
c AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY h)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       ROUND(CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS dup_ratio
FROM g JOIN c USING (h)
GROUP BY g.doc_id
"""


# ------------------------------------------------ CDC merge ---------

INS_OFFSET = 900_000_000  # past the TPC-H orderkey range at tested SFs


def _order_changes(orders):
    """Deterministic U/D/I change set derived from the orders table:
    every 7th key re-priced +5%, every 13th deleted (D wins on
    overlap), every 101st mirrored as a fresh insert key."""
    k = F.col("o_orderkey")
    price = F.col("price")
    upd = (orders.filter((k % 7 == 0) & (k % 13 != 0))
           .select(k.alias("o_orderkey"), "o_orderstatus",
                   F.round(price * F.lit(1.05).cast("decimal(3,2)"), 2)
                   .cast("decimal(18,2)").alias("price"),
                   F.lit("U").alias("op")))
    dele = (orders.filter(k % 13 == 0)
            .select("o_orderkey", "o_orderstatus", "price",
                    F.lit("D").alias("op")))
    ins = (orders.filter(k % 101 == 0)
           .select((k + INS_OFFSET).alias("o_orderkey"),
                   F.lit("N").alias("o_orderstatus"),
                   F.lit("777.77").cast("decimal(18,2)").alias("price"),
                   F.lit("I").alias("op")))
    return upd.unionByName(dele).unionByName(ins)


def q_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics: the change set applied to orders in one
    full-outer key join (operators/merge.py), summarized per status
    so the check covers deletes (row counts drop), updates (totals
    shift by exactly +5% on the touched keys), and inserts (the new
    'N' status appears)."""
    o = (_t(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderstatus",
                 F.col("o_totalprice").cast("decimal(18,2)")
                 .alias("price")))
    merged = merge_into(o, _order_changes(o), "o_orderkey")
    return (merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("price").cast("double").alias("total_price")))


SQL_MERGE_UPSERT = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders),
chg AS (
  SELECT k, status,
         CAST(ROUND(price * CAST(1.05 AS DECIMAL(3,2)), 2)
              AS DECIMAL(18,2)) AS price, 'U' AS op
  FROM base WHERE k % 7 = 0 AND k % 13 <> 0
  UNION ALL
  SELECT k, status, price, 'D' FROM base WHERE k % 13 = 0
  UNION ALL
  SELECT k + {INS_OFFSET}, 'N', CAST(777.77 AS DECIMAL(18,2)), 'I'
  FROM base WHERE k % 101 = 0),
merged AS (
  SELECT COALESCE(c.status, b.status) AS status,
         COALESCE(c.price, b.price) AS price
  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
  WHERE c.op IS NULL OR c.op <> 'D')
SELECT status AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS total_price
FROM merged GROUP BY status
"""


# -------------------------------------------- unigram rarity --------

def q_llm_rarity(spark, sf_dir):
    """Corpus-typicality quality score per document
    (llm/text.rarity_scores — the log-free unigram-LM form)."""
    from .llm.text import rarity_scores
    d = _t(spark, sf_dir, "documents")
    return rarity_scores(d)


SQL_LLM_RARITY = """
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        FROM documents)
  WHERE tok <> ''),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
total AS (SELECT SUM(c) AS n_total FROM counts)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM((n_total * 1000000) // c) AS DOUBLE)
             / (COUNT(*) * 1000000.0), 6) AS rarity
FROM toks JOIN counts USING (tok) CROSS JOIN total
GROUP BY doc_id
"""




# ---------------------------------------------- BPE merge learning -

BPE_MERGES = 8


def q_llm_bpe_merges(spark, sf_dir):
    """Tokenizer-training statistics: the first 8 BPE merges learned
    from the corpus (llm/text.bpe_merges — word-frequency sufficient
    statistics, one corpus pass, declarative merge rounds)."""
    from .llm.text import bpe_merges
    return bpe_merges(_t(spark, sf_dir, "documents"), BPE_MERGES)


def _sql_bpe_merges(n: int = BPE_MERGES) -> str:
    """Unrolled-CTE oracle: round r = pair counts over s{r-1} →
    1-row argmax → two-pass literal replace into s{r} — the exact
    declarative program the Spark side chains, so every intermediate
    vocabulary state matches byte-for-byte."""
    toks = "string_split(trim(sym), ' ')"
    pair_list = (f"list_transform(range(1, len({toks})), "
                 f"i -> {toks}[i] || ' ' || {toks}[i + 1])")
    ctes = ["""w AS MATERIALIZED (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents) WHERE w <> '' GROUP BY w)""",
            r"""s0 AS MATERIALIZED (
  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym, cnt
  FROM w)"""]
    for r in range(1, n + 1):
        ctes.append(f"""p{r} AS MATERIALIZED (
  SELECT pair, SUM(cnt) AS total FROM (
    SELECT unnest({pair_list}) AS pair, cnt FROM s{r - 1})
  GROUP BY pair)""")
        ctes.append(f"""b{r} AS MATERIALIZED (
  SELECT {r} AS merge_rank, pair, replace(pair, ' ', '') AS merged,
         CAST(total AS BIGINT) AS total
  FROM p{r} ORDER BY total DESC, pair LIMIT 1)""")
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT replace(replace(sym, ' ' || b.pair || ' ',
                         ' ' || b.merged || ' '),
                 ' ' || b.pair || ' ', ' ' || b.merged || ' ') AS sym,
         cnt
  FROM s{r - 1}, b{r} b)""")
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, merged, total FROM b{r}"
        for r in range(1, n + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + union


# ------------------------------------------- weighted sampling -----

PRIORITY_K = 10


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement per
    language (operators/sampling.priority_sample): longer documents
    (weight = n_chars) are proportionally likelier survivors — the
    quality-weighted subset selection a training-data pipeline runs
    before expensive downstream stages."""
    from .operators.sampling import priority_sample
    d = _t(spark, sf_dir, "documents")
    return priority_sample(d, "n_chars", "doc_id", PRIORITY_K,
                           group_col="lang")


SQL_WEIGHTED_SAMPLE = f"""
WITH p AS (
  SELECT lang, doc_id, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
              AS BIGINT) // CAST(n_chars AS BIGINT) AS priority
  FROM documents)
SELECT lang, doc_id, n_chars, priority FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY priority, doc_id) AS rn
  FROM p) WHERE rn <= {PRIORITY_K}
"""




def q_llm_bpe_encode(spark, sf_dir):
    """Tokenizer apply: replay the 8 learned merges over the corpus
    and count BPE tokens per document (llm/text.bpe_encode — the
    merges collect to constants, exactly a broadcast model apply)."""
    from .llm.text import bpe_encode, bpe_merges
    d = _t(spark, sf_dir, "documents")
    return bpe_encode(d, bpe_merges(d, BPE_MERGES))


def _sql_bpe_encode(n: int = BPE_MERGES) -> str:
    """Oracle: the training CTE chain (same as _sql_bpe_merges) plus
    an apply stage — each word re-splits and the merges replay via
    the same two-pass replaces, scalar-subquerying b1..b8."""
    body = _sql_bpe_merges(n)
    head = body[:body.rindex("SELECT merge_rank, pair, merged, total FROM b1")]
    sym = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    for r in range(1, n + 1):
        pat = f"' ' || (SELECT pair FROM b{r}) || ' '"
        rep = f"' ' || (SELECT merged FROM b{r}) || ' '"
        sym = f"replace(replace({sym}, {pat}, {rep}), {pat}, {rep})"
    return f"""{head.rstrip()},
words AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents) WHERE w <> ''),
enc AS MATERIALIZED (
  SELECT doc_id,
         length(trim({sym}))
           - length(replace(trim({sym}), ' ', '')) + 1 AS nt
  FROM words)
SELECT doc_id, CAST(SUM(nt) AS BIGINT) AS n_bpe_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM enc GROUP BY doc_id
"""




# --------------------------------------------------- PageRank ------

PR_ROUNDS = 5
PR_TOPK = 20


def q_pagerank(spark, sf_dir):
    """PageRank over the user-interaction graph (operators/graph.py):
    an edge A→B whenever B's event directly follows A's within an
    event type (lead window over (ts, event_id) — a deterministic
    behavioral graph derived from the stream). Integer-scaled ranks
    make the 5 iterative rounds bit-identical across engines, so an
    ITERATIVE GRAPH ALGORITHM gets a full hash oracle (unrolled-CTE
    twin) instead of the usual rows-only check. Top-20 by rank."""
    from .operators.graph import behavioral_edges, pagerank
    e = _t(spark, sf_dir, "events")
    # day-rekeyed lead with boundary stitch — identical pair set to
    # the naive whole-type window, but no ~N/5-row sort partitions
    # (operators/graph.behavioral_edges)
    edges = behavioral_edges(e).select("src", "dst")
    ranks = pagerank(edges, rounds=PR_ROUNDS)
    return (ranks.orderBy(F.col("rank_scaled").desc(), "node")
            .limit(PR_TOPK))


def _sql_pagerank(rounds: int = PR_ROUNDS, k: int = PR_TOPK) -> str:
    from .operators.graph import PR_SCALE
    base = f"(SELECT {PR_SCALE} // n FROM nn)"
    ctes = [f"""ev AS MATERIALIZED (
  SELECT user_id,
         LEAD(user_id) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS nxt
  FROM events)""",
            """edges AS MATERIALIZED (
  SELECT user_id AS src, nxt AS dst FROM ev
  WHERE nxt IS NOT NULL AND nxt <> user_id)""",
            """nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL SELECT dst FROM edges))""",
            """deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)""",
            """ed AS MATERIALIZED (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src))""",
            "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
            f"""r0 AS MATERIALIZED (
  SELECT node, CAST({base} AS BIGINT) AS rank_scaled FROM nodes)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""r{r} AS MATERIALIZED (
  SELECT n.node,
         CAST((85 * COALESCE(s.insum, 0) + 15 * {base}) // 100
              AS BIGINT) AS rank_scaled
  FROM nodes n LEFT JOIN (
    SELECT ed.dst AS node, SUM(r.rank_scaled // ed.deg) AS insum
    FROM ed JOIN r{r - 1} r ON ed.src = r.node
    GROUP BY ed.dst) s USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_scaled FROM r{rounds} "
            f"ORDER BY rank_scaled DESC, node LIMIT {k}")




# ------------------------------------------ quantile sketch --------

QS_BINS = 256
QS_HI = 131072.0  # covers l_extendedprice's domain at any SF
QS_QUANTILES = (0.5, 0.9, 0.99)


def q_quantile_sketch(spark, sf_dir):
    """Mergeable fixed-bin quantile estimates of l_extendedprice per
    returnflag (operators/sketches.histogram_quantiles) — the
    deterministic, oracle-checkable twin of percentile_approx with
    O(bins) mergeable state (the same merge-by-SUM contract as the
    HLL registers). Accuracy vs exact percentiles is pinned by
    tests/test_ext4.py."""
    l = _t(spark, sf_dir, "lineitem")
    return histogram_quantiles(l, ["l_returnflag"], "l_extendedprice",
                               QS_QUANTILES, n_bins=QS_BINS,
                               lo=0.0, hi=QS_HI, scale=100)


def _sql_quantile_sketch() -> str:
    width = int(QS_HI * 100) // QS_BINS
    qsel, qjoin = [], []
    for q in QS_QUANTILES:
        pct = int(q * 100)
        qsel.append(f"""q{pct} AS (
  SELECT l_returnflag,
         ROUND(CAST(0 + bin * {width}
                    + ({width} * (CAST(CEIL(n * {q}) AS BIGINT)
                                  - cum + c)) / c AS DOUBLE) / 100,
               6) AS q_{pct}
  FROM cum
  WHERE cum >= CAST(CEIL(n * {q}) AS BIGINT)
    AND cum - c < CAST(CEIL(n * {q}) AS BIGINT))""")
        qjoin.append(f"JOIN q{pct} USING (l_returnflag)")
    return f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS v
  FROM lineitem),
b AS (
  SELECT l_returnflag,
         LEAST({QS_BINS - 1}, GREATEST(0, v // {width})) AS bin
  FROM s),
bc AS (SELECT l_returnflag, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (SELECT l_returnflag, bin, c,
               SUM(c) OVER (PARTITION BY l_returnflag
                            ORDER BY bin) AS cum,
               SUM(c) OVER (PARTITION BY l_returnflag) AS n
        FROM bc),
base AS (SELECT DISTINCT l_returnflag, CAST(n AS BIGINT) AS n FROM cum),
{",".join(qsel)}
SELECT base.l_returnflag, base.n,
       {", ".join(f"q_{int(q * 100)}" for q in QS_QUANTILES)}
FROM base {" ".join(qjoin)}
"""




# ------------------------------------------------ Python UDTF ------

def q_udtf_chunks(spark, sf_dir):
    """The strided chunker as a Spark 4 PYTHON UDTF (table function in
    a LATERAL join) — mechanism coverage for SURVEY §2.9's UDF/UDTF
    surface. Same contract and SAME ORACLE as the declarative
    ``llm_chunk`` (registry_llm2.q_chunk), so the two implementations
    cross-check each other through the shared SQL. The declarative
    Generate form remains the production path (codegen, no Python
    workers); the UDTF is the escape hatch for row-generating logic
    built-ins can't express — arrow-optimized, batched per partition.
    """
    from pyspark.sql.functions import udtf

    from .registry_llm2 import CHUNK_SIZE, CHUNK_STRIDE

    size, stride = CHUNK_SIZE, CHUNK_STRIDE

    @udtf(returnType="doc_id bigint, chunk_id int, start int, "
                     "n_tokens int, chunk_md5 string")
    class ChunkUDTF:
        def eval(self, doc_id, text):
            import hashlib
            toks = text.strip().lower().split(" ")
            n = len(toks)
            n_chunks = max(1, (n - size // 2) // stride + 1)
            for i in range(n_chunks):
                s = i * stride + 1
                window = " ".join(toks[s - 1:s - 1 + size])
                yield (doc_id, i, s, min(size, n - s + 1),
                       hashlib.md5(window.encode()).hexdigest())

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT c.* FROM udtf_docs, "
        "LATERAL chunk_udtf(doc_id, text) AS c")


def _sql_udtf_chunks() -> str:
    from .registry_llm2 import SQL_CHUNK
    return SQL_CHUNK


QUERIES_EXT4: dict[str, dict] = {
    "hll_sketch":       {"fn": q_hll_sketch, "sql": _sql_hll_sketch()},
    "llm_substr_dedup": {"fn": q_llm_substr_dedup,
                         "sql": SQL_SUBSTR_DEDUP},
    "merge_upsert":     {"fn": q_merge_upsert, "sql": SQL_MERGE_UPSERT},
    "llm_rarity":       {"fn": q_llm_rarity,   "sql": SQL_LLM_RARITY},
    "llm_bpe_merges":   {"fn": q_llm_bpe_merges,
                         "sql": _sql_bpe_merges()},
    "weighted_sample":  {"fn": q_weighted_sample,
                         "sql": SQL_WEIGHTED_SAMPLE},
    "llm_bpe_encode":   {"fn": q_llm_bpe_encode,
                         "sql": _sql_bpe_encode()},
    "pagerank":         {"fn": q_pagerank, "sql": _sql_pagerank()},
    "quantile_sketch":  {"fn": q_quantile_sketch,
                         "sql": _sql_quantile_sketch()},
    "udtf_chunks":      {"fn": q_udtf_chunks,
                         "sql": _sql_udtf_chunks()},
}
