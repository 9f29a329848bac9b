"""L-family: LLM-data-pipeline operators (BASELINE.json north_star).

Exact/deterministic variants are oracle-checked; approximate variants
(MinHash-LSH, BRP-LSH) are declared rows-only here and recall-checked
in tests/test_similarity.py (§2.C rule 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.functions.text import (
    punct_ratio,
    simhash16,
    stopword_ratio,
    token_count,
)
from jobhouse_spark.operators.dedup import exact_dedup_by_content
from jobhouse_spark.operators.similarity import (
    brute_force_top_k,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
)
from jobhouse_spark.queries.registry import dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "l1_exact_dedup",
    oracle=(
        "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique "
        "FROM documents"
    ),
    tags=("llm", "dedup", "headline"),
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: content-hash exact dedup cardinality."""
    d = Tables(spark, sf_dir).documents
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


@register(
    "l1b_dedup_survivors",
    oracle=(
        "SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id FROM ("
        "  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))"
    ),
    tags=("llm", "dedup"),
)
def l1b_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1b: deterministic survivor selection — smallest doc_id per
    content hash (operators/dedup.exact_dedup_by_content)."""
    d = Tables(spark, sf_dir).documents
    survivors = exact_dedup_by_content(d, "text", "doc_id")
    return survivors.agg(
        F.count("*").alias("n"), F.sum("doc_id").alias("sum_id")
    )


@register("l2_minhash_neardup", oracle=None, tags=("llm", "dedup", "approx", "headline"))
def l2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash-LSH near-duplicate candidate pairs (recall-checked in
    tests with planted duplicates; model-specific, not hash-checked).

    The synthetic corpus draws from a tiny vocabulary, so random doc
    pairs already share most words — a loose threshold would make the
    LSH bucket join near-quadratic. Tight threshold + bounded slice
    keeps the demo query scan-shaped; the recall test exercises the
    operator's actual duplicate-finding power."""
    d = Tables(spark, sf_dir).documents
    pairs = minhash_near_duplicates(d, jaccard_threshold=0.5, num_hash_tables=3)
    return pairs.select("doc_a", "doc_b").orderBy("doc_a", "doc_b")


@register(
    "l2b_ngram_jaccard",
    oracle="""
WITH shingled AS (
  SELECT doc_id AS doc,
         list_distinct(list_transform(
           range(1, len(string_split_regex(lower(text), '\\s+')) - 1),
           i -> string_split_regex(lower(text), '\\s+')[i] || ' ' ||
                string_split_regex(lower(text), '\\s+')[i+1] || ' ' ||
                string_split_regex(lower(text), '\\s+')[i+2]
         )) AS shingles
  FROM documents WHERE doc_id < 500
),
sized AS (SELECT doc, shingles, len(shingles) AS set_size FROM shingled),
inv AS (SELECT doc, set_size, unnest(shingles) AS shingle FROM sized),
common AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, a.set_size AS size_a,
         b.set_size AS size_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common
FROM common
WHERE CAST(n_common AS DOUBLE) / (size_a + size_b - n_common) >= 0.18
ORDER BY doc_a, doc_b
""",
    tags=("llm", "dedup"),
)
def l2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b: exact 3-gram Jaccard near-dup pairs via inverted shingle
    index (deterministic counterpart of MinHash, hash-checked).

    The Jaccard threshold compares exact integers (count ratios), so
    both engines agree with no fp tolerance issues.
    """
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.18)
    return pairs.select("doc_a", "doc_b", "n_common").orderBy("doc_a", "doc_b")


@register(
    "l2b2_ngram_jaccard_capped",
    oracle="""
WITH shingled AS (
  SELECT doc_id AS doc,
         list_distinct(list_transform(
           range(1, len(string_split_regex(lower(text), '\\s+')) - 1),
           i -> string_split_regex(lower(text), '\\s+')[i] || ' ' ||
                string_split_regex(lower(text), '\\s+')[i+1] || ' ' ||
                string_split_regex(lower(text), '\\s+')[i+2]
         )) AS shingles
  FROM documents WHERE doc_id < 500
),
inv0 AS (SELECT doc, unnest(shingles) AS shingle FROM shingled),
hot AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) > 4),
inv AS (SELECT doc, shingle FROM inv0
        WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc, COUNT(*) AS set_size FROM inv GROUP BY doc),
common AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common
FROM common
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.18
ORDER BY doc_a, doc_b
""",
    tags=("llm", "dedup"),
)
def l2b2_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b2: the df-capped twin of l2b — same inverted-index exact
    Jaccard, with shingles of document frequency > 4 dropped before the
    self-join (ngram_jaccard_pairs(max_df=4)) and set sizes recomputed
    over the pruned universe. This is the 100 TB shape: the uncapped
    self-join emits C(df, 2) rows per shingle, so one boilerplate
    3-gram shared by 10^6 docs would be ~5*10^11 join rows in one key;
    the cap bounds every shingle at C(4, 2). Oracle mirrors the cap
    (HAVING COUNT(*) > 4 → NOT IN) so the pruned-universe Jaccard is
    hash-checked end-to-end, cap active on real data."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.18, max_df=4)
    return pairs.select("doc_a", "doc_b", "n_common").orderBy("doc_a", "doc_b")


@register(
    "l3_cosine_topk",
    oracle="""
WITH m AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * 1000000
                     AS BIGINT)) AS mv
  FROM embeddings),
q AS (SELECT vec_id AS query_id, mv AS q_vec FROM m WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, mv AS c_vec FROM m),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(list_zip(q_vec, c_vec),
                                      t -> t[1] * t[2])) AS BIGINT) AS s
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id,
       CAST(s AS DOUBLE) / 1000000000000.0 AS score, rn
FROM ranked WHERE rn <= 10 ORDER BY query_id, rn
""",
    tags=("llm", "similarity", "headline"),
)
def l3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: exact brute-force top-10 by dot product for 5 probe vectors.

    Ranking happens on the exact integer micro-unit dot product so the
    order is engine-independent (double dot products would rank
    differently when two candidates are within fp noise) and ~10x
    cheaper than BigDecimal folds. Candidates stream map-only against a
    broadcast probe set — no shuffle of the big side.
    """
    emb = Tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") < 5)
    topk = brute_force_top_k(probes, emb, k=10, exact_decimal=True)
    # micro-unit integer score -> decimal-scale double: |s| < 2^53 so
    # the int64->double conversion is exact and the single division is
    # correctly rounded identically in both engines
    return topk.select(
        "query_id",
        "neighbor_id",
        (F.col("score").cast("double") / F.lit(1e12)).alias("score"),
        "rn",
    ).orderBy("query_id", "rn")


@register("l3b_lsh_topk", oracle=None, tags=("llm", "similarity", "approx"))
def l3b_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3b: LSH-bucketed approximate top-k (the 100 TB path; recall vs
    exact checked in tests/test_similarity.py)."""
    emb = Tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") < 5)
    from jobhouse_spark.operators.similarity import lsh_top_k  # noqa: PLC0415

    return lsh_top_k(probes, emb, k=10).select(
        "query_id", "neighbor_id", "rn"
    ).orderBy("query_id", "rn")


@register("l3c_ivf_topk", oracle=None, tags=("llm", "similarity", "approx"))
def l3c_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3c: IVF (inverted-file) approximate top-k — k-means coarse
    quantizer, corpus assigned to cells map-only, queries probe only the
    n_probe nearest cells. Complements l3b: IVF adapts to the data
    distribution where LSH is data-independent. Rows-only registration
    (k-means is model-derived, not SQL-expressible); recall vs exact
    brute force is asserted in tests/test_operators_scale.py."""
    from jobhouse_spark.operators.ann import ivf_top_k, train_centroids  # noqa: PLC0415

    emb = Tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") < 5)
    centroids = train_centroids(emb, n_cells=8)
    return ivf_top_k(probes, emb, centroids, k=10, n_probe=4).select(
        "query_id", "neighbor_id", "rn"
    ).orderBy("query_id", "rn")


_MICRO_SQL = (
    "list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) "
    "AS DECIMAL(12,6)) * 1000000 AS BIGINT))"
)


def _l3b2_oracle() -> str:
    """DuckDB replica of the ENTIRE lsh_top_k bucket pipeline on the
    deterministic-projection path: same micro-unit quantization, the
    same seeded integer projection vectors (lsh_projection_vectors —
    interpolated as literals), the same pmod-based floor-div bucketing,
    per-(query, table, bucket) candidate cap, multi-table dedup, and
    exact integer squared-L2 ranking. Any drift anywhere flips the
    hash."""
    from jobhouse_spark.operators.similarity import lsh_projection_vectors  # noqa: PLC0415

    w = 1 << 30
    projs = lsh_projection_vectors(42, 3, 64)
    vals = ", ".join(f"({i}, {pv}::BIGINT[])" for i, pv in enumerate(projs))
    return f"""
WITH m AS (SELECT vec_id, {_MICRO_SQL} AS mv FROM embeddings),
proj(table_idx, pv) AS (VALUES {vals}),
hashed AS (
  SELECT vec_id, mv, table_idx,
         CAST((d - (((d % {w}) + {w}) % {w})) / {w} AS BIGINT) AS bucket
  FROM (SELECT vec_id, mv, table_idx,
               CAST(list_sum(list_transform(list_zip(mv, pv), t -> t[1] * t[2])) AS BIGINT) AS d
        FROM m CROSS JOIN proj)),
qb AS (SELECT vec_id AS query_id, mv AS q_vec, table_idx, bucket FROM hashed WHERE vec_id < 5),
cb AS (SELECT vec_id AS neighbor_id, mv AS c_vec, table_idx, bucket FROM hashed),
joined AS (
  SELECT query_id, neighbor_id, cb.table_idx, cb.bucket,
         CAST(list_sum(list_transform(list_zip(q_vec, c_vec),
                                      t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS dist
  FROM cb JOIN qb ON cb.table_idx = qb.table_idx AND cb.bucket = qb.bucket
  WHERE query_id <> neighbor_id),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY query_id, table_idx, bucket
                               ORDER BY dist, neighbor_id) AS bn
  FROM joined),
cand AS (SELECT query_id, neighbor_id, MIN(dist) AS dist
         FROM capped WHERE bn <= 10 GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM cand)
SELECT query_id, neighbor_id, dist, rn FROM ranked WHERE rn <= 10 ORDER BY query_id, rn
"""


@register("l3b2_lsh_checked", oracle=_l3b2_oracle(), tags=("llm", "similarity"))
def l3b2_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3b2: the LSH-bucketed top-k pipeline, differentially verified
    END-TO-END — the same lsh_top_k operator as l3b (bucket equi-join,
    per-bucket candidate cap, multi-table dedup, ranked merge) with the
    hash family swapped from pyspark.ml's fitted BRP projections to
    seeded integer projection vectors both engines compute
    bit-identically (the l2c md5/xxhash64 pattern). l3b keeps the
    data-independent ml path in production; this entry proves the
    ALGORITHM: quantization, bucketing, capping, dedup, and the exact
    integer distance ranking all hash-match a from-scratch DuckDB
    replica."""
    from jobhouse_spark.operators.similarity import (  # noqa: PLC0415
        lsh_projection_vectors,
        lsh_top_k,
    )

    emb = Tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") < 5)
    projs = lsh_projection_vectors(42, 3, 64)
    return lsh_top_k(
        probes, emb, k=10, projections=projs, bucket_width=1 << 30
    ).orderBy("query_id", "rn")


def _l3c2_oracle() -> str:
    """DuckDB replica of the ENTIRE ivf_top_k pipeline on the
    exact-integer path: same micro-unit quantization, the same seeded
    integer centroids (ivf_fixed_centroids — interpolated as literals),
    exact integer squared-L2 argmin cell assignment (ties on centroid
    index), n_probe cell expansion, cell-pruned join, and exact integer
    dot ranking."""
    from jobhouse_spark.operators.ann import ivf_fixed_centroids  # noqa: PLC0415

    cents = ivf_fixed_centroids(42, 8, 64)
    vals = ", ".join(f"({i}, {c}::BIGINT[])" for i, c in enumerate(cents))
    return f"""
WITH m AS (SELECT vec_id, {_MICRO_SQL} AS mv FROM embeddings),
cent(cell, cv) AS (VALUES {vals}),
dists AS (
  SELECT vec_id, mv, cell,
         CAST(list_sum(list_transform(list_zip(mv, cv),
                                      t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS d
  FROM m CROSS JOIN cent),
rnk AS (
  SELECT vec_id, mv, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS r
  FROM dists),
assigned AS (SELECT vec_id AS neighbor_id, mv AS c_vec, cell FROM rnk WHERE r = 1),
probes AS (SELECT vec_id AS query_id, mv AS q_vec, cell
           FROM rnk WHERE r <= 4 AND vec_id < 5),
pairs AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(list_zip(q_vec, c_vec), t -> t[1]*t[2])) AS BIGINT) AS score
  FROM assigned JOIN probes USING (cell)
  WHERE query_id <> neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
  FROM pairs)
SELECT query_id, neighbor_id, score, rn FROM ranked WHERE rn <= 10 ORDER BY query_id, rn
"""


@register("l3c2_ivf_checked", oracle=_l3c2_oracle(), tags=("llm", "similarity"))
def l3c2_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3c2: the IVF top-k pipeline, differentially verified END-TO-END
    — the same ivf_top_k operator as l3c (cell assignment, probe
    expansion, cell-pruned broadcast join, ranked merge) with the
    quantizer swapped from fitted k-means centroids to seeded integer
    micro-unit centroids both engines interpolate identically, and all
    arithmetic exact-integer. l3c keeps k-means in production; this
    entry proves the MECHANISM hash-matches a from-scratch DuckDB
    replica."""
    from jobhouse_spark.operators.ann import ivf_fixed_centroids, ivf_top_k  # noqa: PLC0415

    emb = Tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") < 5)
    cents = ivf_fixed_centroids(42, 8, 64)
    return ivf_top_k(
        probes, emb, cents, k=10, n_probe=4, exact_micro=True
    ).orderBy("query_id", "rn")


@register(
    "l4_text_stats",
    oracle=(
        "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
        + fin_sql("AVG(" + dec_sql("n_chars") + ")")
        + " AS avg_chars, "
        + fin_sql("AVG(" + dec_sql("len(string_split_regex(text, '\\s+'))") + ")")
        + " AS avg_tokens "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    tags=("llm", "text", "headline"),
)
def l4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-language corpus statistics + token counting."""
    from jobhouse_spark.queries.registry import dec  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            fin(F.avg(dec(F.col("n_chars")))).alias("avg_chars"),
            fin(F.avg(dec(token_count(F.col("text"))))).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def _l4b2_oracle() -> str:
    """DuckDB replica of simhash16 on the md5 token-hash path: same
    lowercase whitespace tokenizer, same hex->int token hash, same
    per-bit ±1 vote and sign rule, same bit packing."""
    from jobhouse_spark.functions.hashing import MD5_INT32_SQL  # noqa: PLC0415

    hexint = MD5_INT32_SQL.format(x="t")
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return rf"""
WITH toked AS (
  SELECT doc_id,
         list_transform(string_split_regex(lower(text), '\s+'), t -> {hexint}) AS hs
  FROM documents WHERE doc_id < 100)
SELECT doc_id, CAST({bits} AS BIGINT) AS fingerprint FROM toked ORDER BY doc_id
"""


@register("l4b2_simhash_checked", oracle=_l4b2_oracle(), tags=("llm", "text"))
def l4b2_simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4b2: the SimHash fingerprint, differentially verified — the same
    simhash16 expression pipeline as l4b with the token hash swapped
    from xxhash64 to the md5-derived int both engines compute
    bit-identically (the l2c pattern). Proves the tokenizer, per-bit
    voting, sign rule, and bit packing end-to-end against a
    from-scratch DuckDB replica."""
    d = Tables(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            simhash16(F.col("text"), token_hash="md5").cast("long").alias("fingerprint"),
        )
        .orderBy("doc_id")
    )


@register("l4b_simhash_fingerprint", oracle=None, tags=("llm", "text"))
def l4b_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4b: 16-bit SimHash fingerprint per document (deterministic but
    xxhash64-based, so not DuckDB-expressible; exactness unit-tested)."""
    d = Tables(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 100)
        .select("doc_id", simhash16(F.col("text")).alias("fingerprint"))
        .orderBy("doc_id")
    )


@register(
    "l5_binary_columns",
    oracle=(
        "SELECT doc_id, octet_length(unhex(md5(text))) AS bin_len, "
        "base64(unhex(md5(text))) AS bin_b64, sha256(text) AS text_sha "
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"
    ),
    tags=("llm", "multimodal"),
)
def l5_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: BinaryType round trip — length + hash over binary cells.

    (The full media pipeline — binaryFile scan + mapInPandas feature
    extraction with stubbed codecs — lives in sources/multimodal.py and
    is exercised by tests/test_multimodal.py.)
    """
    d = Tables(spark, sf_dir).documents
    bin_col = F.unhex(F.md5("text"))
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.octet_length(bin_col).alias("bin_len"),
            F.base64(bin_col).alias("bin_b64"),
            F.sha2(F.col("text"), 256).alias("text_sha"),
        )
        .orderBy("doc_id")
    )


@register(
    "l6_quality_filter",
    oracle="""
SELECT COUNT(*) AS n_pass,
       COUNT(*) FILTER (WHERE lang = 'en') AS n_en,
       {pr} AS avg_punct_ratio
FROM (
  SELECT lang,
         CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio
  FROM documents
  WHERE n_chars BETWEEN 100 AND 5000
)
""".format(pr=fin_sql("AVG(" + dec_sql("punct_ratio", 8) + ")", 8)),
    tags=("llm", "text"),
)
def l6_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: quality gates — length band, language, punctuation density."""
    from jobhouse_spark.queries.registry import dec  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents
    filtered = d.filter(F.col("n_chars").between(100, 5000)).select(
        "lang", punct_ratio(F.col("text")).alias("pr")
    )
    return filtered.agg(
        F.count("*").alias("n_pass"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
        fin(F.avg(dec(F.col("pr"), 8)), 8).alias("avg_punct_ratio"),
    )


def _l6b_oracle() -> str:
    """DuckDB replica of quality_score/stopword_ratio. Every term is
    int-over-int double division (IEEE-identical in any engine) and the
    stopword list interpolates from the SAME STOPWORDS constant, so the
    heuristic is hash-checkable with no rounding discipline needed."""
    from jobhouse_spark.functions.text import STOPWORDS  # noqa: PLC0415

    stop_in = ", ".join(f"'{s}'" for s in STOPWORDS)
    return rf"""
WITH s AS (
  SELECT doc_id, n_chars,
         string_split_regex(lower(text), '\s+') AS toks,
         length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         length(text) AS n_len
  FROM documents WHERE doc_id < 100),
r AS (
  SELECT doc_id,
         CAST(n_chars BETWEEN 100 AND 20000 AS INT) AS len_ok,
         CAST(n_punct / greatest(n_len, 1) < 0.3 AS INT) AS punct_ok,
         len(list_filter(toks, t -> t IN ({stop_in}))) / greatest(len(toks), 1) AS stop_ratio
  FROM s)
SELECT doc_id,
       (len_ok + punct_ok + CAST(stop_ratio BETWEEN 0.0 AND 0.6 AS INT)) / 3.0 AS quality,
       stop_ratio
FROM r ORDER BY doc_id
"""


@register("l6b_quality_scores", oracle=_l6b_oracle(), tags=("llm", "text"))
def l6b_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6b: composite quality score + stopword ratio per doc
    (C4/Gopher-style heuristic composition; components unit-tested AND
    the full per-doc output hash-checked against a DuckDB replica —
    every term is int/int double division, IEEE-identical cross-engine)."""
    from jobhouse_spark.functions.text import quality_score  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
            stopword_ratio(F.col("text")).alias("stop_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "l6c_unigram_logprob",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents),
uni AS (
  SELECT tok, COUNT(*) AS c FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
stats AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM uni),
doc_toks AS (
  SELECT doc_id, unnest(t) AS tok FROM toks WHERE doc_id < 200),
lp AS (
  SELECT doc_id,
         CAST(ln((u.c + 1.0) / (s.total + s.vocab)) AS DECIMAL(18,9)) AS lp
  FROM doc_toks d JOIN uni u USING (tok) CROSS JOIN stats s)
SELECT doc_id, COUNT(*) AS n_tok,
       CAST(CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE)
         AS avg_logprob
FROM lp GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text", "quality"),
)
def l6c_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6c: perplexity-proxy quality score — per-document average
    unigram log-probability under the corpus's own Laplace-smoothed
    unigram model (the CCNet/RefinedWeb 'LM quality filter' with the
    n-gram model collapsed to unigrams: gibberish and off-distribution
    docs score low, fluent in-distribution text scores high).

    Scale shape: ONE corpus scan builds the unigram table (partial+final
    agg; verified in the r14 physical plan — the model's two scalars ride
    on a lexicon-sized global window instead of a second aggregate whose
    lineage re-scanned the corpus); the model — vocab counts + two
    scalars — is lexicon-sized at any corpus size, so scoring is a
    broadcast join + map-side math and one groupBy(doc) aggregate. Determinism: per-token log-probs round
    through DECIMAL(18,9) BEFORE summing (decimal addition is exact in
    any order — AQE/retries can't perturb results), then one exact
    int-over-int style division rounds through DECIMAL(18,6)."""
    from pyspark.sql import Window  # noqa: PLC0415

    from jobhouse_spark.queries.registry import dec  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents
    tok = F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    uni = d.select(tok).groupBy("tok").agg(F.count("*").alias("c"))
    # total/vocab as GLOBAL-WINDOW columns over the unigram table, not a
    # separate .agg() off `uni` — an uncached second reference re-executes
    # the whole corpus tokenize+aggregate lineage, so the r13 plan
    # scanned the corpus twice to produce two scalars (round-14 sweep).
    # The single-partition window is lexicon-sized — the same smallness
    # assumption the uni broadcast below already makes.
    wall = Window.partitionBy()
    uni = uni.select(
        "tok", "c",
        F.sum("c").over(wall).alias("total"),
        F.count("*").over(wall).alias("vocab"),
    )
    doc_toks = d.filter(F.col("doc_id") < 200).select("doc_id", tok)
    lp = (
        doc_toks.join(F.broadcast(uni), "tok")
        .select(
            "doc_id",
            dec(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("total") + F.col("vocab"))), 9
            ).alias("lp"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            fin(F.sum("lp").cast("double") / F.count("*"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )
