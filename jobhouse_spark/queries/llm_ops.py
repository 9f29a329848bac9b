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
  FROM documents WHERE doc_id < 120
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
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 120)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.18)
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
           / length(text) AS punct_ratio
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


@register("l6b_quality_scores", oracle=None, tags=("llm", "text"))
def l6b_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6b: composite quality score + stopword ratio per doc (heuristic
    composition; components unit-tested, registered rows-only)."""
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
