"""Training-data pipeline operators beyond L1-L10: document chunking,
repetition-based quality scoring, eval-set contamination detection, and
BM25 relevance ranking. All four are hash-checked against DuckDB — the
scoring math follows the §2.C discipline (exact-integer token counts,
decimal-before-aggregate, DOUBLE finals).

Scale notes (100 TB): every query here is scan → per-row array work →
one keyed aggregate; no shuffle wider than the final groupBy(doc_id),
and the contamination join broadcasts the (tiny) eval-shingle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import dec, fin, register
from jobhouse_spark.tables import Tables

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


@register(
    "l11_doc_chunking",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 500),
s AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS start FROM t)
SELECT doc_id,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(len(toks[start:start + 63]) AS BIGINT) AS n_tok,
       md5(array_to_string(toks[start:start + 63], ' ')) AS chunk_md5
FROM s ORDER BY doc_id, chunk_start
""",
    tags=("llm", "text", "chunking"),
)
def l11_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11: overlapping token-window chunking (64-token windows, stride
    48) — the context-window packing step of a pretraining pipeline.
    Pure JVM array ops (split → sequence → explode → slice), so chunking
    100 TB is a narrow scan with no shuffle at all; chunk identity is
    md5 over the joined tokens, hash-checked cross-engine."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.expr("sequence(1, size(toks), 48)")).alias("start"),
    ).select(
        "doc_id",
        F.col("start").cast("long").alias("chunk_start"),
        F.expr("size(slice(toks, start, 64))").cast("long").alias("n_tok"),
        F.md5(F.expr("concat_ws(' ', slice(toks, start, 64))")).alias("chunk_md5"),
    )
    return chunks.orderBy("doc_id", "chunk_start")


@register(
    "l12_repetition_ratio",
    oracle=rf"""
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, len({_TOKS}) - 1),
           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]) AS grams
  FROM documents WHERE len({_TOKS}) >= 3)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CAST(CAST(CAST(len(list_distinct(grams)) AS DOUBLE) /
                 CAST(len(grams) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
         AS uniq_ratio
FROM g ORDER BY doc_id
""",
    tags=("llm", "text", "quality"),
)
def l12_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12: repetition-based quality signal — distinct-trigram ratio per
    document (the Gopher/RefinedWeb "repetition fraction" filter). The
    ratio divides two exact integers in IEEE double, then rounds through
    decimal, so both engines emit identical bits. Narrow per-row work;
    no shuffle beyond the final sort. The early repartition spreads the
    CPU-heavy tri-gram build across cores when the corpus arrives in
    fewer splits than cores (the l13 single-file trap — measured
    minutes single-threaded at 10x without it)."""
    d = Tables(spark, sf_dir).documents
    g = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), "
                "element_at(toks, i+2)))"
            ).alias("grams"),
        )
    )
    n_grams = F.size("grams").cast("long")
    n_distinct = F.size(F.array_distinct("grams")).cast("long")
    return g.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        fin(n_distinct.cast("double") / n_grams.cast("double"), 6).alias("uniq_ratio"),
    ).orderBy("doc_id")


@register(
    "l13_contamination_overlap",
    oracle=rf"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len({_TOKS}) - 2),
           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]
                || ' ' || {_TOKS}[i+3])) AS shingles
  FROM documents WHERE len({_TOKS}) >= 4),
eval_sh AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 97 = 0),
train AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle
  FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT t.doc_id, t.n_shingles, COUNT(*) AS n_overlap
  FROM train t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY 1, 2)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       CAST(CAST(CAST(n_overlap AS DOUBLE) / CAST(n_shingles AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) AS contaminated_frac
FROM hits ORDER BY doc_id
""",
    tags=("llm", "text", "dedup", "contamination", "headline"),
)
def l13_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L13: train/eval contamination check — 4-gram shingle overlap of
    every training document against a held-out eval set (doc_id % 97),
    the decontamination step every benchmark-clean corpus needs. The
    eval shingle set is tiny by construction, so Spark broadcasts it:
    at 100 TB this is a map-side hash probe per shingle, one shuffle
    only for the per-doc count aggregate.

    The early repartition spreads the CPU-heavy shingling across all
    cores even when the input arrives in few splits (one parquet file
    locally — the small-file/heavy-compute case where scan parallelism
    understates compute parallelism)."""
    d = Tables(spark, sf_dir).documents
    sh = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 4)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(toks) - 3), i -> "
                    "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), "
                    "element_at(toks, i+2), element_at(toks, i+3)))"
                )
            ).alias("shingles"),
        )
    )
    # explode_outer, not explode: InferFiltersFromGenerate would infer
    # size(shingles)>0 from a plain explode and push the ENTIRE shingle
    # expression below the exchange into the scan filter — re-shingling
    # the whole corpus serially. The outer variant infers nothing, and
    # size(toks)>=4 already guarantees a non-empty shingle array (a
    # null row couldn't survive the inner join anyway).
    is_eval = F.col("doc_id") % 97 == 0
    eval_sh = (
        sh.filter(is_eval)
        .select(F.explode_outer("shingles").alias("shingle"))
        .distinct()
    )
    train = sh.filter(~is_eval).select(
        "doc_id",
        F.size("shingles").cast("long").alias("n_shingles"),
        F.explode_outer("shingles").alias("shingle"),
    )
    hits = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_overlap"))
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        fin(
            F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double"), 6
        ).alias("contaminated_frac"),
    ).orderBy("doc_id")


@register(
    "l15_dedup_clusters",
    oracle=r"""
WITH RECURSIVE shingled AS (
  SELECT doc_id AS doc,
         list_distinct(list_transform(
           range(1, len(string_split_regex(lower(text), '\s+')) - 1),
           i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                string_split_regex(lower(text), '\s+')[i+2]
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
),
pairs AS (
  SELECT doc_a, doc_b FROM common
  WHERE CAST(n_common AS DOUBLE) / (size_a + size_b - n_common) >= 0.18
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id < 120),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT node AS doc_id,
       CAST(component AS BIGINT) AS component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
       (node = component) AS is_survivor
FROM labeled ORDER BY doc_id
""",
    tags=("llm", "dedup", "graph", "headline"),
)
def l15_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15: near-dup cluster formation — transitively close the exact
    3-gram Jaccard pair graph (l2b) into duplicate clusters via
    distributed min-label connected components (operators/graph.py),
    then elect the min-doc_id survivor per cluster. This is the step
    that turns pairwise similarity into a keep/drop decision; the
    DuckDB oracle closes the same graph with a recursive CTE."""
    from pyspark.sql import Window  # noqa: PLC0415

    from jobhouse_spark.operators.graph import connected_components  # noqa: PLC0415
    from jobhouse_spark.operators.similarity import ngram_jaccard_pairs  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 120)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.18)
    labels = connected_components(
        d.select(F.col("doc_id").alias("node")),
        pairs,
        src_col="doc_a",
        dst_col="doc_b",
    )
    w = Window.partitionBy("component")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        F.count("*").over(w).cast("long").alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    ).orderBy("doc_id")


@register(
    "l16_embedding_centroids",
    oracle="""
WITH cells AS (
  SELECT label, CAST(t.i AS INT) AS dim_idx,
         CAST(SUM(CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(18,6)))
              * 1000000 AS BIGINT) AS su_micro,
         COUNT(*) AS n
  FROM embeddings, range(1, 65) t(i)
  GROUP BY label, t.i),
r AS (
  SELECT label, dim_idx, n,
         (2 * abs(su_micro) + n) // (2 * n) AS mag, sign(su_micro) AS sg
  FROM cells)
SELECT label, dim_idx,
       CAST(sg * mag AS BIGINT) AS centroid_micro,
       CAST(sg * mag AS DOUBLE) / 1000000.0 AS centroid
FROM r ORDER BY label, dim_idx
""",
    tags=("llm", "embeddings", "features"),
)
def l16_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16: per-label embedding centroids (mean pooling) — the class-
    prototype / cluster-seed computation of an embedding pipeline.

    Determinism: element values round once to micro-units (float widened
    to double first), sums stay in exact decimal, and the mean rounds
    half-away-from-zero in PURE INTEGER arithmetic ((2|s|+n) div 2n) —
    no floating division anywhere, because a scale-6 fp mean with
    divisors like 47 lands on rounding half-boundaries that Spark and
    DuckDB resolve differently. The final double is bigint/10^6, exact
    inputs, correctly rounded identically in both engines.
    At scale: posexplode → groupBy(label, dim) shuffles only
    64 x n_labels cells — map-side partial aggregation does the heavy
    lifting."""
    emb = Tables(spark, sf_dir).embeddings
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim_idx"),
        dec(F.col("x").cast("double"), 6).alias("xd"),
    )
    cells = exploded.groupBy("label", "dim_idx").agg(
        (F.sum("xd") * 1000000).cast("long").alias("su_micro"),
        F.count("*").alias("n"),
    )
    mag = F.expr("(2 * abs(su_micro) + n) DIV (2 * n)")
    sg = F.signum("su_micro").cast("long")
    return cells.select(
        "label",
        "dim_idx",
        (sg * mag).cast("long").alias("centroid_micro"),
        ((sg * mag).cast("double") / F.lit(1000000.0)).alias("centroid"),
    ).orderBy("label", "dim_idx")


@register(
    "l17_token_budget_packing",
    oracle=r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
  FROM documents),
c AS (
  SELECT source, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM t)
SELECT source, doc_id, n_tok,
       CAST(floor(CAST(cum_tok - n_tok AS DOUBLE) / 512.0) AS BIGINT) AS shard_id
FROM c ORDER BY source, doc_id
""",
    tags=("llm", "text", "sharding"),
)
def l17_token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L17: token-budget shard packing — assign documents to fixed-token
    training shards (512-token budget) by cumulative fill within each
    source. The running sum partitions by source, so at 100 TB every
    source packs in parallel (no global single-partition window); shard
    identity is the doc's starting offset divided by the budget, exact
    integer math."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents
    t = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "source",
        "doc_id",
        "n_tok",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")).cast("double") / F.lit(512.0)
        )
        .cast("long")
        .alias("shard_id"),
    ).orderBy("source", "doc_id")


_BM25_TERMS = ("data", "query", "hash")
_K1 = 1.2
_B = 0.75


@register(
    "l14_bm25",
    oracle=rf"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM d),
terms AS (SELECT * FROM (VALUES ('data'), ('query'), ('hash')) v(term)),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM d JOIN terms ON list_contains(toks, term) GROUP BY term),
idf AS (
  SELECT term,
         CAST(CAST(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                      (CAST(df AS DOUBLE) + 0.5) + 1.0)
              AS DECIMAL(18,6)) AS DOUBLE) AS idf
  FROM dfreq, stats),
tfs AS (
  SELECT doc_id, term,
         CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf,
         CAST(len(toks) AS DOUBLE) AS dl
  FROM d CROSS JOIN terms),
scored AS (
  SELECT doc_id,
         CAST(idf * (tf * ({_K1} + 1.0)) /
              (tf + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))
           AS DECIMAL(18,6)) AS s
  FROM tfs JOIN idf USING (term), stats
  WHERE tf > 0)
SELECT doc_id, CAST(CAST(SUM(s) AS DECIMAL(18,6)) AS DOUBLE) AS bm25
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text", "ranking", "headline"),
)
def l14_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14: BM25 relevance ranking (k1=1.2, b=0.75) of every document
    against a fixed term set — the retrieval/quality-ranking primitive.

    Determinism: tf/df/dl are exact integers; avgdl is an exact-integer
    sum divided once in IEEE double; idf is rounded through DECIMAL(18,6)
    immediately after the single `ln`, and per-term scores are rounded
    to decimal BEFORE the per-doc sum so accumulation order can't matter
    (decimal addition is exact, and a tf=0 term contributes exact 0).

    Round-14 shape (guide §2.3/§2.4 — aggregate before you shuffle,
    remove shuffles outright): per-doc term frequencies for the FIXED
    term set pivot into columns on a single tokenize pass, so corpus
    stats (n_docs, avgdl, per-term df→idf) collapse into ONE single-row
    aggregate that broadcasts back, and the per-doc score is computed
    in-row — no per-term row explosion, no corpus-sized groupBy
    shuffle. The corpus is scanned twice (stats pass + scoring pass,
    the streaming-aggregate minimum); the only exchanges left are the
    single-row stats aggregation and the final presentation sort.
    Replaces the r13 shape: 4 corpus scans (each re-tokenizing), a 3x
    row explosion, and a corpus-cardinality groupBy — hash-identical
    output (same dec/fin rounding points), verified vs the unchanged
    oracle."""
    d = Tables(spark, sf_dir).documents.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    # one tokenize pass -> per-doc (dl, tf per fixed term) as COLUMNS
    tf_cols = [
        F.expr(f"size(filter(toks, x -> x = '{t}'))").cast("long").alias(f"tf_{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    t = d.select("doc_id", F.size("toks").cast("long").alias("dl"), *tf_cols)
    # ONE single-row corpus aggregate: n_docs, exact-integer token sum,
    # and per-term document frequencies (count of docs with tf>0)
    stats = t.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, True)).cast("long").alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
        # idf rounded through DECIMAL(18,6) right after the ln — the
        # same rounding point the r13 idf table used
        *[
            fin(
                F.log(
                    (F.col("n_docs").cast("double") - F.col(f"df_{i}").cast("double") + 0.5)
                    / (F.col(f"df_{i}").cast("double") + 0.5)
                    + 1.0
                ),
                6,
            ).alias(f"idf_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    k1, b = F.lit(_K1), F.lit(_B)

    def term_score(i: int) -> F.Column:
        tf = F.col(f"tf_{i}").cast("double")
        # dec-rounded per term BEFORE the sum, exactly like the r13
        # per-row scores; tf=0 contributes an exact decimal 0 (the r13
        # filter(tf>0) + sum drops the same zero)
        return F.when(
            F.col(f"tf_{i}") > 0,
            dec(
                F.col(f"idf_{i}")
                * (tf * (k1 + F.lit(1.0)))
                / (tf + k1 * (F.lit(1.0) - b + b * F.col("dl").cast("double") / F.col("avgdl"))),
                6,
            ),
        ).otherwise(F.lit(0).cast("decimal(18,6)"))

    scored = t.crossJoin(F.broadcast(stats)).filter(
        " OR ".join(f"tf_{i} > 0" for i in range(len(_BM25_TERMS)))
    )
    total = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        total = total + term_score(i)
    return scored.select("doc_id", fin(total, 6).alias("bm25")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L22 — end-to-end RAG-style indexing pipeline: chunk → embed → ANN
# ---------------------------------------------------------------------------

def _l22_oracle() -> str:
    """DuckDB replica of the WHOLE chunk→embed→IVF pipeline: l11-style
    token-window chunking (32/stride-32), the feature-hashing embedder
    (md5 token hash → dim = h mod 16, weight = (h>>4) mod 2001 - 1000,
    per-dim sums), /1000 scaling + micro-unit quantization, then the
    l3c2 exact-integer IVF machinery with seeded centroids."""
    from jobhouse_spark.operators.ann import ivf_fixed_centroids  # noqa: PLC0415

    from jobhouse_spark.functions.hashing import (  # noqa: PLC0415
        HASH_EMB_TERM_SQL,
        MD5_INT32_SQL,
    )

    hext = MD5_INT32_SQL.format(x="t")
    term = HASH_EMB_TERM_SQL.format(h="h", d="d")
    cents = ivf_fixed_centroids(7, 8, 16, 2_000_000)
    vals = ", ".join(f"({i}, {c}::BIGINT[])" for i, c in enumerate(cents))
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents WHERE doc_id < 200),
s AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 32)) AS start FROM t),
c AS (
  SELECT CAST(doc_id * 1000 + (start - 1) / 32 AS BIGINT) AS chunk_id,
         toks[start:start + 31] AS ctoks,
         CAST(start AS BIGINT) AS chunk_start, doc_id
  FROM s WHERE len(toks[start:start + 31]) >= 4),
hs AS (SELECT chunk_id, chunk_start, doc_id,
              list_transform(ctoks, t -> {hext}) AS hs FROM c),
emb AS (
  SELECT chunk_id, chunk_start, doc_id,
         list_transform(range(0, 16), d ->
           CAST(list_sum(list_transform(hs, h ->
             {term})) AS BIGINT)) AS e
  FROM hs),
m AS (
  SELECT chunk_id, chunk_start, doc_id,
         list_transform(e, v -> CAST(CAST(CAST(CAST(v AS DOUBLE) / 1000.0 AS DOUBLE)
                        AS DECIMAL(12,6)) * 1000000 AS BIGINT)) AS mv
  FROM emb),
cent(cell, cv) AS (VALUES {vals}),
dists AS (
  SELECT chunk_id, chunk_start, doc_id, mv, cell,
         CAST(list_sum(list_transform(list_zip(mv, cv),
                                      z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS d
  FROM m CROSS JOIN cent),
rnk AS (
  SELECT chunk_id, chunk_start, doc_id, mv, cell,
         row_number() OVER (PARTITION BY chunk_id ORDER BY d, cell) AS r
  FROM dists),
assigned AS (SELECT chunk_id AS neighbor_id, mv AS c_vec, cell FROM rnk WHERE r = 1),
probes AS (SELECT chunk_id AS query_id, mv AS q_vec, cell
           FROM rnk WHERE r <= 3 AND chunk_start = 1 AND doc_id < 3),
pairs AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(list_zip(q_vec, c_vec), z -> z[1]*z[2])) AS BIGINT) AS score
  FROM assigned JOIN probes USING (cell)
  WHERE query_id <> neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
  FROM pairs)
SELECT query_id, neighbor_id, score, rn FROM ranked WHERE rn <= 5 ORDER BY query_id, rn
"""


@register("l22_chunk_embed_ann", oracle=_l22_oracle(), tags=("llm", "similarity", "chunking"))
def l22_chunk_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L22: the RAG indexing pipeline END-TO-END — token-window chunking
    (l11's shape), an embedding per chunk, IVF cell assignment, and an
    ANN query for 3 probe chunks — every stage hash-checked against a
    from-scratch DuckDB replica.

    The embedder is the FEATURE-HASHING stand-in for a model encoder
    (hashing trick: md5 token hash picks a dimension and a signed
    weight; per-dim sums pool the chunk) — deterministic and
    cross-engine exact, same stub discipline as the multimodal decode
    path. The Spark-side plumbing is the real thing: chunking is a
    narrow zero-shuffle map, embeddings are JVM HOF expressions (no
    Python), the index is the exact-integer ivf_top_k used by l3c2, and
    the ANN probe is a cell-pruned broadcast join. Swapping the stub
    for a real encoder UDF changes one column expression, not the
    pipeline."""
    from jobhouse_spark.operators.ann import ivf_fixed_centroids, ivf_top_k  # noqa: PLC0415

    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    chunks = (
        toks.select(
            "doc_id", "toks",
            F.explode(F.expr("sequence(1, size(toks), 32)")).alias("start"),
        )
        .select(
            "doc_id",
            F.col("start").cast("long").alias("chunk_start"),
            (F.col("doc_id") * 1000 + ((F.col("start") - 1) / 32).cast("long"))
            .cast("long").alias("chunk_id"),
            F.expr("slice(toks, start, 32)").alias("ctoks"),
        )
        .filter(F.size("ctoks") >= 4)
    )

    from jobhouse_spark.functions.hashing import md5_int32 as hext  # noqa: PLC0415

    from jobhouse_spark.functions.hashing import hash_embed_term  # noqa: PLC0415

    hs = F.transform(F.col("ctoks"), hext)
    e = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda dim: F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc + hash_embed_term(h, dim),
        ),
    )
    emb = F.transform(e, lambda v: v.cast("double") / F.lit(1000.0))
    corpus = chunks.select("chunk_id", "chunk_start", "doc_id", emb.alias("emb"))
    probes = corpus.filter((F.col("chunk_start") == 1) & (F.col("doc_id") < 3))
    cents = ivf_fixed_centroids(7, 8, 16, 2_000_000)
    return ivf_top_k(
        probes, corpus, cents, k=5, n_probe=3,
        id_col="chunk_id", vec_col="emb", exact_micro=True,
    ).orderBy("query_id", "rn")
