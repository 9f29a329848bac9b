"""F-family: scalar function surface (SURVEY §2.B — Silver cleaning A17).

All JVM-side `pyspark.sql.functions` — zero Python in the row path, so
every one of these stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jobhouse_spark.queries.registry import dec_sql, fin, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "f1_string",
    oracle=(
        "SELECT p_partkey, lower(trim(p_name)) AS norm_name, "
        "regexp_extract(p_type, '^(\\w+)', 1) AS type_head, "
        "CAST(length(p_name) AS INT) AS name_len, "
        "substring(p_brand, 1, 5) AS brand5, "
        "concat_ws('/', p_brand, p_type) AS brand_type, "
        "replace(p_name, ' ', '_') AS snake_name, "
        "lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4 "
        "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"
    ),
    tags=("function",),
)
def f1_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string normalization family (Silver standardization)."""
    p = Tables(spark, sf_dir).part
    return (
        p.filter(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.lower(F.trim(F.col("p_name"))).alias("norm_name"),
            F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
            F.length("p_name").alias("name_len"),
            F.substring("p_brand", 1, 5).alias("brand5"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        )
        .orderBy("p_partkey")
    )


@register(
    "f2_datetime",
    oracle=(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, "
        "CAST(month(o_orderdate) AS INT) AS mo, "
        "CAST(dayofmonth(o_orderdate) AS INT) AS dom, "
        "date_trunc('month', o_orderdate) AS month_start, "
        "CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date, "
        "strftime(o_orderdate, '%Y-%m-%d') AS iso_day, "
        "CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch "
        "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"
    ),
    tags=("function",),
)
def f2_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time family — the reference's partition-key derivations
    (raw_layer.py:28 y/m/d/h) and transform parsing (A12)."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_epoch"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f3_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        f"{fin_sql('round(l_extendedprice, 1)')} AS price_r1, "
        "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, "
        "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, "
        f"{fin_sql('abs(l_discount - 0.05)')} AS disc_dev, "
        f"{fin_sql('sqrt(l_extendedprice)')} AS price_sqrt, "
        f"{fin_sql('ln(l_extendedprice + 1)')} AS price_ln, "
        "CAST(l_orderkey % 7 AS BIGINT) AS okey_mod7, "
        f"{fin_sql('greatest(l_quantity, l_discount * 100)')} AS g "
        "FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("function",),
)
def f3_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math family (round/floor/ceil/abs/sqrt/ln/pmod/greatest)."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            fin(F.round(F.col("l_extendedprice"), 1)).alias("price_r1"),
            F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
            F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
            fin(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
            fin(F.sqrt("l_extendedprice")).alias("price_sqrt"),
            fin(F.ln(F.col("l_extendedprice") + 1)).alias("price_ln"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("okey_mod7"),
            fin(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100)).alias("g"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "f4_array",
    oracle=(
        "SELECT vec_id, CAST(len(embedding) AS INT) AS dim, "
        + fin_sql(
            "list_sum(list_transform(embedding,"
            " x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))))",
            6,
        )
        + " AS vec_sum, "
        + fin_sql(
            "list_max(list_transform(embedding,"
            " x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))))",
            6,
        )
        + " AS vec_max, "
        "CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos "
        "FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"
    ),
    tags=("function", "array"),
)
def f4_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: array HOFs — transform/filter/aggregate over embedding vectors.

    Elements are decimal-cast *before* the fold so the sum is exact and
    order-independent (§2.C) — same trick as the aggregate family.
    """
    emb = Tables(spark, sf_dir).embeddings
    d6 = T.DecimalType(18, 6)
    acc = T.DecimalType(38, 6)
    return (
        emb.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.aggregate(
                # float -> double first: Spark's float->decimal cast rounds the
                # float's short string repr, not its exact value (DuckDB rounds
                # the exact value); the double detour makes both exact.
                F.transform(F.col("embedding"), lambda x: x.cast("double").cast(d6)),
                F.lit(0).cast(acc),
                lambda a, x: a + x,
            )
            .cast(d6)
            .cast("double")
            .alias("vec_sum"),
            F.array_max(
                F.transform(F.col("embedding"), lambda x: x.cast(d6))
            ).cast(d6).cast("double").alias("vec_max"),
            F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        )
        .orderBy("vec_id")
    )


@register(
    "f5_map",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val, "
        "'k' AS first_key "
        "FROM events WHERE event_id < 300 ORDER BY event_id"
    ),
    tags=("function", "map"),
)
def f5_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: map family — parse props into a MapType, element_at + map_keys."""
    e = Tables(spark, sf_dir).events
    m = F.from_json(F.col("props"), "map<string,int>")
    return (
        e.filter(F.col("event_id") < 300)
        .select(
            "event_id",
            F.element_at(m, "k").alias("k_val"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("first_key"),
        )
        .orderBy("event_id")
    )


@register(
    "f6_json",
    oracle=(
        "SELECT event_id, json_extract_string(props, '$.k') AS k_str, "
        "CAST(json_extract_string(props, '$.k') AS INT) AS k_int, "
        "CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null "
        "FROM events WHERE event_id < 300 ORDER BY event_id"
    ),
    tags=("function", "json"),
)
def f6_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON access on the raw string column (bronze raw_content pattern)."""
    e = Tables(spark, sf_dir).events
    return (
        e.filter(F.col("event_id") < 300)
        .select(
            "event_id",
            F.get_json_object(F.col("props"), "$.k").alias("k_str"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_int"),
            F.get_json_object(F.col("props"), "$.missing").isNull().alias("missing_is_null"),
        )
        .orderBy("event_id")
    )


@register(
    "f7_hash",
    oracle=(
        "SELECT p_partkey, md5(concat_ws('|', p_brand, p_type)) AS brand_md5, "
        "sha256(p_name) AS name_sha "
        "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"
    ),
    tags=("function", "hash"),
)
def f7_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: content hashing — the dedup fingerprint primitives (L1)."""
    p = Tables(spark, sf_dir).part
    return (
        p.filter(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.md5(F.concat_ws("|", "p_brand", "p_type")).alias("brand_md5"),
            F.sha2(F.col("p_name"), 256).alias("name_sha"),
        )
        .orderBy("p_partkey")
    )


@register(
    "f8_cast",
    oracle=(
        "SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS okey_str, "
        "TRY_CAST(o_orderpriority AS INT) AS bad_int, "
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str, "
        f"{fin_sql('o_totalprice', 2)} AS price_dec2 "
        "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"
    ),
    tags=("function", "cast"),
)
def f8_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: cast / try_cast conversions (ANSI-safe)."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("okey_str"),
            F.col("o_orderpriority").try_cast("int").alias("bad_int"),
            F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
            fin(F.col("o_totalprice"), 2).alias("price_dec2"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f10_try_arithmetic",
    oracle=(
        "SELECT o_orderkey, "
        "o_totalprice / nullif(o_orderkey % 5, 0) AS safe_div, "
        "TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num "
        "FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"
    ),
    tags=("function", "ansi"),
)
def f10_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: try_* arithmetic — NULL instead of error under ANSI mode
    (division by zero here). The engine runs ANSI SQL (session.py), so
    un-guarded x/0 would throw at 100 TB three hours into a job;
    try_divide is the contract for dirty data."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5).alias(
                "safe_div"
            ),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f11_url_functions",
    oracle=r"""
WITH urls AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/path/'
           || CAST(doc_id AS VARCHAR) || '?q=term' || CAST(doc_id % 13 AS VARCHAR)
           || '&page=' || CAST(doc_id % 5 AS VARCHAR) AS url
  FROM documents WHERE doc_id < 500)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol
FROM urls ORDER BY doc_id
""",
    tags=("function", "url"),
)
def f11_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: URL parsing — host / path / query-parameter / protocol
    extraction with Spark's native parse_url (a log-analytics staple:
    clickstream and referrer decomposition). The oracle re-derives every
    component with portable regexes over the same deterministic URLs, so
    parse_url's semantics are value-verified, not assumed. Map-only
    codegen; no shuffle beyond the sort."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    url = F.concat(
        F.lit("https://site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/path/"), F.col("doc_id").cast("string"),
        F.lit("?q=term"), (F.col("doc_id") % 13).cast("string"),
        F.lit("&page="), (F.col("doc_id") % 5).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    ).orderBy("doc_id")
