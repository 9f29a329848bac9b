"""Extended relational coverage: cube/grouping-sets, pivot, richer
string/array/map function surface (SURVEY §2.B G4/F1/F4/F5 long tail)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobhouse_spark.queries.registry import fin, fin_sql, register
from jobhouse_spark.tables import Tables


@register(
    "g4b_cube",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
        "GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio "
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
    ),
    tags=("agg",),
)
def g4b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4b: CUBE with grouping() null-vs-superaggregate disambiguation."""
    o = Tables(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "g4c_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n "
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) "
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"
    ),
    tags=("agg",),
)
def g4c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4c: explicit GROUPING SETS via the SQL API (DataFrame and SQL
    converge to the same Expand node)."""
    Tables(spark, sf_dir).lineitem.createOrReplaceTempView("jh_gs_lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n "
        "FROM jh_gs_lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) "
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
    )


@register(
    "g11_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O, "
        "CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("agg",),
)
def g11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11: pivot — wide conditional aggregation over a known domain."""
    l = Tables(spark, sf_dir).lineitem
    wide = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
    ).orderBy("l_returnflag")


@register(
    "g12_unpivot",
    oracle=(
        "SELECT l_orderkey, l_linenumber, metric, "
        f"{fin_sql('value')} AS value FROM ("
        "  SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem"
        "  WHERE l_orderkey < 100) "
        "UNPIVOT (value FOR metric IN (l_quantity, l_discount)) "
        "ORDER BY l_orderkey, l_linenumber, metric"
    ),
    tags=("agg",),
)
def g12_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12: unpivot/melt — long-form metrics."""
    l = Tables(spark, sf_dir).lineitem
    return (
        l.filter(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount"],
            "metric",
            "value",
        )
        .withColumn("value", fin(F.col("value")))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@register(
    "f1b_string_extended",
    oracle=(
        "SELECT p_partkey, "
        "levenshtein(p_brand, 'Brand#10') AS lev, "
        "CAST(instr(p_name, 'a') AS INT) AS first_a, "
        "split_part(p_type, ' ', 1) AS type1, "
        "reverse(p_brand) AS rbrand, "
        "repeat('x', p_size % 4) AS xs, "
        "CAST(starts_with(p_type, 'ECONOMY') AS BOOLEAN) AS is_eco, "
        "translate(p_brand, '#', '-') AS brand_dash "
        "FROM part WHERE p_partkey < 150 ORDER BY p_partkey"
    ),
    tags=("function",),
)
def f1b_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1b: string long tail — levenshtein/instr/split_part/reverse/
    repeat/startswith/translate."""
    p = Tables(spark, sf_dir).part
    return (
        p.filter(F.col("p_partkey") < 150)
        .select(
            "p_partkey",
            F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("lev"),
            F.instr(F.col("p_name"), "a").alias("first_a"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type1"),
            F.reverse(F.col("p_brand")).alias("rbrand"),
            F.repeat(F.lit("x"), F.col("p_size") % 4).alias("xs"),
            F.startswith(F.col("p_type"), F.lit("ECONOMY")).alias("is_eco"),
            F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        )
        .orderBy("p_partkey")
    )


@register(
    "f4b_array_extended",
    oracle="""
SELECT vec_id,
       CAST(len(flatten([embedding, embedding])) AS INT) AS flat_len,
       CAST(list_position(list_transform(embedding, x -> x > 0), true) AS INT) AS first_pos_idx,
       CAST(len(list_slice(embedding, 1, 8)) AS INT) AS slice_len,
       CAST(list_contains(list_transform(embedding, x -> x > 3), true) AS BOOLEAN) AS has_gt3,
       CAST(len(list_distinct(list_transform(embedding, x -> CAST(sign(x) AS INT)))) AS INT) AS n_signs
FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
""",
    tags=("function", "array"),
)
def f4b_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4b: array long tail — flatten/array_position/slice/exists/
    array_distinct over transforms."""
    emb = Tables(spark, sf_dir).embeddings
    e = F.col("embedding")
    return (
        emb.filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.size(F.flatten(F.array(e, e))).alias("flat_len"),
            F.array_position(
                F.transform(e, lambda x: x > 0), F.lit(True)
            ).cast("int").alias("first_pos_idx"),
            F.size(F.slice(e, 1, 8)).alias("slice_len"),
            F.exists(e, lambda x: x > 3).alias("has_gt3"),
            F.size(
                F.array_distinct(
                    F.transform(e, lambda x: F.signum(x).cast("int"))
                )
            ).alias("n_signs"),
        )
        .orderBy("vec_id")
    )


@register(
    "f5b_map_extended",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_plus "
        "FROM events WHERE event_id < 200 ORDER BY event_id"
    ),
    tags=("function", "map"),
)
def f5b_map_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b: map construction round trip — map_from_entries → transform
    values → entries → element_at (the oracle checks the end value)."""
    e = Tables(spark, sf_dir).events
    m = F.from_json(F.col("props"), "map<string,int>")
    rebuilt = F.map_from_entries(
        F.transform(
            F.map_entries(m),
            lambda kv: F.struct(
                kv.getField("key").alias("key"),
                (kv.getField("value") + 1).alias("value"),
            ),
        )
    )
    return (
        e.filter(F.col("event_id") < 200)
        .select(
            "event_id",
            (F.element_at(rebuilt, "k") - 1).alias("k_plus"),
        )
        .orderBy("event_id")
    )
