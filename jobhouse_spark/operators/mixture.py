"""Domain-mixture resampling — deterministic exact-quota corpus
composition (training-data mandate; no reference counterpart — the
reference pipeline stops at Bronze ingestion, `src/extract_raw_jobs.py`).

The LLM-pretraining shape: given a corpus tagged with a domain/source
column and a target mixture (weights per domain), emit a subsample in
which each domain contributes exactly ``min(available, quota)``
documents, chosen DETERMINISTICALLY (hash-ranked, so two runs — or two
engines — pick the identical set; same md5-rank discipline as
l10b_deterministic_sample).

100 TB design — why not ``row_number() OVER (PARTITION BY domain)``:
with a handful of domains that window is a per-domain GLOBAL SORT into
at most |domains| reducer tasks — the exact compute-skew shape AQE
cannot fix (byte-blind; see SCALE.md SemDeDup post-mortem). Instead the
global hash rank is decomposed:

1. bucket each doc by a PREFIX of its rank hash (``substring(md5, 1,
   prefix_len)`` — 256 buckets/domain at prefix_len=2, 4096 at 3);
   because the bucket is a prefix of the sort key, global hash order
   equals (bucket, within-bucket) order;
2. rank locally within (domain, bucket) — |domains|·256 even window
   partitions instead of |domains| skewed ones;
3. aggregate per-bucket counts, compute each bucket's starting offset
   with a window over this TINY (|domains|·256-row) relation, and
   broadcast it back;
4. global_rank = bucket_offset + local_rank; keep global_rank ≤ quota.

Every shuffle is either evenly bucketed or over the tiny offsets/quota
relations (broadcast). Quotas use pure int64 arithmetic (``div``) so
the oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jobhouse_spark.materialize import materialize_barrier


def hash_rank(id_col: Column) -> Column:
    """The deterministic rank key: lowercase-hex md5 of the id string —
    identical in Spark and DuckDB, uniform over [0, 16^32)."""
    return F.md5(id_col.cast("string"))


def hash_ranked(
    df: DataFrame, group_col: str, id_col: str, prefix_len: int = 2
):
    """Steps (1)-(4) of the decomposition: the group-local GLOBAL hash
    rank of every row, without any skewed per-group sort. Returns
    (ranked_df, bucket_counts) where ranked_df carries columns
    ``_id, _g, _rn`` and bucket_counts the materialized tiny
    (_g, _b, _c) relation (reused by callers for quota stats)."""
    docs = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        hash_rank(F.col(id_col)).alias("_h"),
    )
    docs = docs.withColumn("_b", F.substring("_h", 1, prefix_len))

    # (1)+(2) even local ranks: |groups| * 16^prefix_len window partitions
    w_local = Window.partitionBy("_g", "_b").orderBy("_h", "_id")
    local = docs.withColumn("_lrn", F.row_number().over(w_local))

    # (3) tiny per-bucket offset table, broadcast back. Group counts and
    # the corpus total derive from bucket_counts too, and bucket_counts
    # is materialized ONCE (it is |groups|·16^prefix_len rows): without
    # the barrier each of the stat consumers re-plans the
    # aggregate from the scan — with per-branch inferred isnotnull
    # filters that defeat exchange reuse — so the corpus would be
    # scanned four times instead of twice (asserted in
    # tools/explain_audit.py).
    bucket_counts = materialize_barrier(
        docs.groupBy("_g", "_b").agg(F.count("*").alias("_c"))
    )
    w_off = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_counts.select(
        "_g", "_b", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )

    # (4) global rank = bucket offset + local rank
    ranked = local.join(F.broadcast(offsets), ["_g", "_b"]).select(
        "_id", "_g", (F.col("_off") + F.col("_lrn")).alias("_rn")
    )
    return ranked, bucket_counts


def mixture_select(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: Sequence[tuple[str, int]],
    target_num: int = 6,
    target_den: int = 10,
    prefix_len: int = 2,
) -> DataFrame:
    """Exact-quota deterministic mixture subsample.

    ``weights``: (group_value, integer_percent) pairs summing to 100.
    Target corpus size T = (target_num * N) div target_den of the input
    N; each group's quota is ``least(cnt_g, (w_g * T) div 100)``.
    Returns (id, group, rn) for the selected rows, rn = the group-local
    global hash rank, ordered (group, rn). Groups absent from
    ``weights`` are dropped (weight 0).
    """
    spark = df.sparkSession
    ranked, bucket_counts = hash_ranked(df, group_col, id_col, prefix_len)

    # quotas: exact int64 arithmetic, one-row total broadcast
    wdf = spark.createDataFrame(list(weights), "_g string, _w bigint")
    counts = bucket_counts.groupBy("_g").agg(F.sum("_c").alias("_cnt"))
    total = counts.groupBy().agg(F.sum("_cnt").alias("_n"))
    quota = (
        counts.join(F.broadcast(wdf), "_g")
        .crossJoin(F.broadcast(total))
        .select(
            "_g",
            F.least(
                F.col("_cnt"),
                F.expr(f"(_w * (({target_num} * _n) div {target_den})) div 100"),
            ).alias("_quota"),
        )
    )

    return (
        ranked.join(F.broadcast(quota), "_g")
        .filter(F.col("_rn") <= F.col("_quota"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(group_col),
            F.col("_rn").alias("rn"),
        )
        .orderBy(group_col, "rn")
    )


def mixture_select_budget(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    weights: Sequence[tuple[str, int]],
    target_num: int = 6,
    target_den: int = 10,
    prefix_len: int = 2,
) -> DataFrame:
    """Budgeted mixture: same hash-order selection as
    :func:`mixture_select`, but quotas are a cumulative WEIGHT budget
    (e.g. characters/tokens), not a row count — the form real
    pretraining mixes use ("x% of the token budget from domain y").

    A doc is kept iff the running weight total of its domain, in global
    hash order and INCLUDING the doc, stays within the domain's budget
    ``(w_g * (target_num * total_weight div target_den)) div 100``.
    Weights are non-negative, so the running total is monotone and the
    kept set is a prefix of the hash order — which is what lets the
    same prefix-bucket decomposition apply to cumulative SUMS instead
    of ranks: local windowed cumsum within (group, bucket), plus a
    broadcast per-bucket weight-offset table. NULL weights count 0.
    """
    spark = df.sparkSession
    docs = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.coalesce(F.col(weight_col), F.lit(0)).cast("bigint").alias("_w"),
        hash_rank(F.col(id_col)).alias("_h"),
    ).withColumn("_b", F.substring("_h", 1, prefix_len))

    w_local = (
        Window.partitionBy("_g", "_b")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = docs.withColumn("_lc", F.sum("_w").over(w_local))

    bucket_tot = materialize_barrier(
        docs.groupBy("_g", "_b").agg(F.sum("_w").alias("_c"))
    )
    w_off = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "_g", "_b", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )

    wdf = spark.createDataFrame(list(weights), "_g string, _wn bigint")
    total = bucket_tot.groupBy().agg(F.sum("_c").alias("_t"))
    quota = (
        wdf.crossJoin(F.broadcast(total))
        .select(
            "_g",
            F.expr(
                f"(_wn * (({target_num} * _t) div {target_den})) div 100"
            ).alias("_quota"),
        )
    )

    return (
        local.join(F.broadcast(offsets), ["_g", "_b"])
        .join(F.broadcast(quota), "_g")
        .filter(F.col("_off") + F.col("_lc") <= F.col("_quota"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(group_col),
            (F.col("_off") + F.col("_lc")).alias("cum_w"),
        )
        .orderBy(group_col, "cum_w")
    )
