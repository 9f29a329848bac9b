"""As-of join (SURVEY §2.B J8, §4.3) — the union+window rewrite.

Spark has no native ASOF JOIN. The scalable formulation is NOT a
range join (which degenerates to a broadcast-nested-loop or an
explosive theta join): instead, union both sides tagged, sort within
each key partition by event time, and carry the most recent right-side
payload forward with a running `last(..., ignorenulls=True)` window.

Cost model: one shuffle on the key + one in-partition sort — the same
cost as a sort-merge join, fully parallel per key, no pair explosion.
That property is what makes this survive 100 TB: work is linear in
rows, and skewed keys are still bounded by the window sort, not a
quadratic pair count.

This is the single blessed implementation (SURVEY §7 hard parts) so
engine and oracle agree on tie semantics:

- match condition is `right.ts <= left.ts` (inclusive), and
- among right rows with equal ts, the greatest tiebreak column wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with ts <= left ts.

    Returns all left columns plus ``{prefix}{payload}`` columns (null
    when no right row precedes the left row). Single shuffle on ``on``.
    """
    # collapse right duplicates at equal (key, ts): keep greatest tiebreak
    if tiebreak is not None:
        w_dup = Window.partitionBy(on, right_ts).orderBy(F.col(tiebreak).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(w_dup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    left_cols = left.columns
    r_payload_t = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts (<= incl.)
        r_payload_t.alias("__rpay"),
    )
    payload_type = r.schema["__rpay"].dataType

    l_struct = F.struct(*[F.col(c) for c in left_cols])
    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__rpay"),
        l_struct.alias("__lpay"),
    )
    left_type = lhs.schema["__lpay"].dataType
    r = r.withColumn("__lpay", F.lit(None).cast(left_type))

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(r).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col("__lpay").getField(c).alias(c) for c in left_cols],
        *[F.col("__match").getField(c).alias(f"{prefix}{c}") for c in right_payload],
    )
    return out
