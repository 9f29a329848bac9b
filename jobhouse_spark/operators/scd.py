"""Slowly-changing-dimension type-2 history (A16's diff, kept as
versioned history instead of applied destructively).

The reference's change-detection intent (docs/Pipeline
Architecture.mermaid:17-22) classifies keys as inserted/changed/
deleted/unchanged between snapshots. `a16_change_detection` reports
that diff; `incremental_merge` applies it in place; `scd2_apply`
preserves it — every version of a row survives with a
[valid_from, valid_to) validity interval, the standard silver-layer
answer to "what did this posting look like last Tuesday".

Scale shape: one equi-join between the CURRENT slice of the history
(valid_to IS NULL) and the batch, shuffled on the key — closed rows
never join, never shuffle, and at 100 TB live in separate partitions
(partition by is_current, or prune by valid_to) so the join input is
the live dimension, not all history. Attribute comparison is null-safe
(`eqNullSafe`), so NULL→value and value→NULL transitions version
correctly instead of vanishing in three-valued logic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_open(snapshot: DataFrame, as_of: str) -> DataFrame:
    """Bootstrap a history from a first snapshot: every row current."""
    return snapshot.withColumn("valid_from", F.lit(as_of).cast("date")).withColumn(
        "valid_to", F.lit(None).cast("date")
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key: str,
    attr_cols: list[str],
    as_of: str,
    treat_missing_as_delete: bool = True,
) -> DataFrame:
    """Apply a snapshot/batch to an SCD2 history at date ``as_of``.

    - unchanged keys keep their open row untouched;
    - changed keys close the open row (valid_to = as_of) and open a new
      version (valid_from = as_of);
    - new keys open their first version;
    - keys absent from the batch close (deletes) when
      ``treat_missing_as_delete`` (full-snapshot semantics, the A16
      shape); with an incremental feed pass False — absence means
      "no news", not deletion.

    Already-closed history rows pass through untouched (and at scale,
    unjoined). Idempotent: re-applying the same batch at the same
    ``as_of`` leaves the history identical.
    """
    cols = [key, *attr_cols]
    cur = history.filter(F.col("valid_to").isNull())
    closed = history.filter(F.col("valid_to").isNotNull())

    # Explicit presence markers + a null-safe key join: key-nullness is
    # NOT a usable match sentinel — a NULL-key history or batch row
    # would read as "absent" on its own side and silently vanish from
    # the output. eqNullSafe lets NULL-key rows match each other (one
    # NULL-key version, like any other key), and the markers carry
    # presence independently of key values.
    o = cur.select(*cols, "valid_from", F.lit(True).alias("__has_old")).alias("o")
    n = batch.select(*cols, F.lit(True).alias("__has_new")).alias("n")
    # seeded with lit(True): a keys-only dimension (attr_cols == []) is
    # a valid contract — every matched key compares "same", so only
    # inserts/deletes produce version changes — rather than an opaque
    # TypeError out of an initializer-less reduce()
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in attr_cols],
        F.lit(True),
    )
    j = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    has_old = F.col("o.__has_old").isNotNull()
    has_new = F.col("n.__has_new").isNotNull()
    as_of_d = F.lit(as_of).cast("date")

    close_now = has_old & ((has_new & ~same) | (F.lit(treat_missing_as_delete) & ~has_new))
    open_now = has_new & (~has_old | ~same)

    # every old row passes through — closed when superseded/deleted,
    # otherwise still open (incl. keys the batch is silent about in
    # incremental-feed mode)
    old_rows = j.filter(has_old).select(
        *[F.col(f"o.{c}").alias(c) for c in cols],
        F.col("o.valid_from").alias("valid_from"),
        F.when(close_now, as_of_d).otherwise(F.lit(None).cast("date")).alias("valid_to"),
    )
    new_rows = j.filter(open_now).select(
        *[F.col(f"n.{c}").alias(c) for c in cols],
        as_of_d.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    # an open row whose key is idempotently re-applied (same content,
    # same as_of) must not duplicate: old_rows keeps it, new_rows only
    # fires on actual change/insert
    return closed.select(*cols, "valid_from", "valid_to").unionByName(
        old_rows
    ).unionByName(new_rows)
