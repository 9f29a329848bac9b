"""Sampling operators for training-data curation.

A 100 TB corpus is never trained on whole: pipelines draw
per-language / per-source / per-quality-bucket samples (stratified),
and hold out evaluation splits (random split). Both are map-only —
each row decides membership from its own hash, no shuffle, no driver
round trip — so they cost one scan at any scale.

Determinism: Spark's sampleBy/randomSplit are seed-stable for a fixed
partitioning of the input. Re-sampling the same materialized table with
the same seed selects the same rows (asserted in
tests/test_operators_scale.py); the draw is not reproducible across
engines, so the registry entry is rows-only (SURVEY §2.C rule 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling: keep fraction[s] of stratum s.
    Strata absent from `fractions` are dropped (fraction 0.0) — the
    same contract as DataFrameStatFunctions.sampleBy."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def train_eval_split(
    df: DataFrame, eval_fraction: float = 0.1, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/eval split. randomSplit re-scans the input
    per split with disjoint acceptance ranges of one uniform draw, so
    the two outputs partition the input exactly (no dup, no loss)."""
    train, ev = df.randomSplit([1.0 - eval_fraction, eval_fraction], seed=seed)
    return train, ev
