"""The SURVEY §2 operator registry — the engine's capability contract.

Every operator declared in SURVEY.md §2.B registers here as:

- ``name``   — the operator id (e.g. ``g1_groupby_agg``).
- ``fn``     — ``(SparkSession, sf_dir) -> DataFrame``, the Spark-native
  implementation (DataFrame API / SQL; Catalyst plans it).
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  views, or ``None`` for ops that are not hash-checkable
  (approximate, streaming-timing, model-specific — SURVEY §2.C rule 6).
- ``tags``   — family labels for selection (bench picks ``headline``).

Determinism discipline (SURVEY §2.C) is enforced by construction via the
``dec``/``DEC_SQL`` helpers: every floating aggregate is cast to decimal
*before* accumulation so Spark and DuckDB sum identical exact decimals,
and final outputs are re-cast to a fixed DECIMAL(18,s) so output schemas
agree on both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import side-effect: all query modules self-register
    from jobhouse_spark.queries import _load_all  # noqa: PLC0415

    _load_all()
    return dict(_REGISTRY)


def by_tag(tag: str) -> dict[str, Query]:
    return {k: q for k, q in all_queries().items() if tag in q.tags}


# ---------------------------------------------------------------------------
# §2.C determinism helpers — used by every query module
# ---------------------------------------------------------------------------

def dec(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Cast to an exact decimal so cross-engine accumulation is bit-equal."""
    return col.cast(T.DecimalType(precision, scale))


def dec_sql(expr: str, scale: int = 4, precision: int = 18) -> str:
    """The oracle-side twin of :func:`dec`."""
    return f"CAST({expr} AS DECIMAL({precision},{scale}))"


def fin(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Final-output cast: round through decimal, emit DOUBLE.

    Decimal(18,s) → double is the correctly-rounded value of v/10^s in
    both Spark (BigDecimal.doubleValue) and DuckDB (int64/10^s IEEE
    division), so the bits — and any client's serialization — agree.
    Returning DOUBLE avoids cross-client Decimal formatting drift
    ("1.50" vs "1.5000").
    """
    return dec(col, scale, precision).cast(T.DoubleType())


def fin_sql(expr: str, scale: int = 4, precision: int = 18) -> str:
    """The oracle-side twin of :func:`fin`."""
    return f"CAST({dec_sql(expr, scale, precision)} AS DOUBLE)"
