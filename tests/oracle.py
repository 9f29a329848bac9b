"""Differential oracle harness (SURVEY §5.2.1).

Replicates the driver's t2 check: run each registry query on Spark and
its oracle SQL on DuckDB over the same parquet tables, then compare
row count, column names, and an order-insensitive canonical value hash.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

from jobhouse_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # multi-file layout (tools/make_scale_data.py): a directory
            # of part files — glob it, same relation
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_value(v) -> str:
    """Canonical string for one cell — engine-representation agnostic."""
    if v is None:
        return r"\N"
    # NaN gets its OWN token: NULL-vs-NaN is a real cross-engine
    # divergence (e.g. Spark stddev of one sample → NaN, DuckDB → NULL)
    # and must not pass the differential check silently.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return r"\N"
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return r"\N"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    """Order-insensitive canonical form: sort columns by name, serialize
    each row, sort rows lexicographically."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = [v for v in row]
        out.append("|".join(_canon_value(v) for v in vals))
    return sorted(out)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:5]
        problems.append(
            "values differ; spark-only sample=%s duck-only sample=%s" % (diff_s, diff_d)
        )
    return problems
