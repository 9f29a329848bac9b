"""Operator-level unit + property tests (SURVEY §5.2.2): as-of join vs
a naive reference implementation, dedup edge cases, top-k ties."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jobhouse_spark.operators.asof import asof_join
from jobhouse_spark.operators.dedup import (
    dedup_anti_join,
    exact_dedup_by_content,
    latest_per_key,
)
from jobhouse_spark.operators.topk import top_k_per_group

BASE = datetime(2024, 1, 1)


def _naive_asof(left_rows, right_rows):
    """Reference semantics: latest right with ts <= left.ts; ties on ts
    broken by greatest tiebreak id."""
    out = {}
    for lid, key, lts in left_rows:
        best = None
        for rid, rkey, rts in right_rows:
            if rkey == key and rts <= lts:
                if best is None or (rts, rid) > (best[1], best[0]):
                    best = (rid, rts)
        out[lid] = best[0] if best else None
    return out


@pytest.mark.campaign  # round-15 verdict task 1: driver verify-window
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),  # (key, minutes)
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_naive(spark, left_spec, right_spec):
    left_rows = [
        (i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(left_spec)
    ]
    right_rows = [
        (100 + i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(right_spec)
    ]
    left = spark.createDataFrame(left_rows, "lid long, key long, ts timestamp")
    right = spark.createDataFrame(right_rows, "rid long, key long, ts timestamp")
    got_rows = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        right_payload=["rid"], tiebreak="rid",
    ).collect()
    got = {r.lid: r.asof_rid for r in got_rows}
    assert got == _naive_asof(left_rows, right_rows)


def test_exact_dedup_keeps_smallest_id(spark):
    df = spark.createDataFrame(
        [(3, "dup"), (1, "dup"), (2, "dup"), (10, "uniq")], "id long, body string"
    )
    out = exact_dedup_by_content(df, "body", "id").collect()
    assert sorted((r.id, r.body) for r in out) == [(1, "dup"), (10, "uniq")]


def test_latest_per_key_tiebreak(spark):
    t = BASE
    df = spark.createDataFrame(
        [(1, t, 5), (1, t, 9), (2, t, 1)], "key long, ts timestamp, seq long"
    )
    out = {r.key: r.seq for r in latest_per_key(df, "key", "ts", "seq").collect()}
    assert out == {1: 9, 2: 1}  # equal ts -> greatest tiebreak survives


def test_topk_ties_are_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "c"), (1, 5, "d")],
        "g long, score long, id string",
    )
    out = top_k_per_group(
        df, "g", [F.col("score").desc(), F.col("id").asc()], 2
    ).collect()
    assert [(r.id, r.rn) for r in sorted(out, key=lambda r: r.rn)] == [("a", 1), ("b", 2)]


def test_dedup_anti_join_null_safety(spark):
    incoming = spark.createDataFrame([(1,), (2,), (None,)], "id long")
    existing = spark.createDataFrame([(2,)], "id long")
    out = sorted(
        r.id for r in dedup_anti_join(incoming, existing, "id").collect()
        if r.id is not None
    )
    # left_anti keeps non-matching rows including the null-key row
    assert out == [1]


def test_e4_single_day_degenerate_null_z(spark, tmp_path):
    """ADVICE r4: a corpus whose events span ONE day makes the z-score
    denominator (n_days - 1) zero. NULLIF must turn that into NULL in
    BOTH engines — not Spark NaN/Inf vs DuckDB's own division behavior."""
    import duckdb

    from jobhouse_spark.queries import all_queries
    from tests.oracle import compare_frames

    one_day = spark.createDataFrame(
        [(i, "2024-03-05 10:00:00", i, "click", 1.0, "{}") for i in range(5)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path)
    one_day.coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    q = all_queries()["e4_daily_anomalies"]
    spark_pdf = q.fn(spark, sf).toPandas()
    assert len(spark_pdf) == 1 and spark_pdf["z"].isna().all()

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    duck_pdf = con.execute(q.oracle).fetchdf()
    assert not compare_frames(spark_pdf, duck_pdf)


def test_md5_int32_matches_duckdb_bit_for_bit(spark):
    """The cross-engine hash contract every differential oracle rests
    on: functions/hashing.md5_int32 (Spark) and MD5_INT32_SQL (DuckDB)
    must agree bit-for-bit on arbitrary strings — including empties,
    unicode, and separators."""
    import duckdb

    from jobhouse_spark.functions.hashing import MD5_INT32_SQL, md5_int32
    from pyspark.sql import functions as F

    samples = ["", "a", "hello world", "für", "a|b|123", "  padded  ", "0", "emoji🙂"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", md5_int32(F.col("s")).alias("h")).collect()}

    con = duckdb.connect()
    for s in samples:
        # dollar-quoted literal: survives quotes/pipes in the sample
        (want,) = con.execute(
            "SELECT " + MD5_INT32_SQL.format(x=f"$tok${s}$tok$")
        ).fetchone()
        assert got[s] == want, (s, got[s], want)
