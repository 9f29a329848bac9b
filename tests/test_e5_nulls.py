"""Focused always-on pin of e5's NULL-user semantics (ADVICE r14 high).

The r14 pair-proxy rewrite silently diverged from its oracle on NULL
user_ids (dau counted the (day, NULL) pair; an all-NULL day vanished
from the spine). The wide oracle-fuzz profiles cover this too but are
campaign-gated for the driver's verify window; this ~10 s hand-built
fixture keeps the exact shipped divergence pinned in the DEFAULT run.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from jobhouse_spark.queries import all_queries
from tests.oracle import compare_frames, duckdb_connect


def test_e5_null_users_match_oracle(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # day 0: two real users + a NULL-user event -> dau 2 (not 3)
        (1, base, 7),
        (2, base + dt.timedelta(hours=1), 8),
        (3, base + dt.timedelta(hours=2), None),
        # day 1: ONLY NULL-user events -> dau 0, day still in the spine
        (4, base + dt.timedelta(days=1), None),
        (5, base + dt.timedelta(days=1, hours=3), None),
        # day 9 (outside the first trailing week): window moves on
        (6, base + dt.timedelta(days=9), 7),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    q = all_queries()["e5_dau_wau_stickiness"]
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas()
    duck_pdf = duckdb_connect(str(tmp_path)).execute(q.oracle).fetchdf()
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, problems
    # the two r14 failure modes, pinned concretely:
    day0 = spark_pdf[spark_pdf["day"] == base]
    assert int(day0["dau"].iloc[0]) == 2  # NULL user not counted
    day1 = spark_pdf[spark_pdf["day"] == base + dt.timedelta(days=1)]
    assert len(day1) == 1 and int(day1["dau"].iloc[0]) == 0  # day emitted
