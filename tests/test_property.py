"""Property-based tests (hypothesis): random-input equivalence of the
operators with the subtlest semantics against pure-Python oracles.

These complement the DuckDB differential checks: the oracle SQL is a
second *implementation*, while these pin the *specification* (inclusive
as-of boundary, tiebreak rule, Jaccard set math) on adversarial inputs
the fixtures don't contain (duplicate timestamps, empty sides, ties).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jobhouse_spark.operators.asof import asof_join
from jobhouse_spark.operators.similarity import ngram_jaccard_pairs

_KEYS = st.integers(0, 3)
_TS = st.integers(0, 30)
_VAL = st.integers(-100, 100)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    left=st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=25),
    right=st.lists(st.tuples(_KEYS, _TS, _VAL), max_size=25),
)
@_SETTINGS
def test_asof_join_matches_python_oracle(spark, left, right):
    """For every left row: the attached payload is the value of the
    right row with the greatest ts <= left.ts on the same key (inclusive
    boundary), None when no right row precedes. Right duplicates at
    equal (key, ts) resolve to the greatest tiebreak value."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id int, k int, ts int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, v int") if right else (
        spark.createDataFrame([], "k int, ts int, v int")
    )
    out = {
        r.row_id: r.asof_v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts",
            right_payload=["v"], tiebreak="v",
        ).collect()
    }
    # python oracle: dedup right at (k, ts) by max v, then inclusive
    # backward lookup
    best: dict[tuple[int, int], int] = {}
    for k, t, v in right:
        cur = best.get((k, t))
        best[(k, t)] = v if cur is None else max(cur, v)
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in best.items() if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, k, t, out[i], expect)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=8).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
@_SETTINGS
def test_ngram_jaccard_matches_set_oracle(spark, docs, threshold):
    """The inverted-index self-join must produce exactly the pairs whose
    word-trigram Jaccard >= threshold — identical to brute-force set
    math, including docs with no shingles (excluded) and duplicate
    texts (jaccard 1.0)."""
    n = 3
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=n, threshold=threshold).collect()
    }

    def shingles(text: str) -> set[str]:
        toks = text.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    expect = {}
    sets = {i: shingles(t) for i, t in enumerate(docs)}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                expect[(a, b)] = jac
    assert set(got) == set(expect), (got, expect)
    for pair, jac in expect.items():
        assert abs(got[pair] - jac) < 1e-12


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            st.one_of(st.none(), st.integers(0, 50)),
            st.text(alphabet="abcxyz", max_size=4),
        ),
        min_size=1,
        max_size=40,
    ),
    bins=st.sampled_from([2, 4, 16]),
)
@_SETTINGS
def test_zorder_compact_preserves_content(spark, tmp_path_factory, rows, bins):
    """zorder_compact is a pure REWRITE: for arbitrary frames —
    duplicate rows, NULL keys, NULL second dimension, constant columns
    (degenerate quantiles) — the output multiset equals the input."""
    import shutil
    import tempfile

    from jobhouse_spark.operators.maintenance import zorder_compact

    base = tempfile.mkdtemp(prefix="jh_zprop_")
    df = spark.createDataFrame(rows, "a int, b int, s string")
    df.repartition(3).write.parquet(base + "/src")
    out = zorder_compact(
        spark, base + "/src", base + "/dst",
        cols=["a", "b"], target_file_bytes=4 * 1024, bins=bins,
    )
    key = lambda t: tuple(map(str, t))  # None-safe total order  # noqa: E731
    assert sorted(map(tuple, out.collect()), key=key) == sorted(
        map(tuple, rows), key=key
    )
    shutil.rmtree(base, ignore_errors=True)


@given(
    rows=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    ),
    lo=st.integers(-120, 120),
    span=st.integers(0, 60),
)
@_SETTINGS
def test_manifest_pruned_read_equals_filter(spark, rows, lo, span):
    """Manifest planning is a SUPERSET filter: for arbitrary data and
    an arbitrary (even empty / out-of-range) window, the pruned read
    equals the plain filtered scan exactly."""
    import shutil
    import tempfile

    from jobhouse_spark.operators.maintenance import (
        build_manifest,
        manifest_pruned_read,
    )

    base = tempfile.mkdtemp(prefix="jh_mprop_")
    df = spark.createDataFrame(rows, "k int, v int")
    df.repartition(4).write.parquet(base + "/t")
    manifest = build_manifest(spark, base + "/t", ["k"])
    hi = lo + span
    got = sorted(
        map(tuple, manifest_pruned_read(spark, manifest, {"k": (lo, hi)}).collect())
    )
    want = sorted((k, v) for k, v in rows if lo <= k <= hi)
    assert got == want
    shutil.rmtree(base, ignore_errors=True)
