"""Guards on the driver contract: the first 50 queries() entries (the
slice the driver's CORRECTNESS pass verifies) must stay a curated,
fully hash-checkable set spanning every SURVEY §2 family."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract

# every §2 family that must own at least one row in the driver's 50
_FAMILY_PREFIXES = (
    "s", "p", "j", "g", "w", "o", "u", "f", "t", "x", "l", "a", "q", "sq",
)


def test_head_is_exactly_50_unique_registered():
    head = contract._HEAD
    assert len(head) == 50
    assert len(set(head)) == 50
    qs = contract.queries()
    assert list(qs)[:50] == list(head)


# Round-9 head entries that are rows-only by SURVEY §2.C rule 6
# (approximate / model-specific / emission-timing). Each has a
# hash-checked twin of the same mechanism that is already driver-green:
# g14→g14b, l2→l2c/l2d, l3b→l3b2, l3c→l3c2, l4b→l4b2, l10→l10b, t7→t7b.
_ROWS_ONLY_BY_CONTRACT = {
    "g14_approx_percentile",
    "l2_minhash_neardup",
    "l3b_lsh_topk",
    "l3c_ivf_topk",
    "l4b_simhash_fingerprint",
    "l10_stratified_sample",
    "t7_stateful_count",
}


def test_head_is_oracle_backed_except_pinned_rows_only():
    oracles = contract.oracle_sql()
    missing = {n for n in contract._HEAD if n not in oracles}
    assert missing == (_ROWS_ONLY_BY_CONTRACT & set(contract._HEAD)), (
        f"head entries without oracle SQL beyond the pinned rows-only set: "
        f"{missing - _ROWS_ONLY_BY_CONTRACT}"
    )


def test_rows_only_head_entries_have_green_twins_in_registry():
    qs = contract.queries()
    twins = {
        "g14_approx_percentile": "g14b_exact_percentile",
        "l2_minhash_neardup": "l2c_minhash_checked",
        "l3b_lsh_topk": "l3b2_lsh_checked",
        "l3c_ivf_topk": "l3c2_ivf_checked",
        "l4b_simhash_fingerprint": "l4b2_simhash_checked",
        "l10_stratified_sample": "l10b_deterministic_sample",
        "t7_stateful_count": "t7b_stateful_count_checked",
    }
    oracles = contract.oracle_sql()
    for rows_only, twin in twins.items():
        assert rows_only in qs and twin in qs
        assert twin in oracles, f"twin {twin} must be hash-checkable"


def test_head_spans_every_family():
    def family(name: str) -> str:
        # sqN sorts before single-letter prefixes; everything else is
        # letter-prefix up to the first digit
        if name.startswith("sq"):
            return "sq"
        return name[: next(i for i, ch in enumerate(name) if ch.isdigit())]

    covered = {family(n) for n in contract._HEAD}
    missing = [f for f in _FAMILY_PREFIXES if f not in covered]
    assert not missing, f"families with no driver-checked row: {missing}"


def test_oracle_keys_subset_of_queries():
    qs = contract.queries()
    for name in contract.oracle_sql():
        assert name in qs
