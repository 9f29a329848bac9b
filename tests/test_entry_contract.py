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


def test_head_is_fully_oracle_backed():
    oracles = contract.oracle_sql()
    missing = [n for n in contract._HEAD if n not in oracles]
    assert not missing, f"head entries without oracle SQL: {missing}"


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
