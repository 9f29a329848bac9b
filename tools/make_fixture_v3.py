#!/usr/bin/env python3
"""Generate tests/fixtures/hh_pages_v3.json — the entity-resolution
replay fixture for the jh8 employer-canonicalization mart.

v2 (jh5-jh7) kept employer names clean ("Firm 0".."Firm 11" — pairwise
Levenshtein 1, useless as a fuzzy-matching base). v3 plants the dirt the
reference's dedup feedback loop (docs/Pipeline Architecture.mermaid:33)
exists to clean, at ENTITY grain: each of 10 well-separated base
companies appears under up to 6 surface forms —

  kind 0/5  clean title case               "Aurora Analytics"
  kind 1    legal suffix                   "Aurora Analytics LLC"
  kind 2    legal suffix                   "Aurora Analytics Ltd"
  kind 3    one-character deletion typo    "Auror Analytics"
  kind 4    shouting + doubled whitespace  "AURORA  ANALYTICS"
  kind 6    suffix + case dirt             "aurora analytics inc"
  kind 7    one-character substitution     "Auxora Analytics"
  kind 8    legal suffix                   "Aurora Analytics Group"

Kinds 1/2/4/6/8 normalize away exactly (lowercase, whitespace collapse,
legal-suffix strip); kinds 3/7 survive normalization at Levenshtein 1
from the base and need the fuzzy edge. Base names are pairwise
Levenshtein >= 5 after normalization (asserted below), so a distance-2
threshold can never bridge two true entities even through a typo form
(1 + 2 < 5). Salary/area/experience fields keep the v2 closed-form
scheme so the silver plumbing is reused unchanged. Employer *ids* are
deliberately non-canonical (i % 30) — resolution must work from names,
the realistic dirty-feed contract.

Run: python tools/make_fixture_v3.py   (idempotent — rewrites the file)
"""

from __future__ import annotations

import json
import os

BASES = [
    "Aurora Analytics",
    "Borealis Systems",
    "Cobalt Dynamics",
    "Deltaforge Labs",
    "Ember Logistics",
    "Flux Robotics",
    "Granite Media",
    "Harbor Fintech",
    "Ironwood Retail",
    "Jupiter Telecom",
]
SUFFIXES = {1: " LLC", 2: " Ltd", 8: " Group"}

AREAS = ["Moscow", "Saint Petersburg", "Novosibirsk", "Kazan"]
EXPERIENCE = [
    ("noExperience", "No experience"),
    ("between1And3", "1-3 years"),
    ("between3And6", "3-6 years"),
    ("moreThan6", "6+ years"),
]
CURRENCIES = ["RUR", "USD", "KZT", "EUR", "RUR"]  # i%5==4 -> salary NULL
TITLES = ["Data Engineer", "Analytics Engineer", "ML Engineer", "Platform Engineer"]
SCHEDULES = [("remote", "Remote"), ("fullDay", "Full day")]
EMPLOYMENTS = [("full", "Full time"), ("part", "Part time")]

N_ITEMS = 90
PER_PAGE = 20
BASE_SALARY = {"RUR": 120000, "USD": 2500, "EUR": 2300, "KZT": 550000}


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def variant(base: str, kind: int) -> str:
    if kind in (0, 5):
        return base
    if kind in SUFFIXES:
        return base + SUFFIXES[kind]
    if kind == 3:  # deletion typo: drop the 5th character
        return base[:4] + base[5:]
    if kind == 4:
        return base.upper().replace(" ", "  ")
    if kind == 6:
        return base.lower() + " inc"
    if kind == 7:  # substitution typo: 3rd character -> 'x'
        return base[:2] + "x" + base[3:]
    raise ValueError(kind)


def normalize(name: str) -> str:
    import re

    n = re.sub(r"\s+", " ", name.strip().lower())
    return re.sub(r" (llc|ltd|inc|group)$", "", n)


def check_separation() -> None:
    """The planted-variant safety proof: within-entity normalized forms
    are <= 1 apart; cross-entity forms are > 4 apart (threshold 2 can
    never merge two true entities, even typo-to-typo)."""
    forms = {
        b: sorted({normalize(variant(base, k)) for k in range(9)})
        for b, base in enumerate(BASES)
    }
    for b, fs in forms.items():
        base_norm = normalize(BASES[b])
        for f in fs:
            assert levenshtein(f, base_norm) <= 1, (f, base_norm)
    for b1 in range(len(BASES)):
        for b2 in range(b1 + 1, len(BASES)):
            for f1 in forms[b1]:
                for f2 in forms[b2]:
                    d = levenshtein(f1, f2)
                    assert d > 4, (f1, f2, d)


def make_item(i: int) -> dict:
    cur = CURRENCIES[i % 5]
    if i % 5 == 4:
        salary = None
    else:
        lo = BASE_SALARY[cur] + (i % 13) * (BASE_SALARY[cur] // 20)
        hi = lo + BASE_SALARY[cur] // 2
        salary = {
            "from": None if i % 7 == 1 else lo,
            "to": None if i % 7 == 0 else hi,
            "currency": cur,
            "gross": i % 2 == 0,
        }
    base_idx = i % 10
    # 7*i mod 9 cycles through all 9 kinds, decorrelated from base_idx
    emp_name = variant(BASES[base_idx], (7 * i) % 9)
    exp = EXPERIENCE[(i // 4) % 4]
    sch = SCHEDULES[i % 2]
    emp = EMPLOYMENTS[i % 3 == 0]
    return {
        "id": str(3000 + i),
        "name": f"{TITLES[i % 4]} {i}",
        "published_at": f"2024-03-{1 + i % 5:02d}T{9 + i % 10:02d}:{i % 60:02d}:00+0300",
        "area": {"id": str(1 + i % 4), "name": AREAS[i % 4]},
        "salary": salary,
        "employer": {"id": str(300 + i % 30), "name": emp_name},
        "snippet": {
            "requirement": f"Data tooling; seniority {i % 4}",
            "responsibility": "Design and operate data pipelines",
        },
        "schedule": {"id": sch[0], "name": sch[1]},
        "experience": {"id": exp[0], "name": exp[1]},
        "employment": {"id": emp[0], "name": emp[1]},
        "alternate_url": f"https://hh.example/vacancy/{3000 + i}",
    }


def main() -> None:
    check_separation()
    items = [make_item(i) for i in range(N_ITEMS)]
    pages = []
    n_pages = (N_ITEMS + PER_PAGE - 1) // PER_PAGE
    for p in range(n_pages):
        pages.append(
            {
                "pages": n_pages,
                "page": p,
                "found": N_ITEMS,
                "items": items[p * PER_PAGE : (p + 1) * PER_PAGE],
            }
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hh_pages_v3.json",
    )
    with open(out, "w") as f:
        json.dump(pages, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {n_pages} pages, {N_ITEMS} items")


if __name__ == "__main__":
    main()
