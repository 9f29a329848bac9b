#!/usr/bin/env python3
"""Generate tests/fixtures/hh_pages_v2.json — a richer, fully
deterministic HH /vacancies replay fixture for the round-10 domain
Gold marts (jh5 lifecycle / jh6 currency / jh7 skills).

The original hh_pages.json (17 items, one currency, one area) is kept
untouched so jh1–jh4 hashes are stable; v2 adds the variety those marts
need: 4 currencies + missing salaries, from-only/to-only ranges,
gross/net mix, 4 areas, 4 experience bands, and requirement text drawn
from an 8-skill pool. Everything is closed-form in the item index, so
the DuckDB oracles can re-derive any rule independently.

Run: python tools/make_fixture_v2.py   (idempotent — rewrites the file)
"""

from __future__ import annotations

import json
import os

SKILLS = ["Python", "SQL", "Spark", "Airflow", "Kafka", "dbt", "Kubernetes", "Scala"]
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

N_ITEMS = 60
PER_PAGE = 20
# salary base per currency, roughly realistic magnitudes, all integers
BASE = {"RUR": 120000, "USD": 2500, "EUR": 2300, "KZT": 550000}


def make_item(i: int) -> dict:
    cur = CURRENCIES[i % 5]
    if i % 5 == 4:
        salary = None
    else:
        lo = BASE[cur] + (i % 13) * (BASE[cur] // 20)
        hi = lo + BASE[cur] // 2
        salary = {
            "from": None if i % 7 == 1 else lo,
            "to": None if i % 7 == 0 else hi,
            "currency": cur,
            "gross": i % 2 == 0,
        }
    # 2-4 skills per posting, closed-form pick
    k = 2 + i % 3
    skills = [SKILLS[(i + 3 * j) % len(SKILLS)] for j in range(k)]
    # dedupe preserving order (closed-form picks can collide)
    seen: list[str] = []
    for s in skills:
        if s not in seen:
            seen.append(s)
    exp = EXPERIENCE[(i // 4) % 4]  # decorrelated from area (i % 4)
    sch = SCHEDULES[i % 2]
    emp = EMPLOYMENTS[i % 3 == 0]
    return {
        "id": str(2000 + i),
        "name": f"{TITLES[i % 4]} {i}",
        "published_at": f"2024-03-{1 + i % 5:02d}T{9 + i % 10:02d}:{i % 60:02d}:00+0300",
        "area": {"id": str(1 + i % 4), "name": AREAS[i % 4]},
        "salary": salary,
        "employer": {"id": str(300 + i % 12), "name": f"Firm {i % 12}"},
        "snippet": {
            "requirement": ", ".join(seen) + f" required; seniority {i % 4}",
            "responsibility": "Design and operate data pipelines",
        },
        "schedule": {"id": sch[0], "name": sch[1]},
        "experience": {"id": exp[0], "name": exp[1]},
        "employment": {"id": emp[0], "name": emp[1]},
        "alternate_url": f"https://hh.example/vacancy/{2000 + i}",
    }


def main() -> None:
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
        "tests", "fixtures", "hh_pages_v2.json",
    )
    with open(out, "w") as f:
        json.dump(pages, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {n_pages} pages, {N_ITEMS} items")


if __name__ == "__main__":
    main()
