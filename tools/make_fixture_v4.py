#!/usr/bin/env python3
"""Generate tests/fixtures/hh_pages_v4.json — the repost-audit replay
fixture for the jh9 duplicate-posting mart.

v3 planted dirty EMPLOYER names (entity grain); v4 keeps that dirt and
additionally plants duplicate POSTING CONTENT — the reference's dedup
feedback loop (docs/Pipeline Architecture.mermaid:33) at posting grain:
the same vacancy text re-posted by the same company under DIFFERENT
surface forms, areas and days. A naive group-by raw employer name
undercounts these reposts; only canonical-employer resolution (jh8's
machinery) + a content key finds them, which is exactly what jh9 must
compose.

Closed form (asserted by tests/test_silver_gold.py): 120 items, 12 per
base employer; each employer has 6 distinct contents with copy counts
(3, 2, 2, 2, 2, 1) -> per canonical employer the mart must report
n_postings=12, n_contents=6, n_reposts=6, max_copies=3,
n_dup_contents=5. Employer surface forms cycle v3's 9 variant kinds
((7*i) % 9), so copies of one content usually appear under DIFFERENT
dirty forms of the same employer. Titles embed the base index, so
contents never collide across employers.

Run: python tools/make_fixture_v4.py   (idempotent — rewrites the file)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_fixture_v3 import (  # noqa: E402
    AREAS,
    BASES,
    CURRENCIES,
    EMPLOYMENTS,
    EXPERIENCE,
    BASE_SALARY,
    SCHEDULES,
    TITLES,
    check_separation,
    variant,
)

N_ITEMS = 120
PER_PAGE = 20
# copy_idx (0..11) -> content slot; slot 0 posted 3x, slot 5 once
SLOT_OF_COPY = [0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5]


def make_item(i: int) -> dict:
    base_idx = i % 10
    copy_idx = i // 10
    slot = SLOT_OF_COPY[copy_idx]
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
    emp_name = variant(BASES[base_idx], (7 * i) % 9)
    exp = EXPERIENCE[(i // 4) % 4]
    sch = SCHEDULES[i % 2]
    emp = EMPLOYMENTS[i % 3 == 0]
    return {
        "id": str(4000 + i),
        # content identity = (title, requirement); embeds base+slot so
        # groups are exact within an employer, disjoint across them
        "name": f"{TITLES[slot % 4]} {base_idx}-{slot}",
        "published_at": (
            f"2024-04-{1 + copy_idx % 9:02d}T{9 + i % 10:02d}:{i % 60:02d}:00+0300"
        ),
        "area": {"id": str(1 + i % 4), "name": AREAS[i % 4]},
        "salary": salary,
        "employer": {"id": str(400 + i % 30), "name": emp_name},
        "snippet": {
            "requirement": f"Own the tier-{slot} stack for team {base_idx}",
            "responsibility": "Design and operate data pipelines",
        },
        "schedule": {"id": sch[0], "name": sch[1]},
        "experience": {"id": exp[0], "name": exp[1]},
        "employment": {"id": emp[0], "name": emp[1]},
        "alternate_url": f"https://hh.example/vacancy/{4000 + i}",
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
        "tests", "fixtures", "hh_pages_v4.json",
    )
    with open(out, "w") as f:
        json.dump(pages, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {n_pages} pages, {N_ITEMS} items")


if __name__ == "__main__":
    main()
