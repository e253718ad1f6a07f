#!/usr/bin/env python
"""Artifact-lockstep gate: fail if the registry, PLANS.md, COVERAGE.md,
and bench_detail.json disagree on the query-surface size.

Rounds 5/6 both shipped a doc artifact whose count silently trailed the
registry (PLANS.md in r6, the COVERAGE.md header in r5). This makes the
class mechanical: the end-of-round battery runs this script and a
non-zero exit means an artifact was not regenerated after the registry
grew. Run:

    python tools/check_battery.py            # asserts, exit 1 on drift
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def registry_count() -> int:
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    if set(o) - set(q):
        raise SystemExit(f"oracle_sql has keys not in queries(): {sorted(set(o) - set(q))[:5]}")
    return len(q)


def plans_count() -> int:
    with open(os.path.join(REPO, "PLANS.md")) as f:
        text = f.read()
    return len(re.findall(r"^(?:ok|FLAG)\s+\S+", text, re.M))


def coverage_count() -> int:
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        head = f.read(2000)
    m = re.search(r"Current state: (\d+) registered", head)
    if not m:
        raise SystemExit("COVERAGE.md header missing 'Current state: N registered'")
    return int(m.group(1))


def bench_count() -> int:
    # bench_detail's `queries` map holds the headline subset only;
    # `n_all_queries` is the registry size the bench run actually swept
    path = os.path.join(REPO, "bench_detail.json")
    with open(path) as f:
        j = json.load(f)
    if "n_all_queries" in j:
        return int(j["n_all_queries"])
    return len(j.get("queries", j))


def main() -> int:
    counts = {
        "registry": registry_count(),
        "PLANS.md": plans_count(),
        "COVERAGE.md": coverage_count(),
        "bench_detail.json": bench_count(),
    }
    ok = len(set(counts.values())) == 1
    for k, v in counts.items():
        print(f"{'ok  ' if ok else 'DRIFT'} {k}: {v}")
    if not ok:
        print("FAIL: artifact counts diverge — regenerate the stale one "
              "(tools/audit_plans.py for PLANS.md, bench.py for "
              "bench_detail.json, edit the COVERAGE.md header)")
        return 1
    print(f"OK: all artifacts agree on {counts['registry']} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
