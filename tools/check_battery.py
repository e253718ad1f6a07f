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


def bench_regression_gate() -> list[str]:
    """Round-10 verdict ask 8: the battery also fails when any common
    query regressed >1.5x AND >1s between the bench_detail.json
    committed with the last BENCH_r*.json round artifact and the
    current working bench_detail.json. Returns a list of problem
    strings (empty = pass). Skips (empty) with a note when the two
    details ran at different scale factors — cross-SF timings are not
    comparable — or when no prior round artifact exists."""
    import subprocess

    from tools.compare_bench import gate_regressions

    rev = subprocess.run(
        ["git", "-C", REPO, "log", "-1", "--format=%H", "--", "BENCH_r*.json"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    if not rev:
        print("bench-gate: no prior BENCH_r*.json commit — skipped")
        return []
    shown = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:bench_detail.json"],
        capture_output=True,
        text=True,
    )
    if shown.returncode != 0:
        print(f"bench-gate: no bench_detail.json at {rev[:9]} — skipped")
        return []
    old = json.loads(shown.stdout)
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        new = json.load(f)
    if old.get("sf") != new.get("sf"):
        print(
            f"bench-gate: sf mismatch (committed {old.get('sf')} vs "
            f"working {new.get('sf')}) — skipped; rerun bench.py at the "
            "driver SF before gating"
        )
        return []
    regs = gate_regressions(old, new)
    for k, t0, t1 in regs:
        print(f"REGR  {k}: {t0:.2f}s -> {t1:.2f}s ({t1 / t0:.2f}x) vs {rev[:9]}")
    if not regs:
        print(f"ok    bench regressions vs {rev[:9]}: 0 (gate >1.5x & >1s)")
    return [f"{k} {t0:.2f}->{t1:.2f}" for k, t0, t1 in regs]


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
    regs = bench_regression_gate()
    if not ok:
        print("FAIL: artifact counts diverge — regenerate the stale one "
              "(tools/audit_plans.py for PLANS.md, bench.py for "
              "bench_detail.json, edit the COVERAGE.md header)")
        return 1
    if regs:
        print(f"FAIL: {len(regs)} bench regressions above the 1.5x/1s "
              "gate — reproduce each in isolation (best-of-3, quiet) "
              "before shipping; host flutter does not reproduce")
        return 1
    print(f"OK: all artifacts agree on {counts['registry']} queries; "
          "0 gated bench regressions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
