"""Round-over-round bench comparison with the house regression rule.

Usage:
    python tools/compare_bench.py <git-rev-of-old-bench_detail> [new-path]

Diffs the per-query timings of the CURRENT bench_detail.json (or
``new-path``) against the bench_detail.json committed at ``git-rev``,
and prints the queries that regressed by BOTH >1.3x and >0.5s — the
threshold the round verdicts use. Headline queries compare best-of-2
vs best-of-2; other-tier queries are single-run and noisier.

Interpretation guard (SCALE.md, round-10 host-variance datum): the
regression sets of two consecutive SAME-CODE runs were completely
disjoint — a 1.3-2x delta on a sub-3s query is flutter unless it
reproduces across runs. Re-run the flagged queries in isolation
(best-of-3, quiet) before treating any of them as a code regression.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _timings(detail: dict) -> dict[str, float]:
    out = {k: v["t"] for k, v in detail.get("headline_runs", {}).items()}
    out.update(detail.get("other_queries", {}))
    return out


# the round-10 verdict's mechanical gate threshold: a query REGRESSED
# when it is BOTH >1.5x its prior timing and >1s absolutely slower.
# (The report below uses a tighter 1.3x/0.5s lens for archaeology;
# only the 1.5x/1s tier is a gate failure.)
GATE_RATIO, GATE_ABS_S = 1.5, 1.0


def gate_regressions(
    old: dict, new: dict, ratio: float = GATE_RATIO, abs_s: float = GATE_ABS_S
) -> list[tuple[str, float, float]]:
    """Common-query regressions at the gate threshold, worst first.
    Callers (tools/check_battery.py) fail their run when non-empty."""
    q_old, q_new = _timings(old), _timings(new)
    regs = [
        (k, t0, q_new[k])
        for k, t0 in q_old.items()
        if k in q_new and q_new[k] > t0 * ratio and q_new[k] - t0 > abs_s
    ]
    return sorted(regs, key=lambda r: -(r[2] - r[1]))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rev = sys.argv[1]
    new_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    old = json.loads(
        subprocess.run(
            ["git", "show", f"{rev}:bench_detail.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    new = json.load(open(new_path))
    q_old, q_new = _timings(old), _timings(new)
    head_new = set(new.get("headline_runs", {}))
    regs, imps = [], []
    for k, t0 in sorted(q_old.items()):
        t1 = q_new.get(k)
        if t1 is None:
            continue
        if t1 > t0 * 1.3 and t1 - t0 > 0.5:
            regs.append((k, t0, t1))
        elif t0 > t1 * 1.3 and t0 - t1 > 0.5:
            imps.append((k, t0, t1))
    print(f"compared {len(set(q_old) & set(q_new))} common queries")
    print(f"\nREGRESSIONS (>1.3x and >0.5s): {len(regs)}")
    for k, t0, t1 in sorted(regs, key=lambda r: -(r[2] - r[1])):
        tier = "headline" if k in head_new else "other(1-run)"
        print(f"  {k:40s} {t0:7.2f}s -> {t1:7.2f}s  ({t1 / t0:.2f}x, {tier})")
    print(f"\nimprovements (same rule, reversed): {len(imps)}")
    for k, t0, t1 in sorted(imps, key=lambda r: -(r[1] - r[2]))[:20]:
        print(f"  {k:40s} {t0:7.2f}s -> {t1:7.2f}s  ({t0 / t1:.2f}x)")
    only_new = sorted(set(q_new) - set(q_old))
    if only_new:
        print(f"\nnew queries (no prior timing): {len(only_new)}")
        for k in only_new:
            print(f"  {k}: {q_new[k]:.2f}s")
    gate = gate_regressions(old, new)
    print(f"\nGATE (>={GATE_RATIO}x and >={GATE_ABS_S}s): {len(gate)} regressions")
    for k, t0, t1 in gate:
        print(f"  {k:40s} {t0:7.2f}s -> {t1:7.2f}s  ({t1 / t0:.2f}x)")
    return 1 if gate else 0


if __name__ == "__main__":
    raise SystemExit(main())
