"""Recalibrate tools/sweep_budgets.json from a fresh UNCONTENDED full
sweep JSON (r4 verdict task #5): budget = 1.5x the measured per-query
time, floor 2 s — loose enough for host noise, tight enough that a 3x
single-query regression turns the sweep red.

Usage:
    python tools/gen_sweep_budgets.py /tmp/sweep_sf001.json [sf0.01]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    src = sys.argv[1]
    sf_base = sys.argv[2] if len(sys.argv) > 2 else "sf0.01"
    with open(src) as f:
        results = json.load(f)
    budgets = {
        name: round(max(2.0, r["secs"] * 1.5), 2)
        for name, r in sorted(results.items())
        if name != "_summary"
    }
    spec = {
        "_comment": (
            "Per-query sweep wall-time budgets (sec) at %s: 1.5x a fresh "
            "uncontended full-sweep time (floor 2 s). tools/sweep.py "
            "reports overruns in _summary.budget_violations and exits 2; "
            "tests/test_bench_budgets.py pins the checking logic. "
            "Recalibrate with tools/gen_sweep_budgets.py after deliberate "
            "perf work, never to paper over a regression." % sf_base
        ),
        "sf_dir_basename": sf_base,
        "budgets": budgets,
    }
    out = os.path.join(os.path.dirname(__file__), "sweep_budgets.json")
    with open(out, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(budgets)} budgets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
