"""Recalibrate tools/sweep_budgets.json from a fresh UNCONTENDED full
sweep JSON (r4 verdict task #5): budget = 2.0x the measured per-query
time, floor 2.5 s. The factor is sized to the OBSERVED host-load
variance (same-code full sweeps measured 278-351 s within one morning;
heavy dedup queries swing 2-3x under external load) while still
turning red on the 3x single-query regression the mechanism exists to
catch. Calibrate from the ELEMENT-WISE MIN of several fresh sweeps,
never a single noisy run.

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
        name: round(max(2.5, r["secs"] * 2.0), 2)
        for name, r in sorted(results.items())
        if name != "_summary"
    }
    spec = {
        "_comment": (
            "Per-query sweep wall-time budgets (sec) at %s: 2.0x the "
            "element-wise MIN of fresh uncontended full sweeps (floor "
            "2.5 s; factor sized to observed host-load variance, still "
            "red at a 3x regression). tools/sweep.py "
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
