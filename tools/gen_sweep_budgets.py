"""Recalibrate tools/sweep_budgets.json from SEVERAL fresh full-sweep
JSONs (r4 verdict task #5): budget = 2.5x the per-query MEDIAN across
the given runs, floor 3 s. Calibrating from the min proved too tight —
same-code per-query times swing 2-4x under external host load (five
full sweeps in one day ranged 278-351 s wall; one streaming query
measured 1.3-4.1 s) — while the median absorbs outlier runs and 2.5x
still turns red on the 3x single-query regression the mechanism exists
to catch.

Usage:
    python tools/gen_sweep_budgets.py out1.json [out2.json ...] [--sf sf0.01]
        [--out tools/sweep_budgets.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def main() -> int:
    args = sys.argv[1:]
    sf_base = "sf0.01"
    out = os.path.join(os.path.dirname(__file__), "sweep_budgets.json")
    if "--sf" in args:
        i = args.index("--sf")
        sf_base = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    # Budget on process-tree CPU time when the sweeps recorded it (r5
    # verdict task #5): CPU is load-invariant for the same work, so a
    # loaded host no longer false-alarms, while a real regression (more
    # work) moves CPU and wall alike and still turns the gate red.
    # Two passes (r6 ADVICE): decide the metric over ALL rows of ALL
    # files FIRST, then accumulate. The old single pass flipped the
    # metric from cpu_s to secs mid-accumulation when mixing r6 and
    # pre-r6 sweep outputs, leaving CPU seconds and wall seconds in the
    # same per-query lists — medians over mixed units.
    loaded = []
    for src in args:
        with open(src) as f:
            results = json.load(f)
        loaded.append(results)
    rows = [
        r
        for results in loaded
        for name, r in results.items()
        if name != "_summary"
    ]
    # cpu_s None rows (pool-teardown-invalidated intervals, r7) don't
    # demote the metric — they're skipped per-row; only files that
    # never recorded cpu_s (pre-r6) force the wall fallback
    metric = (
        "cpu_s"
        if rows and all("cpu_s" in r for r in rows)
        else "secs"
    )
    times: dict[str, list[float]] = {}
    for results in loaded:
        for name, r in results.items():
            if name == "_summary" or r.get(metric) is None:
                continue
            times.setdefault(name, []).append(r[metric])
    # Floor: 3 s for wall; 10 s for cpu_s — process-tree CPU on sub-1s
    # queries spikes 3-8 s transiently (a single multi-core GC burst or
    # cleanup spillover from the previous query lands in the window),
    # so a 3 s CPU floor false-alarmed on five tiny queries the first
    # round it ran. The mechanism exists to catch 10-30 s gate-tail
    # blowups; a "regression" that keeps a query under 10 s of CPU is
    # immaterial to the gate budget.
    floor = 10.0 if metric == "cpu_s" else 3.0
    budgets = {
        name: round(max(floor, statistics.median(ts) * 2.5), 2)
        for name, ts in sorted(times.items())
    }
    # Carry-forward (r9): a query whose every sampled interval was
    # CPU-invalidated (pool-teardown spillover — stream_stateful_rocksdb
    # hits this reproducibly) has NO new median; dropping its budget
    # entirely would un-gate it. Keep the previous spec's value for any
    # budgeted query the new sweeps produced no valid sample for, and
    # say so — the coverage test (test_bench_budgets.py) requires every
    # registered query budgeted.
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f).get("budgets", {})
        carried = {
            name: b for name, b in prev.items() if name not in budgets
        }
        if carried:
            print(
                "carried forward (no valid samples this calibration): "
                + ", ".join(sorted(carried))
            )
            budgets.update(carried)
    spec = {
        "_comment": (
            "Per-query sweep %s budgets (sec) at %s: 2.5x the "
            "per-query MEDIAN across several fresh full sweeps "
            "(floor 3 s; still red at a sustained 3x regression). "
            "Since r6 the metric is process-tree CPU time (cpu_s) — "
            "host load inflates wall, not CPU, so loaded-host sweeps "
            "no longer false-alarm. tools/sweep.py reports overruns "
            "in _summary.budget_violations and exits 2; "
            "tests/test_bench_budgets.py pins the checking logic. "
            "Recalibrate with tools/gen_sweep_budgets.py over several "
            "sweep outputs, never to paper over a regression."
            % (metric, sf_base)
        ),
        "sf_dir_basename": sf_base,
        "metric": metric,
        "budgets": budgets,
    }
    with open(out, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(budgets)} budgets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
