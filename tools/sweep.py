"""Driver-style full-registry sweep with per-query wall time.

Mirrors the round driver's CORRECTNESS gate (__spark_entry__.queries() vs
oracle_sql() through DuckDB at a fixture scale) and additionally times each
query — the budget the driver has for the whole gate is finite, so per-query
wall time is part of the contract (r1 verdict: only 50/158 queries were
reached; worst offenders were 10-27 s each).

Usage:
    python tools/sweep.py [sf_dir] [out.json] [name1,name2,... | prefix*]
defaults: /root/testdata/sf0.01, /tmp/sweep_sf001.json, all queries
The optional third arg restricts the sweep to a comma-separated name
list (each item may end in ``*`` for a prefix match) — targeted
re-verification after editing a query.

Output JSON: {name: {"ok": bool|None, "secs": float, "err": str|None}},
plus a "_summary" entry; prints the 15 slowest to stderr.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_sf001.json"

    import duckdb

    import __spark_entry__ as e
    from crocus_spark.session import get_spark
    from crocus_spark.testing import compare_frames

    spark = get_spark(app_name="sweep")
    qs, osql = e.queries(), e.oracle_sql()
    if len(sys.argv) > 3:
        pats = sys.argv[3].split(",")
        qs = {
            k: v
            for k, v in qs.items()
            if any(
                k.startswith(p[:-1]) if p.endswith("*") else k == p
                for p in pats
            )
        }

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    t_all = time.monotonic()
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            if name in osql:
                ok, rep = compare_frames(qs[name](spark, sf_dir), con, osql[name])
                err = None if ok else "; ".join(rep)
            else:
                n = qs[name](spark, sf_dir).count()  # rows-only path
                ok, err = None, None if n >= 0 else "negative count"
        except Exception as ex:  # noqa: BLE001 — record and keep sweeping
            ok, err = False, f"{type(ex).__name__}: {ex}"[:500]
        secs = round(time.monotonic() - t0, 3)
        results[name] = {"ok": ok, "secs": secs, "err": err}
        status = "PASS" if ok else ("rows" if ok is None and not err else "FAIL")
        print(f"{status:4s} {secs:7.2f}s {name}" + (f"  {err}" if err else ""),
              flush=True)

    wall = round(time.monotonic() - t_all, 1)
    fails = {k: v for k, v in results.items() if v["ok"] is False}
    results["_summary"] = {
        "sf_dir": sf_dir,
        "total_wall_s": wall,
        "n_queries": len(qs),
        "n_fail": len(fails),
        "fails": sorted(fails),
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    slow = sorted(
        ((v["secs"], k) for k, v in results.items() if k != "_summary"),
        reverse=True,
    )[:15]
    print(f"\nwall={wall}s  fails={len(fails)} {sorted(fails)}", file=sys.stderr)
    print("slowest:", file=sys.stderr)
    for s, k in slow:
        print(f"  {s:7.2f}s {k}", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
