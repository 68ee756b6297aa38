"""Scan every oracle's DuckDB output types for harness-hostile columns.

The round driver hashes oracle results through a pandas/arrow fetch path,
where DuckDB HUGEINT/UHUGEINT coerce to float64 while the Spark side stays
int64 — value hashes diverge even when every cell is identical (r2 verdict,
"What's wrong" #1: the only two driver hash failures ever recorded are
exactly the only two HUGEINT-emitting oracles it sampled).

Usage:
    python tools/oracle_types.py [sf_dir]

Prints one line per offending (query, column, type); exit 1 if any found.
Also flags DECIMAL output columns for review (informational only).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

BAD = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad, dec = [], []
    for name, sql in sorted(e.oracle_sql().items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t in BAD:
                bad.append((name, col, t))
            elif t.startswith("DECIMAL"):
                dec.append((name, col, t))

    for name, col, t in bad:
        print(f"BAD  {name}.{col}: {t}")
    for name, col, t in dec:
        print(f"dec  {name}.{col}: {t}")
    print(f"\n{len(bad)} HUGEINT/UHUGEINT columns, {len(dec)} DECIMAL columns")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
