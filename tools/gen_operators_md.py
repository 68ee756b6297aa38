"""Regenerate OPERATORS.md from the live query registry.

Run: python tools/gen_operators_md.py
Keeps the coverage index honest: every row is read from REGISTRY, so the
doc can't drift from the code.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crocus_spark.queries import REGISTRY, queries  # noqa: E402

GROUPS = [
    ("Flagship & reference parity", ("flagship", "crocus")),
    ("Sources & sinks", ("io",)),
    ("Relational core", ("relational", "filter", "project")),
    ("Joins", ("join",)),
    ("Aggregation", ("agg", "approx", "sketch")),
    ("Window functions", ("window",)),
    ("Set operations & sort", ("setop", "sort", "set")),
    ("Scalar functions", ("scalar", "json", "variant", "null")),
    ("SQL surface", ("sql",)),
    ("Streaming", ("streaming", "session", "stateful")),
    ("LLM pipeline: dedup", ("dedup",)),
    ("LLM pipeline: similarity", ("similarity",)),
    ("LLM pipeline: text", ("text",)),
    ("LLM pipeline: multimodal", ("multimodal",)),
    ("UDF surface", ("udf",)),
    ("Scale hardening", ("skew", "salt")),
]


def main() -> None:
    queries()
    grouped: dict[str, list] = defaultdict(list)
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        for title, tags in GROUPS:
            if set(q.tags) & set(tags):
                grouped[title].append(q)
                break
        else:
            grouped["Other"].append(q)

    n_total = len(REGISTRY)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    out = [
        "# OPERATORS — the registered query surface",
        "",
        "*Generated from `crocus_spark/queries` by `tools/gen_operators_md.py` "
        "— regenerate after adding queries; do not edit by hand.*",
        "",
        f"**{n_total} queries; {n_oracle} DuckDB-oracle-checked** "
        "(hash match at sf0.01), the rest rows-only with property tests "
        "(probabilistic/byte-level ops). Tags `headline` = timed by "
        "`bench.py`. SURVEY.md §2B is the requirement inventory these "
        "implement; SCALE.md records each family's 100 TB design.",
        "",
    ]
    for title, _ in GROUPS + [("Other", ())]:
        qs = grouped.get(title)
        if not qs:
            continue
        out.append(f"## {title}\n")
        out.append("| query | oracle | summary |")
        out.append("|---|---|---|")
        for q in qs:
            first = (q.doc or "").strip().split("\n")[0].rstrip(":.")
            oracle = "DuckDB" if q.oracle else "rows-only"
            out.append(f"| `{q.name}` | {oracle} | {first} |")
        out.append("")
    (REPO / "OPERATORS.md").write_text("\n".join(out))
    print(f"wrote OPERATORS.md: {n_total} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
