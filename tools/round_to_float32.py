"""One-shot codemod: convert decimal-place rounding of BIT-IDENTICAL
doubles at oracle compare boundaries into float32 casts (r2 verdict
"What's wrong" #3 / next-round #5).

Why: Spark's round(x, n) goes through BigDecimal.valueOf (shortest-repr
HALF_UP) while DuckDB rounds the binary value — for the same input
double the two can disagree exactly at half-digit boundaries, so every
`round(x, 6)` double output is one data-luck half-digit from a red row.
A float32 cast is binary round-to-nearest-even — bit-identical in both
engines for identical inputs — so for outputs whose value is already a
deterministic IEEE expression over exact (integer/decimal-quantized)
inputs, the cast is strictly safer. Rounds over ENGINE-INTERNAL
aggregates (percentile, stddev, corr, sketch estimates) must KEEP their
round: there the coarse quantizer deliberately absorbs last-ulp
implementation differences, and a float32 cast would expose them.

Only functions listed in TARGETS are touched; scaled-integer quantization
(`ROUND(x * 1e6)` — single-arg round) never matches the pattern.

Usage: python tools/round_to_float32.py [--dry]
"""

from __future__ import annotations

import re
import sys

TARGETS = {
    "crocus_spark/queries/analytics_q.py": [
        "analytics_abc_pareto",
        "analytics_bounce_rate",
        "analytics_dau_wau",
        "analytics_markov_transitions",
        "analytics_new_vs_returning",
        "analytics_rfm_segmentation",
        "attribution_linear_multitouch",
        "cohort_retention",
        "funnel_conversion",
        "series_autocorrelation",
        "series_cusum_changepoint",
        "series_period_over_period",
        "series_rolling_beta",
        "series_seasonal_decompose",
        "series_theil_sen_slope",
        "stats_jackknife_se",
        "stats_mannwhitney_u",
        "stats_spearman_corr",
    ],
    # integer/decimal-exact ratios and differences — inputs bit-identical
    # cross-engine, so the float32 cast is strictly safer than round
    "crocus_spark/queries/llm.py": [
        "dedup_sentence_level",
        "dedup_cdc_chunking",
        "dedup_shingle_containment",
        "dedup_minhash_jaccard_estimate",
        "dedup_lsh_candidate_quality",
    ],
    "crocus_spark/queries/quality_q.py": [
        "dq_ks_test",
    ],
    "crocus_spark/queries/windows.py": [
        "window_lag_lead",
        "window_distribution_battery",
        "series_vwap_twap",
    ],
    "crocus_spark/queries/graph_q.py": [
        "basket_association_rules",
        "graph_link_prediction_jaccard",
    ],
    "crocus_spark/queries/joins_advanced.py": [
        "join_reciprocal_best",
    ],
}


def _find_blocks(src: str, fns: list[str]) -> list[tuple[int, int]]:
    spans = []
    for fn in fns:
        i = src.find(f"def {fn}(")
        if i < 0:
            raise SystemExit(f"function not found: {fn}")
        j = src.rfind("@register", 0, i)
        nxt = src.find("\n@register", i)
        spans.append((j, nxt if nxt > 0 else len(src)))
    return spans


def _balanced(src: str, open_paren: int) -> int:
    """Index just past the matching close paren."""
    depth = 0
    i = open_paren
    while i < len(src):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def _convert_block(block: str) -> tuple[str, int]:
    n_changes = 0
    out = block
    # repeat until no more matches (indices shift after each edit)
    pat = re.compile(r"(F\.round|round)\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            break
        start, open_p = m.start(), m.end() - 1
        end = _balanced(out, open_p)
        inner = out[open_p + 1 : end - 1].rstrip().rstrip(",")
        # split top-level args
        depth = 0
        split = -1
        for k, ch in enumerate(inner):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                split = k
        if split < 0:
            pos = end
            continue  # single-arg round: scaled-int quantization — keep
        expr, digits = inner[:split], inner[split + 1 :].strip()
        if digits not in {"4", "6", "8", "9", "10"}:
            pos = end
            continue
        is_spark = m.group(1) == "F.round"
        if is_spark:
            repl = f"({expr}).cast(\"float\")"
        else:
            repl = f"CAST({expr} AS FLOAT)"
        out = out[:start] + repl + out[end:]
        pos = start + len(repl)
        n_changes += 1
    return out, n_changes


def main() -> int:
    dry = "--dry" in sys.argv
    total = 0
    for path, fns in TARGETS.items():
        src = open(path).read()
        spans = sorted(_find_blocks(src, fns), reverse=True)
        for a, b in spans:
            new_block, n = _convert_block(src[a:b])
            if n:
                fn_name = re.search(r"def (\w+)\(", src[a:b]).group(1)
                print(f"{path}: {fn_name}: {n} conversions")
                total += n
                if not dry:
                    src = src[:a] + new_block + src[b:]
        if not dry:
            open(path, "w").write(src)
    print(f"total: {total} conversions{' (dry)' if dry else ''}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
