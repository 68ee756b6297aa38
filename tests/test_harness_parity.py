"""Harness-parity guards: the round driver's correctness gate fetches
results through pandas/arrow, where some DuckDB output types coerce in
ways a raw-cursor (fetchall) comparison cannot see — DuckDB HUGEINT
becomes float64 while Spark's bigint stays int64, so value hashes diverge
on cell-for-cell-identical results (r2 verdict "What's wrong" #1: the
only two driver hash failures ever recorded were exactly the only two
HUGEINT-emitting oracles it sampled).

Two guards keep the class dead:

1. TYPE guard — every oracle's DuckDB output types contain no
   HUGEINT/UHUGEINT; DECIMAL outputs are pinned to a reviewed allowlist
   (decimals survive the pandas path as decimal.Decimal objects — safe —
   but a NEW decimal output should be a conscious choice, not drift).
2. FETCH-PATH guard — representative queries (one per output-type class,
   plus every formerly-HUGEINT query) must match their oracle through
   BOTH comparators: compare_frames (fetchall, driver's row/schema gate)
   and compare_frames_pandas (toPandas/fetchdf, driver's value hasher).
"""

from __future__ import annotations

import pytest

from crocus_spark.queries import REGISTRY, queries
from crocus_spark.testing import compare_frames, compare_frames_pandas

from tests.conftest import SF_SMOKE

queries()  # populate REGISTRY

# Reviewed DECIMAL output columns (engine-identical by the decimal
# quantize contract in _det.py; Decimal survives fetchdf unchanged).
DECIMAL_ALLOWLIST = {
    ("agg_histogram_buckets", "lo"),
    ("agg_histogram_buckets", "hi"),
    ("dq_benford_digits", "exp_share"),
    ("ml_mrr_ndcg_eval", "dcg"),
    ("ml_mrr_ndcg_eval", "idcg"),
    ("normalize_fx_convert", "amount"),
    ("normalize_fx_convert", "amount_eur"),
}

# The 16 queries whose oracles emitted HUGEINT before the r3 casts, plus
# one representative per output-type class (TIMESTAMP, DATE, DECIMAL,
# float32/REAL, array, struct/map-ish string agg, plain bigint+double).
PARITY_QUERIES = sorted(
    {
        # formerly-HUGEINT (r2 verdict list, all 16)
        "corpus_dsir_importance",
        "dedup_span_removal",
        "dq_distribution_drift",
        "dq_key_skew_profile",
        "dq_psi_stability",
        "map_higher_order_battery",
        "ml_ab_test_proportions",
        "ml_auc_evaluation",
        "ml_calibration_bins",
        "ml_kmeans_iterations",
        "ml_naive_bayes_langid",
        "ml_target_encoding_kfold",
        "sessionize_batch",
        "sessionize_batch_gaps",
        "text_unigram_prob_score",
        "window_reset_running_total",
        # output-type class representatives
        "series_cusum_changepoint",  # TIMESTAMP
        "series_ohlc_resample",  # DATE + bigint + double
        "agg_histogram_buckets",  # DECIMAL
        "agg_collect_sorted",  # array<...>
        "q1_pricing_summary",  # bigint + double aggregates
        # r3 verdict task 5: ≥1 representative per query FAMILY (module)
        # through the pandas-path hasher — the driver's r2/r3 samples
        # never touched llm/dedup/ann/corpus/graph/sketch, so a sample
        # rotation would meet compare_frames_pandas cold without these.
        "normalize_locale",  # crocus_q
        "geo_haversine_knn",  # geo_q
        "graph_connected_components",  # graph_q
        "join_broadcast_dims",  # joins
        "join_asof_events",  # joins_advanced
        "text_exact_dedup",  # llm (dedup family)
        "ann_bruteforce_topk",  # llm (ann family)
        "dedup_simhash",  # llm (fuzzy-dedup family)
        "corpus_pack_context_windows",  # corpus_q
        "snapshot_time_travel",  # maintenance_q
        "dq_expectations",  # quality_q
        "filter_predicates",  # relational
        "join_dpp_prune",  # runtime_q
        "string_battery",  # scalars
        "set_union_by_name",  # setops
        "sketch_hll_portable",  # sketches_q
        "io_json_roundtrip",  # sources_q
        "sql_topk_customers_per_nation",  # sql_surface
        "stream_tumbling_window",  # streaming_q
        "udaf_weighted_mean",  # udfs_q
        "window_topk_per_group",  # windows
    }
)


def test_parity_covers_every_query_module():
    """PARITY_QUERIES must include at least one ORACLED query from every
    module in the registry — if a new family lands without a parity
    representative, this fails before the driver's sample rotation can
    meet the pandas hasher cold."""
    covered = {
        REGISTRY[n].fn.__module__.split(".")[-1] for n in PARITY_QUERIES
    }
    all_mods = {
        q.fn.__module__.split(".")[-1]
        for q in REGISTRY.values()
        if q.oracle
    }
    missing = all_mods - covered
    assert not missing, f"modules without a parity representative: {missing}"


def test_no_hugeint_oracle_outputs(duck):
    """No oracle may emit HUGEINT/UHUGEINT; DECIMAL only if reviewed."""
    bad, new_dec = [], []
    for name, q in sorted(REGISTRY.items()):
        if not q.oracle:
            continue
        rel = duck.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t in ("HUGEINT", "UHUGEINT"):
                bad.append(f"{name}.{col}: {t}")
            elif t.startswith("DECIMAL") and (name, col) not in (
                DECIMAL_ALLOWLIST
            ):
                new_dec.append(f"{name}.{col}: {t}")
    assert not bad, f"HUGEINT oracle outputs (driver hash hazard): {bad}"
    assert not new_dec, (
        "new DECIMAL oracle output columns — review for pandas-path "
        f"safety and add to DECIMAL_ALLOWLIST: {new_dec}"
    )


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_both_fetch_paths_agree(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    ok, report = compare_frames(df, duck, q.oracle)
    assert ok, f"{name} (fetchall path): {report}"
    df2 = q.fn(spark, SF_SMOKE)
    ok2, report2 = compare_frames_pandas(df2, duck, q.oracle)
    assert ok2, f"{name} (pandas path): {report2}"
