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
    ("Corpus curation (training-data pipeline)", ("corpus", "sampling")),
    ("LLM pipeline: dedup", ("dedup",)),
    ("LLM pipeline: similarity", ("similarity",)),
    ("LLM pipeline: text", ("text",)),
    ("LLM pipeline: multimodal", ("multimodal",)),
    ("UDF surface", ("udf",)),
    ("Geospatial", ("geo",)),
    ("Scale hardening", ("skew", "salt")),
    ("Lakehouse maintenance & data quality",
     ("maintenance", "quality", "validation")),
]


# SURVEY.md §2B row → implementing queries. Validated against REGISTRY at
# generation time: a renamed/removed query breaks the build of this doc.
SURVEY_2B = [
    (1, "Parquet scan", ["io_partitioned_prune", "q1_pricing_summary"]),
    (2, "CSV scan w/ schema", ["io_csv_roundtrip"]),
    (3, "JSON scan", ["io_json_roundtrip"]),
    (4, "binary/document source", ["io_binary_source"]),
    (5, "partitioned Parquet sink", ["io_partitioned_prune"]),
    (6, "single-file JSON sink", ["io_json_roundtrip"]),
    (7, "streaming file source", ["stream_tumbling_window"]),
    (8, "select / alias / drop", ["select_project_drop"]),
    (9, "filter battery", ["filter_predicates"]),
    (10, "conditional expression", ["conditional_case"]),
    (11, "broadcast hash equi-join", ["join_broadcast_dims"]),
    (12, "sort-merge equi-join", ["join_sortmerge_large"]),
    (13, "left/right/full outer", ["join_left_outer", "join_full_outer"]),
    (14, "left semi / left anti", ["join_left_semi", "join_left_anti"]),
    (15, "theta / range join", ["join_range_bands"]),
    (16, "as-of join", ["join_asof_events"]),
    (17, "interval/overlap join", ["join_interval_overlap"]),
    (18, "cross join", ["join_cross_grid"]),
    (19, "hash group-by agg", ["q1_pricing_summary"]),
    (20, "count distinct + approx",
     ["agg_distinct_counts", "agg_approx_distinct", "agg_hll_mergeable_sketch"]),
    (21, "argmax/argmin", ["agg_maxby_argmax"]),
    (22, "grouping sets / rollup / cube",
     ["agg_grouping_sets", "agg_rollup", "agg_cube"]),
    (23, "collect_list / collect_set", ["agg_collect_sorted"]),
    (24, "percentiles / median", ["agg_percentiles"]),
    (25, "stddev / variance / corr", ["agg_stats_moments"]),
    (26, "pivot", ["agg_pivot_confront"]),
    (27, "ranking windows", ["window_rank_battery"]),
    (28, "analytic windows", ["window_lag_lead", "window_first_last"]),
    (29, "frame-spec aggregates", ["window_moving_frame", "window_range_frame"]),
    (30, "top-k per group", ["window_topk_per_group"]),
    (31, "global sort", ["global_sort"]),
    (32, "limit / top-k", ["orderby_limit_topk"]),
    (33, "union by name", ["set_union_by_name", "products_union_dedup"]),
    (34, "intersect / except", ["set_intersect", "set_except"]),
    (35, "dedup by key (last-wins)", ["dedup_last_wins_by_key"]),
    (36, "string functions", ["string_battery"]),
    (37, "regex extract / match", ["regex_battery"]),
    (38, "URL parse", ["url_parse_filetype"]),
    (39, "locale decimal cast", ["normalize_locale"]),
    (40, "date/time functions", ["datetime_battery"]),
    (41, "math functions", ["math_battery"]),
    (42, "array functions", ["array_battery", "array_explode"]),
    (43, "map funcs + JSON",
     ["map_from_json", "json_props_battery", "json_variant_extract"]),
    (44, "null handling", ["null_handling", "try_functions_battery"]),
    (45, "tumbling window agg", ["stream_tumbling_window"]),
    (46, "sliding window agg", ["stream_sliding_window"]),
    (47, "session window", ["stream_session_window"]),
    (48, "watermark + late-data drop",
     ["stream_session_window", "stream_dedup_watermark"]),
    (49, "streaming dedup", ["stream_dedup_watermark"]),
    (50, "stateful per-key processing", ["stream_stateful_totals"]),
    (51, "stream-static join", ["stream_static_join", "stream_stream_join"]),
    (52, "output modes / triggers",
     ["stream_tumbling_window", "stream_stateful_totals"]),
    (53, "exact dedup at scale", ["text_exact_dedup"]),
    (54, "near-dup / fuzzy dedup",
     ["dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_survivors",
      "dedup_simhash"]),
    (55, "similarity search (ANN)",
     ["ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
      "ann_ivf_fullprobe_topk", "ann_hnsw_topk", "ann_hnsw_at_rest",
      "neardup_embedding_cosine", "ann_centroid_classify"]),
    (56, "text normalization/tokenization", ["text_token_stats"]),
    (57, "text stats / quality",
     ["text_langid", "text_quality_score", "text_fingerprint"]),
    (58, "TF-IDF / vectorize", ["text_tfidf_topk"]),
    (59, "fuzzy name match", ["join_fuzzy_name"]),
    (60, "multimodal columns",
     ["multimodal_real_decode", "multimodal_video_frames",
      "multimodal_audio_wav_windows", "multimodal_pdf_text",
      "multimodal_binary_stats"]),
    (61, "scalar pandas UDF", ["udf_pandas_scalar"]),
    (62, "UDAF", ["udaf_weighted_mean"]),
    (63, "UDTF", ["udtf_bigrams"]),
    (64, "grouped map", ["udf_grouped_map_zscore"]),
]

BEYOND_2B = [
    ("flagship cross-entity confront", ["flagship_confront"]),
    ("SQL-string surface (§2C)",
     ["sql_topk_customers_per_nation", "sql_setops_cohorts"]),
    ("skew salting", ["salted_groupby"]),
    ("hierarchical time rollup", ["rollup_hierarchical_time"]),
    ("watermarked stream-stream join", ["stream_stream_join"]),
    ("end-to-end curation pipeline", ["corpus_curation_pipeline"]),
    ("seeded stratified sampling", ["sample_stratified_docs"]),
    ("deterministic corpus shuffle", ["corpus_shuffle_deterministic"]),
    ("context-window sequence packing", ["corpus_pack_context_windows"]),
    ("repetition filter (dup n-grams)", ["text_repetition_ngrams"]),
    ("cross-doc boilerplate filter", ["corpus_boilerplate_ngrams"]),
    ("per-source token quotas", ["corpus_quota_by_source"]),
    ("PII scrubbing / redaction", ["scrub_pii_redact"]),
    ("frequency-vocab tokenization to ids", ["text_tokenize_ids"]),
    ("streaming corpus curation", ["stream_corpus_curation"]),
    ("train/eval decontamination", ["corpus_decontaminate"]),
    ("sliding-window chunking (RAG prep)", ["corpus_chunk_sliding"]),
    ("global row ids without global sort", ["corpus_global_row_ids"]),
    ("small-file compaction (OPTIMIZE)", ["maintenance_compact_files"]),
    ("snapshot time travel (VERSION AS OF)", ["snapshot_time_travel"]),
    ("data-quality expectation suite", ["dq_expectations"]),
    ("dynamic partition pruning", ["join_dpp_prune"]),
    ("runtime bloom-filter join", ["join_runtime_bloom_filter"]),
    ("custom Python Data Source (scraper-as-source)", ["io_python_datasource"]),
    ("schema evolution (mergeSchema read)", ["io_schema_evolution"]),
    ("cost-based join reordering (ANALYZE + CBO)", ["sql_cbo_join_reorder"]),
    ("custom streaming Python Data Source", ["stream_python_datasource"]),
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

    # SURVEY §2B cross-reference, validated against the registry
    missing = [
        (row, name)
        for row, _, names in SURVEY_2B
        for name in names
        if name not in REGISTRY
    ] + [
        (title, name)
        for title, names in BEYOND_2B
        for name in names
        if name not in REGISTRY
    ]
    if missing:
        raise SystemExit(f"stale SURVEY_2B mapping: {missing}")
    out.append("## SURVEY.md §2B cross-reference\n")
    out.append(
        "Every row of the §2B inventory with its implementing queries "
        "(validated against the registry at generation time).\n"
    )
    out.append("| §2B row | operator | queries |")
    out.append("|---|---|---|")
    for row, title, names in SURVEY_2B:
        qlist = ", ".join(f"`{n}`" for n in names)
        out.append(f"| {row} | {title} | {qlist} |")
    out.append("")
    out.append("## Beyond §2B\n")
    out.append("| capability | queries |")
    out.append("|---|---|")
    for title, names in BEYOND_2B:
        qlist = ", ".join(f"`{n}`" for n in names)
        out.append(f"| {title} | {qlist} |")
    out.append("")
    (REPO / "OPERATORS.md").write_text("\n".join(out))
    print(f"wrote OPERATORS.md: {n_total} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
