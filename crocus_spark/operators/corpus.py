"""Corpus-curation operators for training-data pipelines — the ordering /
packing / filtering stages that sit between dedup (operators/dedup.py) and
the trainer: deterministic shuffling, context-window packing, repetition
and boilerplate filters, per-source token quotas, PII scrubbing.

These generalize the reference's snapshot-store curation intent (the
partitioned per-day store at base_scraper.py:72-83 is a corpus of daily
document snapshots) to the driver's north-star LLM-pipeline surface.

Design rules for 100 TB:
- no global total order: every ordering is *sharded* (seeded hash shard →
  within-shard order), so windows/row_numbers parallelize per shard and no
  single-partition sort exists anywhere.
- all randomness is a deterministic seeded hash (md5 of seed:id) — results
  are reproducible across runs, partition layouts, and engines.
- cross-doc statistics (n-gram document frequency) reduce to a
  vocabulary-sized relation that broadcasts; document bodies shuffle at
  most once.

Published foundations: repetition and quality filters follow Rae et al.,
"Scaling Language Models: ... Gopher" (2021) §A1.1 and Penedo et al.,
"The RefinedWeb Dataset" (2023) §3 (line/ngram-level dedup); sequence
packing is the standard fixed-length batching described in Raffel et al.,
"Exploring the Limits of Transfer Learning" (T5, 2020) §2.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = [
    "shuffle_key",
    "deterministic_shuffle",
    "pack_context_windows",
    "dup_gram_cols",
    "repetition_stats",
    "boilerplate_ngram_stats",
    "quota_by_source",
    "scrub_pii",
    "tokenize_to_ids",
    "curation_pipeline",
    "word_ngrams",
    "decontaminate",
    "chunk_sliding_windows",
    "assign_global_row_ids",
]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count — the cheap `n_tok` every packing/quota stage
    shares. Mirrors DuckDB ``len(string_split_regex(trim(text),'\\s+'))``."""
    return F.size(F.split(F.trim(text), r"\s+"))


def shuffle_key(id_col: Column, seed: int = 42) -> Column:
    """Seeded deterministic shuffle key: md5 over "{seed}:{id}". The same
    expression exists verbatim in DuckDB, so shuffled order is
    engine-portable — and being a pure per-row hash it is stable under any
    partitioning or cluster layout."""
    return F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))


def deterministic_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42, n_shards: int = 8
) -> DataFrame:
    """Seeded global shuffle for training-data ordering, sharded so it
    scales: shard = first hex nibble of the key mod n_shards, position =
    rank of the key *within* the shard. No global sort exists — each shard
    orders independently (row_number windows partition by shard), so the
    operator parallelizes across shards at any corpus size.

    Epoch reshuffles are just a different ``seed``.
    """
    key = shuffle_key(F.col(id_col), seed)
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard", F.ascii(F.substring("shuffle_key", 1, 1)) % n_shards
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return out.withColumn("pos", F.row_number().over(w))


def pack_context_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
    window_tokens: int = 512,
) -> DataFrame:
    """Greedy sequence packing (T5-style fixed-length batching): documents
    in deterministic shuffled order are laid head-to-tail per shard; each
    doc is assigned to the context window where its first token lands
    (window_id = tokens_before // window_tokens). A doc may span a window
    boundary — the trainer-side splitter handles that; assignment here is
    what must be deterministic and distributed.

    Pure integer window arithmetic over a per-shard running sum — exact in
    any engine, and every window function partitions by shard (no global
    accumulation)."""
    shuffled = deterministic_shuffle(df, id_col, seed, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        shuffled.withColumn("n_tok", ws_token_count(F.col(text_col)))
        .withColumn("tokens_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn(
            "window_id", F.floor(F.col("tokens_before") / F.lit(window_tokens))
        )
        .withColumn("tok_offset", F.col("tokens_before") % F.lit(window_tokens))
    )


_GRAM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_grams", T.IntegerType()),
        T.StructField("n_distinct_grams", T.IntegerType()),
    ]
)


@F.pandas_udf(_GRAM_STATS_SCHEMA)
def _gram_stats_udf(texts):
    """Arrow-batched 3-gram stats. This is a DELIBERATE Python hot-path
    exception (see SCALE.md global rule 3): the declarative form —
    transform(sequence(...)) building the gram array + array_distinct —
    runs in Spark's interpreted higher-order-function evaluator, measured
    16× slower than this vectorized batch (7s → 0.4s on 5k docs; the
    array_distinct comparator alone is quadratic and per-element
    interpreted). Counts are bit-identical: tokens cannot contain
    whitespace, so distinct token-triples == distinct "a b c" gram
    strings, which is what the DuckDB oracle counts."""
    import re

    import pandas as pd

    ws_re = re.compile(r"\s+", re.ASCII)
    out_g, out_d = [], []
    for t in texts:
        if t is None:
            out_g.append(0)
            out_d.append(0)
            continue
        toks = [x for x in ws_re.split(t.strip().lower()) if x != ""]
        n3 = max(len(toks) - 2, 0)
        out_g.append(n3)
        out_d.append(len(set(zip(toks, toks[1:], toks[2:]))) if n3 else 0)
    return pd.DataFrame({"n_grams": out_g, "n_distinct_grams": out_d})


# asNondeterministic (guide §4.4 pattern): callers filter on dup_ratio
# (curation_pipeline's repetition gate), and the optimizer pushes that
# filter below the projection by evaluating the UDF a SECOND time under
# it — the corpus_curation_pipeline plan carried two ArrowEvalPython
# nodes for this one UDF, every surviving doc tokenized twice. The
# function is pure; withholding the deterministic contract pins one
# evaluation per row (plan-gated in tests/test_plans.py).
_gram_stats_nd = _gram_stats_udf.asNondeterministic()


def dup_gram_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach duplicate-3-gram columns (n_grams, n_distinct_grams,
    dup_ratio) — the Gopher §A1.1 repetition signal, chainable with the
    other withColumn-style scorers. Stateless per-row (Arrow-batched)
    work: no shuffle, streams unchanged."""
    return (
        df.withColumn("_g3", _gram_stats_nd(F.col(text_col)))
        .withColumn("n_grams", F.col("_g3.n_grams"))
        .withColumn("n_distinct_grams", F.col("_g3.n_distinct_grams"))
        .withColumn(
            "dup_ratio",
            F.when(F.col("n_grams") <= 0, F.lit(0.0)).otherwise(
                F.round(
                    1.0 - F.col("n_distinct_grams") / F.col("n_grams").cast("double"),
                    6,
                )
            ),
        )
        .drop("_g3")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_ratio: float = 0.5,
) -> DataFrame:
    """Within-document repetition filter (Gopher §A1.1 "duplicate n-gram
    fraction"): the share of word 3-grams that are repeats of an earlier
    3-gram in the same doc. Degenerate looping text scores near 1.

    Entirely per-row expression work (split → 3-gram transform →
    array_distinct) — no shuffle, whole-stage-codegen'd, embarrassingly
    parallel at any scale."""
    return dup_gram_cols(df, text_col).withColumn(
        "keep", F.col("dup_ratio") <= max_dup_ratio
    ).select(id_col, "n_grams", "n_distinct_grams", "dup_ratio", "keep")


def boilerplate_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_df: int = 30,
    max_boiler_frac: float = 0.5,
) -> DataFrame:
    """Cross-document boilerplate filter (RefinedWeb §3 line-dedup,
    re-expressed in token space for newline-free corpora): a word n-gram
    appearing in ≥ min_df distinct documents is boilerplate (headers,
    navigation, license blurbs); each doc reports what fraction of its
    distinct n-grams are boilerplate.

    The (gram → document frequency) relation is the only cross-doc state;
    it is vocabulary-sized and broadcast back onto the exploded grams —
    document bodies are never shuffled, and the gram relation map-side
    combines before its one aggregation shuffle.

    As in dup_gram_cols, the token array materializes in its own
    projection so the split is evaluated once, not once per element_at."""
    with_ws = df.withColumn(
        "_wsn", F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )
    toks = F.col("_wsn")
    nmax = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.when(nmax <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), nmax),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )
    doc_grams = with_ws.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("gram")
    )
    gram_df = doc_grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        doc_grams.join(F.broadcast(gram_df), "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0)).alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac",
            F.round(F.col("n_boiler") / F.col("n_grams").cast("double"), 6),
        )
    )
    return per_doc.withColumn(
        "keep", F.col("boiler_frac") <= max_boiler_frac
    ).select(F.col("id").alias(id_col), "n_grams", "n_boiler", "boiler_frac", "keep")


def quota_by_source(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    quota_tokens: int = 3000,
) -> DataFrame:
    """Per-source token quota (data-mixture control): rank docs within each
    source (longest first — the cheap quality proxy; swap in a quality
    score upstream), keep docs while the source's running token total stays
    within quota. Windows partition by source, so the operator scales with
    the number of sources, not corpus size, and ties break on id for
    determinism."""
    n_tok = ws_token_count(F.col(text_col))
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.desc("n_tok"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("n_tok", n_tok)
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= quota_tokens)
        .select(id_col, source_col, "n_tok", "cum_tok")
    )


# Engine-portable PII patterns (Java regex == RE2 for this subset: no
# backrefs, no lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGITRUN_RE = r"\d{6,}"


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing (pre-training hygiene): redact email addresses and
    long digit runs (phone/account numbers), report per-doc match counts
    and the digest of the redacted text. Pure per-row regex — no shuffle;
    the scrubbed corpus writes back out partition-parallel."""
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), DIGITRUN_RE, "<NUM>"
    )
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(text, F.lit(f"({EMAIL_RE})"), 1)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(text, F.lit(f"({DIGITRUN_RE})"), 1)).alias(
            "n_digit_runs"
        ),
        F.md5(redacted).alias("redacted_md5"),
    )


def tokenize_to_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Frequency-vocabulary tokenization (trainer prep): build the top-K
    vocabulary by corpus frequency (ties by token, so ids are stable), map
    every token position to its id, OOV → 0. Returns the exploded
    (doc, pos, tok, token_id) relation — the columnar form a trainer's
    packing step consumes.

    Scale shape: token counts are one map-side-combined aggregation; the
    top-K select is a distributed TakeOrdered (no global sort of the
    vocabulary relation); id assignment windows over only the K surviving
    rows; and the finished vocab broadcasts onto the token stream — the
    corpus-sized relation never joins shuffle-side. A learned BPE vocab
    drops in as the same (tok → id) broadcast relation."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), "tok").limit(vocab_size)
    w = Window.orderBy(F.desc("n"), "tok")  # K rows only — safe single task
    vocab = top.withColumn("token_id", F.row_number().over(w)).select(
        "tok", "token_id"
    )
    return toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce("token_id", F.lit(0)).alias("token_id"),
    )


def curation_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.45,
    max_dup_ratio: float = 0.5,
    seed: int = 42,
    n_shards: int = 8,
    window_tokens: int = 512,
) -> DataFrame:
    """The end-to-end curation flagship: quality filter → repetition filter
    → exact dedup → deterministic shuffle → context-window packing, as one
    declarative plan.

    Stage economics at 100 TB: the two filters and both scores are per-row
    expressions fused into the scan (documents that fail never leave the
    mapper); exact dedup shuffles 16-byte digests once; packing windows
    partition by shard. Catalyst sees the whole pipeline as one plan, so
    column pruning reaches the scan and the filters run before any
    exchange.
    """
    from crocus_spark.operators.dedup import exact_dedup
    from crocus_spark.operators.text import quality_score

    scored = dup_gram_cols(quality_score(df, text_col), text_col)
    kept = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("dup_ratio") <= max_dup_ratio)
    )
    deduped = exact_dedup(kept, text_col, id_col)
    return pack_context_windows(
        deduped, text_col, id_col, seed=seed, n_shards=n_shards,
        window_tokens=window_tokens,
    )


def word_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 8
) -> DataFrame:
    """Distinct word n-grams per document: (id, gram).

    Built from ``posexplode`` + ``lead`` windows partitioned per document
    — whole-stage-codegen throughout (no interpreted higher-order-function
    lambdas, which run ~20× slower on this path), and the per-doc window
    sort parallelizes across documents, so cost is O(tokens) with no
    global order anywhere. ``concat_ws`` skips NULLs, so tail positions
    are cut by requiring the (n-1)-th lead to exist.
    """
    from crocus_spark.operators.dedup import normalize_text

    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        words.select(
            "id",
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].isNotNull().alias("full"),
        )
        .filter("full")
        .select("id", "gram")
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Train/eval decontamination: corpus documents sharing any word
    n-gram with the benchmark set, with per-doc contamination counts.

    The standard pre-training hygiene step (n-gram eval-overlap removal:
    Brown et al., "Language Models are Few-Shot Learners", 2020, §4 and
    appendix C use 13-grams; Touvron et al. and most open pipelines use
    8-10): any training document that contains a full n-gram from an
    evaluation benchmark leaks the eval set and must be dropped or
    flagged.

    Scale shape: benchmark gram sets are eval-sized (MBs — tiny against
    a 100 TB corpus), so the distinct benchmark grams BROADCAST and the
    corpus side is one scan + explode + map-side hash probe; the only
    shuffle is the final per-doc count. Returns
    (id, n_grams, n_contaminated, contamination) for contaminated docs
    only — the drop list.
    """
    cg = word_ngrams(corpus, text_col, id_col, n)
    bg = word_ngrams(benchmark, text_col, id_col, n).select("gram").distinct()
    per_doc = cg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cg.join(F.broadcast(bg), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return hits.join(per_doc, "id").select(
        "id",
        "n_grams",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
            "contamination"
        ),
    )


def chunk_sliding_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-size chunking — the context-preparation step for
    retrieval/embedding pipelines (chunk → embed → index) and for
    long-doc training samples: token windows of ``chunk_tokens`` every
    ``stride`` tokens (overlap = chunk_tokens - stride).

    Pure per-row array arithmetic: ``sequence`` generates chunk starts,
    ``slice``/``concat_ws`` cut the window — all JVM built-ins (slice is
    a native expression, NOT an interpreted HOF lambda), no shuffle; the
    op fuses into the scan and is embarrassingly parallel at any corpus
    size. Final partial chunks are kept (standard; the embedder pads).

    Returns (id, chunk_id, start_tok, n_chunk_tok, chunk_md5) — digests,
    not bodies, so downstream joins move 16 bytes per chunk, not text.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.select(
            F.col(id_col).alias("id"),
            words.alias("ws"),
            F.size(words).alias("n_tok"),
        )
        .select(
            "id",
            "ws",
            "n_tok",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_tok") - 1, F.lit(stride)
                )
            ).alias("start_tok"),
        )
        .select(
            "id",
            (F.col("start_tok") / stride).cast("long").alias("chunk_id"),
            "start_tok",
            F.least(
                F.lit(chunk_tokens), F.col("n_tok") - F.col("start_tok")
            ).alias("n_chunk_tok"),
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("ws"), F.col("start_tok") + 1, chunk_tokens)
                )
            ).alias("chunk_md5"),
        )
    )


def assign_global_row_ids(
    df: DataFrame,
    order_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Global consecutive row ids (0..n-1) in ``order_col`` order with NO
    global sort and NO driver collect — the training-sample numbering
    step (every packed corpus needs stable global sample ids).

    The naive ``row_number() OVER (ORDER BY k)`` collapses the whole
    table into ONE partition — the canonical 100 TB anti-pattern. Here:
    range-shard on the key (shard bounds from a scalar max aggregate,
    broadcast), rank WITHIN each shard in parallel, then add each
    shard's cumulative predecessor count — a shard-count relation of
    n_shards rows, windowed at trivial size and broadcast back. Three
    narrow shuffles of metadata; document bodies move once.

    Monotone ids: shard bounds follow key order, so
    (shard asc, within-shard rank asc) enumerates keys globally.
    """
    mx = df.agg(
        F.max(F.col(order_col)).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    sharded = df.crossJoin(F.broadcast(mx)).withColumn(
        "_shard",
        F.least(
            F.lit(n_shards - 1),
            F.floor(
                F.col(order_col)
                / (F.floor(F.col("_mx") / n_shards) + 1)
            ).cast("int"),
        ),
    )
    in_shard = Window.partitionBy("_shard").orderBy(order_col)
    counts = sharded.groupBy("_shard").agg(
        F.count(F.lit(1)).alias("_shard_n")
    )
    w_off = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # n_shards rows total — a metadata-sized window, not a data one
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_shard_n").over(w_off), F.lit(0))
    ).select("_shard", "_offset")
    return (
        sharded.withColumn("_rank", F.row_number().over(in_shard))
        .join(F.broadcast(offsets), "_shard")
        .withColumn(
            "row_id", (F.col("_offset") + F.col("_rank") - 1).cast("long")
        )
        .drop("_shard", "_rank", "_offset", "_mx", "_n")
    )
