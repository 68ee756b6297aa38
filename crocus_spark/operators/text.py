"""Text-analysis operators for training-data pipelines — SURVEY.md §2B
#56-57 and the driver north star (language-ID, quality scoring, token
counting, fingerprinting) over the ``documents`` table.

Everything is built-in column expressions (regexp + higher-order functions)
— JVM-side, codegen-friendly, no Python in the hot path — so each operator
is a single scan at any scale. Each has an exact SQL equivalent used as its
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword heuristic language
# classifier. Deterministic and tiny by design: language ID at 100 TB must
# be a scan-speed expression, not a model call. (A real model plugs in as a
# mapInPandas stage behind the same column contract.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "de", "es"],
}

# BPE-ish pre-tokenizer: alphabetic runs, digit runs, single non-space
# symbols — the classic byte-pair pre-split shape.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_hits(c: Column, words: list[str]) -> Column:
    """Count of marker-word occurrences (word-boundary regex)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 1))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID (§ north-star 'text analysis').

    Scores each language by marker-stopword hit rate plus a CJK-codepoint
    test for zh; argmax with a fixed precedence order breaks ties. Adds
    ``lang_pred`` and per-language scores.
    """
    c = F.col(text_col)
    scores = {k: _marker_hits(c, v) for k, v in LANG_MARKERS.items()}
    zh = F.size(F.regexp_extract_all(c, F.lit(r"([一-鿿])"), 1))
    out = df
    for k, s in scores.items():
        out = out.withColumn(f"score_{k}", s)
    out = out.withColumn("score_zh", zh)
    # precedence order on ties: zh > en > de > fr > es > und
    best = (
        F.when((F.col("score_zh") > 0), F.lit("zh"))
        .when(
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") > 0),
            F.lit("en"),
        )
        .when(
            (F.col("score_de") >= F.col("score_fr"))
            & (F.col("score_de") >= F.col("score_es"))
            & (F.col("score_de") > 0),
            F.lit("de"),
        )
        .when(
            (F.col("score_fr") >= F.col("score_es")) & (F.col("score_fr") > 0),
            F.lit("fr"),
        )
        .when(F.col("score_es") > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return out.withColumn("lang_pred", best)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting (north star): whitespace tokens and BPE-ish regex
    tokens, plus distinct-token count and mean token length."""
    c = F.col(text_col)
    ws = F.split(F.trim(c), r"\s+")
    bpe = F.regexp_extract_all(c, F.lit(f"({BPE_TOKEN_RE})"), 1)
    return (
        df.withColumn("n_ws_tokens", F.size(ws))
        .withColumn("n_bpe_tokens", F.size(bpe))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(ws)))
        .withColumn(
            "mean_token_len",
            F.round(
                F.aggregate(
                    F.transform(ws, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size(ws),
                6,
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring (north star): length, punctuation density, stopword
    ratio, alpha ratio → one bounded score. The standard pre-training
    quality-filter shape (cf. C4/Gopher rules): cheap, deterministic,
    filterable at scan speed."""
    c = F.col(text_col)
    n_chars = F.length(c)
    ws = F.split(F.trim(c), r"\s+")
    n_tokens = F.size(ws)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"([^\w\s])"), 1))
    n_alpha = F.size(F.regexp_extract_all(c, F.lit(r"([A-Za-z])"), 1))
    n_stop = _marker_hits(c, LANG_MARKERS["en"])
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
        - punct_ratio * 0.5,
        6,
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality", score)
    )


FP_MOD = 1_000_000_007
FP_BASE = 31


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint (north star): polynomial rolling hash over the
    code points of the normalized text, mod 1e9+7 — order-sensitive (an
    anagram gets a different print), locale-free, and expressible in both
    engines as a left fold. At perf-critical scale the same fold runs as a
    vectorized Pandas UDF; the expression form keeps it oracle-checkable."""
    chars = F.regexp_extract_all(
        F.lower(F.trim(F.col(text_col))), F.lit("(.)"), 1
    )
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )
    return df.withColumn("fingerprint", fp)


def heavy_hitter_tokens(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Exact heavy hitters (freq > N/k) in bounded memory, two passes.

    Pass 1 is a per-partition Misra-Gries sketch (capacity ``k``) run via
    ``mapInPandas``: each partition emits at most k candidate tokens, and
    the union of per-partition candidates provably contains every global
    heavy hitter (averaging: a token with global share > 1/k beats 1/k in
    some partition; MG keeps everything above N_p/(k+1)). Pass 2 recounts
    ONLY the candidates exactly (broadcast semi-join) and keeps those with
    count·k > N. State is O(k·partitions) no matter the corpus size — the
    100 TB-safe formulation of "top tokens" — while the result is exactly
    the SQL ``HAVING COUNT(*)*k > N``, so it stays oracle-checkable.
    """
    import pandas as pd  # local: keep module import light

    tokens = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    )

    def mg_sketch(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["token"]:
                t = text
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = (
        tokens.mapInPandas(mg_sketch, schema="token string")
        .distinct()
    )
    total = tokens.agg(F.count(F.lit(1)).alias("_n"))
    return (
        tokens.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("_n"))
        .drop("_n")
    )
