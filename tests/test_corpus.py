"""Unit/property tests for the corpus-curation operators
(crocus_spark/operators/corpus.py). The DuckDB-oracle equivalence of the
registered queries is the driver's job; these tests cover the invariants
the oracle can't see — partition-layout independence, packing bounds, and
redaction behavior on real PII (the fixture corpus is PII-free).
"""

from __future__ import annotations

from crocus_spark.io import load
from crocus_spark.operators import corpus as C
from tests.conftest import SF_SMOKE


def test_shuffle_is_partition_layout_invariant(spark):
    """The shuffled order must depend only on (seed, id) — never on how the
    input happens to be partitioned."""
    docs = load(spark, SF_SMOKE, "documents")
    a = C.deterministic_shuffle(docs, "doc_id", seed=42).select(
        "doc_id", "shard", "pos"
    )
    b = C.deterministic_shuffle(docs.repartition(7), "doc_id", seed=42).select(
        "doc_id", "shard", "pos"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_shuffle_seed_changes_order(spark):
    docs = load(spark, SF_SMOKE, "documents")
    a = {
        r.doc_id: (r.shard, r.pos)
        for r in C.deterministic_shuffle(docs, "doc_id", seed=1).collect()
    }
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in C.deterministic_shuffle(docs, "doc_id", seed=2).collect()
    }
    assert a.keys() == b.keys()
    assert any(a[k] != b[k] for k in a)


def test_packing_invariants(spark):
    """Offsets stay inside the window; tokens_before is the exact running
    sum of shard-mates that precede the doc in shuffle order."""
    docs = load(spark, SF_SMOKE, "documents")
    rows = C.pack_context_windows(
        docs, "text", "doc_id", window_tokens=512
    ).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.tok_offset < 512
        assert r.window_id == r.tokens_before // 512
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.shuffle_key)
        running = 0
        for r in shard_rows:
            assert r.tokens_before == running
            running += r.n_tok


def test_repetition_flags_degenerate_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight"),
            (3, "ab"),  # fewer than 3 tokens -> no grams, keep
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert got[1].dup_ratio > 0.8 and not got[1].keep
    assert got[2].dup_ratio == 0.0 and got[2].keep
    assert got[3].n_grams == 0 and got[3].dup_ratio == 0.0 and got[3].keep


def test_boilerplate_fraction(spark):
    """A 5-gram shared by many docs is boilerplate; unique tails are not."""
    header = "all rights reserved by corp"
    rows = [(i, f"{header} unique{i} tail{i} words{i} here{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in C.boilerplate_ngram_stats(df, min_df=10, n=5).collect()
    }
    for r in got.values():
        assert r.n_boiler >= 1  # the shared header 5-gram
        assert r.boiler_frac < 1.0  # per-doc unique grams are not boilerplate


def test_quota_keeps_longest_within_budget(spark):
    docs = load(spark, SF_SMOKE, "documents")
    kept = C.quota_by_source(docs, quota_tokens=300).collect()
    per_src: dict[str, int] = {}
    for r in kept:
        per_src[r.source] = per_src.get(r.source, 0) + r.n_tok
    assert per_src, "quota should keep at least some docs"
    for total in per_src.values():
        assert total <= 300
    # greedy longest-first: every kept doc is at least as long as any
    # dropped doc of the same source... only guaranteed for the first pick,
    # so check the first-ranked doc per source is the source's longest.
    from pyspark.sql import functions as F

    longest = {
        r.source: r.mx
        for r in docs.withColumn("n_tok", C.ws_token_count(F.col("text")))
        .groupBy("source")
        .agg(F.max("n_tok").alias("mx"))
        .collect()
    }
    first = {r.source: r.n_tok for r in kept if r.cum_tok == r.n_tok}
    for src, n in first.items():
        assert n == longest[src]


def test_scrub_pii_redacts_real_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "contact john.doe+spam@example.co.uk or call 5551234567 now"),
            (2, "no pii here, just 123 words"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in C.scrub_pii(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_digit_runs == 1
    assert got[2].n_emails == 0 and got[2].n_digit_runs == 0
    # digest of doc 2 equals the md5 of the untouched text
    import hashlib

    assert got[2].redacted_md5 == hashlib.md5(
        b"no pii here, just 123 words"
    ).hexdigest()
    # and doc 1's digest matches the expected redacted form
    red = "contact <EMAIL> or call <NUM> now"
    assert got[1].redacted_md5 == hashlib.md5(red.encode()).hexdigest()


def test_tokenize_ids_vocab_and_oov(spark):
    """Ids are 1..K by descending frequency (ties by token); tokens outside
    the vocab map to 0; every (doc, pos) keeps exactly one row."""
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b rare")],
        "doc_id long, text string",
    )
    rows = C.tokenize_to_ids(df, vocab_size=2).collect()
    ids = {(r.doc_id, r.pos): (r.tok, r.token_id) for r in rows}
    assert len(ids) == len(rows) == 9
    by_tok = {r.tok: r.token_id for r in rows}
    # freq: b=4, a=3, c=1, rare=1 -> vocab keeps b(1), a(2); c/rare OOV
    assert by_tok == {"b": 1, "a": 2, "c": 0, "rare": 0}


def test_tokenize_ids_positions_reconstruct_docs(spark):
    docs = load(spark, SF_SMOKE, "documents")
    rows = C.tokenize_to_ids(docs, vocab_size=50).collect()
    from collections import defaultdict

    per_doc = defaultdict(dict)
    for r in rows:
        per_doc[r.doc_id][r.pos] = r.tok
    sample = {r.doc_id: r.text for r in docs.limit(20).collect()}
    for did, text in sample.items():
        toks = text.strip().lower().split()
        got = per_doc[did]
        assert [got[i] for i in range(len(toks))] == toks
