"""BPE tokenizer: reference-implementation parity, determinism, the
Arrow-disabled driver-session regression guard, and the graded key's
invariants."""

from __future__ import annotations

from stock_data_project_spark.operators.bpe import (
    _encode_word,
    _train_merges,
    _word_freqs,
    bpe_encode,
    bpe_train,
)
from tests.conftest import SF_ORACLE


def test_train_merges_toy_corpus():
    """The classic textbook example: 'low/lower/newest/widest'-style
    frequency structure — the most frequent pair merges first and
    ties break deterministically."""
    freqs = {"aaab": 10, "aab": 5, "ab": 2}
    merges = _train_merges(freqs, 3)
    assert merges[0] == ("a", "a")  # 25 occurrences, the clear max
    assert len(merges) == 3
    # deterministic: same input, same merges
    assert merges == _train_merges(dict(freqs), 3)


def test_encode_word_applies_ranks_in_order():
    # merges: (a,a)->aa then (aa,b)->aab: "aaab" -> [aa, ab?]...
    ranks = {("a", "a"): 0, ("aa", "b"): 1}
    # aaab -> aa a b </w> -> (no (a,b) rule, (aa,b) doesn't touch
    # the middle 'a') -> 3 tokens + eow
    assert _encode_word("aaab", ranks) == 4
    assert _encode_word("aab", ranks) == 2  # aa+b merges, then </w>
    assert _encode_word("", ranks) == 1  # bare </w>


def test_bpe_spark_matches_reference(spark):
    """Spark pipeline == pure-Python reference on the same docs."""
    docs = [(i, t) for i, t in enumerate(
        ["the cat sat", "the cat", "a hat", "the the the", None]
    )]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges_df = bpe_train(df, n_merges=10, sample_docs=10)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    # reference: train directly on the full corpus word freqs
    ref_merges = _train_merges(
        _word_freqs([t for _, t in docs if t is not None]), 10
    )
    assert merges == ref_merges
    ranks = {p: i for i, p in enumerate(ref_merges)}
    out = {r["doc_id"]: r for r in bpe_encode(df, merges_df).collect()}
    for i, t in docs:
        if t is None:
            assert out[i]["n_bpe_tokens"] is None
            continue
        words = t.strip().lower().split()
        assert out[i]["n_ws_tokens"] == len(words)
        assert out[i]["n_bpe_tokens"] == sum(
            _encode_word(w, ranks) for w in words
        )


def test_bpe_key_runs_and_compresses(spark):
    """Graded-key invariants at sf0.01: every doc covered, BPE never
    emits fewer than one token per word... and after 200 merges the
    common words should be single tokens (ratio well under the
    char-level worst case)."""
    from stock_data_project_spark.plans.llm_next2 import QUERIES_NEXT

    out = QUERIES_NEXT["bpe_token_count"](spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"]  # >= 1 token/word
    import statistics

    # NULL/empty-text docs yield tokens_per_word NULL (try_divide);
    # keep the invariant testable on a regenerated corpus containing
    # them instead of TypeError-ing the gate on the first None.
    ratios = [r["tokens_per_word"] for r in rows if r["tokens_per_word"] is not None]
    for r in rows:
        if r["tokens_per_word"] is None:
            assert r["n_ws_tokens"] == 0  # only empty docs lack a ratio
    assert ratios  # corpus is not all-empty
    mean_ratio = statistics.mean(ratios)
    assert mean_ratio < 4.0, mean_ratio  # merges actually fired


def test_bpe_key_arrow_disabled(spark):
    """The driver's verifier session has Arrow OFF — every
    toPandas/createDataFrame crossing must survive it (CLAUDE.md; the
    r3 ann_ivf ERR class)."""
    from stock_data_project_spark.plans.llm_next2 import QUERIES_NEXT

    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        assert QUERIES_NEXT["bpe_token_count"](spark, SF_ORACLE).count() == 500
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)
