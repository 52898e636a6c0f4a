r"""LLM-pipeline keys built in r5 for the r6 driver window.

Two jobs: (a) give the tested-but-lib-only training-data operators a
driver-graded observable (frequent_tokens ← operators/sketches
.heavy_hitters, contamination_flags ← operators/dedup
.ngram_contamination, capped_counts ← operators/sampling.cap_per_key,
split_counts ← operators/sampling.hash_split), and (b) extend the
quality-signal family with the bigram LM (``bigram_logprob`` — the
next term of the CCNet-style perplexity stand-in after the graded
``unigram_logprob``).

All five registered in ``queries()`` immediately (r5 rule: staging is
POSITION in the grade window, never absence) and parity-proven now by
tests/test_next2_staged.py.

Scale notes per key:
- frequent_tokens: 2-pass Misra-Gries — pass 1 is O(1/f) memory per
  task emitting ≤ partitions×⌈1/f⌉ candidates, pass 2 exact-counts
  candidates only (broadcast semi join). Vocabulary-size-independent;
  the full-vocab groupBy this replaces is the thing that dies at
  100 TB (operators/sketches.py module doc).
- contamination_flags: benchmark shingles broadcast (eval sets are
  metadata-sized), corpus explode joins map-side, only contaminated
  hits shuffle (operators/dedup.ngram_contamination doc).
- bigram_logprob: explode → bigram groupBy → left-word rollup of the
  BIGRAM count table (vocab²-sized, corpus-independent) → join back;
  two corpus-sized shuffles (explode agg + doc agg), the conditional
  table derived without rescanning the corpus.
- capped_counts / split_counts: the decisions are map-only
  purpose-salted hash functions (operators/sampling.py); the graded
  observable is the per-group admitted count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.dedup import ngram_contamination
from stock_data_project_spark.operators.sampling import cap_per_key, hash_split
from stock_data_project_spark.operators.sketches import heavy_hitters
from stock_data_project_spark.operators.textops import words

_MIN_FRACTION = 0.002
_CAP_N = 8
_CAP_MIN_CHARS = 400
_BENCH_MOD = 29


def q_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters with EXACT counts via 2-pass Misra-Gries
    (the corpus's ~30-token Zipf head at this threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters(docs, min_fraction=_MIN_FRACTION)


def q_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, graded: eval set = every 29th doc
    (deterministic stand-in for a held-out benchmark), corpus = the
    rest; flag corpus docs sharing any 8-token shingle with the eval
    set. Exact string match — planted corpus duplicates whose partner
    lands in the eval set are exactly what leaks."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return ngram_contamination(corpus, bench, n=8)


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean log P(w2|w1) under the corpus's own bigram
    distribution — the second term of the model-free perplexity
    stand-in (unigram_logprob is the first). No smoothing needed: the
    corpus is scored under itself, so every observed bigram has
    count ≥ 1. Docs with < 2 tokens have no bigrams and drop out —
    same convention as the oracle.

    The conditional's denominator c1(w1) = Σ_w2 c2(w1, w2) rolls up
    from the bigram count table (vocab²-sized) — no second corpus
    scan. Bigram construction is the CODEGEN lead-over-window form
    (the interpreted-HOF rule: the zip_with-of-slices build fed the
    same aggregations 2.25× slower at the 30× smoke, 10.95→4.86s,
    bit-identical counts)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(words("text")).alias("pos", "_w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    # bigrams feeds the count rollup AND the final doc-scoring join —
    # one eager materialization instead of running the tokenize +
    # per-doc lead window twice (r13 before-plan: the whole subtree
    # duplicated, 6 scans); c2 likewise feeds c1 and lp
    bigrams = (
        tok.withColumn("_nx", F.lead("_w").over(win))
        .filter(F.col("_nx").isNotNull())
        .select("doc_id", F.concat_ws(" ", "_w", "_nx").alias("bg"))
        .localCheckpoint(eager=True)
    )
    c2 = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c2")).localCheckpoint(
        eager=True
    )
    c1 = (
        c2.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    # join the VOCAB tables first (c2 ⋈ c1 is vocab²-sized), then hit
    # the exploded corpus exactly once: the first cut joined the
    # corpus frame to c2 AND c1 separately — three corpus-sized
    # shuffles; this shape pays two (explode-agg + doc-agg), measured
    # 28.4s → 15.1s on the 30× replicated corpus
    lp = (
        c2.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c1, "w1")
        .select("bg", F.log(F.col("c2") / F.col("c1")).alias("lp"))
    )
    return (
        bigrams.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


def q_capped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap gate, graded on its pure observable: admitted
    count per source after capping the long docs (n_chars ≥ 400) at
    exactly ``_CAP_N`` per source (exact mode → kept = min(n_k, N),
    which is what the oracle can state without replaying the hash
    order)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _CAP_MIN_CHARS
    )
    kept = cap_per_key(docs, _CAP_N, key_cols="source", exact=True)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split, graded on per-split doc
    counts. Rows-only: membership is a pure xxhash64 function DuckDB
    cannot replay; determinism + partitioning-invariance are pinned in
    tests/test_sampling.py, and the counts' multinomial concentration
    (±O(√n) of the weights) in tests/test_next2_staged.py."""
    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


QUERIES_NEXT = {
    "frequent_tokens": q_frequent_tokens,
    "contamination_flags": q_contamination_flags,
    "bigram_logprob": q_bigram_logprob,
    "capped_counts": q_capped_counts,
    "split_counts": q_split_counts,
}

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

ORACLE_NEXT = {
    "frequent_tokens": rf"""
        WITH toks AS (
            SELECT unnest(string_split({_NORM}, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        ), f AS (
            SELECT token, count(*) AS n FROM toks
            WHERE token <> '' GROUP BY token
        ), t AS (
            SELECT CAST(sum(n) AS DOUBLE) AS total FROM f
        )
        SELECT token, n, round(n / total, 6) AS fraction
        FROM f CROSS JOIN t
        WHERE n >= total * {_MIN_FRACTION}
    """,
    "contamination_flags": rf"""
        WITH norm AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w
            FROM documents WHERE text IS NOT NULL
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, gs.i, gs.i + 7), ' ') AS sh
            FROM norm, LATERAL unnest(generate_series(1, len(w) - 7)) AS gs(i)
            WHERE len(w) >= 8
            UNION
            SELECT DISTINCT doc_id, array_to_string(w, ' ') AS sh
            FROM norm WHERE len(w) < 8
        ), bench AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id % {_BENCH_MOD} = 0
        )
        SELECT doc_id, count(*) AS n_matched_grams
        FROM sh JOIN bench USING (sh)
        WHERE doc_id % {_BENCH_MOD} <> 0
        GROUP BY doc_id
    """,
    "bigram_logprob": rf"""
        WITH norm AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w
            FROM documents WHERE text IS NOT NULL
        ), bg AS (
            SELECT doc_id,
                   array_to_string(list_slice(w, gs.i, gs.i + 1), ' ') AS bg
            FROM norm, LATERAL unnest(generate_series(1, len(w) - 1)) AS gs(i)
            WHERE len(w) >= 2
        ), c2 AS (
            SELECT bg, count(*) AS c2 FROM bg GROUP BY bg
        ), c1 AS (
            SELECT split_part(bg, ' ', 1) AS w1, sum(c2) AS c1
            FROM c2 GROUP BY 1
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(avg(ln(CAST(c2 AS DOUBLE) / c1)), 6) AS avg_logprob
        FROM bg
        JOIN c2 USING (bg)
        JOIN c1 ON split_part(bg, ' ', 1) = w1
        GROUP BY doc_id
    """,
    "capped_counts": f"""
        SELECT source,
               least(count(*), {_CAP_N}) AS n_kept
        FROM documents
        WHERE n_chars >= {_CAP_MIN_CHARS}
        GROUP BY source
    """,
}


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE token accounting: train merge rules on the (bounded,
    hash-ordered) corpus sample, encode the corpus map-only, report
    per-doc whitespace vs BPE token counts and the compression ratio.
    Rows-only: the merge loop is sequential per word, not
    SQL-expressible; reference-implementation parity + determinism
    pinned in tests/test_bpe.py."""
    from stock_data_project_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=200, sample_docs=2000)
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.round(
            F.try_divide(
                F.col("n_bpe_tokens").cast("double"),
                F.col("n_ws_tokens").cast("double"),
            ),
            6,
        ).alias("tokens_per_word"),
    )


QUERIES_NEXT["bpe_token_count"] = q_bpe_token_count


def q_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing graded on its rollup observable: pack the
    corpus into 2048-token bins (operators/packing.pack_sequences —
    per-hash-group FFD, one exchange, deterministic bins) and report
    bin count / fill. Rows-only: FFD is inherently sequential per
    group, not SQL-expressible; determinism + budget invariants are
    pinned in tests/test_packing.py."""
    from stock_data_project_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, budget=2048)
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("has_oversize").cast("bigint").alias("n_oversize_bins"),
        F.round(F.avg(F.col("fill") / 2048.0), 6).alias("avg_fill_ratio"),
        F.max("fill").alias("max_fill"),
    )


def q_remix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain re-mixing graded on per-domain admitted counts: remix to
    a 50/30/20 three-source target (operators/sampling.remix_corpus —
    map-only purpose-salted keeps, no up-sampling, the k-row domain
    count is the only shuffle). Rows-only: membership is an xxhash64
    function DuckDB cannot replay; mixture convergence is pinned in
    tests/test_sampling.py."""
    from stock_data_project_spark.operators.sampling import remix_corpus

    docs = load_table(spark, sf_dir, "documents")
    mixed = remix_corpus(docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


QUERIES_NEXT["pack_stats"] = q_pack_stats
QUERIES_NEXT["remix_counts"] = q_remix_counts
