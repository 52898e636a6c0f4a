"""Text analysis operators: normalization, tokens, language ID,
quality scoring, fingerprinting.

All pure Column expressions (JVM-side regex/array functions — no
Python in the hot path), so at 100 TB these run inside whole-stage
codegen over the document scan with zero shuffles.

Expressions are written to be reproducible 1:1 in ANSI SQL (the
DuckDB oracle), so: no locale-dependent functions, explicit
character classes, deterministic tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language ID.
# Deliberately small + hard-coded: the op demonstrates the shape
# (token-overlap scoring) — swap in real lists at deployment.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "ist"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"),
}
# Fixed evaluation order for deterministic argmax ties.
LANG_ORDER = ("en", "es", "fr", "de", "zh")

PUNCT_CLASS = r"[.,!?;:()\-]"
WORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalized(text_col: str = "text") -> Column:
    """lower + trim + collapse whitespace — the canonical form used
    by dedup and fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def words(text_col: str = "text") -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalized(text_col), " ")


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-overlap score over distinct tokens."""
    w = F.array_distinct(words(text_col))
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS[lang]])))
        for lang in LANG_ORDER
    }


def predicted_lang(text_col: str = "text") -> Column:
    """Argmax language with fixed-order tie-breaking (first language
    in LANG_ORDER that attains the max wins)."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token and regex-token (BPE-ish pre-tokenizer
    pattern) counts."""
    return df.withColumn("n_ws_tokens", F.size(words(text_col))).withColumn(
        "n_regex_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_PATTERN), F.lit(0))),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha / stopword ratios + a composite
    quality score in [0,1] (heuristic linear blend)."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    w = words(text_col)
    n_words = F.size(w)
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(en_stop, x)))
    # try_divide: an empty document (n_chars = 0) scores NULL ratios
    # instead of killing the whole pipeline under ANSI mode
    n_punct = n_chars - F.length(F.regexp_replace(txt, PUNCT_CLASS, ""))
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    avg_wl = F.length(F.regexp_replace(normalized(text_col), " ", "")) / n_words
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    alpha_ratio = F.try_divide(n_alpha.cast("double"), n_chars)
    stop_ratio = n_stop.cast("double") / n_words
    score = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.25
        + alpha_ratio * 0.35
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.15
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("avg_word_len", F.round(avg_wl, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_gopher_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-quality gate signals (Rae et al. 2021,
    §A1.1) adapted to this corpus: word-count bounds, mean word
    length bounds, symbol-to-word ratio, and the ≥2-distinct-
    stopwords rule. (The line-based rules — bullet/ellipsis line
    fractions — have no analog here: the synthetic corpus is
    single-line.) Pure codegen expressions, zero shuffles."""
    txt = F.col(text_col)
    w = words(text_col)
    n_words = F.size(w)
    mean_wl = F.try_divide(
        F.length(F.regexp_replace(normalized(text_col), " ", "")).cast("double"),
        n_words,
    )
    n_symbols = F.length(F.regexp_replace(txt, r"[A-Za-z0-9\s]", ""))
    symbol_ratio = F.try_divide(n_symbols.cast("double"), n_words)
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_distinct_stop = F.size(F.array_intersect(F.array_distinct(w), en_stop))
    passes = (
        n_words.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (n_distinct_stop >= 2)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wl, 6))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("n_distinct_stopwords", n_distinct_stop)
        .withColumn("passes_gopher", passes)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (the reference's MD5 surrogate-key idiom, fetch_stocks.py:190,
    applied to content identity)."""
    return df.withColumn("fingerprint", F.md5(normalized(text_col)))


# PII patterns: deliberately conservative, ASCII-explicit classes so
# the same regex runs identically in Spark (Java regex) and DuckDB
# (RE2) — no \w/\b shorthand whose unicode semantics differ between
# engines. Order matters: emails before phones (an email's digits
# must not be half-eaten by the phone pattern).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    # +country and separator-tolerant 10+ digit sequences
    ("phone", r"\+?[0-9][0-9 ().-]{8,}[0-9]", "<PHONE>"),
)


def pii_scrub(text_col: str = "text") -> Column:
    """Mask emails / IPv4s / phone-like digit runs with typed
    placeholder tokens — the redaction gate of a training-data
    pipeline. A chain of codegen'd ``regexp_replace`` calls: zero
    shuffles, zero Python, linear scan cost at any corpus size.
    Patterns are a demonstration floor (swap in a maintained PII
    ruleset at deployment); the seam — pure Column in, pure Column
    out — is the production shape."""
    out = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Per-category redaction counts (how much PII a doc carried) —
    the audit metric next to the scrub. Each category counts on the
    text AFTER the earlier categories are masked, mirroring the
    scrub's sequential replace (an IPv4 is digits-and-dots, which the
    phone pattern would otherwise double-count)."""
    out: dict[str, Column] = {}
    scrubbed = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out[name] = F.size(
            F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out


def unigram_logprob_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc mean log-prob under the corpus's own unigram
    distribution — the model-free CCNet perplexity stand-in, shared
    by the ``unigram_logprob`` plan and the corpus builder's
    ``min_logprob`` gate (one implementation so scoring can't drift
    between them). Returns (id, n_tokens, avg_logprob) with the
    score ROUNDED to 6dp — gates that threshold on it stay
    deterministic across partition layouts (unrounded double
    summation order could flip a boundary doc).

    Plan shape: one explode → token groupBy (partial-agg), then the
    exploded stream joins the vocabulary. The vocab is broadcast
    (fine until ~10⁸ tokens); at web-scale vocab drop the broadcast
    hint and let AQE run a skew-handled hash join on the token key.
    NULL-text docs are excluded (no tokens, no score)."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(words(text_col)).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("t").cast("double"))),
                6,
            ).alias("avg_logprob"),
        )
    )
