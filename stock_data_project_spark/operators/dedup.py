"""Deduplication operators: exact, MinHash+LSH, SimHash, blocked
n-gram Jaccard.

Scale design: none of these materialize an O(n²) comparison. Exact
dedup is one hash groupBy; MinHash/SimHash signatures are computed
map-side with array expressions (no explode, no shuffle), and only
band-collision candidates are joined; Jaccard verification is
blocked so each block is small. This is the standard LSH recipe
(Broder '97 minhash / Charikar '02 simhash) expressed as DataFrame
ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_data_project_spark.operators.textops import normalized, words

NUM_PERMS = 32  # minhash permutations
BANDS = 8  # LSH bands (rows per band = NUM_PERMS // BANDS = 4)
SIMHASH_BITS = 64


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by md5 of normalized text: one row per distinct content,
    keeper = min id, n_dups = group size. Single shuffle on a
    64-hex key — uniform, skew-free at any scale."""
    return (
        df.select(F.col(id_col), F.md5(normalized(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text_col: str = "text", k: int = 3) -> Column:
    """k-word shingles of the normalized text, as an array column —
    built with sequence+transform so it stays JVM-side (no explode)."""
    w = words(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
    )


def minhash_signature(shingle_col: Column, num_perms: int = NUM_PERMS) -> Column:
    """Array of num_perms minhashes: perm i = min over shingles of
    xxhash64(i, shingle). Entirely map-side; the per-perm min is an
    array_min over a transformed array."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s, i=i: F.xxhash64(F.lit(i), s)))
            for i in range(num_perms)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = NUM_PERMS,
    bands: int = BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    signatures (map-side) -> explode to (band, band_hash) keys ->
    self-join on band key (only colliding docs meet) -> distinct
    pairs -> estimated Jaccard = fraction of matching minhashes.
    The band join is the only shuffle and its key space is wide, so
    no hot partitions at scale.
    """
    rows_per_band = num_perms // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(word_shingles(text_col), num_perms).alias("sig"),
    )
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", "sig", F.explode(band_cols).alias("bk")).select(
        "doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("double") / F.lit(float(num_perms))
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "est_jaccard")
    )


def simhash_value(text_col: str = "text", bits: int = SIMHASH_BITS) -> Column:
    """64-bit SimHash over whitespace tokens: per bit, sign of the
    sum of ±1 votes from each token's xxhash64 bit. Expressed as a
    fold (F.aggregate) over the token array — map-side only."""
    toks = words(text_col)
    zero = F.array(*[F.lit(0)] * bits)
    votes = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    # pack sign bits into a bigint: sum of 2^b where vote >= 0
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed + F.when(
            F.element_at(votes, b + 1) >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return packed


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into 8 bytes; by
    pigeonhole, hamming ≤ 3 pairs share ≥ 5 of 8 bytes — so pairs
    sharing ANY byte-band are candidates, verified by exact popcount
    hamming distance."""
    sh = df.select(F.col(id_col).alias("doc_id"), simhash_value(text_col).alias("simhash"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * 8).bitwiseAND(F.lit(255)).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select("doc_id", "simhash", F.explode(band_arr).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    threshold: float = 0.4,
    block_chars: int = 100,
) -> DataFrame:
    """Exact word-set Jaccard over blocked candidate pairs
    (block = same language + same length bucket). Blocking keeps the
    quadratic term bounded per block; the block join is an equi-join
    so it shuffles once on the block key."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.floor(F.col(chars_col) / block_chars).alias("len_bucket"),
        F.array_distinct(words(text_col)).alias("wordset"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.wordset"), F.col("b.wordset")))
    union = F.size(F.array_union(F.col("a.wordset"), F.col("b.wordset")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
