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

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stock_data_project_spark.operators.ckpt import loop_checkpoint
from stock_data_project_spark.operators.textops import normalized, words

NUM_PERMS = 32  # minhash permutations
BANDS = 8  # LSH bands (rows per band = NUM_PERMS // BANDS = 4)
SIMHASH_BITS = 64


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by md5 of normalized text: one row per distinct content,
    keeper = min id, n_dups = group size. Single shuffle on a
    64-hex key — uniform, skew-free at any scale.

    NULL text is excluded up front: md5(NULL) is NULL and groupBy
    puts all NULLs in one group, which would silently declare every
    NULL-text document a duplicate of every other — absent content is
    not duplicate content. The oracle filters identically."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.md5(normalized(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text_col: str = "text", k: int = 3) -> Column:
    """k-word shingles of the normalized text, as an array column.

    Built from k-1 whole-array shifts zipped together (zip_with pads
    the shorter side with null; concat propagates the null and
    array_compact drops the ragged tail) — O(k) array passes per doc
    instead of O(n_shingles) per-index slices, which profiling showed
    ~5× cheaper in Spark's interpreted higher-order-function eval."""
    w = words(text_col)
    out = w
    for i in range(1, k):
        shifted = F.slice(w, i + 1, F.greatest(F.size(w) - i, F.lit(1)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(w) >= k, F.array_compact(out)).otherwise(
        F.array(F.concat_ws(" ", w))
    )


def shingle_rows(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) rows — bit-identical to
    ``explode(array_distinct(word_shingles(text, k)))`` (or plain
    ``explode(word_shingles(...))`` with ``distinct=False``) but
    built with CODEGEN window leads instead of interpreted
    ``zip_with``: posexplode the tokens, ``lead(w, i)`` × (k−1) over
    the per-doc window, ``concat_ws`` (which skips the NULL leads
    past the doc end — that is exactly the short-doc whole-text
    fallback).

    Why: Spark evaluates array HOFs interpreted, per element, and the
    k−1 zip_with passes each materialize a full concatenated-string
    array — measured 66.6s vs 5.7s for the 8-gram novelty scan at the
    30× smoke (11.8×, bit-identical output). The per-doc window is
    the UNIFORM-key kind (millions of docs), so the sort stage
    parallelizes; use the array form only where a per-doc ARRAY is
    genuinely needed downstream (e.g. minhash's k=3 signatures, where
    the interpreted cost is 3× smaller and the array feeds codegen
    ``min`` aggregates directly).

    ``distinct=False`` skips the trailing (id, shingle) shuffle —
    right when a downstream broadcast join prunes the rows before any
    dedup matters (ngram_contamination: the join hits are tiny, so
    count_distinct after the join beats a full-corpus distinct
    before it).

    r12 construction upgrade: explode shingle START INDICES and
    slice+array_join the token array — every expression is a codegen
    scalar in ONE map stage, no shuffle and no sort. The previous
    window-lead form (posexplode + lead(w,i)×(k−1) over the per-doc
    window) was itself the 11.8× fix over interpreted zip_with, but
    WindowExec is not whole-stage-codegen'd and its doc-keyed
    shuffle+sort buys nothing: the slice form measured 2.6s → 0.4s
    warm for the sf0.1 10-gram frame (llm_next14 probe). Outputs are
    bit-identical: slice past the array end returns the shorter tail,
    and for n < k the single pos-0 slice IS the whole-text fallback
    (array_join of non-null tokens == the old concat_ws)."""
    base = df.select(F.col(id_col), words(text_col).alias("_ws")).withColumn(
        "_n", F.size("_ws")
    )
    out = base.select(
        F.col(id_col),
        F.explode(
            # greatest guards short docs: sequence(0, negative) would
            # generate a DESCENDING sequence, not an empty one
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.col("_n") - k))
        ).alias("_p"),
        "_ws",
    ).select(
        F.col(id_col),
        F.array_join(F.slice("_ws", F.col("_p") + 1, k), " ").alias("sh"),
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = NUM_PERMS,
) -> DataFrame:
    """(id, sig) with sig = array of num_perms minhashes, via the
    standard two-hash composition (Broder): perm i of shingle s =
    h1(s) + i*h2(s) — each shingle is hashed twice, not num_perms
    times.

    Shingles are exploded and the signature is num_perms codegen'd
    ``min`` aggregates — the wordcount-shaped plan; interpreted
    higher-order-function folds measured ~4× slower. Shingles of one
    doc sit in one input partition, so map-side combine collapses to
    ~1 row per doc before the (narrow) shuffle.

    Hashes are masked to 32 bits so i*h2 can't overflow long under
    ANSI mode."""
    mask = F.lit(0xFFFFFFFF)
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col)).alias("_s"),
    ).select(
        "doc_id",
        F.xxhash64("_s").bitwiseAND(mask).alias("_h1"),
        F.xxhash64(F.lit(1), "_s").bitwiseAND(mask).alias("_h2"),
    )
    mins = [
        F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"_m{i}")
        for i in range(num_perms)
    ]
    agg = exploded.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"_m{i}") for i in range(num_perms)]).alias("sig")
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = NUM_PERMS,
    bands: int = BANDS,
    threshold: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    signatures (map-side) -> explode to (band, band_hash) keys ->
    self-join on band key (only colliding docs meet) -> distinct
    pairs -> estimated Jaccard = fraction of matching minhashes.
    The band join is the only shuffle and its key space is wide, so
    no hot partitions at scale.

    Pipeline-order note: with ``collapse_exact=False`` the OUTPUT is
    inherently quadratic in exact-duplicate multiplicity (k copies of
    one text => k(k-1)/2 true pairs — measured 17× slowdown on a
    30×-replicated corpus, ~50s vs 3.6s at 30× sf0.1). Real web-scale
    corpora ARE duplicate-heavy, so the DEFAULT is the scale path,
    ``collapse_exact=True``: identical normalized content is collapsed
    to its min-id representative first (the ``exact_duplicates``
    output covers those groups losslessly), and near-dup pairs are
    found between distinct contents only. Pass ``False`` only when
    the raw all-pairs output is explicitly wanted.
    """
    if collapse_exact:
        # the representative set IS exact_duplicates' keepers, so the
        # two operators can never diverge on content identity
        reps = exact_duplicates(df, id_col, text_col).select(
            F.col("keeper_id").alias(id_col)
        )
        df = df.join(reps, id_col, "left_semi")
    rows_per_band = num_perms // bands
    # both band-join sides scan the signatures; the tokenize+minhash
    # aggregation is the expensive subtree and the r13 before-plan
    # showed it computed twice (once per join side) — one eager
    # materialization instead (multi-consumer rule, GC-scoped blocks)
    sigs = minhash_signatures(df, id_col, text_col, num_perms).localCheckpoint(
        eager=True
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
    est = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y), lambda eq: eq
        )
    ).cast("double") / F.lit(float(num_perms))
    # est is computed per collision row (cheap scalar) and the pair
    # dedup is a max-agg on scalars — cheaper than dropDuplicates,
    # which would shuffle the 32-long signature arrays with each pair
    scored = left.join(
        right,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.round(est, 6).alias("est_jaccard"),
    )
    return (
        scored.groupBy("doc_id_a", "doc_id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash_values(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over whitespace tokens — per
    bit, sign of the sum of ±1 votes from each token's xxhash64 bit.

    Tokens are exploded and the per-bit popcounts are 64 codegen'd
    ``sum`` aggregates (votes_b >= 0 iff 2*popcount_b >= n_tokens) —
    the wordcount-shaped plan; interpreted higher-order-function
    folds over per-token ±1 arrays measured 10-30× slower."""
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("_t")
    ).select("doc_id", F.xxhash64("_t").alias("_h"))
    sums = [
        F.sum(F.shiftright("_h", b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(bits)
    ]
    agg = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"), *sums)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed + F.when(
            F.col(f"_b{b}") * 2 >= F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", packed.alias("simhash"))


def banded_hamming_pairs(
    hashes: DataFrame,
    hash_col: str = "simhash",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) pairs at hamming ≤ ``max_hamming``
    over any 64-bit-hash column — the hamming-band LSH shared by
    SimHash text dedup and pHash image dedup (operators/phash.py).

    Band the hash into ``bands`` equal chunks; by pigeonhole, a pair
    at hamming ≤ max_hamming has at least one untouched band, so
    same-band collision finds every such pair. Wide (16-bit) bands
    matter on correlated corpora: 8-bit bands measured a 17×
    candidate blowup (6.8M vs 0.4M pairs at sf0.1) because
    common-token-dominated simhashes share low bytes. Candidates are
    verified by exact popcount hamming distance."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole recall needs bands > max_hamming "
            f"(got bands={bands}, max_hamming={max_hamming}): a pair at "
            f"hamming {max_hamming} could flip one bit in every band and "
            f"silently never collide"
        )
    band_bits = bits // bands
    # both self-join sides scan this frame, and the upstream that
    # produces the hashes is the expensive part for every caller
    # (simhash token aggregation, pHash/audio Arrow decode kernels) —
    # eager localCheckpoint materializes it once; the r13 before-plan
    # of dedup_simhash showed the whole subtree duplicated under the
    # join's broadcast side (multi-consumer rule, GC-scoped blocks)
    sh = hashes.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("_h64")
    ).localCheckpoint(eager=True)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("_h64", b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select("doc_id", "_h64", F.explode(band_arr).alias("bk")).select(
        "doc_id", "_h64", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a._h64").bitwiseXOR(F.col("b._h64")))
    # hamming is verified per collision row and the early filter cuts
    # the pair-dedup aggregation down to true near-dups only
    scored = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return scored.groupBy("doc_id_a", "doc_id_b").agg(F.min("hamming").alias("hamming"))


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit SimHash → the shared
    hamming-band LSH (banded_hamming_pairs)."""
    return banded_hamming_pairs(
        simhash_values(df, id_col, text_col),
        hash_col="simhash",
        id_col="doc_id",
        max_hamming=max_hamming,
        bands=bands,
    )


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Within-document repetition signal (the Gopher duplicate-n-gram
    family): fraction of k-word shingles that are repeats of an
    earlier shingle in the SAME document — high values flag boilerplate
    / TV-transcript-style looping text that poisons LM training.

    Plan shape: ZERO shuffles — the signal is row-local (a doc's
    dup_fraction depends only on its own shingle array), so it is
    ``size`` / ``size(array_distinct)`` over the shingles
    (O(k) whole-array zips, see word_shingles) in one scan.
    array_distinct/size are native JVM collection expressions, not
    interpreted HOF lambdas, so this stays off the slow path; the
    explode + (doc, gram) groupBy alternative was measured 27.8s vs
    this shape's 14.5s at the 30× corpus (remaining cost is the
    shared shingle construction itself) — the shuffle moved ~n_grams
    rows for a per-row answer. NULL-text docs are excluded (no gram
    identity), mirroring exact_duplicates."""
    shingles = word_shingles(text_col, k)
    n_grams = F.size(shingles).cast("long")
    n_distinct = F.size(F.array_distinct(shingles)).cast("long")
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        F.round(
            F.lit(1.0) - F.try_divide(n_distinct.cast("double"), n_grams),
            6,
        ).alias("dup_fraction"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 8,
    window: int = 4,
) -> DataFrame:
    """Simplified winnowing (Schleimer et al., MOSS): md5 every
    char-``gram``, take the min hash of each sliding ``window`` of
    consecutive grams, keep the distinct minima as the document's
    fingerprint set; returns per-doc fingerprint stats.

    Implemented as an Arrow-batched ``mapInPandas``: winnowing is
    per-document-independent, so the whole op is map-side with zero
    shuffles, parallel across partitions. The JVM expression path
    (explode + F.md5 + window + distinct) was measured 13× slower
    than DuckDB on the same input because Spark's md5 is a per-row
    MessageDigest call; hashlib + numpy sliding-window minima match
    DuckDB's throughput while producing bit-identical md5 hex, so
    the DuckDB oracle still verifies it exactly."""
    import hashlib
    import re

    import pandas as pd

    def per_batch(batches):
        # must match textops.normalized() EXACTLY: Spark trim() strips
        # spaces only (not \t/\n — Python .strip() would), and Java/RE2
        # \s is ASCII-only (Python \s is unicode-wide without re.ASCII)
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            out = {"doc_id": [], "n_fingerprints": [], "min_fp": [], "max_fp": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    # oracle semantics: NULL text produces no row
                    # (str(None) would fingerprint the literal 'none')
                    continue
                norm = ws.sub(" ", str(text).strip(" ").lower())
                n = max(len(norm) - (gram - 1), 1)
                hs = [
                    hashlib.md5(norm[i : i + gram].encode()).hexdigest() for i in range(n)
                ]
                # sliding min over a `window`-row frame incl. leading
                # partial frames (matches SQL ROWS w-1 PRECEDING)
                fps = {min(hs[max(0, i - (window - 1)) : i + 1]) for i in range(n)}
                out["doc_id"].append(doc_id)
                out["n_fingerprints"].append(len(fps))
                out["min_fp"].append(min(fps))
                out["max_fp"].append(max(fps))
            yield pd.DataFrame(out)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("n_fingerprints", T.LongType()),
            T.StructField("min_fp", T.StringType()),
            T.StructField("max_fp", T.StringType()),
        ]
    )
    # widen only when the input is under-partitioned (a single parquet
    # file lands in one task); never shuffle an already-wide input or
    # cap its parallelism
    projected = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if projected.rdd.getNumPartitions() < target:
        projected = projected.repartition(target)
    return projected.mapInPandas(per_batch, schema=out_schema)


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
    so it shuffles once on the block key.

    Per block, all pairwise intersection counts are ONE boolean
    incidence-matrix matmul (docs × block-vocab) inside
    ``applyInPandas`` — |A∩B| = (M·Mᵀ)[a,b], |A∪B| = |A|+|B|-|A∩B|.
    BLAS does the quadratic part; measured ~10× faster than per-pair
    interpreted array_intersect (which itself was 2× faster than
    string sets). Blocks parallelize across executors; one shuffle
    on the block key."""
    import numpy as np
    import pandas as pd

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL text arrives as a None wordset — such docs pair with
        # nothing (mirrors the SQL oracle, where every jaccard against
        # a NULL list is NULL and fails the threshold)
        pdf = pdf[pdf["wordset"].notna()]
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        vocab: dict[str, int] = {}
        rows, cols = [], []
        for i, ws in enumerate(pdf["wordset"]):
            for w in ws:
                j = vocab.setdefault(w, len(vocab))
                rows.append(i)
                cols.append(j)
        n = len(pdf)
        m = np.zeros((n, len(vocab)), dtype=np.float64)
        m[rows, cols] = 1.0
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        jac = np.round(inter / union, 6)
        iu, ju = np.triu_indices(n, k=1)
        keep = jac[iu, ju] >= threshold
        ids = pdf["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id_a": ids[iu[keep]],
                "doc_id_b": ids[ju[keep]],
                "jaccard": jac[iu, ju][keep].astype(np.float64),
            }
        )

    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc_id_a", id_type),
            T.StructField("doc_id_b", id_type),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.floor(F.col(chars_col) / block_chars).alias("len_bucket"),
        F.array_distinct(words(text_col)).alias("wordset"),
    )
    return docs.groupBy("lang", "len_bucket").applyInPandas(per_block, schema=out_schema)


def blocked_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    threshold: float = 0.5,
    block_chars: int = 100,
) -> DataFrame:
    """Exact word-set CONTAINMENT over the same blocked candidate
    pairs as :func:`blocked_jaccard_pairs` — the asymmetric near-dup
    measure (|A∩B|/|A| vs /|B|) that catches sub-document duplication
    Jaccard dilutes (a doc wholly embedded in a 10× larger one has
    jaccard ~0.1 but containment 1.0). A pair is emitted when EITHER
    direction reaches ``threshold``; both directions are reported.

    Same scale shape as the jaccard variant: one shuffle on the
    (lang, len_bucket) block key, per-block boolean incidence-matrix
    GEMM (containment reuses the SAME M·Mᵀ intersection matrix —
    only the normalizer changes from union to row/col set size)."""
    import numpy as np
    import pandas as pd

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["wordset"].notna()]
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        vocab: dict[str, int] = {}
        rows, cols = [], []
        for i, ws in enumerate(pdf["wordset"]):
            for w in ws:
                j = vocab.setdefault(w, len(vocab))
                rows.append(i)
                cols.append(j)
        n = len(pdf)
        m = np.zeros((n, len(vocab)), dtype=np.float64)
        m[rows, cols] = 1.0
        inter = m @ m.T
        sizes = m.sum(axis=1)
        # empty wordsets (blank text) would divide by zero; such docs
        # intersect nothing, so mask them out like the NULL-text rule
        with np.errstate(divide="ignore", invalid="ignore"):
            cont_a = np.round(inter / sizes[:, None], 6)
            cont_b = np.round(inter / sizes[None, :], 6)
        iu, ju = np.triu_indices(n, k=1)
        ca, cb = cont_a[iu, ju], cont_b[iu, ju]
        keep = np.nan_to_num(np.maximum(ca, cb)) >= threshold
        ids = pdf["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id_a": ids[iu[keep]],
                "doc_id_b": ids[ju[keep]],
                "containment_a": ca[keep].astype(np.float64),
                "containment_b": cb[keep].astype(np.float64),
            }
        )

    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc_id_a", id_type),
            T.StructField("doc_id_b", id_type),
            T.StructField("containment_a", T.DoubleType()),
            T.StructField("containment_b", T.DoubleType()),
        ]
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.floor(F.col(chars_col) / block_chars).alias("len_bucket"),
        F.array_distinct(words(text_col)).alias("wordset"),
    )
    return docs.groupBy("lang", "len_bucket").applyInPandas(per_block, schema=out_schema)


def incremental_dedup(
    new_docs: DataFrame,
    history: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Cross-run exact dedup — the ingest gate of a continuously
    growing corpus: drop every new document whose content fingerprint
    already exists in the historical store, then collapse duplicates
    WITHIN the batch (keeper = min id, same rule as
    ``exact_duplicates``). NULL text is excluded up front for the
    same reason as there: absent content is not duplicate content.

    Returns ``(survivors, new_history)``: survivors carry all input
    columns plus ``content_hash``; new_history is their one-column
    ``content_hash`` projection, to be APPENDED to the store after
    the survivors are durably written. The store stays append-only —
    correctness needs only that it is a superset of every fingerprint
    kept so far, so a crash between the two writes is safe in the
    keep-too-little direction (re-ingest re-drops, never re-admits).

    Scale design: the batch pays exactly one shuffle (content_hash —
    uniform 128-bit key, skew-free) for the anti join and the
    within-batch collapse; the history side at 100 TB is a bucketed
    table on content_hash (``sources.write_bucketed``), so the anti
    join reads it Exchange-free and history is NEVER reshuffled, no
    matter how large it grows relative to the daily batch
    (tests/test_scale_layout.py asserts the history-side plan has no
    Exchange). A broadcast of the batch's hashes would also work when
    the batch is small — Catalyst/AQE picks that automatically below
    the broadcast threshold.
    """
    hashed = new_docs.filter(F.col(text_col).isNotNull()).withColumn(
        "content_hash", F.md5(normalized(text_col))
    )
    if history is not None:
        hashed = hashed.join(
            history.select("content_hash"), "content_hash", "left_anti"
        )
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    survivors = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return survivors, survivors.select("content_hash")


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document that
    shares at least one n-token shingle with a benchmark/eval set —
    the standard leakage gate before training on web-scale text.
    Returns ``(doc_id, n_matched_grams)`` for contaminated docs only
    (n_matched_grams = distinct shared shingles).

    Scale shape: the benchmark is metadata-sized by nature (eval sets
    are KBs-MBs against a TB corpus), so its distinct shingle set
    broadcasts; the corpus side is explode → broadcast semi-ish inner
    join → per-doc count, where everything surviving the join (the
    contaminated gram hits) is tiny — the one real shuffle is the
    per-doc count over those hits. Matching is on the shingle STRING
    (no hash false positives); at a benchmark too large to broadcast
    as strings, switch the join key to a 128-bit hash of the shingle.
    Documents shorter than n tokens contribute their whole normalized
    text as one shingle (``word_shingles`` fallback), so short-answer
    contamination still matches exactly.
    """
    bench_grams = (
        # metadata-sized by design — the interpreted array build is
        # irrelevant here and avoids requiring an id column
        benchmark.select(
            F.explode(word_shingles(bench_text_col, n)).alias("_gram")
        )
        .distinct()
    )
    # corpus side: CODEGEN shingle rows (the interpreted-HOF rule —
    # k−1 zip_with passes measured 42.2→5.75s at the 30× smoke when
    # converted); distinct=False because the broadcast join prunes to
    # the tiny hit set before count_distinct dedups
    doc_grams = shingle_rows(
        docs, k=n, id_col=id_col, text_col=text_col, distinct=False
    ).withColumnRenamed("sh", "_gram")
    return (
        doc_grams.join(F.broadcast(bench_grams), "_gram")
        .groupBy(id_col)
        .agg(F.count_distinct("_gram").alias("n_matched_grams"))
    )


def line_dedup(
    df: DataFrame,
    max_docs_per_line: int = 1,
    min_line_chars: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus repeated-line removal (the CCNet/RefinedWeb
    boilerplate gate): drop every line whose normalized form appears
    in more than ``max_docs_per_line`` DISTINCT documents — headers,
    nav bars, cookie banners repeat across a crawl; prose doesn't.
    Returns the input columns with ``text`` rebuilt from the
    surviving lines (original line text and order preserved,
    single-newline separated) plus ``n_lines_kept`` /
    ``n_lines_dropped``; docs whose lines all drop keep an empty
    text rather than vanishing (downstream quality gates decide).

    Scale shape: explode lines → one groupBy on md5(normalized line)
    counting distinct docs (uniform 128-bit key, skew-free: the
    count is capped reading, not list-building) → broadcast-or-
    shuffle join of the (tiny) banned-line set back → per-doc
    reassembly via sort-free ``array_agg`` over (doc, pos) struct
    sort. Two shuffles total, both on uniform keys; no per-doc
    Python. Documents without newlines are single-line docs — the
    gate then reduces to exact-dup line removal, which is the
    correct degenerate semantics.
    """
    lines = df.select(
        F.col(id_col).alias("_ld_id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "_line"),
    ).withColumn("_lh", F.md5(F.regexp_replace(F.lower(F.trim("_line")), r"\s+", " ")))
    # lines below the length floor (incl. empty) are never "boilerplate"
    sized = lines.withColumn(
        "_tiny", F.length(F.trim("_line")) < min_line_chars
    )
    banned = (
        sized.filter(~F.col("_tiny"))
        .groupBy("_lh")
        .agg(F.count_distinct("_ld_id").alias("_ndocs"))
        .filter(F.col("_ndocs") > max_docs_per_line)
        .select("_lh", F.lit(True).alias("_banned"))
    )
    kept = (
        sized.join(banned, "_lh", "left")
        .withColumn("_drop", F.coalesce("_banned", F.lit(False)) & ~F.col("_tiny"))
    )
    rebuilt = kept.groupBy("_ld_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_drop"), F.struct("_pos", "_line"))
                    )
                ),
                lambda s: s["_line"],
            ),
        ).alias("_new_text"),
        F.sum(F.when(~F.col("_drop"), 1).otherwise(0)).alias("n_lines_kept"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0)).alias("n_lines_dropped"),
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_ld_id"], "left")
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce("_new_text", F.lit("")).alias(text_col),
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        F.coalesce("n_lines_dropped", F.lit(0)).cast("long").alias("n_lines_dropped"),
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: the
    step production dedup needs AFTER minhash/simhash/embedding
    candidates — transitive closure groups A~B, B~C into one cluster
    so exactly one representative survives (pairwise keeps would
    keep both A and C). Returns ``(member_id, cluster_id)`` for
    every node in ``pairs``, cluster_id = min member id.

    Algorithm: alternating large-star / small-star label propagation
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    expressed as DataFrame ops — each round is one groupBy per star
    step on the edge list, converging in O(log n) rounds on real
    graphs (duplicate clusters are overwhelmingly tiny: diameter 1-2,
    so 2-3 rounds in practice). No driver-side graph, no
    collect: the edge list IS the state, checked for fixpoint by an
    edge-count aggregate per round. ``max_iters`` bounds adversarial
    path graphs; convergence raises if exceeded (never silently
    wrong). Tested against a Python union-find oracle
    (tests/test_dedup_clusters.py); the driver-gate oracle is a
    WITH RECURSIVE label-propagation CTE (plans/llm_next.py) — the
    SQL recursion DuckDB can run that Spark deliberately replaces
    with the O(log n)-round star algorithm (per-round shuffles over
    the shrinking edge list instead of a frontier recursion).
    """
    # undirected edge list, self-loops dropped, canonical direction
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    def _canon(edges: DataFrame) -> DataFrame:
        return (
            edges.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    sig_prev: tuple[int, int] | None = None
    for _ in range(max_iters):
        # large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v > u
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star(u): m = min of the smaller neighborhood; emit
        # (v, m) for every v < u AND (u, m) — u itself must re-link
        # to the min or chains disconnect
        small_nbrs = nbrs.filter(F.col("v") < F.col("u"))
        smins = small_nbrs.groupBy("u").agg(F.min("v").alias("m"))
        small = small_nbrs.join(smins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).union(smins.select("u", F.col("m").alias("v")))
        # TRUNCATE LINEAGE each round: each step references e four
        # times, so the logical plan grows ~4^round — Catalyst
        # re-analysis, not execution, becomes the cost (persist cuts
        # recompute but not plan size; measured minutes by round ~6).
        # loop_checkpoint materializes the round and replaces the
        # plan with the stored blocks — the GraphFrames iteration
        # idiom (reliable checkpoint() behind the
        # SPARK_GRAFT_RELIABLE_CHECKPOINT policy knob if executor
        # loss during the loop must be survivable — operators/ckpt).
        # lazy: the fixpoint-signature agg right below is the round's
        # one action and materializes the blocks — an eager checkpoint
        # would add a second full job per round for the same blocks
        new_e = loop_checkpoint(_canon(large.union(small)), eager=False)
        # fixpoint when the canonical edge SET is unchanged: one
        # aggregate job per round — (count, order-independent hash
        # sum); both steps are deterministic so equal signatures on
        # consecutive DISTINCT canonical edge lists mean equal sets
        # (hash-sum collision odds ~2^-32; exact set compare costs 2
        # more jobs per round)
        row = new_e.agg(
            F.count(F.lit(1)).alias("n"),
            # 32-bit mask before summing: ANSI mode overflows on a
            # sum of raw 64-bit hashes (repo-wide hash-arithmetic rule)
            F.sum(
                F.xxhash64("u", "v").bitwiseAND(F.lit(0xFFFFFFFF))
            ).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        e = new_e
        if sig == sig_prev:
            break
        sig_prev = sig
    else:
        raise RuntimeError(
            f"dedup_clusters: no fixpoint in {max_iters} rounds "
            "(adversarial chain graph? raise max_iters)"
        )
    members = e.select(F.col("v").alias("member_id"), F.col("u").alias("cluster_id"))
    roots = e.select(F.col("u").alias("member_id")).distinct().withColumn(
        "cluster_id", F.col("member_id")
    )
    return members.union(roots)


def collapse_exact_families(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact-duplicate family collapse for ER candidate generation:
    one row per distinct (``block_cols``, ``str_col``) with
    ``rep_id`` = min(``id_col``) and ``_m`` = member count.

    This is the minhash collapse-exact-first default transposed to
    edit-distance ER (see the SCALE CHARACTERISTICS note below):
    near-duplicate FAMILIES are quadratic for ANY lossless edit
    filter, and the dominant production family class is exact
    replicas — collapsing them first makes the prefix filter see one
    representative per family while the caller expands match counts
    algebraically (an exact-family pair is lev 0; a verified rep
    pair (a, b) stands for m_a·m_b member pairs at the same lev), so
    the result stays EXACTLY equal to the full enumeration."""
    return df.groupBy(*block_cols, str_col).agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("_m")
    )


def er_candidates(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: tuple[str, ...] = (),
    k: int = 2,
    q: int = 4,
    naive_block_max: int = 4096,
    guard_ratio: float | None = None,
) -> DataFrame:
    """Adaptive ER candidate generation: per-BLOCK strategy choice
    between full within-block pair enumeration and Ed-Join q-gram
    prefix filtering (``edit_prefix_candidates``). Both are lossless
    (every within-block pair at edit distance <= k is emitted), so
    the choice is pure cost:

    - Blocks of <= ``naive_block_max`` rows enumerate directly —
      bounded C(n_b, 2) work per block, one hash-shuffle self-join,
      no gram explode/windows/persists. On low-entropy keys the
      prefix filter can cost MORE than enumeration (measured on
      sf0.1 TPC-H names: 6.0M raw prefix-join rows vs 0.89M naive
      pairs, 6.7× — zero-padded digit names put ~6 corpus-frequent
      structural grams into every 11-gram rarest-first prefix), so
      small blocks should never pay it.
    - Larger blocks route to the prefix filter, whose rare-gram
      buckets stay bounded when the discriminative gram space dwarfs
      the per-block corpus — the shape that survives 100 TB, where a
      fixed block domain (nation × segment = 125) makes per-block
      rows grow linearly with the data. ``guard_ratio`` (forwarded)
      fails loud past the documented quadratic knee.

    The block-size probe is one bounded aggregate (block-key domain
    sized, collect-free: a limit(1) existence check routes the plan).
    Precondition: ``id_col`` unique per block (same as
    ``edit_prefix_candidates``)."""
    if not block_cols:
        # no blocking — strategy is global; treat the corpus as one
        # block and size it with a cheap count
        n = df.count()
        if n <= naive_block_max:
            a, b = df.alias("a"), df.alias("b")
            return a.join(
                b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
            ).select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
        return edit_prefix_candidates(
            df, id_col, str_col, block_cols, k=k, q=q, guard_ratio=guard_ratio
        )
    sizes = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bn"))
    big_blocks = sizes.filter(F.col("_bn") > naive_block_max).drop("_bn")
    has_big = big_blocks.limit(1).count() > 0
    bkeys = list(block_cols)
    if has_big:
        bb = F.broadcast(big_blocks)
        big = df.join(bb, bkeys, "left_semi")
        small = df.join(bb, bkeys, "left_anti")
    else:
        big, small = None, df
    a, b = small.alias("a"), small.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    naive = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in block_cols],
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    if big is None:
        return naive
    filtered = edit_prefix_candidates(
        big, id_col, str_col, block_cols, k=k, q=q, guard_ratio=guard_ratio
    )
    # edit_prefix_candidates aliases ids to id_a/id_b already; blocks
    # are disjoint between the two paths so a plain union is exact
    return naive.unionByName(filtered)


def edit_prefix_candidates(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: tuple[str, ...] = (),
    k: int = 2,
    q: int = 4,
    guard_ratio: float | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs guaranteed to contain EVERY pair
    within edit distance <= k (that also agrees on ``block_cols``) —
    Ed-Join-style q-gram prefix filtering (Xiao/Wang/Lin "Ed-Join",
    VLDB'08; count bound per Gravano et al. VLDB'01), so the caller's
    levenshtein verify stage produces EXACTLY the same matched set as
    a full within-block enumeration, at near-linear candidate volume.

    Why it is lossless: an edit destroys at most q of a string's
    occurrence-indexed q-grams, so two strings within distance k share
    >= G_max - k*q of them (G = L - q + 1 grams, multiset semantics
    via the occurrence index). Under ANY global total order on grams,
    if two sets share >= T elements, their first (|set| - T + 1)
    elements intersect — with T' = G_i - k*q that prefix has constant
    size k*q + 1. We order by ascending corpus frequency (rarest
    first), which is what makes the candidate buckets data-adaptive:
    the join key cardinality GROWS with the data instead of being a
    fixed attribute domain, so bucket sizes stay bounded at 100 TB.
    Strings too short for the count bound to bite (L < q + k*q, where
    a k-edit pair can share zero q-grams) fall back to one shared
    SHORT block key; any qualifying pair with min length < q + k*q
    has max length < q + k*q + k, so the fallback threshold
    q + k*q + k keeps completeness (on TPC-H-style fixed-length names
    the SHORT block is empty).

    Returns distinct (``block_cols``..., id_a, id_b) with
    id_a < id_b. Plan shape: explode to grams (codegen substring —
    no interpreted HOFs per the repo rule), two uniform-key windows
    (per-(id,gram) occurrence index, per-id prefix rank), one
    frequency groupBy, one self-join on (block, gram) whose buckets
    are rare-gram-sized, then a pair distinct.

    BRANCH REUSE: ``grams`` feeds both the frequency groupBy and the
    prefix join, and the keyed prefix feeds BOTH sides of the
    self-join — without a persist each branch recomputes the whole
    explode+window subtree (measured ~2× wall at the 240× smoke:
    224s → the persisted shape). These are HASH exchanges (value-
    deterministic, so correctness never depends on the persist — the
    rank.py range-exchange rule does not apply); the persist is pure
    compute reuse. MEMORY_AND_DISK: the gram frame is ~n·(L−q+1)
    narrow rows and may exceed executor memory at smoke scales.
    ``materialize=True`` localCheckpoints the candidate set so both
    persisted intermediates can be UNPERSISTED before returning (a
    long-lived session otherwise retains their storage blocks per
    call until the frames are GC'd). It is OFF by default: the eager
    checkpoint measured 4.6× the lazy pipeline at the 120× smoke
    (63.8s vs 13.9s — storing millions of candidate rows and cutting
    the pipelined exchange costs far more than the bounded block
    retention it frees). Turn it on only for long-lived sessions
    that invoke the operator repeatedly at small scale; on a cluster
    where executor loss must be survivable, swap for a reliable
    checkpoint() like the dedup_clusters note says.

    ``guard_ratio``: if set, the expected self-join candidate volume
    Σ_buckets C(c, 2) is measured from the persisted key frame
    BEFORE the self-join runs, and the call fails LOUD (RuntimeError)
    when it exceeds ``guard_ratio × rows`` — the documented
    near-duplicate-family / gram-space-saturation knee where every
    lossless edit filter goes quadratic. The fix at that point is
    data prep, not parameters: collapse exact/near families first
    (``collapse_exact_families`` / minhash) and run ER on
    representatives.

    Precondition: ``id_col`` must be unique within each block — the
    occurrence-index and prefix-rank windows key on (block, id), so a
    cross-block id reuse is fine, but a duplicate id INSIDE a block
    would interleave two strings' grams and break losslessness."""
    short_len = q + k * q + k
    prefix_sz = k * q + 1
    bcols = [F.col(c) for c in block_cols]
    base = df.select(
        *bcols, F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
    ).withColumn("_len", F.length("_s"))
    grams = (
        base.filter(F.col("_len") >= q)
        .select(
            *block_cols,
            "_id",
            F.posexplode(F.sequence(F.lit(0), F.col("_len") - q)).alias("_i", "_p"),
            F.col("_s").substr(F.col("_p") + 1, F.lit(q)).alias("_g"),
        )
        .withColumn(
            "_occ",
            F.row_number().over(
                Window.partitionBy(*block_cols, "_id", "_g").orderBy("_p")
            ),
        )
        .select(
            *block_cols, "_id", F.concat_ws("#", "_g", F.col("_occ").cast("string")).alias("_go")
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    freq = grams.groupBy("_go").agg(F.count(F.lit(1)).alias("_f"))
    prefix = (
        grams.join(freq, "_go")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy(*block_cols, "_id").orderBy("_f", "_go")
            ),
        )
        .filter(F.col("_r") <= prefix_sz)
        .select(*block_cols, "_id", F.col("_go").alias("_key"))
    )
    short = base.filter(F.col("_len") <= short_len).select(
        *block_cols, "_id", F.lit("#SHORT#").alias("_key")
    )
    keyed = prefix.unionByName(short).persist(StorageLevel.MEMORY_AND_DISK)
    if guard_ratio is not None:
        # one cheap agg over the (already needed) persisted key frame:
        # Σ C(bucket, 2) IS the self-join's output volume, so the
        # quadratic knee is detected before any quadratic work runs
        n_rows = base.count()
        (exp_pairs,) = (
            keyed.groupBy(*block_cols, "_key")
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.sum(F.expr("_c * (_c - 1) div 2")).alias("p"))
            .collect()[0]
        )
        if exp_pairs is not None and exp_pairs > guard_ratio * max(n_rows, 1):
            grams.unpersist()
            keyed.unpersist()
            raise RuntimeError(
                f"edit_prefix_candidates: expected candidate volume "
                f"{exp_pairs} exceeds guard_ratio={guard_ratio} × "
                f"{n_rows} rows — the corpus is past the documented "
                f"near-duplicate-family / gram-space-saturation knee "
                f"where every lossless edit filter is quadratic. "
                f"Collapse exact/near families first "
                f"(collapse_exact_families / minhash) and run ER on "
                f"representatives."
            )
    a = keyed.alias("a")
    b = keyed.alias("b")
    join_cond = F.col("a._key") == F.col("b._key")
    for c in block_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    out = (
        a.join(b, join_cond & (F.col("a._id") < F.col("b._id")))
        .select(
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .distinct()
    )
    if materialize:
        # materialize so the intermediates can be released NOW (the
        # advice-flagged per-call storage leak); candidates are the
        # small end of the funnel so the stored blocks are bounded
        out = out.localCheckpoint(eager=True)
        grams.unpersist()
        keyed.unpersist()
    return out


# SCALE CHARACTERISTICS of the prefix filter (measured, scale_smoke
# r11):
# 1. q SIZING — candidate volume is Σ_buckets C(c,2) with c = names
#    sharing a rare gram (× block). Buckets stay O(1) only while the
#    DISCRIMINATIVE-character gram space |alphabet|^q dwarfs the
#    per-block corpus; q=5 gives hex-alphabet names 16× the space of
#    q=4. Losslessness then requires strings of length ≥ q + k·q
#    (shorter ones take the SHORT fallback).
# 2. NEAR-DUPLICATE FAMILIES — a corpus where names come in large
#    mid-similarity families (N siblings sharing most characters AND
#    the block) has candidate volume quadratic in the family size for
#    ANY lossless edit filter: family members genuinely share their
#    rare grams (count filtering doesn't help — siblings sharing 14
#    of 21 grams pass the ≥ G−k·q bound), and only the verify stage
#    can tell lev 6 from lev 2. Measured: a hash-suffix replica
#    corpus (18 of 25 chars shared) hit 15k·C(240,2) candidates
#    (565s); rebuilding replicas as distinct entities restored the
#    linear band. Production answer, same as minhash: COLLAPSE
#    exact/near families first (exact_duplicates / minhash), run ER
#    on representatives.


# ---------------------------------------------------------------------------
# Engine-neutral MinHash bands (the streaming LSH ingest gate's
# signature — r13). dedup_minhash stays on xxhash64 (faster, but
# rows-only: no DuckDB twin); this variant derives every hash from
# md5, which BOTH engines evaluate bit-identically, so a gate built
# on it is FULLY oracle-able:
#   base  h0(s) = first 15 hex chars of md5(s) parsed as BIGINT
#            Spark: conv(substr(md5(s),1,15),16,10)  (60-bit, >= 0)
#           DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT
#   perm  h_i(s) = (a_i * (h0 % 2^31) + b_i) % 2^32   (plain BIGINT
#           arithmetic; a_i < 2^31 keeps the product < 2^62 under
#           ANSI, all operands non-negative so DuckDB's % == pmod)
#   band  sig_b = md5(m_{rb} || '-' || ... || m_{rb+r-1})
# Public constants: Murmur/FNV/xxhash primes (a_i) and Knuth/xxhash
# mixers (b_i).

_NEUTRAL_PERM_SALTS: tuple[tuple[int, int], ...] = (
    (1540483477, 2654435761),
    (16777619, 2246822519),
    (1000000007, 3266489917),
    (998244353, 2166136261),
    (1073741827, 4101842887),
    (19349663, 2870177450),
    (83492791, 3141592653),
    (1299709, 2718281829),
)
NEUTRAL_BANDS = 4
NEUTRAL_ROWS_PER_BAND = 2


def neutral_minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bands: int = NEUTRAL_BANDS,
    rows_per_band: int = NEUTRAL_ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_idx, band_sig) — ``bands`` LSH band signatures per
    non-NULL-text document from an md5-derived (engine-neutral)
    MinHash over distinct k-word shingles. One shingle scan, one
    partial-aggregatable per-doc min-aggregation, one map-side band
    projection — the linear LSH cost shape at any corpus size.
    NULL-text docs are excluded (absent content is not duplicate
    content — the exact-dedup rule)."""
    n_perms = bands * rows_per_band
    if n_perms > len(_NEUTRAL_PERM_SALTS):
        raise ValueError("not enough fixed salts for the requested bands")
    sh = shingle_rows(
        df.filter(F.col(text_col).isNotNull()), k=k, id_col=id_col,
        text_col=text_col,
    )
    h0 = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    mins = (
        sh.select(F.col(id_col), h0.alias("_h0"))
        .groupBy(id_col)
        .agg(
            *[
                F.min(
                    F.expr(
                        f"pmod({a} * pmod(_h0, 2147483648) + {b}, 4294967296)"
                    )
                ).alias(f"_m{i}")
                for i, (a, b) in enumerate(_NEUTRAL_PERM_SALTS[:n_perms])
            ]
        )
    )
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "-",
                    *[
                        F.col(f"_m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    return mins.select(
        F.col(id_col),
        F.explode(F.array(*band_structs)).alias("_b"),
    ).select(id_col, F.col("_b.band_idx"), F.col("_b.band_sig"))


def lsh_gate(
    batch: DataFrame,
    history_bands: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """One micro-batch of the streaming NEAR-dup ingest gate:

    (a) a doc is rejected if ANY of its band signatures collides with
        the committed ``history_bands`` store (a banded-LSH candidate
        against already-admitted content);
    (b) among (a)-passers, each (band_idx, band_sig) bucket elects
        min(id) and a doc is rejected if any of its bands is claimed
        by a SMALLER (a)-passing doc. The comparison set is the FIXED
        (a)-passing set — not the admitted set — so admission is one
        groupBy + join with NO sequential cascade: the distributed
        batch semantics (documented; a sequential scan would differ
        on chains A<B<C where B collides with A and C only with B).

    Returns (admitted ids, admitted band rows, (a)-rejected ids,
    (b)-rejected ids). Deterministic and engine-replayable; the
    caller owns materialization and the epoch commit."""
    bands_df = neutral_minhash_bands(batch, id_col=id_col, text_col=text_col)
    if history_bands is not None:
        rej_hist = (
            bands_df.join(
                history_bands, ["band_idx", "band_sig"], "left_semi"
            )
            .select(id_col)
            .distinct()
        )
        passers = bands_df.join(rej_hist, id_col, "left_anti")
    else:
        rej_hist = bands_df.select(id_col).limit(0)
        passers = bands_df
    winners = passers.groupBy("band_idx", "band_sig").agg(
        F.min(id_col).alias("_w")
    )
    ok = (
        passers.join(winners, ["band_idx", "band_sig"])
        .groupBy(id_col)
        .agg(
            F.min((F.col(id_col) == F.col("_w")).cast("int")).alias("_ok")
        )
    )
    admitted = ok.filter(F.col("_ok") == 1).select(id_col)
    rej_batch = ok.filter(F.col("_ok") == 0).select(id_col)
    admitted_bands = bands_df.join(admitted, id_col, "left_semi")
    return admitted, admitted_bands, rej_hist, rej_batch
