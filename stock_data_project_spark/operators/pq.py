"""Product quantization (PQ) — compressed-vector ANN, the memory-
scale path the IVF family doesn't cover.

At 100 TB the limiting resource for ANN is the bytes a scan must
touch: float32 embeddings at d=64 are 256 B/vector, while PQ codes at
m=8 subspaces × 8 bits are 8 B/vector — a 32× scan-volume reduction
that turns "score the corpus" into a code-table sweep with
per-subspace lookup tables (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the
FAISS ``IndexPQ`` recipe).

Spark mapping (same kernel lifecycle as operators/ivf.py):

- ``pq_fit`` — per-subspace k-means on a BOUNDED deterministic
  sample (256·ksub rows by default; k-means needs ~10²-10³ points
  per centroid, not the corpus). The codebook is metadata-sized
  (m × ksub × d/m doubles) and lives driver-side / in kernel
  closures, exactly like the IVF centroid matrix.
- ``pq_encode`` — map-only (zero shuffle): one GEMM per Arrow batch
  per subspace, argmin → code; all input columns carried through.
- ``pq_topk`` — asymmetric distance (ADC): each task builds the
  (|Q|, m, ksub) query→centroid lookup table ONCE, then every code
  batch is scored by table lookups (no float vectors touched), with
  LOCAL top-k before the ranking shuffle (≤ batches × |Q| × k rows),
  the same shuffle contract as cosine_topk.

Vectors are unit-normalized before quantization, so squared L2 on
codes is monotone with cosine (‖a−b‖² = 2−2·cos for unit vectors);
``approx_sim = 1 − dist/2`` reports the cosine estimate. Approximate
by design → rows-only correctness check; recall vs the exact
baseline is asserted in tests/test_pq.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_data_project_spark.operators.linalg import first_dim, to_matrix, unit_rows

_FIT_ROWS_PER_CENTROID = 256


def pq_fit(
    df: DataFrame,
    m: int = 8,
    nbits: int = 8,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_rows: int | None = None,
) -> DataFrame:
    """Train the per-subspace codebooks; returns the (tiny) codebook
    table ``(_sub, _code, _cv)`` — one row per (subspace, code) with
    the centroid subvector. Fit once, then ``pq_encode`` corpus and
    score queries against the SAME codebook (the train/add/search
    split).

    Fit sample: the ``fit_rows`` vectors with the smallest
    ``xxhash64(id, "pq_fit")`` (default 256·2^nbits — bounded by contract;
    ``orderBy(hash).limit(n)`` is a per-partition partial top-n,
    never a global sort). Cells that lose every member keep their
    previous centroid (codes must stay dense in [0, 2^nbits)).
    """
    ksub = 1 << nbits
    if fit_rows is None:
        fit_rows = _FIT_ROWS_PER_CENTROID * ksub
    spark = df.sparkSession
    sample = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            # purpose-salted (CLAUDE.md invariant): an unsalted
            # xxhash64(id) would share its stream with ivf_fit and any
            # raw-hash keep/split downstream — ivfpq's two fits would
            # draw perfectly correlated samples
            F.xxhash64(F.col(id_col), F.lit("pq_fit")).alias("_h"),
        )
        .orderBy("_h")
        .limit(fit_rows)
        .toPandas()
        .sort_values("_h")
    )
    d = first_dim(sample["_v"])
    if d is None:
        raise ValueError("pq_fit: no non-NULL vectors in the fit sample")
    if d % m != 0:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    dsub = d // m
    x = unit_rows(to_matrix(sample["_v"], d))
    x = x[x.any(axis=1)]  # degenerate vectors carry no geometry
    if not len(x):
        raise ValueError("pq_fit: no usable vectors in the fit sample")

    rng_rows = min(ksub, len(x))
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        # deterministic init: the first ksub sample rows in hash order
        cent = xs[:rng_rows].copy()
        if rng_rows < ksub:  # tiny corpora: pad by repeating rows
            reps = -(-ksub // rng_rows)
            cent = np.tile(cent, (reps, 1))[:ksub]
        for _ in range(iters):
            d2 = (
                (xs * xs).sum(axis=1, keepdims=True)
                - 2.0 * xs @ cent.T
                + (cent * cent).sum(axis=1)
            )
            best = d2.argmin(axis=1)
            sums = np.zeros_like(cent)
            cnts = np.zeros(len(cent))
            np.add.at(sums, best, xs)
            np.add.at(cnts, best, 1)
            live = cnts > 0
            cent[live] = sums[live] / cnts[live, None]  # empty cells persist
        books[s] = cent

    # Python scalars/lists, NOT numpy values: this table must build
    # under the CALLER's session config, Arrow-enabled or not (the r3
    # ann_ivf driver regression class)
    rows = [
        (int(s), int(c), books[s, c].tolist())
        for s in range(m)
        for c in range(ksub)
    ]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("_sub", T.IntegerType()),
                T.StructField("_code", T.IntegerType()),
                T.StructField("_cv", T.ArrayType(T.DoubleType())),
            ]
        ),
    )


def _codebook_np(codebook: DataFrame) -> np.ndarray:
    """Codebook table → (m, ksub, dsub) float64 array. Metadata-sized
    by construction — the one intentional driver-side materialization
    (same contract as the IVF centroid matrix)."""
    pdf = codebook.orderBy("_sub", "_code").toPandas()
    m = int(pdf["_sub"].max()) + 1
    ksub = int(pdf["_code"].max()) + 1
    dsub = len(pdf["_cv"].iloc[0])
    out = np.zeros((m, ksub, dsub))
    for s, c, v in zip(pdf["_sub"], pdf["_code"], pdf["_cv"]):
        out[int(s), int(c)] = np.asarray(v, dtype=np.float64)
    return out


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    drop_vec: bool = False,
) -> DataFrame:
    """Append ``out_col`` = the m-byte PQ code (array<int>, one code
    per subspace). Map-only, zero shuffle: every input column is
    carried through the kernel. Degenerate (NULL/zero/ragged) vectors
    encode to NULL — they have no defined cosine, so downstream
    search must not rank them.

    ``drop_vec=True`` omits the float vector from the OUTPUT (codes
    replace it): the kernel must read the vectors in, but not
    round-tripping the d-float arrays back through Arrow roughly
    halves the encode's serialization cost — the right default for a
    search-only code table (exact_rerank fetches from the original
    vectors table, not the codes)."""
    books = _codebook_np(codebook)
    m, ksub, dsub = books.shape
    d = m * dsub
    flat = books.reshape(m * ksub, dsub)
    cnorm = (flat * flat).sum(axis=1).reshape(m, ksub)

    in_schema = df.schema
    cols = [f.name for f in in_schema.fields if not (drop_vec and f.name == vec_col)]
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name in cols]
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                # ARRAY-typed output: yield NOTHING for empty input —
                # an empty float64 column can't Arrow-convert to list
                continue
            # wrong-dimension vectors fail LOUDLY (unlike the scoring
            # kernels' per-row degrade): an index build that silently
            # encodes a mismatched corpus to all-NULL codes yields an
            # empty search downstream with no error — schema drift
            # must surface here, like pq_topk's query-dim ValueError.
            # NULL and zero vectors still degrade to NULL codes.
            bad_dims = {len(v) for v in pdf[vec_col] if v is not None} - {d}
            if bad_dims:
                raise ValueError(
                    f"pq_encode: vector dims {sorted(bad_dims)} != codebook dim {d}"
                )
            mu = unit_rows(to_matrix(pdf[vec_col], d))
            ok = mu.any(axis=1)
            xs = mu.reshape(len(mu), m, dsub)
            # (rows, m, ksub) distances via one einsum GEMM per batch
            cross = np.einsum("rmd,mkd->rmk", xs, books)
            d2 = -2.0 * cross + cnorm[None, :, :]
            codes = d2.argmin(axis=2)
            out = pdf[cols].copy()
            # numpy int32 rows are fine HERE: mapInPandas output always
            # crosses via Arrow (unlike createDataFrame, whose
            # non-Arrow verifier rejects numpy — the ivf_fit rule);
            # per-element int() conversion measured ~25% of encode
            rows = list(codes.astype(np.int32))
            out[out_col] = [r if k else None for r, k in zip(rows, ok)]
            yield out

    return df.mapInPandas(encode, schema=out_schema)


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    rerank: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k neighbors by asymmetric distance: exact
    query subvectors against quantized corpus codes. The scan reads
    CODES only (m ints/row) — the 100 TB memory story; float vectors
    never stream through search.

    Per task: one (|Q|, m, ksub) lookup table build (GEMM against the
    closure-shipped codebook), then each batch scores via table
    lookups and emits its LOCAL top-k, so the ranking shuffle carries
    ≤ batches × |Q| × k rows. Self-matches excluded; ties break on
    neighbor id. Output: (query_id, neighbor_id, approx_sim, rank).

    ``rerank=R`` (with ``vectors`` = the id→embedding table) is the
    production two-stage shape (FAISS's ADC + refine): ADC shortlists
    R ≥ k candidates per query from codes alone, then ONLY the
    |Q|·R shortlisted vectors are fetched (broadcast semi-join
    against the corpus — no corpus shuffle) and re-ranked by exact
    cosine. Quantization noise then only costs recall when a true
    neighbor falls outside the top-R shortlist, not the top-k — the
    right trade on weakly-clustered corpora, where raw ADC ranking
    is noise-limited. ``approx_sim`` holds the exact cosine of the
    shortlisted candidates in this mode."""
    books = _codebook_np(codebook)
    m, ksub, dsub = books.shape
    d = m * dsub
    # the kernel's LOCAL truncation must match the global shortlist
    # size: truncating batches at k while the global filter keeps
    # shortlist_k would silently collapse the rerank pool to k
    shortlist_k = max(k, rerank) if rerank else k

    q_pdf = (
        queries.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
        .toPandas()
        .drop_duplicates("_qid")
    )
    qdim = first_dim(q_pdf["_qv"])
    if qdim is not None and qdim != d:
        raise ValueError(f"pq_topk: query dim {qdim} != codebook dim {d}")
    qm = unit_rows(to_matrix(q_pdf["_qv"], d))
    q_ok = qm.any(axis=1)
    qm = qm[q_ok]
    qids = q_pdf["_qid"].to_numpy()[q_ok]

    shortlist = adc_shortlist(
        codes, books, qids, qm, shortlist_k, id_col=id_col, code_col=code_col
    )
    if not rerank:
        return shortlist
    if vectors is None:
        raise ValueError("pq_topk: rerank requires the vectors table")
    return exact_rerank(shortlist, queries, vectors, k, id_col, vec_col)


def adc_shortlist(
    codes: DataFrame,
    books: np.ndarray,
    qids: np.ndarray,
    qm: np.ndarray,
    shortlist_k: int,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cell_col: str | None = None,
    allowed: np.ndarray | None = None,
) -> DataFrame:
    """The shared ADC scoring stage of ``pq_topk`` and ``ivfpq_topk``
    — ONE kernel so the rounding (6dp before ranking), tie-break
    (neighbor id), and local/global shortlist truncation can never
    drift between the two (their nprobe=n_cells equivalence is
    tested). ``cell_col``/``allowed`` add IVF's per-query cell gate:
    ``allowed[cell, j]`` says whether query j probes that cell.
    Returns the globally ranked shortlist (query_id, neighbor_id,
    approx_sim, rank ≤ shortlist_k)."""
    if (cell_col is None) != (allowed is None):
        # an unpaired gate would die executor-side as an opaque
        # NoneType/IndexError inside the kernel — fail at call time
        raise ValueError("adc_shortlist: cell_col and allowed must be passed together")
    m, ksub, dsub = books.shape
    id_type = codes.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("approx_sim", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not len(qids):
            return
        # ADC lookup table, ONCE per task: ‖q_s − c‖² summed over
        # subspaces reconstructs ‖q − code‖² exactly up to quantization
        qs = qm.reshape(len(qm), m, dsub)
        lut = ((qs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
        for pdf in batches:
            if pdf.empty:
                continue
            keep = pdf[code_col].notna().to_numpy()
            if not keep.any():
                continue
            nids = pdf[id_col].to_numpy()[keep]
            cm = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf[code_col][keep]]
            )
            # dist[q, r] = Σ_s lut[q, s, cm[r, s]]
            dist = np.zeros((len(qids), len(nids)))
            for s in range(m):
                dist += lut[:, s, cm[:, s]]
            sims = np.round(1.0 - dist / 2.0, 6)
            if cell_col is not None:
                cells = pdf[cell_col].to_numpy()[keep].astype(np.int64)
                in_cell = allowed[cells, :].T  # (|Q|, rows)
            else:
                in_cell = None
            frames = []
            for j, qid in enumerate(qids):
                mask = nids != qid
                if in_cell is not None:
                    mask = in_cell[j] & mask
                cand_ids, cand_s = nids[mask], sims[j, mask]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand_s))[:shortlist_k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[order],
                            "approx_sim": cand_s[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    cols = [id_col, code_col] + ([cell_col] if cell_col else [])
    scored = codes.select(*cols).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist_k)
        .select("query_id", "neighbor_id", "approx_sim", "rank")
    )


def exact_rerank(
    shortlist: DataFrame,
    queries: DataFrame,
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refine an approximate ``(query_id, neighbor_id)`` shortlist by
    exact cosine — shared by PQ and IVF-PQ search. Both sides of the
    candidate join are broadcast-sized (shortlist = |Q|·R rows), so
    the corpus-sized vectors table streams once through a broadcast
    join and nothing shuffles until the k-row-per-query ranking
    window. Output column stays ``approx_sim`` (the SET is
    approximate; the scores are exact cosines of the shortlisted
    candidates).

    The cosine is computed AFTER the candidate join on RAW vectors:
    the dot/norm HOF folds are interpreted per element, so the
    obvious ``select(unit(vec))`` formulation evaluates corpus × d
    interpreted ops before the join drops all but |Q|·R rows —
    measured 8.4s → <1s at 60k vectors for the join-first form."""
    from stock_data_project_spark.operators.similarity import cosine

    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).dropDuplicates(["query_id"])
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    refined = (
        nv.join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("approx_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_sim", "rank")
    )
