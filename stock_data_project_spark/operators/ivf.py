"""IVF coarse quantizer: spherical k-means over the embedding
column — the block-key provider for near-duplicate detection and ANN
partitioning at scale.

Scale shape (the FAISS IVF recipe on Spark, the MLlib KMeans
lifecycle):

- init: the ``n_centroids`` vectors with the smallest
  ``xxhash64(id, "ivf_fit")`` — a deterministic pseudo-random sample picked via
  ``orderBy(hash).limit(n)`` (TakeOrderedAndProject: per-partition
  partial top-n, never a global sort).
- assign: one BLAS GEMM per Arrow batch inside ``mapInPandas``, with
  the centroid matrix shipped in the kernel closure. The centroid
  table is metadata-sized (k ≈ √n rows), so holding it driver-side
  and broadcasting it with the task closure is the same lifecycle as
  MLlib's ``KMeansModel.clusterCenters`` — the CORPUS never reaches
  the driver. (The r1-r3a relational formulation — crossJoin +
  interpreted ``aggregate``/``zip_with`` dot folds — was measured
  ~4× slower at sf0.1: Spark HOF lambdas are interpreted per
  element, exactly the hazard the repo's dedup operators already
  avoid.)
- update: the same kernel accumulates per-partition per-cell vector
  sums, so the per-iteration shuffle carries ≤ partitions × k rows
  (map-side combined to k × dim cells) — MLlib KMeans's
  aggregate-by-key shape.
- transform: map-only (zero shuffle) — every input column is carried
  through the kernel and ``centroid_id`` appended, so blocking a
  100 TB corpus costs one scan and no join.

The quantizer's output (``centroid_id``) is the block key for
``blocked_cosine_pairs`` — per-block all-pairs GEMM, quadratic only
within a block, blocks parallel across executors.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_data_project_spark.operators.linalg import first_dim, to_matrix, unit_rows


# Auto cell count: k ≈ √n, clamped. √n balances the two corpus-sized
# costs — assign is O(n·k·d) and per-cell all-pairs is O(n·(n/k)·d)
# on a balanced partition — at O(n^1.5·d) each (the FAISS IVF-Flat
# sizing guidance). A CONSTANT k (the r2 default of 8) makes the
# per-cell term O(n²/k) — quadratic at scale, the r2 verdict finding.
_MIN_CENTROIDS = 8
_MAX_CENTROIDS = 1 << 16

# Auto fit sample: k-means needs ~10²-10³ points per centroid to
# place centroids, not the whole corpus (the FAISS train-on-sample
# guidance). With target_fit_rows = 256·k and k ≈ √n the auto
# fraction is min(1, 256/√n) — 1.0 below ~65k vectors (small corpora
# fit exactly, so sf0.01/sf0.1 results are unchanged), shrinking as
# the corpus grows so the iters×scan fit cost stays ~256·k rows
# instead of iters×n (at n=10⁹: fit scans ~0.8% of the corpus).
_FIT_ROWS_PER_CENTROID = 256


def _auto_centroids(n: int) -> int:
    return max(_MIN_CENTROIDS, min(_MAX_CENTROIDS, round(math.sqrt(max(n, 1)))))


def ivf_assign(
    df: DataFrame,
    n_centroids: int | None = None,
    iters: int = 3,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Append ``centroid_id`` (0..n_centroids-1) = nearest spherical
    k-means centroid by cosine. Deterministic: hash-picked init, fixed
    iteration count, id-tie-broken argmax.

    ``probes > 1`` is IVF multi-probe: each vector is emitted once per
    each of its ``probes`` nearest centroids (output has that many rows
    per input row). For near-dup blocking this recovers pairs that sit
    astride a Voronoi boundary — the standard recall lever when the
    corpus has weak cluster structure; consumers must dedupe pairs
    found in more than one block (``blocked_cosine_pairs`` does).

    ``centroids``: a PREFIT centroid table (ivf_fit output) — skips
    the fit jobs entirely; the steady-state amortization path
    (operators/memo.session_memo), same contract as bloom's bitmap
    cache: the caller owns key freshness."""
    if centroids is None:
        centroids = ivf_fit(df, n_centroids, iters, id_col, vec_col, fit_fraction)
    return ivf_transform(df, centroids, probes, id_col, vec_col)


def _centroids_np(centroids: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Centroid table → (cid vector, (k, d) float64 matrix), rows in
    ascending ``_cid`` order. k ≈ √n rows — metadata-sized; this is
    the one intentional driver-side materialization (see module
    docstring)."""
    pdf = centroids.orderBy("_cid").toPandas()
    cids = pdf["_cid"].to_numpy(dtype=np.int32)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_cv"]])
    return cids, mat


def _unit_batch(batch: pd.Series, d: int) -> tuple[np.ndarray, np.ndarray]:
    """(normalized (rows, d) matrix, degenerate-row mask) for one
    Arrow batch. NULL / wrong-length / zero / non-finite vectors
    normalize to zero rows and are flagged degenerate — the kernel
    analog of the relational NULL cosine."""
    mu = unit_rows(to_matrix(batch, d))
    return mu, ~mu.any(axis=1)


def _sims(batch: pd.Series, cent_t: np.ndarray) -> np.ndarray:
    """(rows, k) cosine matrix for one Arrow batch: normalize + GEMM.
    Degenerate vectors score -2 everywhere, so argmax
    deterministically lands them in the lowest cell — identical to
    the relational formulation's NULL→coalesce(-2)."""
    mu, bad = _unit_batch(batch, cent_t.shape[0])
    sims = mu @ cent_t
    sims[bad] = -2.0
    return sims


def ivf_fit(
    df: DataFrame,
    n_centroids: int | None = None,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> DataFrame:
    """Train the quantizer: returns the (tiny) centroid table
    ``(_cid, _cv)`` with unit-norm centroid vectors. Fit once on the
    corpus, then ``ivf_transform`` corpus and queries against the
    SAME centroids (the FAISS train/add/search split).

    ``n_centroids=None`` derives k ≈ √n from the fit-corpus count
    (see ``_auto_centroids``) so cell sizes track the corpus instead
    of a constant — the r2 scale finding.

    ``fit_fraction`` runs the k-means ITERATIONS on a deterministic
    sample while transform still covers the full corpus — the
    standard FAISS train-on-sample trick (k-means needs ~10²-10³
    points per centroid, not the whole corpus; removes the
    iters×full-scan fit cost). ``None`` (the r4 default) sizes the
    sample automatically at 256·k rows — 1.0 below ~65k vectors, so
    small-corpus results are unchanged while a 10⁹-row fit scans
    ~0.8% per iteration. An explicit fraction keeps the r3 behavior:
    the auto-k count is taken on the sample and scaled back up by
    1/fraction so k still tracks n.

    Per iteration: one map job over the (cached) fit vectors — GEMM
    assign + per-partition per-cell sum accumulation in a single
    kernel — then a ≤ partitions×k-row reduction whose k×d result
    comes back to the driver to become the next closure matrix. The
    corpus cache is dropped in ``finally``; the returned centroid
    table is literal data (no lineage), so nothing stays cached."""
    spark = df.sparkSession
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        # purpose-salted (CLAUDE.md invariant): keeps the fit-sample /
        # init stream independent of pq_fit's and of any raw-hash
        # keep/split decision made on the same ids
        F.xxhash64(F.col(id_col), F.lit("ivf_fit")).alias("_h"),
    )
    if fit_fraction is None:
        # auto: one full map-only count sizes k AND the fit sample,
        # replacing iters× full-corpus scans with iters× sample scans
        # once n exceeds 256·k (~65k rows at auto-k); below that the
        # fraction is 1.0 and behavior is bit-identical to before
        n_full = vecs.count()
        if n_centroids is None:
            n_centroids = _auto_centroids(n_full)
        fit_fraction = min(
            1.0, _FIT_ROWS_PER_CENTROID * n_centroids / max(n_full, 1)
        )
    if fit_fraction < 1.0:
        vecs = vecs.sample(fraction=fit_fraction, seed=7)
    vecs = vecs.cache()
    try:
        if n_centroids is None:
            n_fit = vecs.count()
            scale = 1.0 / fit_fraction if fit_fraction else 1.0
            n_centroids = _auto_centroids(int(n_fit * scale))

        # deterministic pseudo-random init: the n_centroids vectors
        # with the smallest xxhash64(id) (per-partition partial top-n,
        # never a global sort), cids assigned in hash order
        init = vecs.orderBy("_h").limit(n_centroids).toPandas().sort_values("_h")
        dim = first_dim(init["_v"])
        if dim is None:
            raise ValueError("ivf_fit: no non-NULL vectors in the fit sample")
        cent = unit_rows(to_matrix(init["_v"], dim))
        # degenerate init picks (NULL / zero / ragged vectors) would
        # become zero centroids that win every negative-sim vector;
        # the relational NULL-centroid never won — drop them instead
        live = cent.any(axis=1)
        if not live.any():
            # all-degenerate corpus (zero/ragged but non-NULL vectors)
            # would otherwise surface as an opaque numpy shape error
            # deep in an executor; mirror the `dim is None` diagnostic
            raise ValueError("ivf_fit: no usable vectors to seed centroids")
        cids = np.arange(len(init), dtype=np.int32)[live]
        cent = cent[live]

        for _ in range(iters):
            cent_t = cent.T
            k, d = cent.shape

            def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                sums = np.zeros((k, d))
                cnts = np.zeros(k, dtype=np.int64)
                for pdf in batches:
                    if pdf.empty:
                        continue
                    mu, bad = _unit_batch(pdf["_v"], d)
                    sims = mu @ cent_t
                    sims[bad] = -2.0
                    best = sims.argmax(axis=1)  # ties → lowest cell, like max(sim,-cid)
                    np.add.at(sums, best, mu)  # degenerate rows add zero
                    np.add.at(cnts, best, 1)
                nz = np.flatnonzero(cnts)
                if len(nz):  # an empty partition yields nothing — an
                    # empty float64 "_sum" column can't Arrow-convert
                    # to list<double>
                    yield pd.DataFrame(
                        {"_c": nz.astype(np.int32), "_sum": list(sums[nz])}
                    )

            # reduce the per-partition partials relationally (map-side
            # combine → k×d cells), then pull the k×d result back
            red = (
                vecs.mapInPandas(partials, schema="_c int, _sum array<double>")
                .select("_c", F.posexplode("_sum").alias("_j", "_x"))
                .groupBy("_c", "_j")
                .agg(F.sum("_x").alias("_s"))
                .toPandas()
            )
            new = np.zeros((k, d))
            new[red["_c"].to_numpy(), red["_j"].to_numpy()] = red["_s"].to_numpy()
            norms = np.linalg.norm(new, axis=1)
            keep = norms > 0  # cells that lost every member vanish
            cids, cent = cids[keep], unit_rows(new[keep])

        # Python scalars/lists, NOT numpy values: createDataFrame's
        # non-Arrow verifier rejects numpy.int32/float64, and the
        # session config (arrow.pyspark.enabled) is the CALLER's, not
        # ours — this table must build under either setting (r3
        # driver regression: ann_ivf/embedding_dedup_ivf ERR'd in an
        # Arrow-disabled session).
        out = pd.DataFrame(
            {"_cid": [int(c) for c in cids], "_cv": cent.tolist()}
        )
        return spark.createDataFrame(
            out,
            T.StructType(
                [
                    T.StructField("_cid", T.IntegerType()),
                    T.StructField("_cv", T.ArrayType(T.DoubleType())),
                ]
            ),
        )
    finally:
        vecs.unpersist()


def ivf_transform(
    df: DataFrame,
    centroids: DataFrame,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``centroid_id`` = each vector's ``probes`` nearest
    centroids from a fitted centroid table (one output row per
    probe). Map-only: every input column is carried through the GEMM
    kernel, so blocking costs one scan and zero shuffles — the r3a
    relational formulation paid a corpus-sized join here."""
    cids, cent = _centroids_np(centroids)
    cent_t = cent.T
    n_probe = min(probes, len(cids)) if probes > 1 else 1
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("centroid_id", T.IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sims = _sims(pdf[vec_col], cent_t)
            if n_probe == 1:
                picks = sims.argmax(axis=1).reshape(-1, 1)
            else:
                # stable sort: equal sims keep ascending cell order —
                # same tie-break as desc-sort on struct(sim, -cid)
                picks = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            out = pdf.loc[pdf.index.repeat(n_probe)].reset_index(drop=True)
            out["centroid_id"] = cids[picks.ravel()]
            yield out

    return df.mapInPandas(assign, schema=out_schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    iters: int = 3,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors: fit the quantizer on the
    corpus, route each query to its ``nprobe`` nearest cells, and
    exact-rank only the corpus vectors in those cells — the FAISS
    IVF-Flat recipe as a cell equi-join.

    vs ``lsh_topk``: IVF adapts its partitions to the data (k-means
    cells) where hyperplane LSH is data-oblivious; on clustered
    corpora IVF probes a small fraction of cells for the same recall.
    Candidate volume is |queries| × (nprobe/n_centroids) × |corpus|
    in expectation; the only corpus-wide shuffles are the fit's
    per-iteration assign/update aggregations. ``nprobe ==
    n_centroids`` degenerates to exact brute force (every cell
    probed) — the tested exactness limit.

    Defaults are data-adaptive (r3): ``n_centroids=None`` → k ≈ √n
    and ``nprobe=None`` → max(4, √k), so the scanned fraction
    nprobe/k ≈ 1/√k SHRINKS as the corpus grows (at n=10⁹: k≈31623,
    nprobe≈178, ~0.6% of the corpus per query) instead of the r2
    constant-k 4/8 = 50%.

    Recall on the synthetic testdata is the ADVERSARIAL case for any
    partition-based index (near-uniform vectors — neighbors barely
    closer than non-neighbors), so recall there tracks the scanned
    fraction; with the fixed benchmark parameters (8 cells, nprobe
    2/3/4 → half the corpus scanned at 4) it measures
    0.56/0.66/0.68 at sf0.01 — pinned in test_ivf.py. ``ann_lsh``
    (OR-amplified over 16 tables) reaches 0.94 there because
    OR-amplification re-draws the partition 16 times where
    single-assignment IVF cannot; on real clustered embeddings the
    ordering flips — prefer IVF when cluster structure exists, LSH
    otherwise. Approximate by design -> rows-only check.

    Scoring shape: the probed query routing (|Q| × nprobe rows —
    metadata-sized, it was already the broadcast side) ships in the
    scoring kernel's closure as per-cell query matrices; each corpus
    Arrow batch GEMMs only against the queries probing its rows'
    cells and emits its LOCAL top-k per query, so the global-ranking
    shuffle carries ≤ batches × |Q| × k rows. Sims round to 6dp
    before ranking (repo parity rule), which also keeps
    ``nprobe == n_centroids`` bit-identical to ``cosine_topk``."""
    import pandas as pd

    if centroids is None:
        centroids = ivf_fit(
            embeddings, n_centroids, iters, id_col, vec_col, fit_fraction
        )
    if nprobe is None:
        # the centroid table is literal driver-built data → free count
        nprobe = max(4, round(math.sqrt(centroids.count())))
    # duplicated query ids would route (and later score) twice,
    # consuming top-k slots with repeat rows — dedupe like lsh_topk
    probed = (
        ivf_transform(queries.dropDuplicates([id_col]), centroids, nprobe, id_col, vec_col)
        .select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"), "centroid_id")
        .toPandas()
    )
    # per-cell query matrices: cell -> (query ids, normalized matrix^T)
    dim = first_dim(probed["_qv"])
    cell_queries: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if dim is not None:
        for cid, grp in probed.groupby("centroid_id"):
            qm, q_bad = _unit_batch(grp["_qv"], dim)
            keep = ~q_bad  # degenerate queries score nothing
            if keep.any():
                cell_queries[int(cid)] = (grp["_qid"].to_numpy()[keep], qm[keep].T)

    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cand: dict[object, list[tuple[np.ndarray, np.ndarray]]] = {}
            for cid, grp in pdf.groupby("centroid_id"):
                cq = cell_queries.get(int(cid))
                if cq is None:
                    continue
                qids, qt = cq
                mu, bad = _unit_batch(grp[vec_col], qt.shape[0])
                ok = ~bad  # degenerate neighbors excluded
                sims = np.round(mu @ qt, 6)
                nids = grp[id_col].to_numpy()
                for j, qid in enumerate(qids):
                    mask = ok & (nids != qid)
                    if mask.any():
                        cand.setdefault(qid, []).append((nids[mask], sims[mask, j]))
            frames = []
            for qid, parts in cand.items():
                ids = np.concatenate([p[0] for p in parts])
                s = np.concatenate([p[1] for p in parts])
                order = np.lexsort((ids, -s))[:k]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[order], "cosine_sim": s[order]}
                    )
                )
            if frames:
                yield pd.concat(frames)

    corpus = ivf_transform(embeddings, centroids, 1, id_col, vec_col).select(
        id_col, vec_col, "centroid_id"
    )
    scored = corpus.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def blocked_cosine_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs within each block with cosine >= threshold. Each
    block's pairwise cosines are one numpy GEMM inside
    ``applyInPandas`` — the scale-correct kernel for block-local
    all-pairs (BLAS matmul measured ~10× faster than interpreted dot
    folds at sf0.1); blocks parallelize across executors."""
    import numpy as np
    import pandas as pd

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_bid").reset_index(drop=True)
        d = first_dim(pdf["_bv"])
        empty = pd.DataFrame(
            {"vec_id_a": [], "vec_id_b": [], "block": [], "cosine_sim": []}
        )
        if d is None:
            return empty
        mu, bad = _unit_batch(pdf["_bv"], d)
        if bad.any():  # NULL/zero/ragged vectors have no defined cosine
            pdf, mu = pdf[~bad].reset_index(drop=True), mu[~bad]
        if len(pdf) < 2:
            return empty
        sims = np.round(mu @ mu.T, 6)
        iu, ju = np.triu_indices(len(pdf), k=1)
        keep = sims[iu, ju] >= threshold
        ids = pdf["_bid"].to_numpy()
        return pd.DataFrame(
            {
                "vec_id_a": ids[iu[keep]],
                "vec_id_b": ids[ju[keep]],
                "block": pdf["_blk"].iloc[0],
                "cosine_sim": sims[iu, ju][keep],
            }
        )

    blocks = df.select(
        F.col(id_col).alias("_bid"),
        F.col(vec_col).alias("_bv"),
        F.col(block_col).cast("long").alias("_blk"),
    )
    pairs = blocks.groupBy("_blk").applyInPandas(
        per_block, schema="vec_id_a long, vec_id_b long, block long, cosine_sim double"
    )
    # multi-probe assignment finds the same pair in several blocks;
    # dedupe on the (small) pair output, keeping the lowest block id
    return (
        pairs.groupBy("vec_id_a", "vec_id_b")
        .agg(F.min("block").alias("block"), F.max("cosine_sim").alias("cosine_sim"))
        .select("vec_id_a", "vec_id_b", "block", "cosine_sim")
    )
