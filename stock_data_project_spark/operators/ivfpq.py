"""IVF+PQ composed ANN — the full FAISS ``IndexIVFPQ`` recipe on
Spark: IVF cells bound WHAT is scanned (nprobe/k of the corpus), PQ
codes bound the BYTES per scanned row (m ints vs 4d floats). The two
compressions multiply: at auto-k ≈ √n and nprobe ≈ √k the scanned
volume per query is ~n/√k rows × m bytes — at n=10⁹, d=64, m=16
that is ~0.6% of the rows at 1/16 the bytes, vs a full float scan.

Composition of the existing pieces (operators/ivf.py quantizer,
operators/pq.py codebooks/codes/refine):

- index = ivf_fit + ivf_transform (cell per vector) + pq_fit +
  pq_encode (code per vector, cell carried through);
- search routes each query to its ``nprobe`` nearest cells
  driver-side (the centroid matrix is already metadata-sized), the
  code table is PRE-FILTERED to the probed-cell union — with the
  codes laid out by cell (``write_sorted``/partitionBy on
  centroid_id) that filter is partition pruning, not a scan — and
  the ADC kernel masks per-query so each query only ranks its own
  cells' rows;
- optional exact re-rank of the ADC shortlist (``exact_rerank``),
  the same two-stage refine as ``pq_topk``.

Recall is routing-bound: a query's true neighbor must land in a
probed cell. On the synthetic near-uniform corpus (the adversarial
case for any partition index — SURVEY §6, ivf_topk's documented
0.60) IVF-PQ with re-rank tracks the same routing recall; on
clustered corpora the routing recall rises and PQ's quantization
noise is absorbed by the re-rank. ``nprobe == n_cells`` degenerates
to plain PQ search — the tested equivalence limit.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_project_spark.operators.ivf import _centroids_np, ivf_fit, ivf_transform
from stock_data_project_spark.operators.linalg import first_dim, to_matrix, unit_rows
from stock_data_project_spark.operators.pq import (
    _codebook_np,
    adc_shortlist,
    exact_rerank,
    pq_encode,
    pq_fit,
)


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int | None = None,
    m: int = 8,
    nbits: int = 6,
    iters: int = 3,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors via IVF routing over PQ codes.
    Output: (query_id, neighbor_id, approx_sim, rank) — rows-only
    semantics (approximate by design). Defaults are data-adaptive
    like ``ivf_topk``: k_cells ≈ √n, nprobe ≈ √k_cells."""
    centroids = ivf_fit(embeddings, n_centroids, iters, id_col, vec_col)
    assigned = ivf_transform(embeddings, centroids, 1, id_col, vec_col)
    codebook = pq_fit(embeddings, m, nbits, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(assigned, codebook, id_col=id_col, vec_col=vec_col, drop_vec=True)

    cids, cent = _centroids_np(centroids)
    n_cells = len(cids)
    if nprobe is None:
        nprobe = max(4, round(math.sqrt(n_cells)))
    nprobe = min(nprobe, n_cells)

    books = _codebook_np(codebook)
    m_, ksub, dsub = books.shape
    d = m_ * dsub

    q_pdf = (
        queries.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
        .toPandas()
        .drop_duplicates("_qid")
    )
    qdim = first_dim(q_pdf["_qv"])
    if qdim is not None and qdim != d:
        raise ValueError(f"ivfpq_topk: query dim {qdim} != codebook dim {d}")
    qm = unit_rows(to_matrix(q_pdf["_qv"], d))
    q_ok = qm.any(axis=1)
    qm = qm[q_ok]
    qids = q_pdf["_qid"].to_numpy()[q_ok]

    # per-query probe cells, driver-side (centroid matrix is
    # metadata-sized); allowed[cell, j] gates the kernel's scoring
    if len(qids):
        sims_qc = qm @ cent.T
        order = np.argsort(-sims_qc, axis=1)[:, :nprobe]
        probe_cells = cids[order]  # (|Q|, nprobe) actual cell ids
        allowed = np.zeros((int(cids.max()) + 1, len(qids)), dtype=bool)
        for j in range(len(qids)):
            allowed[probe_cells[j], j] = True
        probed_union = sorted({int(c) for c in probe_cells.ravel()})
    else:
        allowed = np.zeros((0, 0), dtype=bool)
        probed_union = []

    # scan reduction: only probed cells' codes reach the kernel. With
    # the code table laid out by cell this is partition pruning; here
    # it is a pushed-down isin filter.
    pruned = codes.select(id_col, "pq_code", "centroid_id").filter(
        F.col("centroid_id").isin(probed_union)
        if probed_union
        else F.lit(False)
    )

    shortlist_k = max(k, rerank) if rerank else k
    # ONE shared ADC kernel with pq_topk (rounding/tie-break/
    # truncation can never drift — the nprobe=n_cells equivalence
    # depends on it), plus the per-query cell gate
    shortlist = adc_shortlist(
        pruned,
        books,
        qids,
        qm,
        shortlist_k,
        id_col=id_col,
        code_col="pq_code",
        cell_col="centroid_id",
        allowed=allowed,
    )
    if not rerank:
        return shortlist
    return exact_rerank(shortlist, queries, embeddings, k, id_col, vec_col)
