"""Shared numpy helpers for the Arrow-batched vector kernels
(IVF assign/scoring, brute-force cosine top-k).

The kernels receive embedding columns as Arrow object arrays; a NULL
or wrong-length element must degrade the ROW, never crash the batch
(the relational formulations these kernels replaced produced a NULL
cosine for such rows). ``to_matrix`` maps those rows to zero vectors;
``unit_rows`` keeps them zero after normalization, so callers detect
them uniformly as zero-norm rows and either skip them or assign the
-2 sentinel.
"""

from __future__ import annotations

import numpy as np


def to_matrix(values, d: int) -> np.ndarray:
    """(rows, d) float64 matrix from an Arrow column of array values.
    NULL / wrong-length / non-numeric rows become zero rows."""
    out = np.zeros((len(values), d))
    for i, v in enumerate(values):
        if v is None:
            continue
        arr = np.asarray(v, dtype=np.float64)
        if arr.shape == (d,):
            out[i] = arr
    return out


def unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalize; all-zero / non-finite rows become zero rows."""
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(nrm > 0, m / nrm, 0.0)
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def first_dim(values) -> int | None:
    """Dimensionality of the first non-NULL array value, or None."""
    for v in values:
        if v is not None:
            arr = np.asarray(v, dtype=np.float64)
            if arr.ndim == 1:
                return int(arr.shape[0])
    return None
