"""Surrogate-key helpers.

The reference derives dimension keys with ``MD5(Ticker)``
(fetch_stocks.py:190, 238). Same contract here, as a Column
expression so it stays inside whole-stage codegen and the join on
the derived key needs no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str) -> Column:
    """Deterministic md5 hex key over one or more columns.

    Multi-column input is joined with a ``\\x1f`` unit separator so
    (``"a", "bc"``) and (``"ab", "c"``) don't collide. NULL in any
    input yields a NULL key (concat propagates NULLs) — matching SQL
    md5(NULL) semantics; concat_ws would silently DROP the NULL part
    and collide with the key of the remaining columns.
    """
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit("\x1f"), p)
    return F.md5(joined)
