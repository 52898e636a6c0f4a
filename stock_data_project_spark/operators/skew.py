"""Skew-handling join: explicit key salting.

AQE's skew-join handles most runtime skew (enabled in session.py),
but a known-hot key joined against a non-broadcastable build side
still needs salting: replicate the build side R ways, scatter the
probe side across the replicas, join on (key, salt). The shuffle for
the hot key then spreads over R partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``key`` with ``salt``-way key
    splitting. ``build`` rows are replicated ``salt`` times (keep it
    the smaller input); ``probe`` rows get a deterministic salt from
    a hash of their full row so replicas stay balanced.

    Only probe-preserving join types are valid: build-side rows are
    replicated, so right/full outer would emit ``salt`` null-extended
    copies of every unmatched build row."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(f"salted_join supports probe-preserving joins only, got {how!r}")
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(salt)).cast("int")
    )
    return salted_probe.join(salted_build, [key, "_salt"], how).drop("_salt")
