"""r13 build, staged r14 debut: ``stream_ingest_neardup`` — the
streaming NEAR-dup ingest gate (banded-LSH twin of
``stream_ingest_dedup``'s exact gate; the r12 verdict's item 7
"continuous corpus-ingest shape").

Three deterministic drops (doc_id % 3) stream through the real
foreachBatch gate (streaming/pipeline.ingest_neardup_batch): each
batch is rejected-against-history on any band collision with the
committed band store, then deduped WITHIN the batch by min-id winner
election per band bucket, and survivors' bands are committed behind
an atomic pointer rename. The observable is the per-epoch gate
stats: admitted / rejected-vs-history / rejected-within-batch.

FULLY oracled because every ingredient is engine-neutral
(operators/dedup.neutral_minhash_bands: md5-hex→BIGINT base hash,
fixed public salts, plain BIGINT arithmetic) and the epoch chain is
finite — the oracle replays drop 0, 1, 2 as chained MATERIALIZED
CTEs (history_e = bands of docs admitted in epochs < e). The
within-batch rule is the FIXED-comparison-set election (rejected iff
any band is claimed by a smaller history-passing doc), i.e. one
groupBy + join with no sequential cascade — the distributed batch
semantics the operator documents.
"""

from __future__ import annotations

from stock_data_project_spark.operators.dedup import (
    _NEUTRAL_PERM_SALTS,
    NEUTRAL_BANDS,
    NEUTRAL_ROWS_PER_BAND,
)
from stock_data_project_spark.plans.llm_next14 import _TOKEN_SPLIT_SQL
from stock_data_project_spark.streaming.pipeline import (
    stream_ingest_neardup_counts,
)

_K_SHINGLE = 3
_N_PERMS = NEUTRAL_BANDS * NEUTRAL_ROWS_PER_BAND


def _neardup_gate_sql() -> str:
    perms = ", ".join(
        f"min(({a} * (h % 2147483648) + {b}) % 4294967296) AS m{i}"
        for i, (a, b) in enumerate(_NEUTRAL_PERM_SALTS[:_N_PERMS])
    )
    band_rows = "\n        UNION ALL ".join(
        f"SELECT doc_id, epoch, {b} AS band_idx, md5("
        + " || '-' || ".join(
            f"CAST(m{b * NEUTRAL_ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(NEUTRAL_ROWS_PER_BAND)
        )
        + ") AS sig FROM mh"
        for b in range(NEUTRAL_BANDS)
    )
    parts = [
        f"""
    WITH arr AS (
        SELECT doc_id, CAST(doc_id % 3 AS INT) AS epoch,
               {_TOKEN_SPLIT_SQL} AS ws
        FROM documents WHERE text IS NOT NULL
    ), sh AS (
        SELECT DISTINCT doc_id, epoch,
               array_to_string(ws[p + 1 : p + {_K_SHINGLE}], ' ') AS s
        FROM (
            SELECT doc_id, epoch, ws,
                   unnest(range(0, greatest(1, len(ws) - {_K_SHINGLE - 1})))
                       AS p
            FROM arr
        )
    ), h0 AS (
        SELECT doc_id, epoch,
               ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
        FROM sh
    ), mh AS MATERIALIZED (
        SELECT doc_id, epoch, {perms}
        FROM h0 GROUP BY doc_id, epoch
    ), bandrows AS MATERIALIZED (
        {band_rows}
    ), p0 AS MATERIALIZED (
        SELECT DISTINCT doc_id FROM bandrows WHERE epoch = 0
    ), w0 AS (
        SELECT band_idx, sig, min(doc_id) AS w
        FROM bandrows WHERE epoch = 0 GROUP BY 1, 2
    ), a0 AS MATERIALIZED (
        SELECT b.doc_id
        FROM bandrows b JOIN w0 USING (band_idx, sig)
        WHERE b.epoch = 0
        GROUP BY b.doc_id HAVING bool_and(w = b.doc_id)
    ), rh0 AS (SELECT doc_id FROM p0 LIMIT 0)"""
    ]
    for e in (1, 2):
        hist_union = " UNION ALL ".join(
            f"SELECT band_idx, sig FROM bandrows JOIN a{p} USING (doc_id)"
            for p in range(e)
        )
        parts.append(
            f""", hist{e} AS MATERIALIZED (
        {hist_union}
    ), rh{e} AS MATERIALIZED (
        SELECT DISTINCT b.doc_id
        FROM bandrows b JOIN hist{e} h USING (band_idx, sig)
        WHERE b.epoch = {e}
    ), p{e} AS MATERIALIZED (
        SELECT DISTINCT doc_id FROM bandrows
        WHERE epoch = {e}
          AND doc_id NOT IN (SELECT doc_id FROM rh{e})
    ), w{e} AS (
        SELECT band_idx, sig, min(b.doc_id) AS w
        FROM bandrows b JOIN p{e} USING (doc_id)
        WHERE b.epoch = {e} GROUP BY 1, 2
    ), a{e} AS MATERIALIZED (
        SELECT b.doc_id
        FROM bandrows b JOIN p{e} USING (doc_id)
                        JOIN w{e} USING (band_idx, sig)
        WHERE b.epoch = {e}
        GROUP BY b.doc_id HAVING bool_and(w = b.doc_id)
    )"""
        )
    selects = " UNION ALL ".join(
        f"""SELECT CAST({e} AS INT) AS epoch,
               (SELECT count(*) FROM a{e}) AS n_admitted,
               (SELECT count(*) FROM rh{e}) AS n_rejected_history,
               (SELECT count(*) FROM p{e}) - (SELECT count(*) FROM a{e})
                   AS n_rejected_batch"""
        for e in (0, 1, 2)
    )
    parts.append(f"\n    {selects}")
    return "".join(parts)


QUERIES_NEXT = {
    "stream_ingest_neardup": stream_ingest_neardup_counts,
}

ORACLE_NEXT = {
    "stream_ingest_neardup": _neardup_gate_sql(),
}
