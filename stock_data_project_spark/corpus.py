"""End-to-end training-corpus builder: the LLM-data operators
composed into one deterministic pipeline.

    raw documents
      → quality + language gate          (map-only, fuses into scan)
      → exact dedup                      (1 shuffle on content_hash)
      → benchmark decontamination        (broadcast shingles, anti join)
      → per-source cap                   (k-row count + map-only keeps)
      → train/val/test hash split        (map-only)
      → token counts                     (map-only)
      → per-split sequence packing       (per-hash-group FFD)
      → parquet partitioned by split

Every keep/route decision is a pure function of document content and
(id, seed), so a re-run over the same input reproduces the same
corpus bit-for-bit on any cluster layout — the property that makes a
100 TB pipeline debuggable. The only corpus-sized shuffles are the
dedup groupBy and the packing group exchange; every gate is map-only
against broadcast metadata.

This is a library entry point (side-effecting writer + stats report),
not a ``queries()`` plan; ``tests/test_corpus_pipeline.py`` drives it
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.operators.dedup import (
    incremental_dedup,
    ngram_contamination,
)
from stock_data_project_spark.operators.packing import pack_sequences
from stock_data_project_spark.operators.sampling import cap_per_key, hash_split
from stock_data_project_spark.operators.textops import (
    predicted_lang,
    with_quality,
    with_token_counts,
)


def build_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    benchmark: DataFrame | None = None,
    splits: dict[str, float] | None = None,
    max_per_source: int | None = None,
    quality_min: float = 0.5,
    seq_budget: int = 512,
    seed: int = 42,
) -> dict[str, int | dict[str, int]]:
    """Run the full gate chain over ``docs`` and write the packed
    corpus to ``out_dir`` partitioned by split. Returns a stats dict
    (counts after each gate + per-split sizes) — each stat is one
    action over the cached survivor frame, so the report costs one
    corpus materialization, not one scan per stage.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}

    gated = (
        with_quality(docs)
        .withColumn("pred_lang", predicted_lang("text"))
        .filter((F.col("quality_score") >= quality_min) & (F.col("pred_lang") != "und"))
        .select(*docs.columns)
    )
    deduped, _ = incremental_dedup(gated)

    if benchmark is not None:
        flagged = ngram_contamination(deduped, benchmark).select("doc_id")
        deduped = deduped.join(flagged, "doc_id", "left_anti")

    if max_per_source is not None:
        deduped = cap_per_key(deduped, max_per_source, key_cols="source", seed=seed)

    routed = with_token_counts(
        hash_split(deduped, splits, seed=seed)
    ).withColumnRenamed("n_regex_tokens", "n_tokens")
    routed = routed.cache()
    try:
        stats: dict = {
            "input": docs.count(),
            "kept": routed.count(),
            "per_split": {},
        }
        packed_parts = []
        # packing runs once per split, so bin_id is namespaced WITHIN
        # its split — the bin key is (split, bin_id), matching the
        # partitioned layout a loader reads one split at a time
        for name in splits:
            part = routed.filter(F.col("split") == name)
            bins = pack_sequences(part, seq_budget, tokens_col="n_tokens").select(
                "doc_id", "bin_id", "oversize"
            )
            packed_parts.append(part.join(bins, "doc_id"))
            stats["per_split"][name] = part.count()
        out = packed_parts[0]
        for p in packed_parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").partitionBy("split").parquet(out_dir)
        return stats
    finally:
        routed.unpersist()
