"""Shingle construction equivalence: the codegen window-lead form
must be bit-identical to the interpreted array-HOF form."""

from __future__ import annotations


def test_shingle_rows_equals_word_shingles_explode(spark):
    """shingle_rows (window-lead codegen) must be bit-identical to
    explode(array_distinct(word_shingles)) — including the short-doc
    whole-text fallback and repeated-shingle dedup — it is the same
    operator, 11.8× faster at the 30× smoke."""
    from pyspark.sql import functions as F

    from stock_data_project_spark.operators.dedup import (
        shingle_rows,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),        # 3 shingles
            (2, "one two three"),               # short: whole-text fallback
            (3, "x x x x x x x x x x x x"),     # repeats: dedup to 1
            (4, "  Mixed   CASE  text  here and more words pad pad "),
            (5, ""),                            # empty: one empty shingle
        ],
        "doc_id long, text string",
    )
    want = sorted(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.explode(F.array_distinct(word_shingles("text", 8))).alias("sh"),
            ).collect(),
        )
    )
    got = sorted(map(tuple, shingle_rows(docs, 8).collect()))
    assert got == want
    # and on the real corpus
    from stock_data_project_spark.catalog import load_table
    from tests.conftest import SF_ORACLE

    real = load_table(spark, SF_ORACLE, "documents").filter(
        F.col("text").isNotNull()
    )
    want = sorted(
        map(
            tuple,
            real.select(
                "doc_id",
                F.explode(F.array_distinct(word_shingles("text", 8))).alias("sh"),
            ).collect(),
        )
    )
    got = sorted(map(tuple, shingle_rows(real, 8).collect()))
    assert got == want
