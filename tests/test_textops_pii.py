"""PII scrub + cross-corpus line dedup: masking exactness, clean-text
passthrough, and repeated-line removal semantics on multi-line docs
(the corpus tables have single-line texts — these ops' general case
is proven here on constructed inputs, like the multimodal stubs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_project_spark.operators.dedup import line_dedup
from stock_data_project_spark.operators.textops import pii_counts, pii_scrub


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    cols = [pii_scrub("text").alias("clean"), *[
        c.alias(n) for n, c in pii_counts("text").items()
    ]]
    return df.select(*cols).collect()[0]


def test_pii_masks_each_category(spark):
    r = _scrub(
        spark,
        "mail bob.smith+x@corp.example.co.uk or call +1 (415) 555-0199 "
        "from 192.168.10.255 today",
    )
    assert r["clean"] == "mail <EMAIL> or call <PHONE> from <IP> today"
    assert (r["email"], r["ipv4"], r["phone"]) == (1, 1, 1)


def test_pii_clean_text_unchanged(spark):
    text = "no contact details here just words and the number 42"
    r = _scrub(spark, text)
    assert r["clean"] == text
    assert (r["email"], r["ipv4"], r["phone"]) == (0, 0, 0)


def test_pii_email_digits_not_eaten_by_phone(spark):
    r = _scrub(spark, "a12345678901@nums.example.com wrote")
    assert r["clean"] == "<EMAIL> wrote"
    assert (r["email"], r["phone"]) == (1, 0)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_drops_cross_doc_repeats_only(spark):
    boiler = "subscribe to our newsletter now"
    rows = [
        (1, f"{boiler}\nunique first body line\nsecond thought"),
        (2, f"{boiler}\nanother different body"),
        (3, "standalone document entirely its own"),
    ]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["text"] == "unique first body line\nsecond thought"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_dropped"]) == (2, 1)
    assert out[2]["text"] == "another different body"
    assert out[3]["text"] == rows[2][1]
    assert out[3]["n_lines_dropped"] == 0


def test_line_dedup_within_doc_repeat_survives(spark):
    # the gate counts DISTINCT docs: a line repeated inside ONE doc
    # is not cross-corpus boilerplate
    rows = [(1, "chorus line\nchorus line\nverse"), (2, "other text")]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["text"] == "chorus line\nchorus line\nverse"


def test_line_dedup_normalized_matching_and_order(spark):
    rows = [
        (1, "First  Line\nkeep a\nkeep b"),
        (2, "first line\nkeep c"),
    ]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    # case/whitespace-insensitive match, original text+order preserved
    assert out[1]["text"] == "keep a\nkeep b"
    assert out[2]["text"] == "keep c"


def test_line_dedup_all_dropped_and_null_text(spark):
    rows = [(1, "same"), (2, "same"), (3, None)]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["text"] == "" and out[2]["text"] == ""
    assert out[1]["n_lines_dropped"] == 1
    assert out[3]["text"] == "" and out[3]["n_lines_kept"] == 0


def test_line_dedup_single_line_corpus_degenerates_to_exact(spark):
    """On the parquet corpus (no newlines) the gate equals exact-dup
    line removal: dup-text docs empty out, unique docs pass through."""
    from stock_data_project_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = line_dedup(docs)
    dup_hashes = (
        docs.filter(F.col("text").isNotNull())
        .groupBy(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("h"))
        .agg(F.count_distinct("doc_id").alias("n"))
        .filter("n > 1")
        .count()
    )
    emptied = out.filter((F.col("text") == "") & (F.col("n_lines_dropped") > 0)).count()
    survivors = out.filter(F.col("n_lines_kept") == 1).count()
    assert emptied > 0 if dup_hashes else emptied == 0
    assert survivors + emptied == docs.filter(F.col("text").isNotNull()).count()
