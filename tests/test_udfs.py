"""UDF-surface tests (U2/U5): the pandas-UDF sentiment twin agrees with
the native expression; the grouped-agg UDAF matches a hand computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.functions.text import clean_text, sentiment_score
from praw_etl_student_dropout_spark.functions.udfs import (
    HAVE_TEXTBLOB,
    grouped_weighted_mean,
    lexicon_sentiment_udf,
    sentiment_udf,
)
from praw_etl_student_dropout_spark.sources.readers import load_tables


def test_lexicon_udf_matches_native_expression(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(200)
    cleaned = docs.select("doc_id", clean_text(F.col("text")).alias("t"))
    both = cleaned.select(
        "doc_id",
        sentiment_score(F.col("t")).alias("native"),
        lexicon_sentiment_udf(F.col("t")).alias("udf"),
    )
    mismatch = both.filter(F.abs(F.col("native") - F.col("udf")) > 1e-12)
    assert mismatch.count() == 0


def test_sentiment_dispatch_without_textblob(spark):
    # container has no textblob → dispatch must fall back to the lexicon path
    assert not HAVE_TEXTBLOB
    df = spark.createDataFrame([("spark is fast and good",), ("slow bad crash",)], ["t"])
    rows = df.select(sentiment_udf(F.col("t")).alias("s")).collect()
    assert rows[0].s > 0 and rows[1].s < 0


def test_grouped_weighted_mean(spark):
    data = [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 0.0), ("b", 2.0, 5.0)]
    df = spark.createDataFrame(data, ["k", "v", "w"])
    got = {
        r.k: r.m
        for r in df.groupBy("k").agg(grouped_weighted_mean("v", "w").alias("m")).collect()
    }
    assert got["a"] == pytest.approx((1.0 * 1.0 + 3.0 * 3.0) / 4.0)
    assert got["b"] == pytest.approx((10.0 * 0.0 + 2.0 * 5.0) / 5.0)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "t string")
    rows = df.select(lexicon_sentiment_udf(F.col("t")).alias("s")).collect()
    assert all(r.s == 0.0 for r in rows)


def test_chunk_by_tokens_covers_every_token(spark):
    from praw_etl_student_dropout_spark.operators.chunking import chunk_by_tokens

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "a b")], ["doc_id", "text"])
    chunks = chunk_by_tokens(df, chunk_size=10, overlap=2).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # short doc: one whole-text chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b"
    # long doc: stride 8 → ceil((100-2)/8) = 13 chunks
    long = sorted(by_doc[1], key=lambda r: r.chunk_no)
    assert len(long) == 13
    # consecutive chunks overlap by exactly `overlap` tokens
    a, b = long[0].chunk_text.split(), long[1].chunk_text.split()
    assert a[-2:] == b[:2]
    # every token appears in at least one chunk, in order
    covered = set()
    for r in long:
        covered.update(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(100)}
    # all chunks except the last are full-size
    assert all(r.n_chunk_tokens == 10 for r in long[:-1])


def test_chunk_by_tokens_rejects_bad_overlap(spark):
    from praw_etl_student_dropout_spark.operators.chunking import chunk_by_tokens

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_by_tokens(df, chunk_size=8, overlap=8)


def test_chunk_text_udtf_matches_native_chunker(spark):
    """U5 table-function surface: the Python UDTF's fan-out must agree
    with the native sequence+explode chunker at overlap=0."""
    from praw_etl_student_dropout_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, None)], "doc_id int, text string"
    ).createOrReplaceTempView("__udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.chunk_text, c.n_tokens
        FROM __udtf_docs d, LATERAL chunk_text(d.text, 3) c
        """
    )
    rows = {(r.doc_id, r.chunk_no): (r.chunk_text, r.n_tokens) for r in out.collect()}
    assert rows == {
        (1, 0): ("a b c", 3),
        (1, 1): ("d e f", 3),
        (1, 2): ("g", 1),
        (2, 0): ("x y", 2),
    }


def test_redact_pii_masks_emails_phones_numbers(spark):
    from praw_etl_student_dropout_spark.functions.text import redact_pii

    rows = [
        ("mail me at jane.doe+spam@sub.example.co.uk today",),
        ("call +1 (415) 555-0199 or 020-7946-0958 now",),
        ("card 4111111111111111 acct 123456789",),
        ("no pii here, just words and the number 42",),
    ]
    df = spark.createDataFrame(rows, ["t"]).select(
        redact_pii(F.col("t")).alias("r")
    )
    got = [r.r for r in df.collect()]
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "card <NUM> acct <NUM>"
    # Short, innocuous numbers survive — redaction must not destroy text
    assert got[3] == "no pii here, just words and the number 42"


def test_redact_pii_idempotent(spark):
    from praw_etl_student_dropout_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [("a@b.io and 99887766 and +1-555-123-4567",)], ["t"]
    )
    once = df.select(redact_pii(F.col("t")).alias("r"))
    twice = once.select(redact_pii(F.col("r")).alias("r"))
    assert once.collect() == twice.collect()


def test_clean_pattern_ascii_class_equivalence(spark):
    """Gauntlet pinning the intentional spelling divergence between
    functions/text.py::CLEAN_PATTERN (\\p{Alpha}, the fast JVM form) and
    plans/catalog.py::SQL_CLEAN ([a-zA-Z], the RE2-portable oracle form):
    clean_text output must be byte-equal to the same pipeline built on
    the [^a-zA-Z\\s] class, on mixed-case / Unicode / URL / digit edges.
    Java compiles \\p{Alpha} as US-ASCII when no flags are set, so the
    two classes are the same match set — this test is what licenses the
    hand-synchronization (ADVICE r5)."""
    edges = [
        "Hello, World! 123",
        "MiXeD CaSe WiTh   runs\tof\nwhitespace",
        "http://example.com/path?q=1 trailing words",
        "www.example.com,comma-glued",
        "unicode: café naïve Ωmega 東京 emoji 🚀 done",
        "accents ÀÉÎÕÜ and ß sharp-s and ñ",  # non-ASCII letters must be STRIPPED
        "digits 0123456789 and _underscores_ and [brackets]",
        "",
        "   ",
        "ALLCAPS",
        "already clean lower case",
        "http nbsp-after-scheme-prefix",  # \S is ASCII-agnostic here
        "tabs\tand\rcarriage\nnewline",
        "punct !@#$%^&*()-=+[]{};:'\",.<>/?`~|\\",
    ]
    df = spark.createDataFrame([(s,) for s in edges], "text string")
    ascii_form = F.trim(
        F.lower(F.regexp_replace("text", r"http\S+|www\S+|[^a-zA-Z\s]", ""))
    )
    both = df.select(
        clean_text(F.col("text")).alias("fast"), ascii_form.alias("ref")
    ).collect()
    for r in both:
        assert r.fast == r.ref, (r.fast, r.ref)


def test_clean_pattern_matches_duckdb_sql_clean(spark):
    """Cross-engine leg of the same pin: DuckDB evaluating SQL_CLEAN
    byte-equals Spark's clean_text on the edge gauntlet (RE2 vs JVM, not
    just JVM vs JVM)."""
    import duckdb

    from praw_etl_student_dropout_spark.plans.catalog import SQL_CLEAN

    edges = [
        "Hello, World! 123",
        "http://example.com/path?q=1 trailing words",
        "unicode: café naïve Ωmega 東京 emoji 🚀 done",
        "accents ÀÉÎÕÜ and ß and ñ",
        "punct !@#$%^&*()-=+[]{};:'\",.<>/?`~|\\",
        "   ",
    ]
    spark_out = [
        r.c
        for r in spark.createDataFrame([(s,) for s in edges], "text string")
        .select(clean_text(F.col("text")).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(
            f"SELECT {SQL_CLEAN.format(col='?')}", [s]
        ).fetchone()[0]
        for s in edges
    ]
    assert spark_out == duck_out
