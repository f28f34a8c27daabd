from __future__ import annotations

from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.plans.flagship import (
    document_sentiment_pivot,
    enrich_documents,
    flagship_star_pivot,
)
from praw_etl_student_dropout_spark.sources.readers import load_tables


def test_flagship_star_pivot(spark, sf_dir):
    out = flagship_star_pivot(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 5  # five regions
    assert set(out.columns) == {"r_name", "cnt_f", "cnt_o", "cnt_p"}
    total = sum(r.cnt_f + r.cnt_o + r.cnt_p for r in rows)
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    assert total == orders.count()


def test_enrich_documents_deterministic(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    enriched = enrich_documents(docs)
    row = enriched.filter(F.col("doc_id") == 0).first()
    assert row is not None
    assert row.sentiment_label in {"positive", "negative", "neutral"}
    assert -1.0 <= row.sentiment <= 1.0
    # rerun → identical (pure expressions, no rand)
    again = enrich_documents(docs).filter(F.col("doc_id") == 0).first()
    assert row.sentiment == again.sentiment


def test_document_sentiment_pivot(spark, sf_dir):
    out = document_sentiment_pivot(spark, sf_dir).collect()
    docs_total = load_tables(spark, sf_dir, ["documents"])["documents"].count()
    assert sum(r.n_positive + r.n_negative + r.n_neutral for r in out) == docs_total


def test_curation_funnel_is_monotone(spark, sf_dir):
    from praw_etl_student_dropout_spark.plans import catalog_all

    rows = {
        r["stage"]: r["n_docs"]
        for r in catalog_all()["llm_curation_funnel"].builder(spark, sf_dir).collect()
    }
    order = ["1_total", "2_lang_en", "3_quality", "4_deduped", "5_decontaminated"]
    assert list(rows) and set(rows) == set(order)
    counts = [rows[s] for s in order]
    assert counts == sorted(counts, reverse=True), counts  # each gate narrows
    assert counts[0] > 0 and counts[-1] > 0
