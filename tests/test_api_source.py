"""API ingestion tests (S1, §3.1): injected fake client, cross-query
dedup, per-query failure isolation, bounded buffer, landing-zone round-trip."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from praw_etl_student_dropout_spark.sources.api_source import ingest_query_matrix, land_raw
from praw_etl_student_dropout_spark.sources.readers import read_parquet


def _rec(i: int, sub: str) -> dict:
    return {
        "id": f"post{i}",
        "content": f"title {i} body {i}",
        "date": datetime(2025, 7, 17, 12, 0, i % 60, tzinfo=timezone.utc),
        "url": f"https://example.test/{i}",
        "subreddit": sub,
    }


def test_ingest_dedups_across_queries(spark):
    # both keywords return the same 5 posts → seen_ids collapses them
    def fetch(sub, term, limit):
        return iter(_rec(i, sub) for i in range(5))

    df = ingest_query_matrix(spark, fetch, ["college"], ["dropout", "quit"])
    assert df.count() == 5
    assert df.columns == ["id", "content", "date", "url", "subreddit"]


def test_ingest_survives_failing_query(spark):
    calls = []

    def fetch(sub, term, limit):
        calls.append((sub, term))
        if term == "bad":
            raise RuntimeError("rate limited")
        return iter(_rec(i, sub) for i in range(3))

    df = ingest_query_matrix(spark, fetch, ["a"], ["ok", "bad", "also_ok"])
    # the failing query is logged + skipped; the others still land
    assert len(calls) == 3
    assert df.count() == 3  # same ids from ok and also_ok dedup to 3


def test_ingest_respects_limit_arg(spark):
    def fetch(sub, term, limit):
        return iter(_rec(i, sub) for i in range(min(limit, 100)))

    df = ingest_query_matrix(spark, fetch, ["a"], ["x"], limit_per_query=7)
    assert df.count() == 7


def test_ingest_buffer_bound(spark):
    def fetch(sub, term, limit):
        return iter(_rec(i, sub) for i in range(100))

    with pytest.raises(BufferError):
        ingest_query_matrix(spark, fetch, ["a"], ["x"], max_rows_in_flight=10)


def test_land_raw_round_trip(spark, tmp_path):
    def fetch(sub, term, limit):
        return iter(_rec(i, sub) for i in range(10))

    df = ingest_query_matrix(spark, fetch, ["college"], ["dropout"])
    path = land_raw(df, str(tmp_path), run_id="20250717_120000")
    back = read_parquet(spark, path)
    assert back.count() == 10
    assert set(back.columns) == set(df.columns)
