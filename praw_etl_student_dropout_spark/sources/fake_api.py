"""Deterministic fake paged-API client.

Stands in for a PRAW-style search client (etl_pipeline.py:44-48) in
tests and the Python Data Source: importable on executors, no network,
reproducible records. A real client drops in as any other
``module:function`` with the same (key, term, limit) signature.

Overlap is intentional: the same post id appears for multiple terms
(record i for term j exists whenever i < 10 + 13*j), mirroring how one
Reddit post matches several search keywords — exercising cross-query
dedup downstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone


def fetch_page(key: str, term: str, limit: int) -> Iterator[dict]:
    term_ix = sum(ord(c) for c in term) % 7
    n = min(10 + 13 * term_ix, limit)
    for i in range(n):
        yield {
            "id": f"{key}_{i}",  # ids collide across terms, not across keys
            "content": f"{term} discussion number {i} in {key}",
            "date": datetime(2025, 7, 17, 12, i % 60, term_ix, tzinfo=timezone.utc),
            "url": f"https://api.test/{key}/{i}",
            "subreddit": key,
        }


def failing_fetch_page(key: str, term: str, limit: int) -> Iterator[dict]:
    """Raises for one specific term — retry/error-path testing."""
    if term == "bad":
        raise RuntimeError("simulated rate limit")
    yield from fetch_page(key, term, limit)


def fetch_page_number(key: str, term: str, page: int, page_size: int = 20) -> list[dict]:
    """Paged variant for the streaming source: page N of the (key, term)
    result set; empty list past the end. Deterministic like fetch_page."""
    all_recs = list(fetch_page(key, term, limit=10_000))
    start = page * page_size
    return all_recs[start : start + page_size]


def page_count(key: str, term: str, page_size: int = 20) -> int:
    """Cheap metadata probe for the parallel stream reader (models an API
    count/HEAD endpoint): how many pages exist for (key, term)."""
    n = len(list(fetch_page(key, term, limit=10_000)))
    return (n + page_size - 1) // page_size
