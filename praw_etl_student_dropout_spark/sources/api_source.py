"""Paged-API batch ingestion (SURVEY.md §2.1 S1, §3.1).

Generalizes the reference's extract stage (etl_pipeline.py:23-63): a
(subreddit × keyword)-style query matrix fanned out against a paged API
client, per-query retry/backoff, cross-query dedup by id, projection to
an explicit schema, and a raw-zone parquet landing.

The API client is injected (``fetch_page``), so tests run a fake and a
PRAW-backed callable drops in unchanged. Ingestion is driver-side by
design — it is the process boundary where data enters the cluster; from
the landing zone on, everything is distributed. At real scale, run many
ingestion workers writing to the same landing zone and let the engine's
idempotent-append (J3) collapse overlap, exactly the reference's
INSERT IGNORE cadence.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import RAW_POSTS

logger = logging.getLogger(__name__)

# fetch_page(query_key, query_term, limit) -> iterator of record dicts
FetchPage = Callable[[str, str, int], Iterator[dict]]


def ingest_query_matrix(
    spark: SparkSession,
    fetch_page: FetchPage,
    query_keys: Iterable[str],
    query_terms: Iterable[str],
    limit_per_query: int = 1000,
    schema: T.StructType = RAW_POSTS,
    id_field: str = "id",
    sleep_ok: float = 0.0,
    sleep_err: float = 0.0,
    max_rows_in_flight: int = 500_000,
) -> DataFrame:
    """Fan out the query matrix, dedup by id across queries, return a
    DataFrame with the explicit schema.

    Mirrors etl_pipeline.py:41-63 (seen_ids guard, per-query try/except
    with backoff, inter-query sleep) minus the anti-patterns: rows are
    buffered in bounded chunks, and dedup beyond the in-flight window is
    the engine's job (dropDuplicates / idempotent_append downstream).
    """
    seen: set = set()
    rows: list[dict] = []
    for key in query_keys:
        for term in query_terms:
            try:
                for rec in fetch_page(key, term, limit_per_query):
                    rid = rec.get(id_field)
                    if rid in seen:
                        continue
                    seen.add(rid)
                    rows.append(rec)
                    if len(rows) >= max_rows_in_flight:
                        raise BufferError(
                            "in-flight ingestion buffer full — land and resume"
                        )
                if sleep_ok:
                    time.sleep(sleep_ok)
            except BufferError:
                raise
            except Exception as e:  # per-query failure: log + backoff + continue
                logger.warning("query (%s, %s) failed: %s", key, term, e)
                if sleep_err:
                    time.sleep(sleep_err)
    return spark.createDataFrame(rows, schema)


def land_raw(df: DataFrame, landing_dir: str, run_id: str) -> str:
    """Write the ingested batch to the raw landing zone, partitioned by
    run (the scalable form of the reference's timestamped CSV backups,
    etl_pipeline.py:68-69)."""
    path = f"{landing_dir.rstrip('/')}/run_id={run_id}"
    df.write.mode("overwrite").parquet(path)
    return path
