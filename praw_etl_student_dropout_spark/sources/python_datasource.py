"""Engine-native paged-API source via the Spark 4 Python Data Source API
(SURVEY.md §2.1 S1 "engine-native" variant).

``api_source.ingest_query_matrix`` runs the query matrix on the driver —
correct, but serial and bounded by one process. This source moves the
fan-out INTO the scan: every (query_key, query_term) pair becomes an
``InputPartition``, so a 7×17 matrix reads as 119 parallel executor
tasks, and a 10k-query backfill scales like any other scan. Downstream
dedup stays the engine's job (`dropDuplicates` / idempotent append), the
same split the reference's seen_ids + INSERT IGNORE made
(etl_pipeline.py:41,122).

The page fetcher is addressed by a ``module:function`` option so
executors can import it themselves — worker processes share no driver
state, only the serialized partition descriptors.

Usage::

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("keys", "college,university")
          .option("terms", "dropout,quit school")
          .option("fetcher", "praw_etl_student_dropout_spark.sources.fake_api:fetch_page")
          .option("limit", "1000")
          .load())
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

API_SCHEMA = "id string, content string, date timestamp, url string, subreddit string"


def _resolve(dotted: str):
    mod, _, fn = dotted.partition(":")
    return getattr(importlib.import_module(mod), fn)


class QueryPartition(InputPartition):
    def __init__(self, key: str, term: str):
        self.key = key
        self.term = term


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.keys = [k.strip() for k in options.get("keys", "").split(",") if k.strip()]
        self.terms = [t.strip() for t in options.get("terms", "").split(",") if t.strip()]
        self.fetcher = options["fetcher"]
        self.limit = int(options.get("limit", "1000"))
        # tolerant=true: a failing query yields zero rows instead of
        # failing the scan — the reference's log-and-continue semantics
        # (etl_pipeline.py:59-61) at partition granularity
        self.tolerant = options.get("tolerant", "false").lower() == "true"

    def partitions(self) -> list[InputPartition]:
        # one task per API query — the unit of retry AND of parallelism
        return [QueryPartition(k, t) for k in self.keys for t in self.terms]

    def read(self, partition: QueryPartition) -> Iterator[tuple]:
        fetch = _resolve(self.fetcher)
        try:
            records = list(fetch(partition.key, partition.term, self.limit))
        except Exception:
            if self.tolerant:
                import logging

                logging.getLogger(__name__).warning(
                    "query (%s, %s) failed; tolerant mode drops it",
                    partition.key,
                    partition.term,
                )
                return
            raise
        for rec in records:
            yield (
                rec["id"],
                rec.get("content"),
                rec.get("date"),
                rec.get("url"),
                rec.get("subreddit"),
            )


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return API_SCHEMA

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)

    def simpleStreamReader(self, schema) -> "PagedApiStreamReader":
        return PagedApiStreamReader(self.options)

    def streamReader(self, schema) -> "PagedApiParallelStreamReader":
        # Spark prefers streamReader and only falls back to the simple
        # reader on NotImplementedError — gate on the option the parallel
        # path needs so both stay selectable per query
        if "pageprober" not in self.options:
            # must be the PySpark error type: the engine's fallback to
            # simpleStreamReader catches PySparkNotImplementedError only
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader without pageprober"},
            )
        return PagedApiParallelStreamReader(self.options)


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming S1: each micro-batch pulls the next page per query.

    Offsets are {"key|term": next_page}; the engine checkpoints them, so
    a restarted query resumes exactly where the last committed batch
    ended — the formalization of the reference's timestamped-rerun
    cadence (etl_pipeline.py:68, .MISSING_LARGE_BLOBS) with exactly-once
    bookkeeping instead of filename conventions. The simple reader runs
    on the driver (fine for API-rate-bound ingestion); partition-parallel
    streaming needs the full DataSourceStreamReader, same layout.
    """

    def __init__(self, options: dict):
        self.keys = [k.strip() for k in options.get("keys", "").split(",") if k.strip()]
        self.terms = [t.strip() for t in options.get("terms", "").split(",") if t.strip()]
        self.fetcher = options["pagedfetcher"]
        self.page_size = int(options.get("pagesize", "20"))

    def initialOffset(self) -> dict:
        return {f"{k}|{t}": 0 for k in self.keys for t in self.terms}

    def read(self, start: dict):
        fetch = _resolve(self.fetcher)
        rows: list[tuple] = []
        end = dict(start)
        for qk, page in start.items():
            key, _, term = qk.partition("|")
            recs = fetch(key, term, page, self.page_size)
            if recs:
                end[qk] = page + 1
            for rec in recs:
                rows.append(
                    (
                        rec["id"],
                        rec.get("content"),
                        rec.get("date"),
                        rec.get("url"),
                        rec.get("subreddit"),
                    )
                )
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: re-fetch the pages in [start, end)
        fetch = _resolve(self.fetcher)
        rows: list[tuple] = []
        for qk, first in start.items():
            key, _, term = qk.partition("|")
            for page in range(first, end.get(qk, first)):
                for rec in fetch(key, term, page, self.page_size):
                    rows.append(
                        (
                            rec["id"],
                            rec.get("content"),
                            rec.get("date"),
                            rec.get("url"),
                            rec.get("subreddit"),
                        )
                    )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the fake API is stateless


class PagePartition(InputPartition):
    def __init__(self, key: str, term: str, page: int):
        self.key = key
        self.term = term
        self.page = page


class PagedApiParallelStreamReader(DataSourceStreamReader):
    """Partition-parallel streaming S1 (the scale path the simple reader
    documents): per micro-batch the driver advances offsets using only a
    cheap metadata probe (an API count/HEAD endpoint), and every (query,
    page) in the offset range becomes an ``InputPartition`` whose payload
    fetch runs ON EXECUTORS — a 119-query backfill pages in parallel
    across the cluster while offsets/commits stay exactly-once in the
    checkpoint."""

    def __init__(self, options: dict):
        self.keys = [k.strip() for k in options.get("keys", "").split(",") if k.strip()]
        self.terms = [t.strip() for t in options.get("terms", "").split(",") if t.strip()]
        self.fetcher = options["pagedfetcher"]
        self.prober = options["pageprober"]
        self.page_size = int(options.get("pagesize", "20"))

    def _queries(self):
        return [(k, t) for k in self.keys for t in self.terms]

    def initialOffset(self) -> dict:
        return {f"{k}|{t}": 0 for k, t in self._queries()}

    def latestOffset(self) -> dict:
        # re-probe each trigger: the batch is everything new since the
        # last commit. Pacing the batch SIZE here would be wrong — Spark
        # commits whatever this returns, so any pages partitions() held
        # back would be skipped forever; admission control belongs in the
        # probe (e.g. cap pages reported per trigger IN the endpoint).
        probe = _resolve(self.prober)
        return {f"{k}|{t}": probe(k, t, self.page_size) for k, t in self._queries()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for qk, first in start.items():
            key, _, term = qk.partition("|")
            parts.extend(
                PagePartition(key, term, p) for p in range(first, end.get(qk, first))
            )
        # Spark requires >=1 partition per batch; an empty batch means
        # everything is drained — emit a no-op partition
        return parts or [PagePartition("", "", -1)]

    def read(self, partition: PagePartition):
        if partition.page < 0:
            return
        fetch = _resolve(self.fetcher)
        for rec in fetch(partition.key, partition.term, partition.page, self.page_size):
            yield (
                rec["id"],
                rec.get("content"),
                rec.get("date"),
                rec.get("url"),
                rec.get("subreddit"),
            )

    def commit(self, end: dict) -> None:
        pass
