"""Cache-lifetime helpers (SCALING.md §cache-contract).

Several operators persist an intermediate that is read more than once
inside their own plan (an LSH index feeding both sides of a self-join,
a TF table feeding both a DF aggregation and the final join). Lazy
evaluation means the operator cannot unpersist before returning — the
caller's action is what populates the cache — so by default those
persists live until LRU eviction or session end (MEMORY_AND_DISK, safe
but unowned).

Two ownership idioms close that gap:

- ``materialize_and_release(result, caches)``: eager mode. Persist and
  force the RESULT, then unpersist the intermediates; the returned
  DataFrame is cached and OWNED BY THE CALLER, who unpersists it when
  done (or lets a short-lived session end). Net effect: one owned cache
  instead of N unowned ones, and the intermediates are freed as soon as
  the result exists.
- ``scoped_persist(*dfs)``: context-manager for caller-driven
  pipelines — persist on entry, unpersist on exit, for when the caller
  controls the action boundary and wants deterministic release.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, caches: Sequence[DataFrame]) -> DataFrame:
    """Persist + force ``result``, then unpersist every intermediate in
    ``caches``. Returns the persisted result; the caller owns its
    lifetime (``.unpersist()`` when done)."""
    result = result.persist()
    result.count()
    for c in caches:
        c.unpersist()
    return result


@contextmanager
def scoped_persist(*dfs: DataFrame) -> Iterator[tuple[DataFrame, ...]]:
    """Persist the given DataFrames for the duration of the block and
    unpersist them on exit (including on error). Use when the caller
    triggers all actions that need the cache inside the block."""
    for d in dfs:
        d.persist()
    try:
        yield dfs
    finally:
        for d in dfs:
            d.unpersist()
