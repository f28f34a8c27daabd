"""Python UDTFs (SURVEY.md §2.9 U5 — the table-function half).

The hot-path form of row fan-out in this engine is native
sequence+explode (operators/chunking.py): zero Python, zero shuffle.
A Python UDTF is the API surface for fan-out logic that genuinely needs
an imperative body (external tokenizers, parsers, model-driven
splitters) — one input row yields many output rows, executed in the
Arrow-batched Python worker like any pandas UDF.

Keep UDTFs off columns the optimizer could otherwise prune or push
through: a UDTF is a black box to Catalyst, so apply it after filters.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no int, chunk_text string, n_tokens int")
class ChunkTextUDTF:
    """Non-overlapping token-window chunker as a table function.

    The declarative twin (same semantics, JVM-side) is
    ``operators.chunking.chunk_by_tokens`` with overlap=0 — prefer that
    in pipelines; this class exists to cover the Spark 4 Python UDTF
    surface end-to-end (registration, LATERAL invocation, worker-side
    package import).
    """

    def eval(self, text: str, chunk_size: int = 64):  # noqa: D102
        if text is None or chunk_size is None or chunk_size <= 0:
            return
        toks = text.split()
        for i, start in enumerate(range(0, len(toks), chunk_size)):
            window = toks[start : start + chunk_size]
            yield i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``LATERAL chunk_text(...)``)."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
