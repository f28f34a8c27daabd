"""Document chunking (LLM-pipeline mandate: the step between cleaning
and embedding/training).

Token-window chunks with overlap, entirely native: tokenize → compute
the chunk count per document → ``sequence`` + ``posexplode`` fan the
chunk indices out inside the executor → ``slice`` materializes each
window. One narrow pass, no shuffle, no Python — at corpus scale chunk
explosion is embarrassingly parallel and output size is the only cost.

Chunk layout: chunk i covers tokens [i*stride, i*stride + chunk_size)
with stride = chunk_size - overlap; every token belongs to at least one
chunk; documents shorter than the overlap still yield one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_by_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Returns (id, chunk_no, chunk_text, n_chunk_tokens).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))), F.lit(1)
    ).cast("int")
    with_chunks = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
    )
    chunk_toks = F.slice(
        F.col("__toks"), F.col("chunk_no") * stride + 1, chunk_size
    )
    return with_chunks.select(
        id_col,
        "chunk_no",
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
        F.size(chunk_toks).alias("n_chunk_tokens"),
    )
