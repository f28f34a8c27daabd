from .text import (
    NEG_WORDS,
    POS_WORDS,
    STOPWORDS,
    clean_text,
    doc_fingerprint,
    dropout_mentioned,
    lang_id,
    quality_score,
    rolling_hash,
    sentiment_label,
    sentiment_score,
    token_count,
    tokens,
)
from .arrays import cosine_similarity, dot_product, l2_norm
from .json_fns import json_get

__all__ = [
    "NEG_WORDS",
    "POS_WORDS",
    "STOPWORDS",
    "clean_text",
    "doc_fingerprint",
    "dropout_mentioned",
    "lang_id",
    "quality_score",
    "rolling_hash",
    "sentiment_label",
    "sentiment_score",
    "token_count",
    "tokens",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "json_get",
]
