"""The engine's Python-UDF surface (SURVEY.md §2.9 U2, U5).

Only irreducibly-Python logic lives here — everything else in
``functions/`` compiles to native expressions. UDFs are Arrow-batched
``pandas_udf``s (vectorized transfer, ~10-100x over row-at-a-time).

Sentiment (etl_pipeline.py:78) is swappable: TextBlob when installed
(reference parity), else the deterministic lexicon scorer that the
DuckDB oracle can also compute (SURVEY §7 sentiment-parity watch-list).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .text import NEG_WORDS, POS_WORDS

try:  # optional dependency — not in this container
    from textblob import TextBlob  # type: ignore

    HAVE_TEXTBLOB = True
except ImportError:
    TextBlob = None
    HAVE_TEXTBLOB = False


@pandas_udf(T.DoubleType())
def textblob_sentiment(texts: pd.Series) -> pd.Series:
    """TextBlob polarity, Arrow-vectorized (reference etl_pipeline.py:78).
    Raises if TextBlob is absent — callers choose via ``sentiment_udf``."""
    if not HAVE_TEXTBLOB:
        raise NotImplementedError("textblob not installed; use lexicon_sentiment")
    return texts.fillna("").map(lambda t: TextBlob(t).sentiment.polarity)


@pandas_udf(T.DoubleType())
def lexicon_sentiment_udf(texts: pd.Series) -> pd.Series:
    """Pandas-UDF twin of functions.text.sentiment_score — same math,
    Python path. Exists to exercise/benchmark the UDF boundary; the
    native expression is the production default."""
    pos, neg = set(POS_WORDS), set(NEG_WORDS)

    def score(t: str) -> float:
        toks = t.split()
        if not toks:
            return 0.0
        p = sum(1 for w in toks if w in pos)
        n = sum(1 for w in toks if w in neg)
        return (p - n) / max(len(toks), 1)

    return texts.fillna("").map(score)


def sentiment_udf(col: Column, prefer_textblob: bool = True) -> Column:
    """U2 dispatch: TextBlob when available and requested, else lexicon."""
    if prefer_textblob and HAVE_TEXTBLOB:
        return textblob_sentiment(col)
    return lexicon_sentiment_udf(col)


@pandas_udf(T.DoubleType())
def grouped_weighted_mean(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """U5 — GROUPED_AGG pandas UDAF example: weighted mean. Used with
    ``df.groupBy(k).agg(grouped_weighted_mean(col, w))``."""
    den = weights.sum()
    return float((values * weights).sum() / den) if den else 0.0
