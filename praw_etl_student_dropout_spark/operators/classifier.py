"""Hashed-feature linear classifier scoring (LLM-pipeline quality gate).

The curation stacks behind GPT-3 (Brown et al. 2020, Appendix A) and
CCNet/LLaMA filter web documents with a cheap LINEAR classifier over
hashed bag-of-words features (fastText-style hashing trick: token →
``hash(token) mod D`` bucket, score = σ(w·x + b)). The reference repo
has no classifier stage — this is part of the engine's ⊕ LLM-pipeline
mandate, and it is deliberately split model-from-plumbing:

- TRAINING happens offline (fastText, sklearn, anything); the model
  arrives here as a plain ``list[float]`` of D bucket weights + a bias.
- SCORING is what must scale, and it is the part the engine owns: the
  weight vector is inlined as a LITERAL array (ConstantFolding collapses
  it once), each document's score is a row-local ``F.aggregate`` dot
  product over its token buckets — NO explode of the token stream, NO
  join, NO shuffle, NO Python. A 100 TB corpus is scored in one narrow
  scan, exactly like u6_gopher_rules.

The token→bucket hash is the engine-portable md5 road (first 8 hex
digits mod D — operators/sampling.py::hash_coin precedent), so any SQL
engine reproduces the same buckets and the whole scorer is
oracle-checkable end-to-end.

``lexicon_weights`` builds a deterministic demo model from word lists
(prose indicators +1, boilerplate/junk −1) so the catalog entry needs no
external artifact; real deployments pass their trained weights instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket(tok: Column, dim: int) -> Column:
    """Engine-portable hashing trick: md5-derived bucket in [0, dim)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"), F.lit(dim)
    )


def lexicon_weights(
    dim: int, positive: list[str], negative: list[str]
) -> list[float]:
    """Deterministic demo model: +1 per positive word's bucket, −1 per
    negative word's (colliding words sum). Stands in for a trained
    fastText/logreg weight vector — same shape, same scoring path."""
    import hashlib

    w = [0.0] * dim
    for words, delta in ((positive, 1.0), (negative, -1.0)):
        for word in words:
            b = int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % dim
            w[b] += delta
    return w


def hashed_linear_score(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with σ(w·x + b) over mean-normalized hashed
    bag-of-words features, entirely row-locally.

    x = (1/n) Σ_tokens e_bucket(token): each token contributes
    weights[bucket]/n, so w·x is an order-independent exact sum whenever
    the weights are integer-valued (the demo lexicon model) and
    bit-stable regardless of partitioning either way. ``keep`` is
    decided on the raw margin's sign (dot > −bias·n for n>0; the sign
    of the bias alone for empty documents, so keep and margin_prob =
    σ(bias) agree on the n=0 edge), never on the rounded probability —
    no float-boundary flakiness.

    Returns (id_col, n_tokens, dot, margin_prob, keep).
    """
    from ..functions.text import token_count, tokens

    dim = len(weights)
    arr = F.array(*[F.lit(float(v)) for v in weights])
    t = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    dot = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(
                t,
                lambda tok: F.element_at(
                    arr, (token_bucket(tok, dim) + 1).cast("int")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    z = F.when(n == 0, F.lit(bias)).otherwise(F.lit(bias) + dot / n)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        id_col,
        n.alias("n_tokens"),
        F.round(dot, 6).alias("dot"),
        F.round(prob, 6).alias("margin_prob"),
        F.when(n == 0, F.lit(bias > 0))
        .otherwise(dot + F.lit(bias) * n > 0)
        .alias("keep"),
    )
