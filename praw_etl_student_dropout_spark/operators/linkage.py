"""Probabilistic record linkage — Fellegi & Sunter (JASA 1969), the
model behind every modern ER engine (Splink, dedupe.io).

Candidate pairs come from a BLOCKING join (equi-key, PassJoin segments,
or LSH bands — never all-pairs); each pair's field-agreement pattern is
scored with log-likelihood weights log2(m/u) (agree) or
log2((1-m)/(1-u)) (disagree), where m = P(agree | match) and
u = P(agree | non-match). The total score classifies the pair against
(lower, upper) thresholds into non-match / possible / match.

Engine-parity note: the weights are computed DRIVER-side in Python and
inlined as full-precision literals, so both Spark and any SQL oracle sum
the exact same doubles — log2 evaluated inside two different engines can
differ in the last ulp, a pair score must not.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement_weight, disagreement_weight) = log2 likelihood ratios."""
    if not (0.0 < u < m < 1.0):
        raise ValueError(f"need 0 < u < m < 1, got m={m} u={u}")
    return math.log2(m / u), math.log2((1.0 - m) / (1.0 - u))


def fellegi_sunter_score(
    pairs: DataFrame,
    fields: dict[str, tuple[Column, float, float]],
    lower: float = 0.0,
    upper: float = 6.0,
) -> DataFrame:
    """Score candidate pairs: ``fields`` maps a field name to
    (agreement_predicate, m, u). Adds ``w_<field>`` per-field weights,
    ``fs_score`` (rounded to 6), and ``match_class`` in
    {'non_match', 'possible', 'match'}.

    Pure per-row arithmetic over the (already-blocked) pair table — no
    shuffle; the expensive part of linkage is candidate generation,
    which belongs to the blocking operator (passjoin_pairs /
    minhash_dedup_pairs / an equi-key join).
    """
    out = pairs
    score = F.lit(0.0)
    for name, (agree, m, u) in fields.items():
        wa, wd = fs_weights(m, u)
        w = F.when(agree, F.lit(wa)).otherwise(F.lit(wd))
        out = out.withColumn(f"w_{name}", w)
        score = score + F.col(f"w_{name}")
    out = out.withColumn("fs_score", F.round(score, 6))
    return out.withColumn(
        "match_class",
        F.when(F.col("fs_score") >= upper, "match")
        .when(F.col("fs_score") >= lower, "possible")
        .otherwise("non_match"),
    )
