"""Array/vector expressions (SURVEY.md §2.8 F10, §2.9 U7).

Dot products and norms over ``array<float>`` embedding columns, built
from ``zip_with`` + ``aggregate`` so they compile to codegen'd loops in
the JVM — no Python boundary. All math is done in double precision
(floats upcast first) so results are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_array(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, left-to-right double accumulation."""
    return _sum_array(F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a|| * ||b||); null-safe via greatest-epsilon guard."""
    denom = l2_norm(a) * l2_norm(b)
    return dot_product(a, b) / F.greatest(denom, F.lit(1e-12))


def cosine_from_norms(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine when the norms are already materialized as columns.

    ``l2_norm`` is a deterministic fold of the array, so hoisting it out
    of an N×M scoring join (compute once per side, not once per pair)
    produces bit-identical scores with 3x fewer array traversals."""
    return dot / F.greatest(norm_a * norm_b, F.lit(1e-12))
