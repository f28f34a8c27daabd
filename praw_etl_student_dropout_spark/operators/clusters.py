"""Duplicate-cluster formation: connected components over near-dup pairs.

Pair emitters (exact fingerprints, n-gram Jaccard, MinHash/SimHash/LSH —
operators.dedup) stop at edges; keeping one representative per duplicate
GROUP needs the transitive closure: a~b and b~c must collapse a,b,c
together even when a~c was never emitted. Components come from min-label
propagation expressed as join+groupBy rounds — the standard scalable
formulation (each round is one shuffle; rounds ≈ cluster diameter, and
near-dup clusters are shallow). No graph library, no driver-side
adjacency: 100 TB of pairs is just a DataFrame here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with its component id (the component's min id).

    Iterates ``comp(v) = min(comp(v), min over neighbors comp(u))`` to a
    fixpoint. Each round materializes via ``localCheckpoint`` to cut the
    join-loop lineage (on a cluster with executor churn, swap in a
    reliable ``checkpoint`` dir); convergence is detected by counting
    changed labels, so the loop runs diameter+1 rounds, not ``max_iter``.

    Returns (id, comp).
    """
    verts = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    labels = verts.withColumn("comp", F.col("id"))
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy("b")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["b"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dup_clusters(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Collapse near-dup pairs into clusters: (comp_id, n_members).

    comp_id is the smallest member id — the deterministic survivor the
    dedup convention keeps (min-id tiebreak, matching dedup_by_key).
    """
    comps = connected_components(pairs, src=src, dst=dst)
    return comps.groupBy(F.col("comp").alias("comp_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
