"""Similarity search over embedding columns (SURVEY.md §2.9 U7 ⊕).

Two paths:
- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (queries are few; the corpus is the 100 TB side), scores are computed
  with codegen'd ``zip_with``/``aggregate`` array math, and per-query
  top-k goes through a window — the corpus is scanned once, never
  collected.
- ``ivf_topk``: IVF-style approximate search. Corpus vectors are
  assigned to their nearest centroid ONCE (an O(n·k) narrow map with the
  centroid table broadcast); queries probe only the ``nprobe`` nearest
  centroid partitions, turning the scan into an equi-join on
  centroid_id. This is the standard inverted-file ANN layout; at scale
  the corpus would be written partitioned by centroid_id so probes
  become partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_from_norms, cosine_similarity, dot_product, l2_norm


def _score(metric: str, q: F.Column, c: F.Column) -> F.Column:
    if metric == "cosine":
        return cosine_similarity(q, c)
    if metric == "dot":
        return dot_product(q, c)
    raise ValueError(f"unknown metric {metric!r}")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k per query: broadcast(queries) × corpus → score →
    window top-k with deterministic (score desc, corpus_id asc) order.
    Returns (query_id, vec_id, score, rank)."""
    if metric == "cosine":
        # Hoist the norms out of the N×M join: each side's l2_norm is a
        # deterministic per-row fold, so computing it once per side (not
        # once per pair) is bit-identical and 3x less array work.
        q = queries.withColumn("__qn", l2_norm(F.col(query_vec)))
        c = corpus.withColumn("__cn", l2_norm(F.col(corpus_vec)))
        score = cosine_from_norms(
            dot_product(F.col(query_vec), F.col(corpus_vec)), F.col("__qn"), F.col("__cn")
        )
    else:
        q, c = queries, corpus
        score = _score(metric, F.col(query_vec), F.col(corpus_vec))
    scored = F.broadcast(q).crossJoin(c).select(
        F.col(query_id),
        F.col(corpus_id),
        score.alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("score", 6).alias("score"), "rank")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (argmax cosine).

    Broadcast nested-loop over the (small) centroid table + window
    rank=1 — a one-time index build, amortized over all queries.
    """
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(corpus_id),
        F.col(corpus_vec),
        F.col(centroid_id),
        cosine_similarity(F.col(corpus_vec), F.col(centroid_vec)).alias("c_score"),
    )
    w = Window.partitionBy(corpus_id).orderBy(F.desc("c_score"), F.asc(centroid_id))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(corpus_id, corpus_vec, centroid_id)
    )


def sample_centroids(
    corpus: DataFrame,
    num_centroids: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Deterministic centroid seed set: every (n/k)-th vector by id.

    A k-means refinement pass can replace this without changing the
    query path; determinism matters more than centroid quality for
    reproducible tests.
    """
    n = corpus.count()
    stride = max(n // num_centroids, 1)
    return (
        corpus.filter((F.col(corpus_id) % stride == 0) & (F.col(corpus_id) / stride < num_centroids))
        .select(
            (F.col(corpus_id) / stride).cast("int").alias("centroid_id"),
            F.col(corpus_vec).alias("centroid_vec"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus_indexed: DataFrame,
    centroids: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroids only.

    corpus_indexed = output of ``assign_centroids``. The query→centroid
    scoring is tiny (|Q|×|C|); the heavy step is an equi-join on
    centroid_id that touches ~nprobe/num_centroids of the corpus.
    """
    q_probe = F.broadcast(queries).crossJoin(F.broadcast(centroids)).select(
        F.col(query_id),
        F.col(query_vec),
        F.col("centroid_id"),
        cosine_similarity(F.col(query_vec), F.col("centroid_vec")).alias("c_score"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.desc("c_score"), F.asc("centroid_id"))
    probes = q_probe.withColumn("__r", F.row_number().over(wq)).filter(F.col("__r") <= nprobe).select(
        query_id, query_vec, "centroid_id"
    )
    scored = probes.withColumn("__qn", l2_norm(F.col(query_vec))).join(
        corpus_indexed.withColumn("__cn", l2_norm(F.col(corpus_vec))), on="centroid_id"
    ).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_from_norms(
            dot_product(F.col(query_vec), F.col(corpus_vec)), F.col("__qn"), F.col("__cn")
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("score", 6).alias("score"), "rank")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iterations: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of the IVF centroid table (iterative, batch).

    Each iteration: (1) assign — broadcast the centroid table, argmax
    cosine per vector (narrow, no shuffle of the corpus); (2) update —
    posexplode to (centroid, dim, value), partial-agg means per
    (centroid, dim), rebuild the centroid arrays. The corpus is never
    collected; per-iteration shuffle volume is n_centroids × dim after
    the map-side combine. ``localCheckpoint`` truncates the lineage each
    round — without it the plan doubles per iteration and analysis cost
    explodes long before the data does.

    Not SQL-expressible as one query (iterative fixpoint) — driver
    checks rows-only; pytest checks invariants + recall.
    """
    for _ in range(iterations):
        assigned = assign_centroids(corpus, centroids, corpus_id=corpus_id, corpus_vec=corpus_vec)
        dims = assigned.select(
            "centroid_id", F.posexplode(corpus_vec).alias("pos", "val")
        )
        means = dims.groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
        centroids = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"]).alias("centroid_vec"),
            )
        )
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def hashing_embed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 128,
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashing ("hashing trick") document embeddings, fully
    native: token → xxhash64 bucket with a ±1 sign hash, summed per
    bucket, densified via map lookup over a static index sequence. No
    vocabulary, no model, no Python — one narrow pass plus one shuffle
    on the doc id, so it runs at corpus scale and its output feeds
    ``brute_force_topk`` / ``assign_centroids`` / ``embedding_dup_pairs``
    unchanged (text similarity without an embeddings table).

    Deterministic (hash-seeded), so approximate text search results are
    reproducible run to run.
    """
    from ..functions.text import clean_text, tokens

    tok = F.explode(tokens(clean_text(F.col(text_col)))).alias("tok")
    exploded = docs.select(F.col(id_col), tok).filter(F.length("tok") > 0)
    bucket = F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int")
    sign = F.when(F.pmod(F.xxhash64("tok", F.lit(1)), 2) == 0, 1.0).otherwise(-1.0)
    per_bucket = exploded.select(F.col(id_col), bucket.alias("b"), sign.alias("s")).groupBy(
        id_col, "b"
    ).agg(F.sum("s").alias("w"))
    as_map = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "w"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        # element_at on a MAP takes the key itself (buckets are 0-based) —
        # array-style i+1 here would silently drop bucket 0
        lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
    )
    out = as_map.select(F.col(id_col), dense.alias("embedding"))
    if normalize:
        norm = F.greatest(l2_norm(F.col("embedding")), F.lit(1e-12))
        out = out.select(
            id_col,
            F.transform("embedding", lambda x: x / norm).alias("embedding"),
        )
    return out
