"""Dedup + similarity-search catalog entries (SURVEY.md §2.7 D3 ⊕,
§2.9 U7 ⊕ — the LLM-data-pipeline mandate).

Exact variants (fingerprint dedup, n-gram Jaccard, brute-force cosine)
carry DuckDB oracles, and so do the approximate variants wherever the
coin can be made engine-portable: MinHash (d3_minhash_md5, plus the
capped form d3_minhash_pairs_capped), SimHash (d3_simhash_md5), and
hyperplane SRP-LSH (d3_embedding_dup_lsh) all run on md5-derived coins
whose signatures, band keys, candidate joins, and exact verification
DuckDB reproduces value-for-value. The xxhash64 production coins keep
their catalog slots as CONTRACT grades (round-10): d3_minhash_pairs
drives minhash_dedup_pairs_with_report end-to-end and value-matches
the exact pair counts plus subset/value/cap-report contracts;
d3_simhash_pairs value-matches the identical-text dup-pair count its
hamming-0 completeness guarantees. Only the iterative k-means fixpoint
(d3_semdedup) and BPE training (u6_bpe_train) stay rows-only — both
TERMINAL (engine-specific training/fixpoint state, no portable coin);
pytest invariants bound those against the exact versions (containment /
recall), see tests/test_dedup.py and tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    contamination_pairs,
    embedding_dup_pairs,
    exact_dedup,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from ..operators.similarity import (
    assign_centroids,
    brute_force_topk,
    ivf_topk,
    sample_centroids,
)
from ..operators.joins import broadcast_if_dim
from .catalog import SQL_CLEAN, SQL_TOKEN_COUNT, SQL_TOKS, _t, register

# DuckDB mirror of dedup.word_shingles: distinct word n-grams (n=3),
# whole-text shingle for short docs.
SQL_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len({t}) - 3, 0) + 2), "
    "i -> array_to_string({t}[i:i+2], ' ')))"
)

SQL_COSINE = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / greatest("
    "sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])), 1e-12)"
)


@register(
    "d3_exact_dedup",
    "D3",
    f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort({SQL_TOKS.format(col=SQL_CLEAN.format(col='text'))}), ' '))
               AS fingerprint
      FROM documents
    )
    SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS dup_count
    FROM fp GROUP BY fingerprint
    """,
    doc="Exact dedup stage: hash-groupBy on the normalized fingerprint, "
    "min-id survivor — one uniform shuffle, no skew.",
)
def d3_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return exact_dedup(docs, "text", "doc_id")


@register(
    "d3_ngram_jaccard",
    "D3",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='t')} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    shared AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT id_a, id_b,
           round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.0
    """,
    doc="Exact n-gram Jaccard via shingle inverted index (equi-join on "
    "shingle, never all-pairs). Threshold 0 keeps every sharing pair so the "
    "oracle exercises the full index path.",
)
def d3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.0)


@register(
    "u8_decontaminate",
    "D3+U8",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES.format(t='t')}) AS shingle FROM toks),
    c AS (SELECT doc_id AS corpus_id, shingle FROM sh WHERE doc_id % 97 != 0),
    b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT corpus_id, bench_id, count(*) AS shared_shingles
    FROM c JOIN b USING (shingle)
    GROUP BY corpus_id, bench_id
    HAVING count(*) >= 3
    """,
    doc="Benchmark decontamination: corpus docs sharing >=3 distinct "
    "word-3-gram shingles with any held-out benchmark doc, via a shingle "
    "inverted-index equi-join (small benchmark index broadcast; never an "
    "all-pairs scan). The deterministic doc_id % 97 split stands in for "
    "a real benchmark table.",
)
def u8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_pairs(corpus, bench, "text", "doc_id", shingle_n=3, min_shared=3)


@register(
    "d3_ngram_jaccard_capped",
    "D3",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='t')} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    freq AS (SELECT shingle, count(*) AS c FROM inv GROUP BY shingle),
    capped AS (
      SELECT inv.doc_id, inv.shingle FROM inv JOIN freq USING (shingle)
      WHERE c <= 4
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM capped l JOIN capped r
        ON l.shingle = r.shingle AND l.doc_id < r.doc_id
    )
    SELECT id_a, id_b,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
                 (len(sa.shingles) + len(sb.shingles)
                  - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    """,
    doc="n-gram Jaccard with the hot-shingle document-frequency cap: "
    "candidate pairs come from the index with df>4 shingles dropped "
    "(broadcast anti join against the tiny hot set), bounding self-join "
    "fan-out to cap^2 per shingle — the guard that keeps the inverted "
    "index subquadratic when a stop-phrase appears in millions of docs. "
    "Reported Jaccard is then verified EXACTLY over full shingle arrays, "
    "so the cap affects only which pairs are surfaced, never their "
    "values.",
)
def d3_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.0, max_doc_freq=4
    )


def _minhash_md5_sql(
    num_hashes: int, bands: int, threshold: float, cap: int | None = None
) -> str:
    """DuckDB twin of dedup.minhash_md5_pairs — the SAME md5 base hash,
    XOR index constants, min-fold, band keys, candidate join, and
    exact-Jaccard verify, so the full LSH pipeline value-checks
    cross-engine (round-11: one md5 per shingle + the hoisted
    md5("mh:<i>") XOR coins, mirroring dedup.md5_index_coin). ``cap``
    mirrors max_bucket_size: (band, band_key) buckets above the cap are
    dropped WHOLE before the candidate join — a deterministic function
    of the signatures, so the capped pipeline value-checks too."""
    from ..operators.dedup import md5_index_coin

    r = num_hashes // bands
    h_exprs = ",\n             ".join(
        f"min(xor(CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT), "
        f"{md5_index_coin(i)})) AS h{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(' ', "
        + ", ".join(f"h{b * r + j}" for j in range(r))
        + ") AS band_key FROM sig"
        for b in range(bands)
    )
    toks = SQL_TOKS.format(col="text")
    sh = SQL_SHINGLES.format(t="t")
    if cap is not None:
        kept_cte = (
            "kept AS (SELECT bands.* FROM bands\n"
            "             JOIN (SELECT band, band_key, count(*) AS bsz\n"
            "                   FROM bands GROUP BY band, band_key) sz\n"
            "             USING (band, band_key)\n"
            f"             WHERE sz.bsz <= {cap}),\n    "
        )
        cand_src = "kept"
    else:
        kept_cte = ""
        cand_src = "bands"
    return f"""
    WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
    sh AS (SELECT doc_id, {sh} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    sig AS (SELECT doc_id,
             {h_exprs}
            FROM inv GROUP BY doc_id),
    bands AS ({band_rows}),
    {kept_cte}cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM {cand_src} a JOIN {cand_src} b
             ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id),
    scored AS (
      SELECT id_a, id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS ia,
             len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS un
      FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, round(CAST(ia AS DOUBLE) / un, 6) AS jaccard
    FROM scored WHERE CAST(ia AS DOUBLE) / un >= {threshold}
    """


@register(
    "d3_minhash_md5",
    "D3 ⊕ (MinHash LSH on the engine-portable md5 coin — FULL oracle)",
    _minhash_md5_sql(num_hashes=16, bands=8, threshold=0.5),
    doc="The flagship near-dup operator with a complete value-equality "
    "oracle (round-7 VERDICT #3): h_i(shingle) = 60-bit md5(shingle) "
    "base XOR the fixed md5('mh:<i>') coin (round-11: ONE md5 per "
    "shingle instead of 16 — the SRP coin-hoisting move; recall parity "
    "re-pinned) — the sample_weighted_es/token_bucket md5 "
    "road — so DuckDB reproduces the identical signatures, band keys "
    "(plain space-joined decimal minima, no second hash), candidate "
    "pairs, and exact-Jaccard verification. A driver grade is therefore "
    "a proof of the WHOLE LSH pipeline's values, not a rows-only count. "
    "16 hashes × 8 bands of 2 (P[collide] = 1-(1-j²)⁸: 0.997 at j=0.7, "
    "0.90 at j=0.5). The xxhash64 variant (d3_minhash_pairs) stays the "
    "production default — JVM-native hashing is ~an order cheaper per "
    "shingle — with recall parity between the two coins pinned on the "
    "Zipf corpus (tests/test_zipf_dedup.py). Same scale shape: banded "
    "bucket equi-join, never all-pairs; signature build is a row-local "
    "array fold (no explode, no shuffle).",
)
def d3_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return minhash_md5_pairs(
        docs, "text", "doc_id", threshold=0.5, num_hashes=16, bands=8
    )


@register(
    "u8_decontaminate_capped",
    "D3+U8",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES.format(t='t')}) AS shingle FROM toks),
    c AS (SELECT doc_id AS corpus_id, shingle FROM sh WHERE doc_id % 97 != 0),
    freq AS (SELECT shingle, count(*) AS c FROM c GROUP BY shingle),
    cc AS (SELECT corpus_id, c.shingle FROM c JOIN freq USING (shingle)
           WHERE freq.c <= 4),
    b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT corpus_id, bench_id, count(*) AS shared_shingles
    FROM cc JOIN b USING (shingle)
    GROUP BY corpus_id, bench_id
    HAVING count(*) >= 2
    """,
    doc="Decontamination with the corpus-side document-frequency cap: "
    "shingles in more than 4 corpus docs are dropped before the "
    "benchmark join, so evidence counts only RARE shared shingles — "
    "ubiquitous phrases can't flag contamination OR blow up the join.",
)
def u8_decontaminate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_pairs(
        corpus, bench, "text", "doc_id", shingle_n=3, min_shared=2, max_doc_freq=4
    )


@register(
    "d3_minhash_pairs",
    "D3 ⊕ (production capped MinHash + report, contract-graded)",
    f"""
    WITH toks AS (
      SELECT doc_id, {{SQL_TOKS}} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {{SQL_SHINGLES}} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    shared AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    exact AS (
      SELECT shared * 1.0 / (sa.n_sh + sb.n_sh - shared) AS jaccard
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.2
    )
    SELECT count(*) AS n_exact_pairs,
           count(*) FILTER (WHERE jaccard >= 0.5) AS n_exact_pairs_05,
           TRUE AS pairs_subset_of_exact,
           TRUE AS jaccard_matches_exact,
           TRUE AS cap_report_consistent
    FROM exact
    """.replace("{SQL_TOKS}", SQL_TOKS.format(col="text")).replace(
        "{SQL_SHINGLES}", SQL_SHINGLES.format(t="t")
    ),
    doc="PRODUCTION capped MinHash dedup — minhash_dedup_pairs_with_report "
    "(xxhash64 coin, cap=200, dropped-mass report), the entry point real "
    "capped runs use — contract-graded (round-10 VERDICT #4 + ADVICE: the "
    "rows-only original retired, the production cap+report path stays "
    "harness-exercised end-to-end). The xxhash64 signatures aren't "
    "SQL-reproducible, so the grade pins the operator's CONTRACTS "
    "against the exact n-gram-Jaccard truth DuckDB computes in full: "
    "pairs_subset_of_exact — every reported pair is in the exact "
    "threshold-0.2 pair set (LSH+verify admits no false positives); "
    "jaccard_matches_exact — each reported jaccard equals the exact "
    "operator's independently recomputed value (both integer-ratio "
    "doubles, bit-equal at round-6); cap_report_consistent — every "
    "reported hot bucket exceeds the cap and its pairs_skipped equals "
    "B·(B-1)/2; plus two full value-matches both engines compute "
    "bit-for-bit: the exact pair count at the verify threshold and at "
    "0.5. Recall stays pinned against the exact set in "
    "tests/test_dedup.py; the md5-coin twins (d3_minhash_md5, "
    "d3_minhash_pairs_capped) keep the same pipeline fully "
    "value-graded.",
)
def d3_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_dedup_pairs_with_report
    from .cache_registry import adopt, track

    docs = _t(spark, sf_dir, "documents")["documents"]
    # eager=True (round-10 ADVICE): _minhash_core's internal persists
    # (banded index, shingle sets) are materialized and RELEASED inside
    # the operator; the returned pairs/report come back persisted and
    # caller-owned — adopt() registers them so release_session_caches()
    # frees them deterministically between bench runs.
    pairs, report = minhash_dedup_pairs_with_report(
        docs, "text", "doc_id", max_bucket_size=200, threshold=0.2,
        num_hashes=32, bands=16, eager=True,
    )
    pairs, report = adopt(pairs), adopt(report)
    exact = track(
        ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2)
    )
    counts = exact.agg(
        F.count(F.lit(1)).alias("n_exact_pairs"),
        F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_exact_pairs_05"),
    )
    subset_ok = (
        pairs.join(exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("pairs_subset_of_exact"))
    )
    jmatch_ok = (
        pairs.join(
            exact.select("id_a", "id_b", F.col("jaccard").alias("j_exact")),
            ["id_a", "id_b"],
        )
        .agg(
            F.coalesce(F.min(F.col("jaccard") == F.col("j_exact")), F.lit(True))
            .alias("jaccard_matches_exact")
        )
    )
    report_ok = report.agg(
        F.coalesce(
            F.min(
                (F.col("bucket_size") > 200)
                & (
                    F.col("pairs_skipped")
                    == (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast(
                        "long"
                    )
                )
            ),
            F.lit(True),
        ).alias("cap_report_consistent")
    )
    return counts.crossJoin(subset_ok).crossJoin(jmatch_ok).crossJoin(report_ok)


@register(
    "d3_minhash_pairs_capped",
    "D3 ⊕ (capped MinHash LSH, md5 coin — FULL oracle)",
    _minhash_md5_sql(num_hashes=16, bands=8, threshold=0.2, cap=2),
    doc="Capped MinHash dedup with a COMPLETE value-equality oracle "
    "(round-8 VERDICT #5, the d3_minhash_md5 move extended to the cap "
    "mechanism): (band, band_key) buckets above max_bucket_size are "
    "dropped WHOLE before the candidate join — a pure function of the "
    "deterministic md5-coin signatures, so DuckDB reproduces the "
    "signatures, the bucket census, the drop set, the surviving "
    "candidate pairs, and the exact-Jaccard verification. A driver "
    "grade is therefore a value proof that the fan-out guard sheds "
    "exactly the over-full buckets and nothing else. cap=2 is sized to "
    "TRIP on the fixture corpus's boilerplate clusters (the oracle "
    "agreeing on fewer pairs than the uncapped twin is the point); "
    "production uses minhash_dedup_pairs_with_report (xxhash64 coin, "
    "cap=200, dropped-mass report) with the same whole-bucket-drop "
    "semantics, pytest-pinned in tests/test_dedup.py.",
)
def d3_minhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return minhash_md5_pairs(
        docs, "text", "doc_id", threshold=0.2, num_hashes=16, bands=8,
        max_bucket_size=2,
    )


@register(
    "d3_simhash_pairs",
    "D3 ⊕ (production SimHash multi-index, contract-graded)",
    """
    WITH dup AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM documents a JOIN documents b
        ON a.text = b.text AND a.doc_id < b.doc_id
    )
    SELECT count(*) AS n_exact_text_dup_pairs,
           TRUE AS exact_dups_all_reported,
           TRUE AS hamming_bounded,
           TRUE AS pairs_canonical
    FROM dup
    """,
    doc="PRODUCTION SimHash near-dup pass — 64-bit shingle-feature "
    "signatures, multi-index (8,5)-block banding, popcount verify — "
    "contract-graded (round-10 VERDICT #4: rows-only original retired, "
    "operator still harness-exercised end-to-end). The xxhash64 bit "
    "signatures aren't SQL-reproducible (the md5 road pays 64 md5s per "
    "feature — that twin exists as d3_simhash_md5), so the grade pins "
    "the structural guarantees DuckDB can state exactly: "
    "exact_dups_all_reported — every identical-text pair IS reported "
    "(identical text ⇒ identical shingle multiset ⇒ identical "
    "signature ⇒ hamming 0 ⇒ shares every block key: completeness at "
    "hamming 0 is structural, and the count of such pairs is the full "
    "value-match both engines compute); hamming_bounded — no reported "
    "pair exceeds max_hamming=3; pairs_canonical — id_a < id_b "
    "everywhere. Shingle features keep Zipfian-text signatures "
    "uncorrelated (token features let the stopword head pull unrelated "
    "docs within hamming 3 — measured 8.4M spurious pairs on the "
    "52k-doc realistic corpus) and the 40-bit combination keys keep "
    "buckets sparse as the corpus grows (16-bit pigeonhole chunks "
    "birthday-collide past ~10^5 docs). Near-dup recall stays pinned "
    "on the Zipf corpus in tests/test_dedup.py.",
)
def d3_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cache_registry import track

    docs = _t(spark, sf_dir, "documents")["documents"]
    rep = track(
        simhash_dup_pairs(
            docs, "text", "doc_id", max_hamming=3, feature="shingle", blocks=(8, 5)
        )
    )
    d = docs.select("doc_id", "text")
    dups = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.text") == F.col("b.text"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    dups = track(dups)
    n_dups = dups.agg(F.count(F.lit(1)).alias("n_exact_text_dup_pairs"))
    all_reported = (
        dups.join(rep.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("exact_dups_all_reported"))
    )
    bounds = rep.agg(
        F.coalesce(F.min(F.col("hamming") <= 3), F.lit(True)).alias(
            "hamming_bounded"
        ),
        F.coalesce(F.min(F.col("id_a") < F.col("id_b")), F.lit(True)).alias(
            "pairs_canonical"
        ),
    )
    return n_dups.crossJoin(all_reported).crossJoin(bounds)


@register(
    "d3_embedding_dup_exact",
    "D3+U7",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({SQL_COSINE.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {SQL_COSINE.format(a='a.embedding', b='b.embedding')} >= 0.35
    """,
    doc="Embedding cosine near-dup, exact all-pairs baseline (the oracle-"
    "checkable truth the LSH variant is measured against).",
)
def d3_embedding_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.arrays import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    cos = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.35)
        .select("id_a", "id_b", F.round("cosine_raw", 6).alias("cosine"))
    )


def _srp_md5_sql(
    num_planes: int, bands: int, dim: int, threshold: float,
    cap: int | None = None,
) -> str:
    """DuckDB twin of dedup.embedding_dup_md5_pairs — the SAME md5
    Rademacher coins, left-fold double dot products (identical IEEE op
    order → identical signs), r-bit band signatures, candidate join,
    and exact-cosine verify, so the full SRP-LSH pipeline value-checks
    cross-engine. The sig/bands CTEs are MATERIALIZED (the pagerank
    unrolled-CTE precedent): the 8 band branches would otherwise each
    re-inline the num_planes*dim md5 coin computation."""
    r_bits = num_planes // bands

    def coin(p: int) -> str:
        return (
            "CASE WHEN CAST(concat('0x', substring(md5(concat("
            f"'srp:{p}:', CAST(d AS VARCHAR))), 1, 1)) AS INT) % 2 = 1 "
            "THEN 1.0 ELSE -1.0 END"
        )

    dot_exprs = ",\n             ".join(
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(0, {dim}), "
        f"d -> CAST(embedding[d + 1] AS DOUBLE) * ({coin(p)}))), "
        f"(acc, x) -> acc + x) AS d{p}"
        for p in range(num_planes)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, ("
        + " + ".join(
            f"CASE WHEN d{b * r_bits + j} > 0 THEN {1 << j} ELSE 0 END"
            for j in range(r_bits)
        )
        + ") AS band_sig FROM sig"
        for b in range(bands)
    )
    cos = SQL_COSINE.format(a="ea.embedding", b="eb.embedding")
    if cap is not None:
        kept_cte = (
            "kept AS MATERIALIZED (SELECT bands.* FROM bands\n"
            "             JOIN (SELECT band, band_sig, count(*) AS bsz\n"
            "                   FROM bands GROUP BY band, band_sig) sz\n"
            "             USING (band, band_sig)\n"
            f"             WHERE sz.bsz <= {cap}),\n    "
        )
        cand_src = "kept"
    else:
        kept_cte = ""
        cand_src = "bands"
    return f"""
    WITH sig AS MATERIALIZED (SELECT vec_id,
             {dot_exprs}
            FROM embeddings),
    bands AS MATERIALIZED ({band_rows}),
    {kept_cte}cand AS MATERIALIZED (
             SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM {cand_src} a JOIN {cand_src} b
             ON a.band = b.band AND a.band_sig = b.band_sig
                AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, round({cos}, 6) AS cosine
    FROM cand
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
    WHERE {cos} >= {threshold}
    """


@register(
    "d3_embedding_dup_lsh",
    "D3+U7 ⊕ (banded SRP-LSH on the md5 coin — FULL oracle)",
    _srp_md5_sql(num_planes=16, bands=8, dim=64, threshold=0.35, cap=600),
    doc="Embedding near-dup via BANDED signed-random-projection LSH "
    "(equi-join per (band, band_sig), exact-cosine verify within bucket "
    "collisions only — the MinHash-LSH shape over sign bits), converted "
    "to a COMPLETE value-equality oracle (round-8 VERDICT #5): plane "
    "components are Rademacher ±1 coins from md5('srp:<p>:<d>') "
    "(Achlioptas 2003 — ±1 entries carry the Gaussian guarantees), and "
    "per-plane dot products LEFT-FOLD doubles so both engines execute "
    "the identical IEEE op sequence — identical signs, signatures, "
    "candidates, cosines. r=2-bit bands keep per-band match probability "
    "high at this low 0.35 threshold (recall ≈0.98); at a 0.95-dup "
    "threshold use r=8, b=8. max_bucket_size=600 is the scale guard "
    "(round-9: the 32× growth probe caught the uncapped 2-bit banding "
    "going quadratic on the RANDOM fixture — 4 buckets/band × 64k rows "
    "≈ 4·10⁹ candidates): whole buckets above the cap drop before the "
    "self-join, deterministically, so the guard itself value-grades "
    "(the d3_minhash_pairs_capped move); fixture buckets at the graded "
    "SFs stay under it, so recall there is unchanged. Production keeps "
    "embedding_dup_pairs "
    "(Gaussian numpy planes — no per-row md5 cost), recall-pinned in "
    "tests/test_dedup.py; same banded scale shape, never all-pairs.",
)
def d3_embedding_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import embedding_dup_md5_pairs
    from .cache_registry import adopt

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    # eager=True: the operator materializes the pair set and releases its
    # internal banded-index persist; adopt() hands the one remaining
    # (caller-owned) cache to the registry so release_session_caches()
    # frees it between bench runs — no unowned session-lifetime cache,
    # and no timed run serving the warm-up's LSH index (round-10 ADVICE).
    return adopt(
        embedding_dup_md5_pairs(
            e, "embedding", "vec_id", threshold=0.35, num_planes=16, bands=8,
            dim=64, max_bucket_size=600, eager=True,
        )
    )


@register(
    "d3_semdedup",
    "D3+U7 ⊕ (semantic dedup, SemDeDup)",
    None,  # k-means is an iterative fixpoint — no SQL twin; pytest pins
    # recall on planted cosine pairs + zero false positives by construction
    doc="SemDeDup (Abbas et al. 2023): k-means cluster-bounded semantic "
    "near-dup pairs — candidates only within a probed cluster (equi-join "
    "on centroid_id, never all-pairs), exact-cosine verified with hoisted "
    "norms. nprobe=2 multi-probe assignment recovers the pairs k-means "
    "splits across cluster boundaries (0.99-cos recall 1.0 on the Zipf "
    "corpus, tests/test_semdedup.py). Scale: k ∝ corpus size keeps "
    "Σ|cluster|² linear; hub clusters bounded by max_cluster_size with "
    "stable-hash truncation.",
)
def d3_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import semdedup_pairs

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return semdedup_pairs(
        e,
        "embedding",
        "vec_id",
        threshold=0.35,
        num_clusters=16,
        kmeans_iters=1,
        nprobe=2,
    )


@register(
    "u7_knn_bruteforce",
    "U7",
    f"""
    SELECT query_id, vec_id, round(score, 6) AS score, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id,
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} AS score,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.embedding', b='c.embedding')} DESC, c.vec_id ASC
             ) AS INTEGER) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
      CROSS JOIN embeddings c
    ) WHERE rank <= 10
    """,
    doc="Exact top-k cosine per query: broadcast query set × corpus scan + "
    "window top-k; deterministic (score desc, id asc) order.",
)
def u7_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return brute_force_topk(
        queries, e, query_id="query_id", corpus_id="vec_id",
        query_vec="query_vec", corpus_vec="embedding", k=10, metric="cosine",
    )


@register(
    "llm_hard_negatives",
    "U7 ⊕ (contrastive hard-negative mining)",
    f"""
    SELECT query_id, vec_id, round(score, 6) AS score, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id,
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} AS score,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.embedding', b='c.embedding')} DESC,
                        c.vec_id ASC
             ) AS INTEGER) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 4) q
      CROSS JOIN embeddings c
      WHERE {SQL_COSINE.format(a='q.embedding', b='c.embedding')} < 0.95
        AND q.vec_id != c.vec_id
    ) WHERE rank <= 5
    """,
    doc="Hard-negative mining for contrastive training (DPR recipe): per "
    "query, the 5 most-similar corpus vectors BELOW the near-dup screen "
    "(cosine < 0.95, self excluded) — random negatives are too easy and "
    "near-duplicates are false negatives; the band under the dup "
    "threshold carries the training signal. Broadcast queries x one "
    "corpus scan with hoisted norms; at 100 TB the first stage swaps for "
    "the IVF probe join (operators/similarity.py::hard_negative_topk).",
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negative_topk

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return hard_negative_topk(
        queries, e, query_id="query_id", corpus_id="vec_id", k=5,
        dup_threshold=0.95,
    )


@register(
    "u7_knn_ivf",
    "U7",
    f"""
    SELECT q.vec_id AS query_id,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} END), 6)
             AS exact_max_nonself,
           TRUE AS routed_from_probed_lists,
           TRUE AS score_is_exact_cosine,
           TRUE AS top1_bounded,
           TRUE AS nonempty
    FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
    CROSS JOIN embeddings c
    GROUP BY q.vec_id
    """,
    doc="IVF approximate top-k, contract-graded (the u7_ivfpq_topk "
    "pattern, round-8 rows-only whittling): one-time centroid "
    "assignment, queries probe nprobe inverted lists via equi-join on "
    "centroid_id. Per query the grade pins: routed_from_probed_lists — "
    "every returned row's assigned centroid is among the query's "
    "nprobe nearest lists (the routing invariant); "
    "score_is_exact_cosine — each returned score equals the round-6 "
    "cosine recomputed independently on the raw vectors (IVF's scoring "
    "tier is exact, only its candidate set is approximate); "
    "top1_bounded — no returned score exceeds the exact corpus max; "
    "exact_max_nonself — a full value-match both engines compute "
    "bit-for-bit. Recall@10 vs brute force stays pinned in "
    "tests/test_similarity.py.",
)
def u7_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    centroids = sample_centroids(e, num_centroids=16)
    indexed = assign_centroids(e, centroids)
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivf_topk(queries, indexed, centroids, k=10, nprobe=4)

    # mirror of ivf_topk's probe selection, for the routing check
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_score"), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine_similarity(F.col("query_vec"), F.col("centroid_vec")).alias(
                "c_score"
            ),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= 4)
        .select("query_id", "centroid_id", F.lit(True).alias("__probed"))
    )
    routed_ok = (
        res.join(indexed.select("vec_id", "centroid_id"), "vec_id")
        .join(probes, ["query_id", "centroid_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(F.coalesce("__probed", F.lit(False))).alias(
                "routed_from_probed_lists"
            )
        )
    )
    # independent exact-cosine recomputation of every returned score
    score_ok = (
        res.join(queries, "query_id")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "query_id",
            (
                F.round(
                    cosine_similarity(F.col("query_vec"), F.col("embedding")), 6
                )
                == F.col("score")
            ).alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("score_is_exact_cosine"))
    )
    stats = (
        F.broadcast(queries)
        .crossJoin(e.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("query_vec"), F.col("embedding")).alias("__cos"),
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.max(F.when(F.col("vec_id") != F.col("query_id"), F.col("__cos"))),
                6,
            ).alias("exact_max_nonself"),
            F.max("__cos").alias("__max_all"),
        )
    )
    top1 = res.filter(F.col("rank") == 1).select(
        "query_id", F.col("score").alias("__top1")
    )
    counts = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(stats, "query_id")
        .join(routed_ok, "query_id")
        .join(score_ok, "query_id")
        .join(top1, "query_id")
        .select(
            "query_id",
            "exact_max_nonself",
            "routed_from_probed_lists",
            "score_is_exact_cosine",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
            (F.col("__n") >= 1).alias("nonempty"),
        )
    )


@register(
    "u7_ivf_persisted",
    "U7 ⊕ (persisted IVF index + delta-append routing)",
    f"""
    SELECT q.vec_id AS query_id,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} END), 6)
             AS exact_max_nonself,
           TRUE AS routed_from_probed_lists,
           TRUE AS score_is_exact_cosine,
           TRUE AS top1_bounded,
           TRUE AS index_complete,
           TRUE AS nonempty
    FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
    CROSS JOIN embeddings c
    GROUP BY q.vec_id
    """,
    doc="The u7_knn_ivf contract on a PERSISTED index (VERDICT r13 "
    "#4): centroids + assignments are a maintained scratch layout "
    "(operators/bucketing.ensure_ivf_index — assignments bucketed by "
    "centroid_id so the probe equi-join rides the layout instead of "
    "shuffling the corpus; spec tag v1_k16_d10 encoded in every path), "
    "built once over the BASE corpus (vec_id % 10 != 0). The held-out "
    "tenth is the post-build arrivals stand-in: the entry routes it to "
    "the persisted centroids at read time (assign_centroids over the "
    "delta only — the append buffer every ANN deployment keeps between "
    "compactions; a compaction rung would insertInto the bucketed "
    "table by centroid). Query cost is thus independent of index-build "
    "cost, and append cost scales with the delta, never the corpus. "
    "Grade pins the full u7_knn_ivf contract — routing containment vs "
    "an independently recomputed probe set, exact-cosine recheck of "
    "every returned score, top-1 bound, and the bit-exact "
    "exact_max_nonself value anchor — PLUS index_complete: base "
    "assignments ∪ routed delta covers every corpus vector exactly "
    "once (count and distinct-id equality against the raw table), so "
    "a stale or partial layout can never grade green.",
)
def u7_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity
    from ..operators.bucketing import IVF_DELTA_MOD, ensure_ivf_index
    from ..operators.similarity import ivf_topk

    cent_t, asg_t = ensure_ivf_index(spark, sf_dir)
    centroids = spark.table(cent_t)
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    delta = e.filter(F.col("vec_id") % IVF_DELTA_MOD == 0)
    # read-time routing of the delta against the PERSISTED centroids —
    # cost ∝ |delta| × k, the corpus is never rescanned
    indexed = spark.table(asg_t).unionByName(assign_centroids(delta, centroids))
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivf_topk(queries, indexed, centroids, k=10, nprobe=4)

    # mirror of ivf_topk's probe selection, for the routing check
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_score"), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine_similarity(F.col("query_vec"), F.col("centroid_vec")).alias(
                "c_score"
            ),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= 4)
        .select("query_id", "centroid_id", F.lit(True).alias("__probed"))
    )
    routed_ok = (
        res.join(indexed.select("vec_id", "centroid_id"), "vec_id")
        .join(probes, ["query_id", "centroid_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(F.coalesce("__probed", F.lit(False))).alias(
                "routed_from_probed_lists"
            )
        )
    )
    score_ok = (
        res.join(queries, "query_id")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "query_id",
            (
                F.round(
                    cosine_similarity(F.col("query_vec"), F.col("embedding")), 6
                )
                == F.col("score")
            ).alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("score_is_exact_cosine"))
    )
    stats = (
        F.broadcast(queries)
        .crossJoin(e.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("query_vec"), F.col("embedding")).alias("__cos"),
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.max(F.when(F.col("vec_id") != F.col("query_id"), F.col("__cos"))),
                6,
            ).alias("exact_max_nonself"),
            F.max("__cos").alias("__max_all"),
        )
    )
    # layout-staleness tripwire: base ∪ delta must cover the corpus
    # exactly once — a swept/partial/over-appended index fails here
    complete = (
        indexed.agg(
            F.count(F.lit(1)).alias("__n_idx"),
            F.count_distinct(F.col("vec_id")).alias("__n_dist"),
        )
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("__n_corpus"))))
        .select(
            (
                (F.col("__n_idx") == F.col("__n_corpus"))
                & (F.col("__n_dist") == F.col("__n_corpus"))
            ).alias("index_complete")
        )
    )
    top1 = res.filter(F.col("rank") == 1).select(
        "query_id", F.col("score").alias("__top1")
    )
    counts = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(stats, "query_id")
        .join(routed_ok, "query_id")
        .join(score_ok, "query_id")
        .join(top1, "query_id")
        .crossJoin(F.broadcast(complete))
        .select(
            "query_id",
            "exact_max_nonself",
            "routed_from_probed_lists",
            "score_is_exact_cosine",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
            "index_complete",
            (F.col("__n") >= 1).alias("nonempty"),
        )
    )


@register(
    "u7_kmeans_ivf",
    "U7+iterative",
    f"""
    SELECT q.vec_id AS query_id,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} END), 6)
             AS exact_max_nonself,
           TRUE AS routed_from_probed_lists,
           TRUE AS score_is_exact_cosine,
           TRUE AS top1_bounded,
           TRUE AS nonempty
    FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
    CROSS JOIN embeddings c
    GROUP BY q.vec_id
    """,
    doc="IVF with Lloyd-refined centroids (3 k-means iterations: "
    "broadcast assign + posexplode/partial-agg mean update, lineage cut "
    "per round), then the same nprobe query path — contract-graded like "
    "u7_knn_ivf (r8): the TRAINING is the iterative non-SQL part, but "
    "routing containment, the independent exact-cosine recheck of every "
    "returned score, the corpus-max bound, and the value-matched "
    "exact_max_nonself are all provable regardless of where the "
    "centroids came from — the probe mirror uses the SAME refined "
    "centroid frame the index used. Recall@10 of the refined index "
    "stays pinned in tests/test_similarity.py.",
)
def u7_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity
    from ..operators.similarity import kmeans_refine

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    centroids = kmeans_refine(
        e, sample_centroids(e, num_centroids=16), iterations=3
    ).localCheckpoint(eager=True)  # one training run feeds index AND probe mirror
    indexed = assign_centroids(e, centroids)
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivf_topk(queries, indexed, centroids, k=10, nprobe=4)

    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_score"), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine_similarity(F.col("query_vec"), F.col("centroid_vec")).alias(
                "c_score"
            ),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= 4)
        .select("query_id", "centroid_id", F.lit(True).alias("__probed"))
    )
    routed_ok = (
        res.join(indexed.select("vec_id", "centroid_id"), "vec_id")
        .join(probes, ["query_id", "centroid_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(F.coalesce("__probed", F.lit(False))).alias(
                "routed_from_probed_lists"
            )
        )
    )
    score_ok = (
        res.join(queries, "query_id")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "query_id",
            (
                F.round(
                    cosine_similarity(F.col("query_vec"), F.col("embedding")), 6
                )
                == F.col("score")
            ).alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("score_is_exact_cosine"))
    )
    stats = (
        F.broadcast(queries)
        .crossJoin(e.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("query_vec"), F.col("embedding")).alias("__cos"),
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.max(F.when(F.col("vec_id") != F.col("query_id"), F.col("__cos"))),
                6,
            ).alias("exact_max_nonself"),
            F.max("__cos").alias("__max_all"),
        )
    )
    top1 = res.filter(F.col("rank") == 1).select(
        "query_id", F.col("score").alias("__top1")
    )
    counts = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(stats, "query_id")
        .join(routed_ok, "query_id")
        .join(score_ok, "query_id")
        .join(top1, "query_id")
        .select(
            "query_id",
            "exact_max_nonself",
            "routed_from_probed_lists",
            "score_is_exact_cosine",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
            (F.col("__n") >= 1).alias("nonempty"),
        )
    )


@register(
    "u7_text_search_hashed",
    "U6+U7",
    """
    SELECT doc_id AS query_id,
           CAST(5 AS BIGINT) AS n_results,
           TRUE AS self_at_rank1
    FROM documents WHERE doc_id < 4
    """,
    doc="Text similarity search with no embeddings table: feature-hashing "
    "doc vectors (native exprs) + exact cosine top-k. First 4 docs query "
    "the corpus; self lands at rank 1 by construction. The hash buckets "
    "are engine-specific (xxhash64), so the raw top-k list cannot "
    "value-match a SQL twin — the entry instead grades the RETRIEVAL "
    "INVARIANT cross-engine (round-7 rows-only whittling): per query, "
    "exactly k results and the query's own document at rank 1 (its "
    "hashed vector is identical to itself, so cosine 1.0 must win under "
    "the (score desc, id asc) total order). The oracle emits the "
    "literals the invariant must equal; the full top-k list stays "
    "pinned by pytest (clone retrieval + determinism, tests/test_similarity.py).",
)
def u7_text_search_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, hashing_embed

    docs = _t(spark, sf_dir, "documents")["documents"]
    emb = hashing_embed(docs, dim=128)
    queries = emb.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = brute_force_topk(queries, emb, corpus_id="doc_id", k=5)
    return topk.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_results"),
        (F.min_by("doc_id", "rank") == F.col("query_id")).alias("self_at_rank1"),
    )


@register(
    "llm_chunk_embed_dedup",
    "U6+U7+D3+pipeline",
    rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks,
             CAST(greatest(ceil((len(toks) - 16) / 48.0), 1) AS INT) AS n_chunks
      FROM t
    ),
    ch AS (
      SELECT doc_id, chunk_no,
             array_to_string(toks[(chunk_no*48 + 1):(chunk_no*48 + 64)], ' ')
               AS chunk_text
      FROM n, LATERAL unnest(range(n_chunks)) AS u(chunk_no)
    ),
    nonblank AS (
      SELECT * FROM ch
      WHERE {SQL_CLEAN.format(col='chunk_text')} <> ''
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_dup_chunks
    FROM nonblank a JOIN nonblank b
      ON a.chunk_text = b.chunk_text AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    doc="The training-data pipeline end-to-end as ONE lazy plan: chunk "
    "documents into token windows -> hashing-trick chunk embeddings -> "
    "random-hyperplane LSH near-dup pairs across documents -> per-doc-pair "
    "duplicate-chunk counts. Catalyst fuses chunking+embedding into the "
    "same stage; only the dedup bucket join shuffles. Round-7 rows-only "
    "whittling: the hashed embeddings are engine-specific, but IDENTICAL "
    "chunk texts hash to identical vectors, share every LSH band bucket, "
    "and verify at cosine 1.0 — so the LSH pipeline must find every "
    "identical-text chunk pair, and the graded output is exactly that "
    "subset (found pairs restricted to text-equal chunks). The oracle "
    "computes the identical-chunk doc pairs from first principles (the "
    "u6_chunk_documents SQL chunker + text self-join, blank-after-clean "
    "chunks excluded on both sides since they embed to no vector), so a "
    "driver grade is a NO-FALSE-NEGATIVE proof of the banding + verify "
    "path — the j10 bloom pattern. Near-but-not-identical chunk recall "
    "stays pinned by the embedding-LSH recall pytest on planted pairs.",
)
def llm_chunk_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_by_tokens
    from ..operators.similarity import hashing_embed

    docs = _t(spark, sf_dir, "documents")["documents"]
    chunks = chunk_by_tokens(docs, chunk_size=64, overlap=16)
    # synthetic global chunk id that round-trips to (doc, chunk)
    chunk_docs = chunks.select(
        (F.col("doc_id") * 10_000 + F.col("chunk_no")).alias("chunk_id"),
        F.col("chunk_text").alias("text"),
    )
    emb = hashing_embed(chunk_docs, text_col="text", id_col="chunk_id", dim=64)
    pairs = embedding_dup_pairs(
        emb, "embedding", "chunk_id", threshold=0.9, num_planes=8, bands=4, dim=64
    )
    texts = chunk_docs
    return (
        pairs.join(
            texts.select(
                F.col("chunk_id").alias("id_a"), F.col("text").alias("__ta")
            ),
            "id_a",
        )
        .join(
            texts.select(
                F.col("chunk_id").alias("id_b"), F.col("text").alias("__tb")
            ),
            "id_b",
        )
        .filter(F.col("__ta") == F.col("__tb"))
        .select(
            (F.col("id_a") / 10_000).cast("long").alias("doc_a"),
            (F.col("id_b") / 10_000).cast("long").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_dup_chunks"))
    )


@register(
    "llm_dataset_card",
    "U6+A ⊕ (dataset-card corpus summary)",
    f"""
    WITH d AS (
      SELECT lang, source,
             {SQL_TOKEN_COUNT.format(col='text')} AS n_toks,
             md5(array_to_string(list_sort(
               {SQL_TOKS.format(col=SQL_CLEAN.format(col='text'))}), ' '))
               AS fp,
             ({SQL_CLEAN.format(col='text')} = '') AS blank
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
           CAST(count(*) FILTER (blank) AS BIGINT) AS blank_docs,
           round(CAST(sum(n_toks) AS DOUBLE) / count(*), 2) AS mean_doc_tokens
    FROM d
    """,
    doc="The dataset card a corpus release ships with, as ONE query: doc "
    "and token totals, language/source cardinalities, exact-duplicate "
    "mass (docs minus distinct order-insensitive fingerprints — the "
    "d3_exact_dedup fingerprint), blank-after-clean count, and mean "
    "document length. One scan feeds every stat; the three exact "
    "distincts ride the same aggregation via Expand (a20's plan shape). "
    "The composed observability twin of etl_contract_report: that one "
    "gates a LOAD on named expectations, this one SUMMARIZES a corpus "
    "for its consumers.",
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import clean_text, token_count
    from ..operators.dedup import doc_fingerprint

    docs = _t(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "lang",
        "source",
        token_count(F.col("text")).alias("n_toks"),
        doc_fingerprint(F.col("text")).alias("fp"),
        (clean_text(F.col("text")) == "").alias("blank"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("exact_dup_docs"),
        F.count_if(F.col("blank")).alias("blank_docs"),
        F.round(F.sum("n_toks").cast("double") / F.count(F.lit(1)), 2).alias(
            "mean_doc_tokens"
        ),
    )


# sample_stratified_mix (the seeded-RNG sampleBy variant) was RETIRED
# from the catalog in round 7 (rows-only whittling): it was strictly
# dominated by sample_stratified_mix_hash below — the content-hash coin
# is layout-independent, engine-portable, and therefore fully
# oracle-checked, while RNG streams are engine-specific by nature. The
# RNG operators themselves (stratified_sample / mix_sources /
# discover_fractions) remain in operators/sampling.py with their
# reproducibility + rate property tests; they are the documented
# fallback when a caller insists on sampleBy semantics.


def _md5_coin_sql(seed: int) -> str:
    """DuckDB twin of sampling.hash_coin(method='md5'): first 8 hex
    digits of md5(id '#' seed) mod 2^20, scaled to [0,1)."""
    return (
        "CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), "
        f"'#{seed}')), 1, 8)) AS BIGINT) % 1048576 / 1048576.0"
    )


@register(
    "sample_stratified_mix_hash",
    "D5-sampling ⊕ (layout-independent content-hash coins)",
    f"""
    WITH first_lang AS (SELECT min(lang) AS l FROM documents),
    kept AS (
      SELECT d.lang FROM documents d, first_lang
      WHERE {_md5_coin_sql(11)} < CASE WHEN d.lang = first_lang.l
                                       THEN 1.0 ELSE 0.25 END
    ),
    mixed_in AS (
      SELECT d.lang FROM documents d, first_lang
      WHERE d.lang = first_lang.l AND {_md5_coin_sql(14)} < 0.5
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM mixed_in)
    GROUP BY lang
    """,
    doc="The stratified-sample + mixture pipeline with CONTENT-HASH "
    "coins (md5(doc_id, seed) thresholded): the keep/drop decision is a "
    "pure function of the row key, so the assembled corpus is identical "
    "under any partitioning, any row order, any engine — which is why "
    "this variant is oracle-checkable where the partition-coin "
    "sample_stratified_mix is rows-only. The documented default for "
    "corpus assembly at 100 TB: compaction/repartition/cluster-resize "
    "can never silently change the training set. Round-6: the lead "
    "stratum comes from a BROADCAST one-row min aggregate and the rate "
    "is a Column — no driver-side distinct().collect() discovery scan "
    "anywhere in the plan (VERDICT r5 #6).",
)
def sample_stratified_mix_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import mix_sources_hash, stratified_sample_hash

    docs = _t(spark, sf_dir, "documents")["documents"]
    # Lead stratum as data, not a collected constant: one aggregated row
    # broadcast onto every doc — the plan stays fully distributed and
    # single-submission.
    lead = F.broadcast(docs.agg(F.min("lang").alias("lead_lang")))
    docs_l = docs.crossJoin(lead)
    rate = F.when(F.col("lang") == F.col("lead_lang"), 1.0).otherwise(0.25)
    sampled = stratified_sample_hash(
        docs_l, "lang", "doc_id", rate, seed=11, method="md5"
    ).drop("lead_lang")
    first_stratum = docs_l.filter(F.col("lang") == F.col("lead_lang")).drop(
        "lead_lang"
    )
    mixture = mix_sources_hash(
        [(sampled, 1.0), (first_stratum, 0.5)], "doc_id", seed=13, method="md5"
    )
    return mixture.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "sample_weighted_es",
    "D5-sampling ⊕ (weighted without-replacement, Efraimidis–Spirakis)",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             pow({_md5_coin_sql(7)}, 1.0 / n_chars) AS ek
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
      ORDER BY ek DESC, doc_id ASC LIMIT 100
    )
    SELECT doc_id, lang, source, n_chars, round(ek, 6) AS es_key
    FROM keyed
    """,
    doc="Weighted k-sample without replacement (Efraimidis–Spirakis "
    "2006): key = coin^(1/weight), top-k by key — here quality-weighting "
    "corpus assembly by document length. The coin is the content-hash "
    "md5 coin, so the sample is a pure function of (id, weight, seed): "
    "layout-independent, engine-portable (this oracle computes the "
    "IDENTICAL sample), and mergeable across shards (union of per-shard "
    "top-k, re-top-k — pinned in tests/test_kmv_sketch.py). "
    "TakeOrderedAndProject, never a global sort.",
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import sample_weighted_k

    docs = _t(spark, sf_dir, "documents")["documents"]
    return sample_weighted_k(
        docs.select("doc_id", "lang", "source", "n_chars"),
        "doc_id",
        "n_chars",
        k=100,
        seed=7,
        method="md5",
    )


@register(
    "a36_kmv_quantiles",
    "A11+A12 ⊕ (mergeable bottom-k-hash quantile sketch)",
    """
    WITH ids AS (
      SELECT l_quantity, l_orderkey * 10 + l_linenumber AS li_id FROM lineitem
    ),
    sk AS (
      SELECT l_quantity,
             CAST(concat('0x', substring(md5(concat(CAST(li_id AS VARCHAR),
                  '#7')), 1, 8)) AS BIGINT) % 1048576 / 1048576.0 AS coin,
             li_id
      FROM ids
      ORDER BY coin ASC, li_id ASC LIMIT 200
    )
    SELECT quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           CAST(count(*) AS BIGINT) AS sketch_rows
    FROM sk
    """,
    doc="Quantile estimates from a KMV bottom-k-hash sketch: the 200 "
    "rows with the smallest md5 coin are a deterministic mergeable "
    "uniform sample; percentiles over the sketch cost O(k log k) at any "
    "base-table size, and shard sketches merge by union + re-bottom-k "
    "(the mergeability a12's exact path lacks). The coin is engine-"
    "portable, so unlike approx_percentile this sketch's ESTIMATE is "
    "oracle-checkable bit-for-bit; l_quantity is integer-valued so "
    "interpolation is exact in binary (a12 precedent). O(1/sqrt k) "
    "rank error pinned in tests/test_kmv_sketch.py.",
)
def a36_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_quantiles, kmv_sample

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    ids = li.select(
        "l_quantity",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("li_id"),
    )
    sk = kmv_sample(ids, "li_id", k=200, seed=7, method="md5").drop(
        "li_id", "kmv_coin"
    )
    return kmv_quantiles(sk, "l_quantity", [0.25, 0.50, 0.75])


def _funnel_sql() -> str:
    from .catalog_text import _lang_scalar_sql, _quality_sql

    toks = SQL_TOKS.format(col="text")
    clean_toks = SQL_TOKS.format(col=SQL_CLEAN.format(col="text"))
    return f"""
    WITH lang AS ({_lang_scalar_sql()}),
    q AS ({_quality_sql()}),
    fp AS (SELECT doc_id,
                  md5(array_to_string(list_sort({clean_toks}), ' ')) AS fingerprint
           FROM documents),
    st2 AS (SELECT lang.doc_id FROM lang WHERE lang_guess = 'en'),
    st3 AS (SELECT st2.doc_id FROM st2 JOIN q ON st2.doc_id = q.doc_id
            WHERE q.quality >= 0.71),
    st4 AS (SELECT doc_id FROM (
              SELECT st3.doc_id,
                     min(st3.doc_id) OVER (PARTITION BY fp.fingerprint) AS m
              FROM st3 JOIN fp ON st3.doc_id = fp.doc_id)
            WHERE doc_id = m),
    tk AS (SELECT doc_id, {toks} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES.format(t='t')}) AS shingle FROM tk),
    c AS (SELECT doc_id AS corpus_id, shingle FROM sh WHERE doc_id % 97 != 0),
    b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT corpus_id AS doc_id FROM (
        SELECT corpus_id, bench_id, count(*) AS shared
        FROM c JOIN b USING (shingle)
        GROUP BY corpus_id, bench_id HAVING count(*) >= 3)),
    st5 AS (SELECT doc_id FROM st4 WHERE doc_id % 97 != 0
            AND doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT '1_total' AS stage, count(*) AS n_docs FROM documents
    UNION ALL SELECT '2_lang_en', count(*) FROM st2
    UNION ALL SELECT '3_quality', count(*) FROM st3
    UNION ALL SELECT '4_deduped', count(*) FROM st4
    UNION ALL SELECT '5_decontaminated', count(*) FROM st5
    """


@register(
    "llm_curation_funnel",
    "U6+D3+U8 composed",
    _funnel_sql(),
    doc="The training-data curation pipeline as ONE declarative funnel: "
    "language gate (marker-token argmax) → quality gate (≥0.71 composite) "
    "→ exact dedup (min-id survivor per cleaned-token-bag fingerprint) → "
    "benchmark decontamination (≥3 shared 3-gram shingles vs the held-out "
    "doc_id%97 split). Emits the per-stage surviving-document counts, so "
    "the graded value pins every stage's semantics at once. Each gate is "
    "a narrowing filter BEFORE the expensive joins; the dedup and "
    "decontamination joins shuffle only survivors/shingles, the shape "
    "that holds at corpus scale.",
)
def llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import doc_fingerprint, lang_id, quality_score

    from ..operators.dedup import _spread

    docs = _t(spark, sf_dir, "documents")["documents"]
    # One pass computes every per-doc signal (the reference's insight
    # block re-scans its frame five times, etl_pipeline.py:194-198 — the
    # anti-pattern this funnel exists to replace). Stage membership
    # becomes boolean flags; the only extra exchanges are the
    # fingerprint window (dedup survivor) and the contamination join.
    # Round-14 (guide §2.5): the single-row-group fixture scan is one
    # task, so lang_id + quality_score + fingerprint — the three heavy
    # regex/tokenize expressions — ran on one core. _spread
    # hash-repartitions (doc_id, text) before the flags project only
    # when scan parallelism is deficient (no-op on a real multi-split
    # corpus); the contamination branch already spreads inside
    # shingle_index. 1.506 -> 1.112 s at sf0.1-local[32], values
    # identical (tools/r14_spread_probe.py).
    # Round-15 (guide §2.3, shuffle fewer bytes): the fingerprint only
    # exists to PARTITION the survivor window — it never reaches the
    # output — so it rides the exchange as the raw 16-byte md5 digest
    # (unhex) instead of the 32-char hex string. unhex is injective on
    # md5 output, so the window groups are identical; measured 16 B/doc
    # off the survivor exchange (2 055 353 -> 1 979 342 total funnel
    # shuffle bytes at sf0.1), stage counts byte-identical, time flat at
    # the fixture floor (tools/r15_fp_binary.py probe).
    flags = _spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        (lang_id(F.col("text")) == "en").alias("is_en"),
        (quality_score(F.col("text")) >= 0.71).alias("is_q"),
        F.unhex(doc_fingerprint(F.col("text"))).alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))
    # survivor = smallest doc_id among stage-3 rows sharing a fingerprint
    m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(
        Window.partitionBy("fingerprint")
    )
    flags = flags.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))
    contaminated = (
        contamination_pairs(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "text",
            "doc_id",
            shingle_n=3,
            min_shared=3,
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )
    # No forced broadcast: the contaminated set is small by construction
    # HERE, but at 100 TB a badly contaminated corpus can exceed the
    # broadcast limit — leaving the strategy to AQE gives a broadcast
    # exactly when the runtime size is under threshold and a shuffle
    # hash join otherwise (the size-guarded form).
    flags = flags.join(contaminated, "doc_id", "left").withColumn(
        "is_final",
        F.col("is_surv")
        & (F.col("doc_id") % 97 != 0)
        & F.coalesce(~F.col("is_cont"), F.lit(True)),
    )
    one = flags.agg(
        F.count(F.lit(1)).alias("c1"),
        F.count_if(F.col("is_en")).alias("c2"),
        F.count_if(F.col("is_q")).alias("c3"),
        F.count_if(F.col("is_surv")).alias("c4"),
        F.count_if(F.col("is_final")).alias("c5"),
    )
    return one.selectExpr(
        "stack(5, '1_total', c1, '2_lang_en', c2, '3_quality', c3, "
        "'4_deduped', c4, '5_decontaminated', c5) AS (stage, n_docs)"
    )


def _ngram_pairs_sql(threshold: float) -> str:
    """(id_a, id_b) near-dup pairs CTE body at the given Jaccard threshold
    — the oracle twin of ngram_jaccard_pairs."""
    toks = SQL_TOKS.format(col="text")
    return f"""
      SELECT id_a, id_b FROM (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
        FROM (SELECT doc_id, unnest({SQL_SHINGLES.format(t=f'({toks})')}) AS shingle FROM documents) l
        JOIN (SELECT doc_id, unnest({SQL_SHINGLES.format(t=f'({toks})')}) AS shingle FROM documents) r
          ON l.shingle = r.shingle AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id
      ) s
      JOIN (SELECT doc_id, len({SQL_SHINGLES.format(t=f'({toks})')}) AS n_sh FROM documents) sa
        ON sa.doc_id = s.id_a
      JOIN (SELECT doc_id, len({SQL_SHINGLES.format(t=f'({toks})')}) AS n_sh FROM documents) sb
        ON sb.doc_id = s.id_b
      WHERE s.shared * 1.0 / (sa.n_sh + sb.n_sh - s.shared) >= {threshold}
    """


@register(
    "d3_dup_clusters",
    "D3+iterative",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_ngram_pairs_sql(0.3)}),
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT comp AS comp_id, count(*) AS n_members FROM (
      SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a
    ) GROUP BY comp
    """,
    doc="Near-dup pairs collapsed into duplicate CLUSTERS via connected "
    "components (min-label propagation as join+groupBy rounds, one "
    "shuffle per round, rounds = cluster diameter — operators/clusters). "
    "The oracle states the same closure with a recursive CTE; both sides "
    "label each cluster by its smallest member, the deterministic "
    "survivor the dedup convention keeps.",
)
def d3_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import dup_clusters

    docs = _t(spark, sf_dir, "documents")["documents"]
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).select(
        "id_a", "id_b"
    )
    return dup_clusters(pairs)


@register(
    "a17_cms_heavy_hitters",
    "A11 ⊕ (count-min sketch)",
    """
    WITH top AS (
      SELECT l_partkey, count(*) AS exact_count
      FROM lineitem
      GROUP BY l_partkey
      ORDER BY exact_count DESC, l_partkey
      LIMIT 10
    )
    SELECT l_partkey, CAST(exact_count AS BIGINT) AS exact_count,
           TRUE AS never_underestimates,
           TRUE AS overcount_within_bound
    FROM top
    """,
    doc="Count-min-sketch frequency estimates for the exact top-10 "
    "lineitem partkeys: the sketch (4 x 1024 cells, one pass, one "
    "shuffle that map-side combines to <= 4096 rows per partition) "
    "broadcasts into the estimation probe — the sublinear per-key "
    "frequency statistic for data too large to group exactly. The raw "
    "estimate is a seeded-xxhash64 artifact no ANSI engine reproduces, "
    "so the entry grades the sketch's ACCURACY CONTRACT (the a12 "
    "rows-only-whittling pattern, round 8): never_underestimates "
    "asserts est >= exact — the CMS hard guarantee, true for ANY data "
    "since each cell sums every colliding key's full count — and "
    "overcount_within_bound asserts est <= exact + 10 x N/width, 10x "
    "the per-row expected collision mass (P[all 4 rows exceed it] <= "
    "1e-4 per key by Markov + row independence; verified at all three "
    "SFs). The oracle emits the literal TRUEs plus the exact top-10 "
    "both engines agree on bit-for-bit, so a driver grade is a "
    "per-round proof the sketch honors both bounds on real data.",
)
def a17_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_build, cms_estimate

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    sketch = cms_build(li, "l_partkey", depth=4, width=1024)
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("l_partkey"))
        .limit(10)
    )
    n_total = li.select(F.count(F.lit(1)).alias("__n"))
    est = cms_estimate(sketch, top.select("l_partkey"), "l_partkey", depth=4, width=1024)
    return (
        top.join(est, "l_partkey")
        .crossJoin(F.broadcast(n_total))
        .select(
            "l_partkey",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
            (
                F.col("est_count")
                <= F.col("exact_count") + F.lit(10.0) * F.col("__n") / F.lit(1024.0)
            ).alias("overcount_within_bound"),
        )
    )


@register(
    "llm_shuffle_pack",
    "U6 ⊕ (deterministic shuffle + sequence packing)",
    r"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS shuffle_key
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tokens, shuffle_key,
             sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, n_tokens, shuffle_key,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS seq_first,
           CAST(floor((cum_tokens - 1) / 2048) AS BIGINT) AS seq_last,
           CAST((cum_tokens - n_tokens) % 2048 AS BIGINT) AS seq_offset
    FROM packed
    """,
    doc="Pretraining concat-and-chunk: deterministic Knuth-hash shuffle, "
    "then every document's placement in the packed 2048-token training "
    "sequences. The oracle states the semantics with one global window; "
    "the Spark side computes the SAME prefix sum distributed — "
    "range-repartition on the shuffle order, per-partition running sums, "
    "and a per-partition-totals prefix broadcast back (operators/"
    "packing.py) — so no single-partition window ever materializes. "
    "Offsets are partition-layout-independent by construction.",
)
def llm_shuffle_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(toks, "doc_id", "n_tokens", seq_len=2048)


PAGERANK_ITERS = 12


def _pagerank_oracle_sql(iters: int) -> str:
    """Unrolled power-iteration oracle: one CTE per round, r0..r{iters},
    each computing rank' = (1-d) + d*(in_sum + dangling/n) exactly as
    operators/clusters.py::pagerank does with tol=0 (fixed rounds, no
    early stop — the one semantics change that makes an iterative float
    fixpoint oracle-checkable at all: a data-dependent convergence test
    cannot be replicated bit-for-bit in SQL, a fixed round count can).
    The (1-d) literal is spelled 0.15000000000000002 — the exact double
    Python's 1.0-0.85 produces — so both engines add the same constant;
    the only remaining cross-engine float freedom is per-node in-sum
    accumulation ORDER (<=25 damped terms, error ~1e-15), five orders
    below the round(.,4) output grid. Every CTE is MATERIALIZED:
    DuckDB inlines plain CTEs, and r{k} references r{k-1} twice, so an
    uninlined chain re-evaluates the base join 2^iters times (observed
    as a too-many-open-files explosion before materializing)."""
    base = """
    WITH pairs AS MATERIALIZED (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    ptot AS MATERIALIZED (
      SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM pairs, ptot WHERE vol * n_pairs > total
    ),
    verts AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
    outdeg AS MATERIALIZED (SELECT src AS id, count(*) AS od FROM edges GROUP BY 1),
    r0 AS MATERIALIZED (SELECT id, 1.0 AS rank FROM verts)"""
    step = """,
    r{k} AS MATERIALIZED (
      SELECT v.id,
             0.15000000000000002 + 0.85 * (
               COALESCE(s.in_sum, 0.0) + d.dang / nn.n) AS rank
      FROM verts v
      CROSS JOIN nn
      CROSS JOIN (
        SELECT COALESCE(sum(r.rank), 0.0) AS dang
        FROM r{prev} r LEFT JOIN outdeg o ON r.id = o.id
        WHERE o.id IS NULL) d
      LEFT JOIN (
        SELECT e.dst AS id, sum(r.rank / o.od) AS in_sum
        FROM edges e
        JOIN r{prev} r ON e.src = r.id
        JOIN outdeg o ON o.id = e.src
        GROUP BY 1) s ON s.id = v.id
    )"""
    sql = base
    for k in range(1, iters + 1):
        sql += step.format(k=k, prev=k - 1)
    return sql + f"\n    SELECT id, round(rank, 4) AS rank FROM r{iters}"


@register(
    "u9_pagerank_nations",
    "U ⊕ (iterative fixpoint: PageRank)",
    _pagerank_oracle_sql(PAGERANK_ITERS),
    doc="PageRank over the nation-level trade graph (supplier nation -> "
    "customer nation edges from lineitem⋈orders⋈customer⋈supplier, "
    "SPARSIFIED to above-average-volume pairs by the integer test "
    "vol*n_pairs > total — the raw pair graph is complete at every SF, "
    "where PageRank is uniformly 1.0): power iteration as join+groupBy "
    "rounds with dangling-mass redistribution, lineage cut per round — the second iterative-"
    "fixpoint operator beside connected components. Runs a FIXED "
    "12-round schedule (tol=0) so the unrolled-CTE oracle replays the "
    "identical computation — converted from rows-only in r8; the "
    "tol-driven early-stop variant remains available on the operator "
    "(operators/clusters.py::pagerank) and is property-tested against "
    "dense power iteration in tests/test_properties.py. One shuffle of "
    "the edge list per round; the graph never leaves the executors.",
)
def u9_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bucketing import ensure_nation_trade_directed
    from ..operators.clusters import pagerank

    # rides the materialized DIRECTED trade census (r14): before this
    # the SF-proportional fact join replayed under the 12 rounds —
    # 11.0 s at the 32× probe, vs sub-second on the layout
    pairs = spark.table(ensure_nation_trade_directed(spark, sf_dir))
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    edges = (
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("src", "dst")
    )
    ranks = pagerank(edges, max_iter=PAGERANK_ITERS, tol=0.0)
    return ranks.select("id", F.round("rank", 4).alias("rank"))


@register(
    "sample_hash_split",
    "U6 ⊕ (deterministic train/val/test split)",
    """
    WITH b AS (
      SELECT source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                  AS BIGINT) % 10 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM b GROUP BY 1, 2
    """,
    doc="Reproducible 80/10/10 train/val/test split by content-stable "
    "hash: bucket = first-6-hex-digits of md5(doc_id) mod 10. The split "
    "is a PURE FUNCTION of the row key — no RNG, no state, no seed file "
    "— so any engine, any partitioning, any rerun assigns every document "
    "identically (the property that keeps eval sets uncontaminated "
    "across pipeline versions; both engines compute the identical md5, "
    "which is what makes this oracle-checkable at all). Embarrassingly "
    "parallel: one projection + one grouped count.",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )
    return (
        docs.select(
            "source",
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "sample_k_per_group",
    "U6+W1 ⊕ (deterministic per-group sampling)",
    """
    SELECT source, doc_id, CAST(rk AS INTEGER) AS rk FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 3
    """,
    doc="Deterministic k-per-group sample: order each group by "
    "md5(key) — a fixed pseudo-random permutation — and keep the first "
    "k. Reproducible sampling for eval subsets and data audits, with "
    "the same scale shape as w1 top-k: WindowGroupLimit prunes to k "
    "rows per group map-side BEFORE the shuffle, so the exchange "
    "carries k×groups rows regardless of corpus size.",
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "rk")
    )


@register(
    "d3_jaccard_prefix",
    "D3 ⊕ (prefix-filtered set-similarity join)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='t')} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    shared AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT id_a, id_b,
           round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.4
    """,
    doc="Exact Jaccard >= 0.4 pairs via PREFIX FILTERING (All-Pairs/"
    "PPJoin): each doc indexes only its |A|-ceil(t|A|)+1 globally-"
    "rarest shingles — a necessary-condition index, so the oracle (a "
    "full inverted-index join) must agree exactly. The candidate join "
    "touches a fraction of the index and hot boilerplate shingles drop "
    "out of long docs' prefixes entirely; recall is 1 by theorem, not "
    "by tuning, which is what you want when dedup certificates matter. "
    "Caveat measured in the 8x scale probe (BASELINE.md): on the "
    "fixture's 31-token vocabulary NO shingle is rare, so prefixes "
    "prune nothing and the DF-sort prep is pure overhead vs the capped "
    "inverted index — prefix filtering earns its constant on Zipfian "
    "real-corpus vocabularies where most shingles are rare.",
)
def d3_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_prefix_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return jaccard_prefix_pairs(docs, "text", "doc_id", n=3, threshold=0.4)


@register(
    "llm_leakage_safe_split",
    "D3+iterative+U6 ⊕ (cluster-keyed train/val/test split)",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_ngram_pairs_sql(0.3)}),
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, min(b)) AS comp FROM reach GROUP BY a
    ),
    assigned AS (
      SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS comp
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    b AS MATERIALIZED (
      SELECT comp,
             CAST(concat('0x', substring(md5(CAST(comp AS VARCHAR)), 1, 6))
                  AS BIGINT) % 10 AS bucket
      FROM assigned
    )
    SELECT CASE WHEN bucket = 8 THEN 'val'
                WHEN bucket = 9 THEN 'test' ELSE 'train' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT comp) AS BIGINT) AS n_clusters
    FROM b GROUP BY 1
    """,
    doc="Leakage-safe 80/10/10 split: md5 bucket keyed on the near-dup "
    "CLUSTER id (connected components over Jaccard>=0.3 pairs; "
    "singletons are their own cluster), so a near-duplicate of a "
    "training doc structurally cannot land in val/test — the "
    "memorization leak a doc-keyed hash split admits ~20% of the time "
    "per dup pair. Composes three verified layers (exact similarity "
    "join, min-label components, content-stable hash split); the "
    "oracle restates the closure with a recursive CTE.",
)
def llm_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")["documents"]
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).select(
        "id_a", "id_b"
    )
    assigned = leakage_safe_split(docs, pairs)
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("comp").alias("n_clusters"),
    )


@register(
    "llm_mixture_temperature",
    "A1+U6 ⊕ (temperature-scaled mixture weights)",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({SQL_TOKEN_COUNT.format(col='text')}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_tokens,
             pow(n_tokens, 0.5) AS raw_w,
             sum(pow(n_tokens, 0.5)) OVER () AS tot_w
      FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           round(raw_w / tot_w, 6) AS mix_weight,
           round(500000.0 * raw_w / tot_w, 2) AS target_tokens,
           round(CAST(CASE WHEN n_tokens > 0
                 THEN least(1.0, 500000.0 * raw_w / tot_w / n_tokens)
                 ELSE 0.0 END AS DOUBLE), 6) AS sample_rate
    FROM w
    """,
    doc="Temperature-scaled mixture weights (the multilingual-LM "
    "standard, mBERT/XLM-R/mT5: p_i ∝ n_i^τ): τ=0.5 upweights small "
    "sources relative to proportional sampling while never letting one "
    "giant source dominate — the knob between uniform (τ=0) and "
    "proportional (τ=1) that llm_mixture_plan's uniform split lacks. "
    "One grouped pass for per-source token totals; the normalizing sum "
    "is an unpartitioned window over the SOURCE-count rows (bounded by "
    "the source domain, never the corpus — the packing allowlist "
    "argument). Feeds mix_sources_hash as its fractions.",
)
def llm_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import token_count

    docs = _t(spark, sf_dir, "documents")["documents"]
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
    )
    raw_w = F.pow(F.col("n_tokens"), 0.5)
    w = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        raw_w.alias("raw_w"),
        F.sum(raw_w).over(Window.partitionBy()).alias("tot_w"),
    )
    target = F.lit(500000.0) * F.col("raw_w") / F.col("tot_w")
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("raw_w") / F.col("tot_w"), 6).alias("mix_weight"),
        F.round(target, 2).alias("target_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.least(F.lit(1.0), target / F.col("n_tokens")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("sample_rate"),
    )


@register(
    "llm_curriculum_order",
    "W1+D5 ⊕ (curriculum data ordering)",
    """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r,
             count(*) OVER () AS n
      FROM documents
    ),
    staged AS (
      SELECT doc_id, n_chars,
             CAST((r - 1) * 5 // n + 1 AS INTEGER) AS stage
      FROM ranked
    )
    SELECT doc_id, n_chars, stage,
           CAST(row_number() OVER (
             ORDER BY stage ASC,
                      md5(concat(CAST(doc_id AS VARCHAR), '#17')) ASC,
                      doc_id ASC
           ) AS BIGINT) AS order_idx
    FROM staged
    """,
    doc="Curriculum training order: 5 difficulty stages by document "
    "length (the sequence-length curriculum), deterministically "
    "shuffled WITHIN each stage by a content-hash key so intra-stage "
    "order carries no collection bias, with a global training-order "
    "index. The order is a pure function of the corpus + seed (md5 "
    "shuffle key, the sampling-coin convention), and stage cuts are "
    "exact integer arithmetic on the global rank — no ntile, whose tie "
    "handling is engine-specific. The engine side computes BOTH global "
    "ranks with packing.global_rank (range partition → per-partition "
    "running count → ≤num_partitions-row offset window), never a "
    "single-partition window; the oracle's plain windows are the "
    "semantic contract.",
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import curriculum_order

    docs = _t(spark, sf_dir, "documents")["documents"]
    return curriculum_order(docs, "doc_id", "n_chars", stages=5, seed=17)


@register(
    "llm_mixture_plan",
    "A1+U6 ⊕ (token-budget mixture / epoch planning)",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({SQL_TOKEN_COUNT.format(col='text')}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT count(*) AS n_sources FROM per_src)
    SELECT source, n_docs, n_tokens,
           CAST(500000.0 / n_sources AS DOUBLE) AS target_tokens,
           round(CAST(CASE WHEN n_tokens > 0
                 THEN least(1.0, (500000.0 / n_sources) / n_tokens)
                 ELSE 0.0 END AS DOUBLE), 6) AS sample_rate,
           round(CAST(CASE WHEN n_tokens > 0
                 THEN (500000.0 / n_sources) / n_tokens
                 ELSE 0.0 END AS DOUBLE), 6) AS epochs
    FROM per_src CROSS JOIN tot
    """,
    doc="Mixture/epoch planning for a token budget: per-source token "
    "totals (one grouped pass over the corpus) joined with the "
    "source-count scalar give each source's target token allocation "
    "under uniform weights, the sampling rate that hits it "
    "(capped at 1.0 — you cannot sample more than once without "
    "repeating), and the epoch multiplier when the source is smaller "
    "than its allocation (>1 means the mixture repeats that source). "
    "The numbers a sampling/mixing stage (sample_stratified_mix, "
    "mix_sources) consumes as its fractions — computed by the engine "
    "from the corpus itself, not hand-maintained. Corpus-sized work is "
    "the single aggregation; everything after is broadcast-scalar "
    "arithmetic.",
)
def llm_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = _t(spark, sf_dir, "documents")["documents"]
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
    )
    tot = per_src.agg(F.count(F.lit(1)).alias("n_sources"))
    target = F.lit(500000.0) / F.col("n_sources")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            target.alias("target_tokens"),
            # Zero-token-source guard (w9/a21 convention): Spark's
            # division by zero ERRORS under ANSI (Spark 4 default)
            # or yields NULL non-ANSI, where DuckDB yields Inf.
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.least(F.lit(1.0), target / F.col("n_tokens")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("sample_rate"),
            F.round(
                F.when(F.col("n_tokens") > 0, target / F.col("n_tokens")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("epochs"),
        )
    )


@register(
    "d3_cross_source_dup_report",
    "D3+A2 ⊕ (corpus provenance audit)",
    f"""
    WITH pairs AS MATERIALIZED ({_ngram_pairs_sql(0.3)})
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = pairs.id_a
    JOIN documents db ON db.doc_id = pairs.id_b
    GROUP BY 1, 2
    """,
    doc="Which sources duplicate each other: near-dup pairs joined back "
    "to provenance, counted per unordered source pair. The report that "
    "tells a crawl operator whether dup mass is intra-source (re-crawls "
    "— fix the fetcher) or cross-source (mirrors/syndication — fix the "
    "source list). Pair volume is already sublinear in corpus size "
    "after the similarity join; the provenance joins are id-keyed "
    "lookups against the (small) pair set.",
)
def d3_cross_source_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).select(
        "id_a", "id_b"
    )
    prov = docs.select("doc_id", "source")
    return (
        pairs.join(
            prov.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            prov.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "d3_source_priority_dedup",
    "D3+iterative+W1 ⊕ (provenance-ranked survivor selection)",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_ngram_pairs_sql(0.3)}),
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, min(b)) AS comp FROM reach GROUP BY a
    ),
    assigned AS (
      SELECT d.doc_id, d.source, coalesce(l.comp, d.doc_id) AS comp
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    ranked AS MATERIALIZED (
      SELECT doc_id, source, comp,
             row_number() OVER (PARTITION BY comp
                                ORDER BY source ASC, doc_id ASC) AS rk
      FROM assigned
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_survivors
    FROM ranked WHERE rk = 1 GROUP BY source
    """,
    doc="Dedup survivor selection by PROVENANCE RANK, not min id: within "
    "each near-dup cluster keep the doc from the preferred source "
    "(lexicographic source order stands in for a curated priority list; "
    "doc_id breaks ties), then count survivors per source. This is how "
    "production corpus dedup actually chooses — keep the canonical "
    "edition, drop the mirrors — and it composes the similarity join, "
    "connected components, and a per-cluster top-1 window "
    "(WindowGroupLimit prunes to one row per cluster map-side).",
)
def d3_source_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.clusters import connected_components

    docs = _t(spark, sf_dir, "documents")["documents"]
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).select(
        "id_a", "id_b"
    )
    labels = connected_components(pairs).withColumnRenamed("id", "doc_id")
    assigned = (
        docs.select("doc_id", "source")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("comp", F.col("doc_id")).alias("comp"),
        )
    )
    w = Window.partitionBy("comp").orderBy(F.asc("source"), F.asc("doc_id"))
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_survivors"))
    )


@register(
    "u7_pq_adc_topk",
    "U7 ⊕ (product quantization + ADC + exact re-rank)",
    f"""
    SELECT q.vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_results,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} END), 6)
             AS exact_max_nonself,
           TRUE AS adc_matches_recon,
           TRUE AS top1_bounded
    FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
    CROSS JOIN embeddings c
    GROUP BY q.vec_id
    """,
    doc="Two-tier billion-vector ANN layout (Jégou et al., TPAMI 2011): "
    "per-subspace k-means codebooks compress each vector to m small "
    "codes; the corpus-wide scan scores by asymmetric distance "
    "computation — m table lookups against a per-query LUT of "
    "m*k dot products, no d-dim arithmetic per row — and the exact "
    "cosine re-ranks only the rerank_factor*k ADC candidates. Codes "
    "(m ints) replace raw vectors (d floats) in the scan tier, which "
    "is the memory math that fits a billion vectors on a cluster. "
    "Training: all m subspace k-means in ONE corpus pass per "
    "iteration; codebooks are the only driver-side state. The trained "
    "codebook is iterative and engine-specific, so the entry grades the "
    "layout's CONTRACTS per query (round-8 rows-only whittling): "
    "adc_matches_recon pins the ADC identity — the LUT-lookup score of "
    "every candidate equals dot(query, reconstruction(codes)) computed "
    "through the independent codebook-indexing path (catches the "
    "element_at off-by-one / lambda-capture class of bug); top1_bounded "
    "asserts the reranked top-1 cosine never exceeds the exact corpus "
    "max; and exact_max_nonself is a full value-match both engines "
    "compute bit-for-bit at round-6 (the knn_bruteforce precedent). "
    "Recall and determinism stay pinned in tests/test_similarity.py.",
)
def u7_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.arrays import cosine_similarity, l2_norm
    from ..operators.similarity import (
        _codebooks_lit,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    from .cache_registry import track

    unit = track(emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x / l2_norm(F.col("embedding").cast("array<double>")),
        ).alias("embedding"),
    ))  # plan-level persist owned by the cache registry
    books = pq_train(unit, m=16, k=32, iterations=2)
    encoded = pq_encode(unit, books)
    queries = unit.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = pq_topk(
        queries, encoded, books, k=5, rerank_corpus=unit, rerank_factor=4
    )

    # ADC identity: candidate LUT scores vs the independent
    # codebook-reconstruction dot product.
    adc = pq_topk(queries, encoded, books, k=20)
    recon = F.flatten(
        F.zip_with(
            _codebooks_lit(books),
            F.col("codes"),
            lambda book, code: F.element_at(book, code + 1),
        )
    )
    recon_dot = F.aggregate(
        F.zip_with(
            F.col("query_vec").cast("array<double>"), recon, lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    identity = (
        adc.join(encoded, "vec_id")
        .join(queries, "query_id")
        .select(
            "query_id",
            (F.abs(F.col("score") - recon_dot) <= F.lit(1e-6)).alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("adc_matches_recon"))
    )

    # Exact per-query stats on the RAW embeddings (what the oracle
    # computes): max cosine to a non-self row, and the whole-corpus max
    # bounding the reranked top-1.
    raw_q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    stats = (
        F.broadcast(raw_q)
        .crossJoin(emb.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("embedding")).alias("__cos"),
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.max(F.when(F.col("vec_id") != F.col("query_id"), F.col("__cos"))),
                6,
            ).alias("exact_max_nonself"),
            F.max("__cos").alias("__max_all"),
        )
    )
    top1 = res.filter(F.col("rank") == 1).select(
        "query_id", F.col("score").alias("__top1")
    )
    counts = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    return (
        counts.join(stats, "query_id")
        .join(identity, "query_id")
        .join(top1, "query_id")
        .select(
            "query_id",
            "n_results",
            "exact_max_nonself",
            "adc_matches_recon",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
        )
    )


@register(
    "u7_ivfpq_topk",
    "U7 ⊕ (IVF-PQ composed ANN layout)",
    f"""
    SELECT q.vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_results,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} END), 6)
             AS exact_max_nonself,
           TRUE AS routed_from_probed_lists,
           TRUE AS rerank_is_exact_cosine,
           TRUE AS top1_bounded
    FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
    CROSS JOIN embeddings c
    GROUP BY q.vec_id
    """,
    doc="IVF-PQ, the composed billion-vector layout: IVF centroid "
    "routing bounds WHICH rows each query touches (equi-join on the "
    "nprobe nearest lists), PQ codes bound the COST per touched row "
    "(ADC lookups, no d-dim math), exact cosine re-ranks the "
    "candidate handful. Production writes the code table partitioned "
    "by centroid_id so probes are partition-pruned scans. Training and "
    "routing are iterative/approximate and engine-specific, so the "
    "entry grades the composition's CONTRACTS per query (round-8 "
    "rows-only whittling): routed_from_probed_lists pins the routing "
    "invariant — every returned row's assigned centroid is among the "
    "query's nprobe nearest lists; rerank_is_exact_cosine pins the "
    "re-rank tier — each returned score equals the exact round-6 "
    "cosine recomputed independently on the RAW (un-normalized) "
    "vectors; top1_bounded asserts no returned score exceeds the exact "
    "corpus max; and exact_max_nonself is a full value-match both "
    "engines compute bit-for-bit at round-6 (the knn_bruteforce "
    "precedent). Recall stays pinned in tests/test_similarity.py.",
)
def u7_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity, l2_norm
    from ..operators.similarity import (
        assign_centroids,
        ivfpq_topk,
        pq_encode,
        pq_train,
        sample_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    from .cache_registry import track

    unit = track(emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x / l2_norm(F.col("embedding").cast("array<double>")),
        ).alias("embedding"),
    ))  # plan-level persist owned by the cache registry
    centroids = sample_centroids(unit, num_centroids=8)
    indexed = assign_centroids(unit, centroids)
    books = pq_train(unit, m=16, k=32, iterations=2)
    encoded = pq_encode(unit, books)
    queries = unit.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivfpq_topk(
        queries, indexed, centroids, encoded, books, k=5, nprobe=6, rerank_factor=4
    )

    # Mirror of the probe selection (ivfpq_topk's q_probe/wq): the
    # nprobe nearest centroid ids per query, for the routing check.
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_score"), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine_similarity(F.col("query_vec"), F.col("centroid_vec")).alias(
                "c_score"
            ),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= 6)
        .select("query_id", "centroid_id", F.lit(True).alias("__probed"))
    )
    routed_ok = (
        res.join(indexed.select("vec_id", "centroid_id"), "vec_id")
        .join(probes, ["query_id", "centroid_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(F.coalesce("__probed", F.lit(False))).alias(
                "routed_from_probed_lists"
            )
        )
    )

    # Exact per-query stats + independent re-rank verification on the
    # RAW embeddings (cosine is normalization-invariant).
    raw_q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairwise = (
        F.broadcast(raw_q)
        .crossJoin(emb.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("embedding")).alias("__cos"),
        )
    )
    stats = pairwise.groupBy("query_id").agg(
        F.round(
            F.max(F.when(F.col("vec_id") != F.col("query_id"), F.col("__cos"))),
            6,
        ).alias("exact_max_nonself"),
        F.max("__cos").alias("__max_all"),
    )
    rerank_ok = (
        res.join(pairwise, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(
            F.min(
                F.abs(F.col("score") - F.round(F.col("__cos"), 6)) <= F.lit(2e-6)
            ).alias("rerank_is_exact_cosine"),
            F.count(F.lit(1)).alias("n_results"),
            F.max("score").alias("__top1"),
        )
    )
    return (
        rerank_ok.join(stats, "query_id")
        .join(routed_ok, "query_id")
        .select(
            "query_id",
            "n_results",
            "exact_max_nonself",
            "routed_from_probed_lists",
            "rerank_is_exact_cosine",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
        )
    )


@register(
    "d3_shared_span_pairs",
    "D3 ⊕ (exact shared-span / repeated-substring dedup)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    pos_t AS (
      SELECT doc_id, t, len(t) - 8 + 1 AS m,
             unnest(range(1, len(t) - 8 + 2)) AS pos
      FROM toks WHERE len(t) >= 8
    ),
    fps AS (
      SELECT doc_id, pos, m,
             md5(array_to_string(t[pos:pos+7], ' ')) AS fp
      FROM pos_t
    ),
    win AS (
      SELECT doc_id, pos, m,
             min(struct_pack(f := fp, p := pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS ws
      FROM fps
    ),
    sel AS MATERIALIZED (
      SELECT DISTINCT doc_id, (ws).f AS fp FROM win
      WHERE pos <= greatest(m - 4 + 1, 1)
    ),
    hot AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) > 50),
    sel2 AS MATERIALIZED (SELECT * FROM sel WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared_fps
    FROM sel2 a JOIN sel2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
    doc="Exact shared-SPAN duplicate pairs (round-6 ⊕): winnowed "
    "rolling-window fingerprints (k=8-token windows, w=4 winnow — any "
    "shared verbatim run of ≥ 11 tokens is guaranteed a selected "
    "fingerprint collision, Schleimer-Wilkerson-Aiken SIGMOD'03) "
    "joined on the fingerprint, counting distinct shared prints per "
    "pair. This is the repeated-substring detector bag-of-shingles "
    "similarity dilutes away on long documents — the curation stage "
    "that catches licence blocks / boilerplate / copy-paste. Scale "
    "shape: hashing+winnowing are row-local array exprs (selected "
    "density ~2/(w+1); only selections explode), the pair step is a "
    "fingerprint equi-join (never all-pairs), and the df>50 hot-print "
    "cap bounds boilerplate fan-out deterministically. md5 window "
    "hashes make the whole index engine-portable: the oracle computes "
    "the identical winnowed index via SQL window min.",
)
def d3_shared_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shared_span_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return shared_span_pairs(
        docs, "text", "doc_id", k=8, w=4, max_doc_freq=50, min_shared=2
    )


@register(
    "d3_shared_span_regions",
    "D3 ⊕ (shared-span localization)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    pos_t AS (
      SELECT doc_id, t, len(t) - 8 + 1 AS m,
             unnest(range(1, len(t) - 8 + 2)) AS pos
      FROM toks WHERE len(t) >= 8
    ),
    fps AS (
      SELECT doc_id, pos, m,
             md5(array_to_string(t[pos:pos+7], ' ')) AS fp
      FROM pos_t
    ),
    win AS (
      SELECT doc_id, pos, m,
             min(struct_pack(f := fp, p := pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS ws
      FROM fps
    ),
    sel AS MATERIALIZED (
      SELECT doc_id, (ws).f AS fp, min((ws).p) AS pos FROM win
      WHERE pos <= greatest(m - 4 + 1, 1)
      GROUP BY doc_id, (ws).f
    ),
    hot AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) > 50),
    sel2 AS MATERIALIZED (SELECT * FROM sel WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared_fps,
           CAST(min(a.pos) AS BIGINT) AS a_start,
           CAST(max(a.pos) + 7 AS BIGINT) AS a_end,
           CAST(min(b.pos) AS BIGINT) AS b_start,
           CAST(max(b.pos) + 7 AS BIGINT) AS b_end
    FROM sel2 a JOIN sel2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
    doc="Shared-span dedup with LOCALIZATION (round-6 ⊕): same winnowed "
    "fingerprint join as d3_shared_span_pairs, but each qualifying pair "
    "reports the convex hull of its matched window positions per side "
    "(1-based token offsets, end inclusive) — the bounds a cleaner "
    "needs to CUT a licence header / boilerplate block instead of "
    "dropping the document. Hull semantics documented honestly: "
    "multiple disjoint shared regions collapse to one interval. Same "
    "scale shape as the pair variant (row-local winnowing, fingerprint "
    "equi-join, df cap); positions ride the index as a third column "
    "and the localization is pure min/max aggregation.",
)
def d3_shared_span_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shared_span_regions

    docs = _t(spark, sf_dir, "documents")["documents"]
    return shared_span_regions(
        docs, "text", "doc_id", k=8, w=4, max_doc_freq=50, min_shared=2
    )


@register(
    "d3_shared_span_incremental",
    "D3 ⊕ (incremental span screening: batch vs persisted index)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    pos_t AS (
      SELECT doc_id, t, len(t) - 8 + 1 AS m,
             unnest(range(1, len(t) - 8 + 2)) AS pos
      FROM toks WHERE len(t) >= 8
    ),
    fps AS (
      SELECT doc_id, pos, m,
             md5(array_to_string(t[pos:pos+7], ' ')) AS fp
      FROM pos_t
    ),
    win AS (
      SELECT doc_id, pos, m,
             min(struct_pack(f := fp, p := pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS ws
      FROM fps
    ),
    sel AS MATERIALIZED (
      SELECT DISTINCT doc_id, (ws).f AS fp FROM win
      WHERE pos <= greatest(m - 4 + 1, 1)
    ),
    newb AS (SELECT doc_id AS new_id, fp FROM sel WHERE doc_id % 11 = 0),
    corp AS MATERIALIZED (SELECT doc_id AS corpus_id, fp FROM sel WHERE doc_id % 11 != 0),
    hot AS (SELECT fp FROM corp GROUP BY fp HAVING count(*) > 50),
    corp2 AS (SELECT * FROM corp WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT new_id, corpus_id, count(*) AS n_shared_fps
    FROM newb JOIN corp2 USING (fp)
    GROUP BY new_id, corpus_id
    HAVING count(*) >= 2
    """,
    doc="Incremental span screening (round-6 ⊕): an arriving batch's "
    "winnowed prints joined against the persisted corpus print index — "
    "the 100 TB deployment shape, linear in the batch instead of "
    "re-self-joining the corpus. The deterministic doc_id % 11 split "
    "stands in for batch-vs-corpus; the df cap applies to the CORPUS "
    "side (where boilerplate mass lives). Same (k=8, w=4) on both "
    "sides — the ≥ k+w-1-token guarantee composes only across equal "
    "parameters.",
)
def d3_shared_span_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (
        shared_span_pairs_incremental,
        winnowed_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    new_docs = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    corpus_prints = winnowed_fingerprints(corpus, "text", "doc_id", k=8, w=4)
    return shared_span_pairs_incremental(
        new_docs, corpus_prints, "text", "doc_id", k=8, w=4,
        max_doc_freq=50, min_shared=2,
    )


@register(
    "u7_bm25_topk",
    "U6+U7 ⊕ (lexical retrieval: Okapi BM25)",
    f"""
    WITH tok AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM tok),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    cnt AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM tok)
      GROUP BY doc_id, tok
    ),
    hits AS (SELECT * FROM cnt WHERE tok IN ('vector', 'hash', 'slow')),
    dfreq AS (SELECT tok, count(*) AS df FROM hits GROUP BY tok),
    scored AS (
      SELECT h.doc_id,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (h.tf * (1.2 + 1.0))
               / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
      FROM hits h
      JOIN dfreq USING (tok)
      JOIN dl ON h.doc_id = dl.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
             AS rank
    FROM (
      SELECT doc_id, round(sum(s), 6) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY round(sum(s), 6) DESC, doc_id ASC
      LIMIT 10
    )
    """,
    doc="Okapi BM25 top-10 for the fixed query {{vector, hash, slow}} — "
    "the lexical leg of the retrieval stack next to u7's vector legs "
    "(Lucene idf variant, k1=1.2 b=0.75). Scale shape: term counts are "
    "row-local and filtered to the query terms INSIDE the row, so only "
    "(doc, query-term) hits explode; df aggregates from those hits; "
    "N/avgdl is one broadcast row; orderBy+limit compiles to "
    "TakeOrderedAndProject. Ordered by the ROUNDED score with a doc_id "
    "tiebreak so last-ulp sum differences can't reorder across "
    "engines.",
)
def u7_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import bm25_topk

    docs = _t(spark, sf_dir, "documents")["documents"]
    return bm25_topk(docs, ["vector", "hash", "slow"], k=10)


@register(
    "u7_hybrid_rrf",
    "U7 ⊕ (hybrid retrieval: reciprocal-rank fusion)",
    f"""
    WITH tok AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM tok),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    cnt AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM tok)
      GROUP BY doc_id, tok
    ),
    hits AS (SELECT * FROM cnt WHERE tok IN ('vector', 'hash', 'slow')),
    dfreq AS (SELECT tok, count(*) AS df FROM hits GROUP BY tok),
    bm25_scored AS (
      SELECT h.doc_id,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (h.tf * (1.2 + 1.0))
               / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
      FROM hits h JOIN dfreq USING (tok)
      JOIN dl ON h.doc_id = dl.doc_id CROSS JOIN stats
    ),
    bm25_leg AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM (SELECT doc_id, round(sum(s), 6) AS score FROM bm25_scored
            GROUP BY doc_id ORDER BY round(sum(s), 6) DESC, doc_id LIMIT 30)
    ),
    tfidf_scored AS (
      SELECT h.doc_id, h.tf * ln((n_docs + 1.0) / (df + 1.0)) AS s
      FROM hits h JOIN dfreq USING (tok) CROSS JOIN stats
    ),
    tfidf_leg AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM (SELECT doc_id, round(sum(s), 6) AS score FROM tfidf_scored
            GROUP BY doc_id ORDER BY round(sum(s), 6) DESC, doc_id LIMIT 30)
    ),
    fused AS (
      SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf,
             count(*) AS n_lists
      FROM (SELECT * FROM bm25_leg UNION ALL SELECT * FROM tfidf_leg)
      GROUP BY doc_id
    )
    SELECT doc_id, rrf, CAST(n_lists AS BIGINT) AS n_lists
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
    "SIGIR'09): BM25 and tf-idf top-30 candidate lists for the same "
    "query fused as Σ 1/(60+rank) — the standard combiner for "
    "lexical+vector hybrid search, demonstrated here over two "
    "oracle-checkable lexical legs (swap either leg for "
    "brute_force_topk/ivf_topk output in production; rrf_fuse only "
    "needs (id, rank) lists). Union+groupBy fusion is linear in "
    "candidate mass — no n-way outer join. Rank windows run over "
    "post-limit (<=30-row) frames; every ordering is rounded-score + "
    "id, so ranks are engine-stable.",
)
def u7_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import term_counts, tokens
    from ..operators.similarity import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")["documents"]
    terms = ["vector", "hash", "slow"]
    bm25_leg = bm25_topk(docs, terms, k=30)
    # tf-idf leg: same row-local hit extraction, u10's idf weighting.
    terms_lit = F.array(*[F.lit(t) for t in terms])
    hits = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    term_counts(tokens(F.col("text"))),
                    lambda p: F.array_contains(terms_lit, p["term"]),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.term").alias("term"), F.col("p.tf").cast("long").alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))),
                6,
            ).alias("score")
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(30)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    tfidf_leg = top.select("doc_id", F.row_number().over(w).alias("rank"))
    return rrf_fuse([bm25_leg.select("doc_id", "rank"), tfidf_leg], k=10)


@register(
    "llm_k_anonymity",
    "U6 ⊕ (privacy governance: k-anonymity report)",
    """
    WITH g AS (
      SELECT lang, source,
             CAST(floor(n_chars / 100.0) AS BIGINT) AS size_bucket,
             count(*) AS grp_n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT CAST(min(grp_n) AS BIGINT) AS k_anonymity,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS rows_at_risk
    FROM g
    """,
    doc="k-anonymity risk report over the corpus's quasi-identifiers "
    "(lang, source, length bucket): the minimum equivalence-class size "
    "is the corpus's k; classes below the k=5 release threshold and the "
    "row mass inside them quantify re-identification exposure before a "
    "dataset ships. Two-level aggregation — one shuffle on the QI tuple, "
    "then a single-row collapse; the QI space, not the corpus, is the "
    "second stage's input, so the plan is scale-free.",
)
def llm_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    groups = docs.groupBy(
        "lang", "source", F.floor(F.col("n_chars") / 100.0).alias("size_bucket")
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    return groups.agg(
        F.min("grp_n").alias("k_anonymity"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0)).alias("n_small_groups"),
        F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    )


@register(
    "llm_l_diversity",
    "U6 ⊕ (privacy governance: l-diversity report)",
    """
    WITH g AS (
      SELECT lang,
             CAST(floor(n_chars / 100.0) AS BIGINT) AS size_bucket,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive,
             count(*) AS grp_n
      FROM documents GROUP BY 1, 2
    )
    SELECT CAST(min(n_sensitive) AS BIGINT) AS l_diversity,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN grp_n ELSE 0 END) AS BIGINT)
             AS rows_at_risk
    FROM g
    """,
    doc="l-diversity risk report — k-anonymity's complement (Machanavajjhala "
    "et al. 2007): a class can be large (k-safe) yet expose its members if "
    "every row shares one SENSITIVE value. Quasi-identifiers (lang, length "
    "bucket) against the sensitive attribute (source): per class, the "
    "distinct sensitive count; the corpus's l is the minimum, with classes "
    "below l=3 and their row mass quantifying attribute-disclosure "
    "exposure before a dataset ships. Same scale-free two-level shape as "
    "llm_k_anonymity — one QI-tuple shuffle with an exact-distinct expand, "
    "then a single-row collapse over the QI space.",
)
def llm_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    groups = docs.groupBy(
        "lang", F.floor(F.col("n_chars") / 100.0).alias("size_bucket")
    ).agg(
        F.countDistinct("source").alias("n_sensitive"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    return groups.agg(
        F.min("n_sensitive").alias("l_diversity"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("n_sensitive") < 3, 1).otherwise(0)).alias(
            "n_low_diversity"
        ),
        F.sum(F.when(F.col("n_sensitive") < 3, F.col("grp_n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    )


@register(
    "d3_line_dedup",
    "D3 ⊕ (cross-doc line/segment boilerplate removal)",
    """
    WITH lines AS (
      SELECT doc_id, p.i - 1 AS pos, p.line FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ls) + 1),
                                     i -> struct_pack(i := i, line := ls[i]))) AS p
        FROM (SELECT doc_id, string_split(text, ' ') AS ls FROM documents)
      )
    ),
    freq AS (SELECT line, count(DISTINCT doc_id) AS f FROM lines GROUP BY line)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE f < 300) AS BIGINT) AS n_kept,
           coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE f < 300), '')
             AS text_clean
    FROM lines JOIN freq USING (line)
    GROUP BY doc_id
    """,
    doc="CCNet/RefinedWeb-style cross-document segment dedup: any segment "
    "occurring in >= 300 distinct docs is boilerplate and is dropped "
    "everywhere; survivors re-join in original order and no doc is ever "
    "silently lost (fully-boilerplate docs come back empty). The graded "
    "entry runs the operator at word granularity (the fixture corpus is "
    "single-line); the newline-granularity path is pinned in "
    "tests/test_dedup.py on a multi-line corpus. One shuffle computes "
    "segment doc-frequency, one grouped pass reassembles — the segment "
    "string is the shard key, so the plan is the standard sharded "
    "line-hash removal at any scale.",
)
def d3_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents")["documents"]
    return line_dedup(
        docs, text_col="text", id_col="doc_id", min_doc_freq=300, delimiter=" "
    )


@register(
    "u9_triangle_count",
    "U ⊕ (graph analytics: triangle counting)",
    """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS ea,
                      greatest(s.s_nationkey, c.c_nationkey) AS eb
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e0 e1
    JOIN e0 e2 ON e1.eb = e2.ea
    JOIN e0 e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
    """,
    doc="Triangle counting over the nation-level trade graph (same edge "
    "derivation as u9_pagerank_nations): edges canonicalized to a < b, "
    "triangles enumerated once each via the two-hop equi-join "
    "(a,b)⋈(b,c)⋈(a,c) — the third join-based graph operator beside "
    "connected components and PageRank, and unlike those it IS "
    "SQL-expressible, so it carries a full oracle. Two shuffle joins on "
    "the edge list; no adjacency matrix, no driver state.",
)
def u9_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import triangle_count

    # rides the materialized trade-pair census (r14: the derivation is
    # a layout, not a per-query plan) — the layout is already canonical
    # ea < eb distinct, so triangle_count's canonicalization is a no-op
    # over ≤ nations² rows
    edges = _nation_trade_pairs(spark, sf_dir)
    return triangle_count(edges, "ea", "eb")


@register(
    "u7_mmr_rerank",
    "U7 ⊕ (diversified retrieval: MMR re-rank)",
    f"""
    WITH cand AS (
      SELECT query_id, vec_id, round(score, 6) AS score FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               {SQL_COSINE.format(a='q.embedding', b='c.embedding')} AS score,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {SQL_COSINE.format(a='q.embedding', b='c.embedding')} DESC,
                          c.vec_id ASC
               ) AS rk
        FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
        CROSS JOIN embeddings c
      ) WHERE rk <= 30
    )
    SELECT query_id, vec_id AS first_pick,
           round(0.7 * score, 6) AS first_mmr_score,
           CAST(10 AS BIGINT) AS n_selected,
           TRUE AS picks_distinct,
           TRUE AS picks_in_candidates
    FROM (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS mrk
      FROM cand
    ) WHERE mrk = 1
    """,
    doc="Maximal Marginal Relevance diversification (Carbonell & Goldstein "
    "1998) over the brute-force retriever's top-30 candidates: greedy "
    "lam*relevance - (1-lam)*max-sim-to-selected, k=10, lam=0.7. The "
    "per-query greedy loop is inherently sequential, so it runs as "
    "applyInPandas over query groups with candidate-set-bounded state "
    "(30 rows/group) — queries parallelize across executors; the full "
    "corpus is never touched past the first stage. The greedy TAIL is "
    "not SQL-expressible, but its HEAD is (round-8 rows-only "
    "whittling): with nothing selected yet, MMR's first pick is exactly "
    "argmax relevance, so the entry grades per query the first pick's "
    "id and mmr_score (= lam x top-1 rounded cosine — both engines "
    "value-match bit-for-bit) plus the selection invariants the greedy "
    "loop must honor: exactly k distinct picks, all drawn from the "
    "candidate set (oracle emits the literal TRUEs). The full greedy "
    "trajectory stays pinned against a pure-Python MMR reference in "
    "tests/test_similarity.py.",
)
def u7_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, mmr_rerank

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = brute_force_topk(
        queries, e, query_id="query_id", corpus_id="vec_id",
        query_vec="query_vec", corpus_vec="embedding", k=30, metric="cosine",
    ).join(e.select("vec_id", "embedding"), "vec_id")
    picked = mmr_rerank(cands, k=10, lam=0.7)
    per_pick = picked.join(
        cands.select("query_id", "vec_id", F.lit(True).alias("__is_cand")),
        ["query_id", "vec_id"],
        "left",
    )
    return (
        per_pick.groupBy("query_id")
        .agg(
            F.min_by("vec_id", "mmr_rank").alias("first_pick"),
            F.round(F.min_by("mmr_score", "mmr_rank"), 6).alias(
                "first_mmr_score"
            ),
            F.count(F.lit(1)).alias("n_selected"),
            (
                F.count_distinct("vec_id") == F.count(F.lit(1))
            ).alias("picks_distinct"),
            F.min(F.coalesce("__is_cand", F.lit(False))).alias(
                "picks_in_candidates"
            ),
        )
    )


@register(
    "llm_dsir_select",
    "U6 ⊕ (data selection: DSIR-style importance weights)",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({SQL_TOKS.format(col='text')}) AS tok FROM documents
    ),
    cnt AS (
      SELECT doc_id, lang, tok, count(*) AS ctf FROM tok GROUP BY 1, 2, 3
    ),
    freq AS (
      SELECT tok, sum(ctf) AS c_all,
             sum(CASE WHEN lang = 'en' THEN ctf ELSE 0 END) AS c_t
      FROM cnt GROUP BY tok
    ),
    tot AS (SELECT sum(c_all) AS n_all, sum(c_t) AS n_t, count(*) AS v FROM freq)
    SELECT doc_id, lang,
           round(sum(ctf * (ln((c_t + 1.0) / (n_t + v))
                            - ln((c_all + 1.0) / (n_all + v)))) / sum(ctf), 6)
             AS dsir_weight,
           CAST(sum(ctf) AS BIGINT) AS n_tokens
    FROM cnt JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id, lang
    ORDER BY dsir_weight DESC, doc_id LIMIT 50
    """,
    doc="DSIR-style data selection (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling', simplified to unigram "
    "features): per-doc mean importance weight ln(p_target/p_raw) under "
    "Laplace-smoothed unigram LMs, target = the corpus's English slice, "
    "raw = the whole corpus; the top-50 selection is the set an "
    "importance resampler would draw first. Same scale shape as "
    "u11_unigram_logprob: row-local term counts (no token-stream "
    "explode), ONE vocab-sized frequency agg computing both LMs in the "
    "same pass (conditional sums), a 1-row totals broadcast, and the "
    "per-doc regroup — the oracle reproduces the identical weighted "
    "algebra.",
)
def llm_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = _t(spark, sf_dir, "documents")["documents"]
    # Plain explode + hash agg beats row-local term_counts here (measured
    # 3.2x on the Zipf corpus): the map-side partial combine already
    # collapses the token stream to vocab-sized partials before either
    # shuffle, so pre-counting per row only adds an O(n log n) array sort
    # per doc. (Same u10 lesson, applied to counting instead of caching.)
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.count_if(F.col("lang") == "en").alias("c_t"),
    )
    tot = freq.agg(
        F.sum("c_all").alias("n_all"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    w = F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.col("v"))) - F.log(
        (F.col("c_all") + 1.0) / (F.col("n_all") + F.col("v"))
    )
    weights = freq.crossJoin(F.broadcast(tot)).select("tok", w.alias("w"))
    # ONE shuffle on doc_id, with the per-doc partial sums combining
    # map-side (52k groups, not 9M rows, cross the wire).
    return (
        tok.join(weights, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(F.sum("w") / F.count(F.lit(1)), 6).alias("dsir_weight"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(50)
    )


@register(
    "llm_corpus_drift",
    "U6 ⊕ (corpus drift: Jensen-Shannon divergence report)",
    f"""
    WITH tok AS (
      SELECT doc_id % 2 AS grp, unnest({SQL_TOKS.format(col='text')}) AS tok
      FROM documents
    ),
    cnt AS (SELECT grp, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    tots AS (SELECT grp, sum(c) AS n FROM cnt GROUP BY grp),
    probs AS (
      SELECT tok,
             coalesce(sum(CASE WHEN grp = 0 THEN c END), 0) * 1.0
               / (SELECT n FROM tots WHERE grp = 0) AS pa,
             coalesce(sum(CASE WHEN grp = 1 THEN c END), 0) * 1.0
               / (SELECT n FROM tots WHERE grp = 1) AS pb
      FROM cnt GROUP BY tok
    ),
    terms AS (
      SELECT tok, pa, pb,
             0.5 * (CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END)
           + 0.5 * (CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END)
               AS jsd_term
      FROM probs
    ),
    tot AS (SELECT round(sum(jsd_term), 6) AS js_divergence FROM terms)
    SELECT tok, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
           round(abs(pa - pb), 6) AS abs_diff, js_divergence
    FROM terms CROSS JOIN tot
    ORDER BY round(abs(pa - pb), 6) DESC, tok LIMIT 10
    """,
    doc="Corpus drift monitor: Jensen-Shannon divergence between the "
    "unigram distributions of two corpus slices (here the doc_id parity "
    "halves — in production, yesterday's crawl vs today's), plus the ten "
    "most-divergent tokens with both probabilities — the table an "
    "operator reads to see WHAT drifted, not just that it did. One "
    "vocab-sized conditional-sum agg computes both distributions in the "
    "same pass; per-group totals broadcast back as a 1-row join; every "
    "emitted float is rounded to 6 places for cross-engine determinism.",
)
def llm_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = _t(spark, sf_dir, "documents")["documents"]
    # Plain explode: the map-side combine collapses the stream to
    # vocab-sized partials, so per-row pre-counting would only add work
    # (measured 3.2x on the Zipf corpus — see llm_dsir_select).
    tok = docs.select(
        (F.col("doc_id") % 2).alias("grp"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    by_tok = tok.groupBy("tok").agg(
        F.count_if(F.col("grp") == 0).alias("ca"),
        F.count_if(F.col("grp") == 1).alias("cb"),
    )
    tots = by_tok.groupBy().agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    probs = by_tok.crossJoin(F.broadcast(tots)).select(
        "tok",
        (F.coalesce(F.col("ca"), F.lit(0)) * 1.0 / F.col("na")).alias("pa"),
        (F.coalesce(F.col("cb"), F.lit(0)) * 1.0 / F.col("nb")).alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    jsd_term = 0.5 * F.when(
        F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(0.0)
    terms = probs.select("tok", "pa", "pb", jsd_term.alias("jsd_term"))
    tot = terms.agg(F.round(F.sum("jsd_term"), 6).alias("js_divergence"))
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.round("pa", 6).alias("p_a"),
            F.round("pb", 6).alias("p_b"),
            F.round(F.abs(F.col("pa") - F.col("pb")), 6).alias("abs_diff"),
            "js_divergence",
        )
        .orderBy(F.desc("abs_diff"), "tok")
        .limit(10)
    )


def _corpus_build_sql() -> str:
    """Full-pipeline oracle: funnel survivors → temperature mixture →
    hash-coin sample → deterministic shuffle + pack."""
    from .catalog_text import _lang_scalar_sql, _quality_sql

    toks = SQL_TOKS.format(col="text")
    clean_toks = SQL_TOKS.format(col=SQL_CLEAN.format(col="text"))
    return f"""
    WITH lang AS ({_lang_scalar_sql()}),
    q AS ({_quality_sql()}),
    fp AS (SELECT doc_id,
                  md5(array_to_string(list_sort({clean_toks}), ' ')) AS fingerprint
           FROM documents),
    st2 AS (SELECT lang.doc_id FROM lang WHERE lang_guess = 'en'),
    st3 AS (SELECT st2.doc_id FROM st2 JOIN q ON st2.doc_id = q.doc_id
            WHERE q.quality >= 0.71),
    st4 AS (SELECT doc_id FROM (
              SELECT st3.doc_id,
                     min(st3.doc_id) OVER (PARTITION BY fp.fingerprint) AS m
              FROM st3 JOIN fp ON st3.doc_id = fp.doc_id)
            WHERE doc_id = m),
    tk AS (SELECT doc_id, {toks} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES.format(t='t')}) AS shingle FROM tk),
    c AS (SELECT doc_id AS corpus_id, shingle FROM sh WHERE doc_id % 97 != 0),
    b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT corpus_id AS doc_id FROM (
        SELECT corpus_id, bench_id, count(*) AS shared
        FROM c JOIN b USING (shingle)
        GROUP BY corpus_id, bench_id HAVING count(*) >= 3)),
    st5 AS (SELECT doc_id FROM st4 WHERE doc_id % 97 != 0
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
    surv AS (
      SELECT d.doc_id, d.source,
             CAST(len({toks}) AS BIGINT) AS n_tokens
      FROM documents d JOIN st5 USING (doc_id)
    ),
    per_src AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      FROM surv GROUP BY source
    ),
    rates AS (
      SELECT source,
             round(least(1.0, 20000.0 * pow(src_tokens, 0.5)
                   / sum(pow(src_tokens, 0.5)) OVER () / src_tokens), 6)
               AS rate
      FROM per_src
    ),
    sampled AS (
      SELECT surv.doc_id, surv.source, surv.n_tokens,
             CAST((surv.doc_id * 2654435761) % 4294967296 AS BIGINT)
               AS shuffle_key
      FROM surv JOIN rates USING (source)
      WHERE {_md5_coin_sql(23)} < rates.rate
    ),
    packed AS (
      SELECT doc_id, source, n_tokens, shuffle_key,
             sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_tokens
      FROM sampled
    )
    SELECT doc_id, source, n_tokens, shuffle_key,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS seq_first,
           CAST(floor((cum_tokens - 1) / 2048) AS BIGINT) AS seq_last
    FROM packed
    """


@register(
    "llm_corpus_build",
    "⊕ composed (funnel → mixture → sample → pack)",
    None,  # assigned post-def: the SQL builds on sibling-module helpers
    doc="The END-TO-END corpus build as ONE checked query: curation-"
    "funnel survivors (lang → quality → exact-dedup survivor → "
    "decontamination), temperature-scaled per-source sampling rates "
    "(τ=0.5 over SURVIVOR token mass, budget 20k tokens), layout-"
    "independent md5-coin sampling at those rates, then the "
    "deterministic Knuth shuffle + 2048-token sequence packing via the "
    "distributed prefix sum (pack_sequences — never a single-partition "
    "window). Every stage is an already-verified operator; this entry "
    "pins their COMPOSITION against one end-to-end oracle, which is "
    "what a user actually runs. Rates are rounded to 6 before the coin "
    "comparison on both engines so the sample boundary is semantically "
    "exact, not a last-ulp race.",
)
def llm_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import doc_fingerprint, lang_id, quality_score, token_count
    from ..operators.packing import pack_sequences
    from ..operators.sampling import hash_coin

    docs = _t(spark, sf_dir, "documents")["documents"]
    flags = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        (lang_id(F.col("text")) == "en").alias("is_en"),
        (quality_score(F.col("text")) >= 0.71).alias("is_q"),
        # internal-only window key: raw 16-byte digest, not the 32-char
        # hex (same §2.3 narrowing as llm_curation_funnel; unhex is
        # injective on md5 output so the survivor groups are identical)
        F.unhex(doc_fingerprint(F.col("text"))).alias("fingerprint"),
    ).withColumn("is_q", F.col("is_en") & F.col("is_q"))
    m = F.min(F.when(F.col("is_q"), F.col("doc_id"))).over(
        Window.partitionBy("fingerprint")
    )
    flags = flags.withColumn("is_surv", F.col("is_q") & (F.col("doc_id") == m))
    contaminated = (
        contamination_pairs(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "text",
            "doc_id",
            shingle_n=3,
            min_shared=3,
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )
    surv = (
        flags.join(contaminated, "doc_id", "left")
        .filter(
            F.col("is_surv")
            & (F.col("doc_id") % 97 != 0)
            & F.coalesce(~F.col("is_cont"), F.lit(True))
        )
        .select("doc_id", "source", "n_tokens")
    )
    per_src = surv.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    rw = F.pow(F.col("src_tokens"), 0.5)
    rates = per_src.select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(20000.0)
                * rw
                / F.sum(rw).over(Window.partitionBy())
                / F.col("src_tokens"),
            ),
            6,
        ).alias("rate"),
    )
    sampled = (
        surv.join(F.broadcast(rates), "source")
        .filter(hash_coin(F.col("doc_id"), 23, method="md5") < F.col("rate"))
        .select("doc_id", "source", "n_tokens")
    )
    packed = pack_sequences(sampled, "doc_id", "n_tokens", seq_len=2048)
    return (
        packed.join(sampled.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id", "source", "n_tokens", "shuffle_key", "seq_first", "seq_last"
        )
    )


# The oracle references sibling-module SQL helpers; attach it after
# registration (QuerySpec is a frozen dataclass).
import dataclasses as _dc  # noqa: E402

from .catalog import REGISTRY as _REG  # noqa: E402

_REG["llm_corpus_build"] = _dc.replace(
    _REG["llm_corpus_build"], oracle=_corpus_build_sql()
)


def _quality_classifier_weights() -> tuple[list[float], int]:
    """The catalog's demo model: prose indicators +1 (stopwords + common
    verbs), boilerplate/junk −1 — stands in for a trained fastText
    weight vector (same shape, same scoring path)."""
    from ..functions.text import STOPWORDS
    from ..operators.classifier import lexicon_weights

    dim = 256
    prose = STOPWORDS + ["is", "was", "with", "for", "that", "this"]
    junk = ["click", "subscribe", "buy", "free", "winner", "offer",
            "discount", "casino"]
    return lexicon_weights(dim, prose, junk), dim


def _quality_classifier_sql() -> str:
    weights, dim = _quality_classifier_weights()
    w_lit = "[" + ", ".join(f"{v!r}" for v in weights) + "]"
    toks = SQL_TOKS.format(col="text")
    n = SQL_TOKEN_COUNT.format(col="text")
    bucket = (
        "CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % " + str(dim)
    )
    return f"""
    WITH w AS (SELECT {w_lit} AS w),
    scored AS (
      SELECT doc_id,
             CAST({n} AS INTEGER) AS n_tokens,
             CAST(list_aggregate(list_transform({toks},
                    tok -> w[({bucket}) + 1]), 'sum') AS DOUBLE) AS dot_raw
      FROM documents CROSS JOIN w
    )
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(dot_raw, 6) END AS dot,
           CASE WHEN n_tokens = 0 THEN CAST(0.5 AS DOUBLE)
                ELSE round(1 / (1 + exp(-(dot_raw / n_tokens))), 6)
           END AS margin_prob,
           CASE WHEN n_tokens = 0 THEN false
                ELSE dot_raw > 0 END AS keep
    FROM scored
    """


@register(
    "llm_quality_classifier",
    "U6 ⊕ (hashed linear quality classifier, fastText-style)",
    _quality_classifier_sql(),
    doc="Classifier-based quality filtering — the GPT-3 (Brown et al. "
    "2020 App. A) / CCNet curation stage the rule-based u6_gopher_rules "
    "and score-based u6_quality_score sit beside: σ(w·x) over hashed "
    "bag-of-words features (token → md5 bucket mod 256, the "
    "engine-portable hashing trick). Training is offline; the engine "
    "owns SCORING at scale — the weight vector is a folded literal "
    "array, each doc's dot product is a row-local F.aggregate over its "
    "token buckets: NO explode, NO join, NO shuffle, NO Python — one "
    "narrow scan scores 100 TB (operators/classifier.py). keep decides "
    "on the raw margin's sign, never the rounded probability. Demo "
    "weights are lexicon-derived (+1 prose, −1 junk) so both engines "
    "inline identical integer-valued doubles; a real deployment passes "
    "its trained weights through the same path.",
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import hashed_linear_score

    weights, _dim = _quality_classifier_weights()
    docs = _t(spark, sf_dir, "documents")["documents"]
    return hashed_linear_score(docs, weights, bias=0.0)


@register(
    "d3_containment_pairs",
    "D3 ⊕ (asymmetric shingle containment)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='t')} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    shared AS (
      SELECT l.doc_id AS src_id, r.doc_id AS dst_id, count(*) AS shared
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id <> r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT src_id, dst_id,
           round(shared * 1.0 / sa.n_sh, 6) AS containment
    FROM shared
    JOIN sizes sa ON sa.doc_id = src_id
    WHERE shared * 1.0 / sa.n_sh >= 0.8
    """,
    doc="Asymmetric containment |S(src)∩S(dst)|/|S(src)| ≥ 0.8 — the "
    "quote/excerpt detector Jaccard structurally misses (a short doc "
    "embedded in a long one has tiny Jaccard but containment ≈ 1 from "
    "the short side; Broder 1997's resemblance/containment pairing). "
    "DIRECTED pairs tell the dedup policy which copy is the excerpt "
    "(drop src, keep dst). Same scale shape as d3_ngram_jaccard: "
    "shingle inverted-index equi-join, never all-pairs; the df-capped "
    "variant (operators/dedup.py::shingle_containment_pairs "
    "max_doc_freq) bounds hot-shingle fan-out at corpus scale with "
    "exact re-verification over full shingle arrays.",
)
def d3_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_containment_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return shingle_containment_pairs(docs, "text", "doc_id", n=3, threshold=0.8)


@register(
    "d3_containment_capped",
    "D3 ⊕ (asymmetric containment, df-capped index)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='t')} AS shingles FROM toks),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    freq AS (SELECT shingle, count(*) AS c FROM inv GROUP BY shingle),
    capped AS (
      SELECT inv.doc_id, inv.shingle FROM inv JOIN freq USING (shingle)
      WHERE c <= 4
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS src_id, r.doc_id AS dst_id
      FROM capped l JOIN capped r
        ON l.shingle = r.shingle AND l.doc_id <> r.doc_id
    )
    SELECT src_id, dst_id,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
                 len(sa.shingles), 6) AS containment
    FROM cand
    JOIN sh sa ON sa.doc_id = src_id
    JOIN sh sb ON sb.doc_id = dst_id
    WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
          len(sa.shingles) >= 0.8
    """,
    doc="d3_containment_pairs' scale shape: candidates from the df≤4 "
    "capped index (hot boilerplate shingles dropped by a broadcast anti "
    "join before the self-join — cap² fan-out per shingle instead of "
    "df²), containment then verified EXACTLY over full shingle arrays, "
    "so values are never distorted; only pairs overlapping solely on "
    "boilerplate can be missed. Measured on the 52k-doc Zipf corpus the "
    "cap is the difference between GC-pressure minutes and seconds "
    "(BASELINE §round-6c).",
)
def d3_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_containment_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return shingle_containment_pairs(
        docs, "text", "doc_id", n=3, threshold=0.8, max_doc_freq=4
    )


@register(
    "llm_pii_scrub",
    "U6 ⊕ (PII detection + redaction)",
    r"""
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or ' || CAST(doc_id % 900 + 100 AS VARCHAR)
                  || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(t,
             '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
           CAST(length(
             regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')
           ) AS BIGINT) AS redacted_len
    FROM pii
    """,
    doc="PII detection + redaction — the corpus-release scrub step: "
    "per-doc email / phone / IPv4 match counts and the length of the "
    "text after chained placeholder redaction. Row-local regex work "
    "only (zero shuffles; whole-stage-codegen'd, no Python); the "
    "patterns stay in the RE2-compatible subset so Java and DuckDB "
    "match identically. The fixture text is synthetic words with no "
    "digits, so the entry deterministically APPENDS one email, one "
    "phone, one IP derived from doc_id before scrubbing — both engines "
    "construct the identical string, the counts and redacted lengths "
    "carry real nonzero cross-engine values, and the scrubber is "
    "exercised end-to-end rather than vacuously counting zeros.",
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\d{3}-\d{3}-\d{4}"
    ip = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or "),
        (F.col("doc_id") % 900 + 100).cast("string"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"
        ),
        ip,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(phone)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(ip)).cast("long").alias("n_ips"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


@register(
    "u6_url_normalize",
    "U6 ⊕ (URL parsing + canonicalization)",
    r"""
    WITH urls AS (
      SELECT doc_id,
             'https://sub' || CAST(doc_id % 7 AS VARCHAR) || '.example'
               || CAST(doc_id % 3 AS VARCHAR) || '.com/p/'
               || CAST(doc_id AS VARCHAR) || '/x?utm_source=feed&id='
               || CAST(doc_id % 50 AS VARCHAR) || '&utm_medium=rss#frag'
               AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '([a-z0-9-]+\.[a-z]+)$',
             1) AS reg_domain_probe,
           regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
             '([a-z0-9-]+\.[a-z0-9-]+)$', 1) AS registrable_domain,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(url,
             '#.*$', '', 'g'),
             '(\?|&)utm_[a-z]+=[^&#]*', '\1', 'g'),
             '&+', '&', 'g'),
             '\?&', '?', 'g'),
             '[?&]+$', '', 'g') AS canonical_probe,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
    FROM urls
    """,
    doc="URL parse + canonicalize — the crawl-pipeline normalization "
    "step (dedup by registrable domain, strip tracking params, drop "
    "fragments) expressed entirely in RE2-portable regex so Spark and "
    "DuckDB extract identical pieces: host, registrable domain "
    "(last two labels of the host), path, the utm_*-stripped "
    "fragment-free canonical form, and a named query parameter. "
    "Spark's parse_url exists but has no DuckDB twin — the regex form "
    "IS the oracle-checkable contract, and stays row-local / "
    "zero-shuffle / codegen'd. Fixture docs carry no URLs, so a "
    "deterministic URL is composed from doc_id (the llm_pii_scrub "
    "injection pattern) — every extracted value is a real nonzero "
    "cross-engine match.",
)
def u6_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    url = F.concat(
        F.lit("https://sub"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".com/p/"),
        F.col("doc_id").cast("string"),
        F.lit("/x?utm_source=feed&id="),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("&utm_medium=rss#frag"),
    )
    host = F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1)
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.regexp_extract(url, r"([a-z0-9-]+\.[a-z]+)$", 1).alias(
            "reg_domain_probe"
        ),
        F.regexp_extract(host, r"([a-z0-9-]+\.[a-z0-9-]+)$", 1).alias(
            "registrable_domain"
        ),
        F.regexp_extract(url, r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias("path"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(url, r"#.*$", ""),
                        r"(\?|&)utm_[a-z]+=[^&#]*",
                        r"$1",
                    ),
                    r"&+",
                    "&",
                ),
                r"\?&",
                "?",
            ),
            r"[?&]+$",
            "",
        ).alias("canonical_probe"),
        F.regexp_extract(url, r"[?&]id=([^&#]*)", 1).alias("id_param"),
    )


@register(
    "u7_radius_search",
    "U7 ⊕ (threshold / radius similarity search)",
    f"""
    SELECT query_id, vec_id, round(score, 6) AS score FROM (
      SELECT q.vec_id AS query_id, c.vec_id,
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} AS score
      FROM (SELECT * FROM embeddings WHERE vec_id < 6) q
      CROSS JOIN embeddings c
      WHERE q.vec_id != c.vec_id
    ) WHERE round(score, 6) >= 0.12
    """,
    doc="Radius search — ALL corpus vectors within a similarity "
    "threshold of each query (cosine >= tau, self excluded), the "
    "retrieval mode dedup sweeps and recall-oriented RAG use when "
    "top-k's fixed cutoff is wrong (result count varies per query; "
    "top-k is u7_knn_bruteforce). Same scale shape as the exact knn "
    "baseline: broadcast query set x one corpus scan with hoisted "
    "norms, no window needed — the threshold filter replaces the "
    "rank cutoff, so the plan is pure scan+filter (no top-k sort at "
    "all). At 100 TB the first stage swaps for the IVF probe join "
    "exactly like knn; every returned score is exact.",
)
def u7_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.arrays import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return (
        F.broadcast(q)
        .crossJoin(e.select("vec_id", "embedding"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_similarity(F.col("qv"), F.col("embedding")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= 0.12)
    )


@register(
    "u7_int8_ann",
    "U7 ⊕ (int8 scalar-quantized retrieval)",
    """
    WITH z AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * 127.0 /
                 list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))
               ) AS BIGINT)) AS qv
      FROM embeddings
      WHERE list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
    ),
    zn AS (
      SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS n2
      FROM z
    )
    SELECT query_id, vec_id, int_dot, round(qcos, 6) AS qcos, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS int_dot,
             CAST(CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS DOUBLE)
               / sqrt(CAST(q.n2 * c.n2 AS DOUBLE)) AS qcos,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY CAST(CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS DOUBLE)
                          / sqrt(CAST(q.n2 * c.n2 AS DOUBLE)) DESC,
                        c.vec_id ASC
             ) AS INTEGER) AS rank
      FROM (SELECT * FROM zn WHERE vec_id < 4) q
      CROSS JOIN zn c
      WHERE q.vec_id != c.vec_id
    ) WHERE rank <= 10
    """,
    doc="Top-k retrieval over int8 scalar-quantized embeddings (FAISS "
    "SQ8 recipe): q_i = round(x_i * 127 / max|x|) per vector, score = "
    "quantized cosine int_dot / sqrt(qnorm2_q * qnorm2_c) — the "
    "per-vector scales cancel, so no dequantization float path exists "
    "at all. The whole score is integers plus one IEEE-exact sqrt and "
    "one division, which is why a quantized ANN stage can carry a FULL "
    "value-equality oracle (float dot products cannot — accumulation "
    "order). Production value: the corpus column shrinks 4x (1 byte/dim) "
    "— at 100 TB of embeddings that is the difference between spilling "
    "and scanning; the plan is the u7_knn shape (broadcast queries x "
    "one corpus scan, WindowGroupLimit top-k) with an integer inner "
    "loop. operators/similarity.py::int8_quantize/int8_topk.",
)
def u7_int8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import int8_topk

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return int8_topk(
        queries,
        e,
        query_id="query_id",
        corpus_id="vec_id",
        query_vec="query_vec",
        corpus_vec="embedding",
        k=10,
    )


@register(
    "llm_quantile_normalize",
    "U6 ⊕ (cross-source score calibration)",
    """
    WITH per_v AS (
      SELECT source, n_chars, count(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, n_chars,
             sum(c) OVER (PARTITION BY source ORDER BY n_chars) - c AS cum_prev,
             sum(c) OVER (PARTITION BY source) AS n_src
      FROM per_v
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round(CAST(r.cum_prev AS DOUBLE) / (r.n_src - 1), 6) AS pct_in_source
    FROM documents d
    JOIN ranked r ON r.source = d.source AND r.n_chars = d.n_chars
    """,
    doc="Quantile normalization of a per-document score ACROSS sources "
    "(here n_chars as the score): pct_in_source = percent_rank within "
    "the document's source, ties sharing the min-rank — the calibration "
    "step before mixing heterogeneously-scored corpora under one global "
    "threshold (a web-crawl '0.8 quality' and a books '0.8' are not the "
    "same animal; their within-source quantiles are). Scale shape: NOT "
    "a data-sized per-source sort — counts per (source, value) first "
    "(one shuffle), percent_rank derived on the bounded value DOMAIN "
    "via the a46/KS running-sum trick, then joined back (the domain "
    "frame broadcasts). Exact integers until one final division. At "
    "100 TB the same plan holds; the approximate variant (fixed "
    "quantile grid via a12/a39 sketches) trades the join for a "
    "broadcast lookup.",
)
def llm_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")["documents"]
    per_v = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("source")
    ranked = per_v.select(
        "source",
        "n_chars",
        (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
        F.sum("c").over(wall).alias("n_src"),
    )
    return docs.select("doc_id", "source", "n_chars").join(
        F.broadcast(ranked), ["source", "n_chars"]
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.col("cum_prev").cast("double") / (F.col("n_src") - 1), 6).alias(
            "pct_in_source"
        ),
    )


@register(
    "d3_simhash_md5",
    "D3 ⊕ (SimHash full-oracle twin)",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES.format(t='t')}) AS s FROM toks),
    h AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) AS hv
          FROM sh),
    votes AS (
      SELECT doc_id, bit,
             sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(60)) AS bit) bits
      GROUP BY 1, 2
    ),
    sigs AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
      FROM votes GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
    doc="SimHash near-dup pairs on the engine-portable md5 coin — the "
    "d3_minhash_md5 move applied to the signed-projection family, "
    "closing the last near-dup technique without a full oracle twin: "
    "60-bit per-shingle md5 hash, per-bit majority vote, sign-packed "
    "BIGINT signature, pairs at hamming<=3. Spark finds pairs via the "
    "4-band pigeonhole equi-join (radius 3 over 4 slices is LOSSLESS, "
    "and the join is hash-shaped, never all-pairs); the oracle "
    "recomputes signatures from scratch and brute-forces every pair — "
    "a driver grade is simultaneously a signature value-equality proof "
    "AND a banding losslessness proof. xxhash64 SimHash "
    "(d3_simhash_pairs) stays the production coin; recall/radius "
    "behavior pinned in tests/test_zipf_dedup.py. "
    "operators/dedup.py::simhash_md5_pairs.",
)
def d3_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_md5_pairs

    docs = _t(spark, sf_dir, "documents")["documents"]
    return simhash_md5_pairs(docs, "text", "doc_id", max_hamming=3, bands=4)


@register(
    "u7_ivf_int8_topk",
    "U7 ⊕ (IVF + SQ8 composed layout)",
    """
    WITH z AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * 127.0 /
                 list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))
               ) AS BIGINT)) AS qv
      FROM embeddings
      WHERE list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
    ),
    zn AS (
      SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS n2
      FROM z
    )
    SELECT q.vec_id AS query_id,
           round(max(CASE WHEN c.vec_id != q.vec_id THEN
             CAST(CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS DOUBLE)
               / sqrt(CAST(q.n2 * c.n2 AS DOUBLE)) END), 6)
             AS exact_max_qcos_nonself,
           TRUE AS routed_from_probed_lists,
           TRUE AS rerank_is_exact_qcos,
           TRUE AS top1_bounded,
           TRUE AS nonempty
    FROM (SELECT * FROM zn WHERE vec_id < 4) q
    CROSS JOIN zn c
    GROUP BY q.vec_id
    """,
    doc="IVF + SQ8, the standard production ANN pairing (FAISS "
    "'IVF,SQ8'): centroid routing bounds WHICH rows a query touches, "
    "int8 quantization bounds the bytes and inner-loop cost per touched "
    "row (4x smaller lists than raw floats). Contract-graded like "
    "u7_knn_ivf, but with a STRONGER value anchor than the float "
    "family can carry: exact_max_qcos_nonself is the brute-force "
    "QUANTIZED-cosine max — deterministic because quantization is a "
    "pure integer function, so both engines compute it bit-for-bit. "
    "Plus: routing containment, an independent integer-dot recheck of "
    "every returned score, and the corpus-max bound. "
    "operators/similarity.py::ivf_int8_topk.",
)
def u7_ivf_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity
    from ..operators.similarity import int8_quantize, ivf_int8_topk

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    centroids = sample_centroids(e, num_centroids=16)
    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivf_int8_topk(
        queries,
        e,
        centroids,
        query_id="query_id",
        corpus_id="vec_id",
        query_vec="query_vec",
        corpus_vec="embedding",
        k=10,
        nprobe=4,
    )

    # probe mirror (same centroids frame) for the routing check
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_score"), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine_similarity(F.col("query_vec"), F.col("centroid_vec")).alias(
                "c_score"
            ),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= 4)
        .select("query_id", "centroid_id", F.lit(True).alias("__probed"))
    )
    indexed = assign_centroids(e, centroids)
    routed_ok = (
        res.join(indexed.select("vec_id", "centroid_id"), "vec_id")
        .join(probes, ["query_id", "centroid_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(F.coalesce("__probed", F.lit(False))).alias(
                "routed_from_probed_lists"
            )
        )
    )
    # independent quantized-cosine recheck + brute-force quantized max
    cz = int8_quantize(e, "embedding", out_q="__cq", out_norm2="__cn2").select(
        "vec_id", "__cq", "__cn2"
    )
    qz = int8_quantize(queries, "query_vec", out_q="__qq", out_norm2="__qn2").select(
        "query_id", "__qq", "__qn2"
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("__cq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    all_scored = (
        cz.crossJoin(F.broadcast(qz))
        .withColumn("__dot", int_dot)
        .withColumn(
            "__qcos",
            F.col("__dot").cast("double")
            / F.sqrt((F.col("__qn2") * F.col("__cn2")).cast("double")),
        )
    )
    score_ok = (
        res.join(
            all_scored.select("query_id", "vec_id", "__dot", "__qcos"),
            ["query_id", "vec_id"],
        )
        .select(
            "query_id",
            (
                (F.col("__dot") == F.col("int_dot"))
                & (F.round("__qcos", 6) == F.col("qcos"))
            ).alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("rerank_is_exact_qcos"))
    )
    stats = (
        all_scored.groupBy("query_id")
        .agg(
            F.round(
                F.max(
                    F.when(F.col("vec_id") != F.col("query_id"), F.col("__qcos"))
                ),
                6,
            ).alias("exact_max_qcos_nonself"),
            F.max("__qcos").alias("__max_all"),
        )
    )
    top1 = res.filter(F.col("rank") == 1).select(
        "query_id", F.col("qcos").alias("__top1")
    )
    counts = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(stats, "query_id")
        .join(routed_ok, "query_id")
        .join(score_ok, "query_id")
        .join(top1, "query_id")
        .select(
            "query_id",
            "exact_max_qcos_nonself",
            "routed_from_probed_lists",
            "rerank_is_exact_qcos",
            (F.col("__top1") <= F.col("__max_all") + F.lit(1e-6)).alias(
                "top1_bounded"
            ),
            (F.col("__n") >= 1).alias("nonempty"),
        )
    )


@register(
    "llm_preference_pairs",
    "U6 ⊕ (preference-pair construction)",
    f"""
    WITH scored AS (
      SELECT doc_id, source,
             {SQL_TOKEN_COUNT.format(col='text')} AS n_toks
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_toks,
             row_number() OVER (
               PARTITION BY source ORDER BY n_toks DESC, doc_id ASC) AS r_top,
             row_number() OVER (
               PARTITION BY source ORDER BY n_toks ASC, doc_id ASC) AS r_bot,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM scored
    )
    SELECT a.source,
           a.doc_id AS chosen_id, b.doc_id AS rejected_id,
           CAST(a.n_toks AS BIGINT) AS chosen_score,
           CAST(b.n_toks AS BIGINT) AS rejected_score,
           CAST(a.r_top AS BIGINT) AS pair_rank
    FROM ranked a
    JOIN ranked b ON a.source = b.source AND a.r_top = b.r_bot
    WHERE a.r_top <= 5 AND a.r_top * 2 <= a.n_src
      AND a.n_toks > b.n_toks
    """,
    doc="Preference-pair construction for reward-model / DPO training "
    "data: per source, pair the k-th HIGHEST-scored document with the "
    "k-th LOWEST (here score = token count as the stand-in quality "
    "signal) — extreme-pairing maximizes the score margin per pair, "
    "equal-rank pairing keeps pairs disjoint, total-order tiebreaks "
    "(score, doc_id) make the pairing a pure function of the data, and "
    "the margin guard (chosen > rejected) drops degenerate pairs on "
    "tiny sources. Two rank windows per source partition + one "
    "rank-keyed self-join; at corpus scale the rank windows become the "
    "llm_quantile_normalize domain trick if sources are mega-partition "
    "sized.",
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import token_count

    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_toks")
    )
    w_top = Window.partitionBy("source").orderBy(
        F.desc("n_toks"), F.asc("doc_id")
    )
    w_bot = Window.partitionBy("source").orderBy(
        F.asc("n_toks"), F.asc("doc_id")
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "n_toks",
        F.row_number().over(w_top).alias("r_top"),
        F.row_number().over(w_bot).alias("r_bot"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_src"),
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.r_top") == F.col("b.r_bot")),
        )
        .filter(
            (F.col("a.r_top") <= 5)
            & (F.col("a.r_top") * 2 <= F.col("a.n_src"))
            & (F.col("a.n_toks") > F.col("b.n_toks"))
        )
        .select(
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("chosen_id"),
            F.col("b.doc_id").alias("rejected_id"),
            F.col("a.n_toks").cast("long").alias("chosen_score"),
            F.col("b.n_toks").cast("long").alias("rejected_score"),
            F.col("a.r_top").cast("long").alias("pair_rank"),
        )
    )


@register(
    "u6_shingle_novelty",
    "U6 ⊕ (inter-source novelty rate)",
    f"""
    WITH toks AS (SELECT doc_id, source, {SQL_TOKS.format(col='text')} AS t
                  FROM documents),
    sh AS (
      SELECT DISTINCT source, unnest({SQL_SHINGLES.format(t='t')}) AS s
      FROM toks
    ),
    spread AS (
      SELECT s, count(DISTINCT source) AS n_src FROM sh GROUP BY 1
    )
    SELECT sh.source,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE spread.n_src = 1) AS BIGINT)
             AS n_unique,
           round(CAST(count(*) FILTER (WHERE spread.n_src = 1) AS DOUBLE)
                 / count(*), 6) AS novelty_rate
    FROM sh JOIN spread USING (s)
    GROUP BY 1
    """,
    doc="Inter-source novelty: per source, the fraction of its DISTINCT "
    "word shingles that appear in NO other source — the redundancy "
    "diagnostic that tells a corpus mixer which sources actually add "
    "content versus re-serve what another source already contributes "
    "(low novelty ⇒ a candidate for downweighting before the dedup "
    "pass even runs). One shingle-keyed shuffle to count source spread "
    "+ one source-keyed fold; counts are exact integers, one rounded "
    "division. The shingle domain, not the document count, sizes the "
    "shuffle — the same reason the d3 family scales.",
)
def u6_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _spread, word_shingles

    docs = _t(spark, sf_dir, "documents")["documents"]
    sh = (
        _spread(docs.select("doc_id", "source", "text"), "doc_id")
        .select("source", F.explode(word_shingles(F.col("text"), 3)).alias("s"))
        .distinct()
    )
    spread = sh.groupBy("s").agg(F.countDistinct("source").alias("n_src"))
    uniq = F.count(F.when(F.col("n_src") == 1, 1))
    return (
        sh.join(spread, "s")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            uniq.cast("long").alias("n_unique"),
            F.round(uniq.cast("double") / F.count(F.lit(1)), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "u9_clustering_coeff",
    "U ⊕ (graph analytics: local clustering coefficient)",
    """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    ptot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, ptot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea AS v, eb AS u FROM e0
      UNION ALL SELECT eb, ea FROM e0
    ),
    deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    tri AS MATERIALIZED (
      SELECT w.v, CAST(count(*) AS BIGINT) AS t
      FROM (
        SELECT a.v, a.u AS x, b.u AS y
        FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
      ) w
      JOIN e0 ON e0.ea = w.x AND e0.eb = w.y
      GROUP BY 1
    )
    SELECT deg.v AS id, deg.d AS degree,
           CAST(coalesce(tri.t, 0) AS BIGINT) AS n_wedges_closed,
           round(CAST(coalesce(tri.t, 0) AS DOUBLE) * 2
                 / (deg.d * (deg.d - 1)), 6) AS clustering_coeff
    FROM deg LEFT JOIN tri ON tri.v = deg.v
    WHERE deg.d >= 2
    """,
    doc="Local clustering coefficient per node over the undirected "
    "nation trade graph, SPARSIFIED to above-average-volume pairs by "
    "the integer test vol*n_pairs > total (the u9_pagerank_nations "
    "move: the raw pair graph is complete at every SF, where every "
    "coefficient is trivially 1.0) — closed wedges / possible "
    "wedges, the 'how clique-like is this node's neighborhood' metric "
    "that complements global triangle counting (u9_triangle_count uses "
    "the same canonical-edge derivation): wedges at v enumerate as the "
    "neighbor self-join (u < w), closure checks against the canonical "
    "edge list — three equi-joins, no adjacency matrix, no driver "
    "state. Exact integer wedge counts; one rounded division.",
)
def u9_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rides the materialized trade-pair census (r14) — identical
    # derivation, persisted once per fixture dir
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = (
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("ea", "eb")
    )
    sym = e0.select(F.col("ea").alias("v"), F.col("eb").alias("u")).unionByName(
        e0.select(F.col("eb").alias("v"), F.col("ea").alias("u"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = sym.alias("a"), sym.alias("b")
    wedges = a.join(
        b, (F.col("a.v") == F.col("b.v")) & (F.col("a.u") < F.col("b.u"))
    ).select(F.col("a.v").alias("v"), F.col("a.u").alias("x"), F.col("b.u").alias("y"))
    tri = (
        wedges.join(
            e0, (F.col("ea") == F.col("x")) & (F.col("eb") == F.col("y"))
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return (
        deg.join(tri, "v", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("v").cast("long").alias("id"),
            F.col("d").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_wedges_closed"),
            F.round(
                F.coalesce("t", F.lit(0)).cast("double") * 2
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


@register(
    "u9_link_prediction",
    "U ⊕ (graph analytics: Adamic-Adar link prediction)",
    """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    ptot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, ptot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea AS v, eb AS u FROM e0
      UNION ALL SELECT eb, ea FROM e0
    ),
    deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    wedge AS MATERIALIZED (
      SELECT a.v AS c, a.u AS x, b.u AS y
      FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
    ),
    cand AS MATERIALIZED (
      SELECT w.x, w.y, w.c FROM wedge w
      LEFT JOIN e0 ON e0.ea = w.x AND e0.eb = w.y
      WHERE e0.ea IS NULL
    )
    SELECT CAST(cand.x AS BIGINT) AS id_a, CAST(cand.y AS BIGINT) AS id_b,
           CAST(count(*) AS BIGINT) AS n_common,
           round(sum(1.0 / ln(deg.d)), 6) AS aa_score
    FROM cand JOIN deg ON deg.v = cand.c
    GROUP BY cand.x, cand.y
    """,
    doc="Adamic-Adar link prediction over the sparsified nation trade "
    "graph (same canonical-edge derivation as u9_clustering_coeff / "
    "u9_triangle_count): for each NON-adjacent pair, score common "
    "neighbors weighted by 1/ln(degree) — rare hubs certify a likely "
    "future edge, ubiquitous ones don't (Adamic & Adar 2003; the "
    "LinkedIn people-you-may-know family). Wedge centers have degree "
    ">= 2 by construction, so ln(d) > 0 without a guard. Scale shape: "
    "the wedge self-join and the adjacency anti-join are node-domain "
    "sized (the clustering-coeff adjudication); counts are exact ints "
    "and the only float is the 1/ln(d) sum, rounded at 6.",
)
def u9_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cache_registry import track

    # rides the materialized trade-pair census (r14) — identical
    # derivation, persisted once per fixture dir
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    # The 4-table fact join feeding the edge list is read by FIVE plan
    # branches (sym x2, wedge x2, the anti probe, deg) — persist the
    # ~node-domain-sized edge list once (tracked; see cache_registry
    # module doc for the ownership contract).
    e0 = track(
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("ea", "eb")
    )
    sym = e0.select(F.col("ea").alias("v"), F.col("eb").alias("u")).unionByName(
        e0.select(F.col("eb").alias("v"), F.col("ea").alias("u"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = sym.alias("a"), sym.alias("b")
    wedge = a.join(
        b, (F.col("a.v") == F.col("b.v")) & (F.col("a.u") < F.col("b.u"))
    ).select(
        F.col("a.v").alias("c"), F.col("a.u").alias("x"), F.col("b.u").alias("y")
    )
    cand = wedge.join(
        e0,
        (F.col("ea") == F.col("x")) & (F.col("eb") == F.col("y")),
        "left_anti",
    )
    return (
        cand.join(F.broadcast(deg), F.col("v") == F.col("c"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("aa_score"),
        )
        .select(
            F.col("x").cast("long").alias("id_a"),
            F.col("y").cast("long").alias("id_b"),
            "n_common",
            "aa_score",
        )
    )


@register(
    "u9_degree_assortativity",
    "U ⊕ (graph analytics: degree assortativity)",
    """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    ptot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, ptot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea AS v, eb AS u FROM e0
      UNION ALL SELECT eb, ea FROM e0
    ),
    deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    ends AS MATERIALIZED (
      SELECT dv.d AS x, du.d AS y
      FROM sym
      JOIN deg dv ON dv.v = sym.v
      JOIN deg du ON du.v = sym.u
    ),
    sums AS (
      SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM ends
    )
    SELECT CAST(m / 2 AS BIGINT) AS n_edges,
           round((m * sxy - sx * sy) * 1.0
                 / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)),
                 6) AS assortativity
    FROM sums
    """,
    doc="Degree assortativity (Newman 2002) of the sparsified nation "
    "trade graph: Pearson correlation of endpoint degrees over the "
    "DIRECTED edge multiset (both orientations, the standard undirected "
    "convention) — positive means hubs trade with hubs, negative the "
    "hub-and-spoke shape; completes the graph family beside "
    "triangles/clustering/pagerank/link-prediction, all sharing one "
    "canonical-edge derivation. Degrees and every power sum are exact "
    "integers; the single float expression (one closed-form Pearson on "
    "six exact operands) is deterministic IEEE on both engines, rounded "
    "at 6. Scale shape: edge-domain joins only.",
)
def u9_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rides the materialized trade-pair census (r14) — identical
    # derivation, persisted once per fixture dir
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = (
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("ea", "eb")
    )
    sym = e0.select(F.col("ea").alias("v"), F.col("eb").alias("u")).unionByName(
        e0.select(F.col("eb").alias("v"), F.col("ea").alias("u"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ends = (
        sym.join(
            F.broadcast(deg.select(F.col("v").alias("_v"), F.col("d").alias("x"))),
            F.col("_v") == F.col("v"),
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("_u"), F.col("d").alias("y"))),
            F.col("_u") == F.col("u"),
        )
        .select("x", "y")
    )
    sums = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return sums.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(num * 1.0 / den, 6).alias("assortativity"),
    )


@register(
    "a63_srm_check",
    "A ⊕ (experiment hygiene: sample-ratio-mismatch test)",
    """
    WITH b AS (
      SELECT CASE
               WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 10 < 8 THEN 'train'
               WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 10 = 8 THEN 'val'
               ELSE 'test' END AS split
      FROM documents
    ),
    obs AS (SELECT split, count(*) AS n FROM b GROUP BY split),
    tot AS (SELECT sum(n) AS nt FROM obs),
    e AS (
      SELECT obs.split, obs.n,
             tot.nt * CASE obs.split WHEN 'train' THEN 0.8
                                     WHEN 'val' THEN 0.1
                                     ELSE 0.1 END AS expected
      FROM obs, tot
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_total,
           round(sum((n - expected) * (n - expected) / expected), 6) AS chi2,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           CAST(CASE WHEN sum((n - expected) * (n - expected) / expected)
                          > 13.816 THEN 1 ELSE 0 END AS BIGINT) AS srm_alarm
    FROM e
    """,
    doc="Sample-ratio-mismatch check on the hash split — the #1 "
    "experiment-hygiene gate (Fabijan et al. 2019: most corrupted A/B "
    "results trace to assignment drift, and an SRM chi-square catches "
    "it before any metric is read): observed train/val/test counts "
    "from sample_hash_split's md5 coin vs the declared 80/10/10, "
    "chi-square against expectations, alarm at the p<0.001 critical "
    "value (13.816 at dof=2 — a CONSTANT, so no erf/CDF cross-engine "
    "exposure). Counts are exact integers; one closed-form float. One "
    "scan + a 3-row fold.",
)
def a63_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    obs = docs.select(split.alias("split")).groupBy("split").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("nt"))
    expected = F.col("nt") * (
        F.when(F.col("split") == "train", 0.8)
        .when(F.col("split") == "val", 0.1)
        .otherwise(0.1)
    )
    e = obs.crossJoin(F.broadcast(tot)).select(
        "split", "n", expected.alias("expected")
    )
    chi2 = F.sum(
        (F.col("n") - F.col("expected"))
        * (F.col("n") - F.col("expected"))
        / F.col("expected")
    )
    return e.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.round(chi2, 6).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.when(chi2 > 13.816, 1).otherwise(0).cast("long").alias("srm_alarm"),
    )


@register(
    "sample_class_balance",
    "D5-sampling ⊕ (deterministic class-balanced downsample)",
    """
    WITH sized AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    k AS (SELECT min(n) AS k FROM sized),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(k.k) AS BIGINT) AS target_k
    FROM ranked, k WHERE rn <= k.k
    GROUP BY source
    """,
    doc="Class-balanced downsampling: every source reduced to the "
    "SMALLEST source's count, membership decided by md5(doc_id) rank "
    "within source — a pure function of the data (rerun-stable, "
    "layout-independent; the sample_hash_split coin applied to the "
    "undersampling problem class imbalance poses for classifier "
    "training sets). The per-source rank window partitions on source; "
    "at 100 TB you'd rank only sources above the target k and take "
    "the md5-threshold shortcut (keep iff hash < k/n quantile — "
    "documented contract, avoids the full sort) — the exact-rank form "
    "here is what gives the oracle bit-equality. Returns the per-source "
    "census; the kept-rows form is the same query minus the rollup.",
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")["documents"]
    sized = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    k = sized.agg(F.min("n").alias("k"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.min("k").cast("long").alias("target_k"),
        )
    )


@register(
    "u7_matryoshka_rerank",
    "U7 ⊕ (truncated-dimension cascade retrieval)",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    stage1 AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.embedding[1:16]', b='c.embedding[1:16]')} DESC,
                        c.vec_id ASC) AS r1
      FROM q CROSS JOIN embeddings c
    ),
    survivors AS (SELECT query_id, vec_id FROM stage1 WHERE r1 <= 50)
    SELECT query_id, vec_id, round(score, 6) AS score, rank FROM (
      SELECT s.query_id, s.vec_id,
             {SQL_COSINE.format(a='q.embedding', b='c.embedding')} AS score,
             CAST(row_number() OVER (
               PARTITION BY s.query_id
               ORDER BY {SQL_COSINE.format(a='q.embedding', b='c.embedding')} DESC,
                        s.vec_id ASC) AS INTEGER) AS rank
      FROM survivors s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings c ON c.vec_id = s.vec_id
    ) WHERE rank <= 10
    """,
    doc="Matryoshka/truncated-dimension cascade (Kusupati et al. 2022; "
    "the modern production retrieval stack): stage 1 scores the corpus "
    "on the FIRST 16 of 64 dims (4× less arithmetic and — at 100 TB, "
    "the real win — 4× fewer bytes scanned when the prefix is stored "
    "as its own column), keeps top-50 per query; stage 2 re-ranks only "
    "survivors with the full-dimension exact cosine. Both stages are "
    "exact deterministic arithmetic with total-order tiebreaks, so "
    "unlike IVF/PQ this cascade carries a FULL value oracle — no "
    "contract grade needed. Same scale shape as u7_knn_bruteforce's "
    "broadcast-query scoring, with the expensive arithmetic confined "
    "to 50 rows per query.",
)
def u7_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.arrays import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id"), F.col("embedding").alias("cv"))
    s1_score = cosine_similarity(F.slice("qv", 1, 16), F.slice("cv", 1, 16))
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("s1"), F.asc("vec_id")
    )
    survivors = (
        q.crossJoin(c)
        .select("query_id", "vec_id", "qv", "cv", s1_score.alias("s1"))
        .select("query_id", "vec_id", "qv", "cv", F.row_number().over(w1).alias("r1"))
        .filter(F.col("r1") <= 50)
    )
    score = cosine_similarity(F.col("qv"), F.col("cv"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        survivors.select("query_id", "vec_id", score.alias("score"))
        .select(
            "query_id",
            "vec_id",
            "score",
            F.row_number().over(w2).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


@register(
    "llm_span_corruption",
    "U6 ⊕ (T5-style deterministic span corruption)",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
      WHERE trim(text) <> ''
    ),
    corrupted AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             list_transform(range(1, len(t) + 1),
               i -> CASE WHEN CAST(concat('0x', substring(md5(concat(
                          CAST(doc_id AS VARCHAR), ':',
                          CAST((i - 1) // 3 AS VARCHAR))), 1, 2)) AS INT) < 38
                         THEN '<mask>' ELSE t[i] END) AS ct
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(len(list_filter(ct, x -> x = '<mask>')) AS BIGINT) AS n_masked,
           array_to_string(ct, ' ') AS corrupted
    FROM corrupted
    """,
    doc="T5-style span corruption as a PURE FUNCTION of the data "
    "(Raffel et al. 2020): 3-token blocks mask with probability 38/256 "
    "≈ 14.8% under an md5(doc_id:block) coin — whole blocks, not iid "
    "tokens, which is what makes it SPAN corruption — so any engine, "
    "any partitioning, any rerun corrupts every document identically "
    "(the determinism that makes pretraining data reproducible and "
    "this entry fully value-gradeable; an RNG mask would be rows-only). "
    "Row-local array transform, zero exchanges; original tokens never "
    "leave the row.",
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = _t(spark, sf_dir, "documents")["documents"]
    toked = docs.filter(F.trim("text") != "").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    def coin(i):
        blk = ((i - 1) / 3).cast("int").cast("string")
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(":"), blk)
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            < 38
        )

    ct = F.transform(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: F.when(coin(i), F.lit("<mask>")).otherwise(
            F.element_at("t", i)
        ),
    )
    out = toked.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens"), ct.alias("ct")
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.size(F.filter("ct", lambda x: x == "<mask>")).cast("long").alias(
            "n_masked"
        ),
        F.array_join("ct", " ").alias("corrupted"),
    )


@register(
    "u9_cn_jaccard",
    "U ⊕ (graph analytics: common-neighbor Jaccard link scores)",
    """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    ptot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, ptot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea AS v, eb AS u FROM e0
      UNION ALL SELECT eb, ea FROM e0
    ),
    deg AS MATERIALIZED (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1
    ),
    wedge AS MATERIALIZED (
      SELECT a.v AS c, a.u AS x, b.u AS y
      FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
    ),
    cand AS MATERIALIZED (
      SELECT w.x, w.y, count(*) AS cn FROM wedge w
      LEFT JOIN e0 ON e0.ea = w.x AND e0.eb = w.y
      WHERE e0.ea IS NULL
      GROUP BY w.x, w.y
    )
    SELECT CAST(cand.x AS BIGINT) AS id_a, CAST(cand.y AS BIGINT) AS id_b,
           CAST(cand.cn AS BIGINT) AS n_common,
           round(cand.cn * 1.0 / (dx.d + dy.d - cand.cn), 6) AS cn_jaccard
    FROM cand
    JOIN deg dx ON dx.v = cand.x
    JOIN deg dy ON dy.v = cand.y
    """,
    doc="Common-neighbor Jaccard link scores over the sparsified nation "
    "trade graph — |N(x)∩N(y)| / |N(x)∪N(y)| for every NON-adjacent "
    "pair sharing a neighbor: the normalized companion of "
    "u9_link_prediction's Adamic-Adar (same canonical-edge derivation, "
    "same wedge join, same adjacency anti-join — the graph family's "
    "sixth member on one shared shape). For non-adjacent pairs the "
    "union is exactly d(x)+d(y)-cn, so every term is an exact integer "
    "and the one division rounds at 6 (the D3 Jaccard discipline "
    "applied to neighborhoods). Scale shape: node-domain wedge "
    "self-join + two broadcast degree joins after the single fact "
    "rollup shuffle; the tracked edge-list persist pattern of "
    "u9_link_prediction applies unchanged at larger node domains.",
)
def u9_cn_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cache_registry import track

    # Round-12: shared lean derivation (one fact shuffle — see
    # _nation_trade_pairs); downstream wedge/degree shape unchanged.
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = track(
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("ea", "eb")
    )
    sym = e0.select(F.col("ea").alias("v"), F.col("eb").alias("u")).unionByName(
        e0.select(F.col("eb").alias("v"), F.col("ea").alias("u"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = sym.alias("a"), sym.alias("b")
    wedge = a.join(
        b, (F.col("a.v") == F.col("b.v")) & (F.col("a.u") < F.col("b.u"))
    ).select(F.col("a.u").alias("x"), F.col("b.u").alias("y"))
    cand = (
        wedge.join(
            e0,
            (F.col("ea") == F.col("x")) & (F.col("eb") == F.col("y")),
            "left_anti",
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    return (
        cand.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            F.col("x").cast("long").alias("id_a"),
            F.col("y").cast("long").alias("id_b"),
            F.col("cn").cast("long").alias("n_common"),
            F.round(
                F.col("cn") * 1.0 / (F.col("dx") + F.col("dy") - F.col("cn")), 6
            ).alias("cn_jaccard"),
        )
    )


def _nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical nation trade-graph edge list ``(ea < eb, vol)`` —
    undirected cross-nation pair volumes counting the raw supplier→
    customer trade rows, exactly the 4-way-join pair census every u9_*
    oracle states.

    Round 14 (VERDICT r13 #5): the derivation is now a MAINTAINED
    LAYOUT, not a per-query plan —
    ``operators/bucketing.ensure_nation_trade_pairs`` materializes the
    census once per fixture dir (round-12 lean shape: dims broadcast
    onto their fact sides, the one data-proportional join riding the
    load-time bucketed (lineitem, orders) layout, map-side-combined
    pair census; measured 2.72 s → 1.54 s → ~1.0 s across the r11-r12
    restructurings) and every graph entry reads the ≤ nations²-row
    table back. The ~1.0 s shared derivation that floored all eight
    u9_* entries at the 32× probe (SCALE_r12/r13 decompositions) is
    paid once at load time, like every other warehouse layout; the
    oracles keep stating the full 4-way join, so value equality still
    proves the materialized census correct on every grade."""
    from ..operators.bucketing import ensure_nation_trade_pairs

    return spark.table(ensure_nation_trade_pairs(spark, sf_dir))


def _lpa_sql(rounds: int) -> str:
    """Unrolled synchronous-LPA oracle: one CTE pair per round (votes,
    then argmax by count DESC / label ASC) — the fixed round count makes
    each round a deterministic function of the last, so the unrolled SQL
    is value-identical to the DataFrame loop. Every CTE is MATERIALIZED
    (the u9_pagerank_nations discipline): sym is referenced by all
    rounds and e0 by both sym arms, so the default inlining would
    re-execute the 4-way fact join ~2·rounds times — measured 38 s at
    sf0.1 and a spill-to-disk blowup on the 32× replicas."""
    sql = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS ea,
                      greatest(s.s_nationkey, c.c_nationkey) AS eb
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
    ),
    sym AS MATERIALIZED (SELECT ea, eb FROM e0 UNION ALL SELECT eb AS ea, ea AS eb FROM e0),
    lab0 AS MATERIALIZED (SELECT DISTINCT ea AS id, ea AS label FROM sym)"""
    for r in range(1, rounds + 1):
        sql += f""",
    v{r} AS MATERIALIZED (
      SELECT s.ea AS vid, l.label, count(*) AS n
      FROM sym s JOIN lab{r - 1} l ON l.id = s.eb
      GROUP BY s.ea, l.label
    ),
    lab{r} AS MATERIALIZED (
      SELECT vid AS id, label FROM (
        SELECT vid, label,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY n DESC, label ASC) AS rk
        FROM v{r}) WHERE rk = 1
    )"""
    sql += f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
    FROM lab{rounds}
    """
    return sql


@register(
    "u9_label_prop",
    "U ⊕ (graph analytics: label-propagation communities)",
    _lpa_sql(rounds=4),
    doc="Community detection over the nation-level trade graph (same "
    "canonical edge derivation as u9_triangle_count) by SYNCHRONOUS "
    "label propagation — operators/clusters.label_propagation, the "
    "fourth join-based graph operator beside connected components, "
    "PageRank, and triangle counting (round-10 VERDICT #8: the graph "
    "family was the thinnest). Each of the 4 fixed rounds is one "
    "shuffle join of the symmetrized edge list against the label frame "
    "plus a two-level aggregate (votes per (vertex,label), argmax by "
    "count DESC / label ASC via min_by on an order-encoding struct); "
    "fixed rounds + deterministic tie-break make the labeling a pure "
    "function of the graph, so the oracle UNROLLS the same rounds as "
    "CTEs and matches VALUES, not just counts. Lineage is cut per "
    "round (localCheckpoint) exactly like pagerank — at 100 TB the "
    "graph stays a DataFrame, one shuffle per round, no driver "
    "adjacency.",
)
def u9_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import label_propagation

    # Lean shared derivation (one fact shuffle) + bounded-domain rounds
    # (nation graph ≤ 25 vertices → exchange-free single-task rounds):
    # round-12 re-leg of the 7.67×-at-32× entry (VERDICT r11 #3).
    edges = _nation_trade_pairs(spark, sf_dir).select(
        F.col("ea").alias("src"), F.col("eb").alias("dst")
    )
    return label_propagation(edges, max_iter=4, bounded_domain=True).select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    )


@register(
    "sample_weighted_kpg",
    "D5-sampling ⊕ (weighted without-replacement PER GROUP)",
    f"""
    WITH keyed AS (
      SELECT source, doc_id, lang, n_chars,
             pow({_md5_coin_sql(7)}, 1.0 / n_chars) AS ek
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    ranked AS (
      SELECT source, doc_id, lang, n_chars, ek,
             row_number() OVER (PARTITION BY source
                                ORDER BY ek DESC, doc_id ASC) AS rk
      FROM keyed
    )
    SELECT source, doc_id, lang, n_chars, CAST(rk AS INTEGER) AS rk,
           round(ek, 6) AS es_key
    FROM ranked WHERE rk <= 5
    """,
    doc="Weighted k-per-group sample without replacement (round-10 "
    "VERDICT #8, the missing member of the sampling family): "
    "sample_weighted_es's Efraimidis–Spirakis key (coin^(1/weight), "
    "content-hash coin) ranked WITHIN each source instead of globally — "
    "5 length-weighted docs per source, the per-stratum quality-"
    "weighted eval-subset draw sample_k_per_group does unweighted. "
    "Same determinism contract as the whole sampling family: the draw "
    "is a pure function of (group, id, weight, seed), so this oracle "
    "reproduces the IDENTICAL sample. Scale shape: one window over the "
    "source exchange with Spark's WindowGroupLimit map-side prune "
    "(k·groups rows shuffled, never the corpus) — asserted alongside "
    "t13's in tests/test_plans.py.",
)
def sample_weighted_kpg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import sample_weighted_k_per_group

    docs = _t(spark, sf_dir, "documents")["documents"]
    return sample_weighted_k_per_group(
        docs.select("source", "doc_id", "lang", "n_chars"),
        "source",
        "doc_id",
        "n_chars",
        k=5,
        seed=7,
        method="md5",
    ).select(
        "source", "doc_id", "lang", "n_chars",
        F.col("rk").cast("int").alias("rk"), "es_key",
    )


@register(
    "sample_reservoir_merge",
    "D5-sampling ⊕ (deterministic distributed reservoir: global k via partial top-k merge)",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, lang,
           round({_md5_coin_sql(23)}, 6) AS coin
    FROM documents
    ORDER BY {_md5_coin_sql(23)}, doc_id
    LIMIT 100
    """,
    doc="Global k-sample as a DISTRIBUTED RESERVOIR, deterministically "
    "(round-11 VERDICT #7): the 100 docs with the smallest "
    "content-keyed md5 coins, ORDER BY (coin, doc_id) LIMIT k. "
    "Classic reservoir sampling (Vitter '85) is sequential and "
    "layout-dependent; keying the reservoir priority on a hash coin "
    "(the Efraimidis–Spirakis unweighted special case) makes the "
    "sample a pure function of CONTENT, so any partitioning, any "
    "engine, and any merge order draw the IDENTICAL sample — which is "
    "exactly what lets this entry value-grade. Scale shape: Spark "
    "plans the ORDER BY k as TakeOrderedAndProject — each partition "
    "keeps its local k candidates and the driver merges k-sized "
    "buffers (the distributed-reservoir merge), so no global sort and "
    "no full shuffle ever happens; doc_id breaks the ~n²/2²¹ expected "
    "coin collisions at the boundary into a total order.",
)
def sample_reservoir_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_coin

    docs = _t(spark, sf_dir, "documents")["documents"]
    coin = hash_coin(F.col("doc_id"), seed=23, method="md5")
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            "lang",
            coin.alias("_coin"),
        )
        .orderBy("_coin", "doc_id")
        .limit(100)
        .select("doc_id", "source", "lang", F.round("_coin", 6).alias("coin"))
    )


def _bfs_sql(rounds: int) -> str:
    """Unrolled truncated-BFS oracle over the sparsified trade graph —
    one settled-set CTE per round, every multiply-referenced CTE
    MATERIALIZED (the _lpa_sql lesson)."""
    sql = """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, tot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea, eb FROM e0 UNION ALL SELECT eb AS ea, ea AS eb FROM e0
    ),
    d0 AS MATERIALIZED (SELECT min(ea) AS id, 0 AS lvl FROM e0)"""
    for r in range(1, rounds + 1):
        sql += f""",
    d{r} AS MATERIALIZED (
      SELECT id, lvl FROM d{r - 1}
      UNION ALL
      SELECT DISTINCT s.eb AS id, {r} AS lvl
      FROM sym s JOIN d{r - 1} p ON s.ea = p.id AND p.lvl = {r - 1}
      WHERE s.eb NOT IN (SELECT id FROM d{r - 1})
    )"""
    sql += f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(lvl AS INTEGER) AS lvl
    FROM d{rounds}
    """
    return sql


@register(
    "u9_bfs_levels",
    "U ⊕ (graph analytics: truncated BFS levels / unweighted SSSP)",
    _bfs_sql(rounds=4),
    doc="Truncated breadth-first levels from the smallest vertex of the "
    "sparsified nation trade graph (the u9_kcore/u9_cn_jaccard "
    "above-average-volume edge derivation): 4 synchronous frontier "
    "expansions via operators/clusters.bfs_levels — the SEVENTH "
    "join-based graph operator, covering the reachability/shortest-"
    "path gap beside CC, PageRank, triangles, LPA, k-core and edge "
    "support. The fixed round budget is the family's value-gradability "
    "contract (a fixpoint BFS is the data-dependent-rounds class); the "
    "oracle unrolls the same rounds as MATERIALIZED CTEs. The source "
    "vertex is MIN(id) as a 1-row aggregate joined into the seed — "
    "deterministic and driver-collect-free. Scale shape: per round one "
    "frontier equi-join + one settled-set anti-join, lineage cut per "
    "round; the graded entry runs the bounded-domain path (nation "
    "domain ≤ 25 → exchange-free single-task rounds) off the shared "
    "lean bucketed edge derivation (_nation_trade_pairs).",
)
def u9_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import bfs_levels

    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = (
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select(F.col("ea").alias("src"), F.col("eb").alias("dst"))
    )
    return bfs_levels(e0, rounds=4, bounded_domain=True).select(
        F.col("id").cast("long").alias("id"),
        F.col("lvl").cast("int").alias("lvl"),
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled truncated k-core oracle — one (degree, survivor,
    edge-filter) CTE triple per peeling round, every CTE MATERIALIZED
    (the _lpa_sql lesson: inlined CTEs re-execute the fact join per
    reference and spill at probe scale)."""
    sql = """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, tot WHERE vol * n_pairs > total
    )"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += f""",
    deg{r} AS MATERIALIZED (
      SELECT v, count(*) AS d FROM (
        SELECT ea AS v FROM {prev} UNION ALL SELECT eb FROM {prev}
      ) GROUP BY v
    ),
    keep{r} AS MATERIALIZED (SELECT v FROM deg{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT ea, eb FROM {prev}
      WHERE ea IN (SELECT v FROM keep{r}) AND eb IN (SELECT v FROM keep{r})
    )"""
        prev = f"e{r}"
    sql += f"""
    SELECT CAST(v AS BIGINT) AS id, CAST(count(*) AS BIGINT) AS deg FROM (
      SELECT ea AS v FROM {prev} UNION ALL SELECT eb FROM {prev}
    ) GROUP BY v
    """
    return sql


@register(
    "u9_kcore",
    "U ⊕ (graph analytics: truncated k-core peeling)",
    _kcore_sql(k=8, rounds=3),
    doc="Truncated 8-core of the sparsified nation trade graph (the "
    "u9_cn_jaccard/u9_pagerank above-average-volume edge derivation, "
    "whose degree spread 1-24 actually peels): 3 synchronous peeling "
    "rounds — drop vertices with current degree < k, discard their "
    "edges, repeat — via operators/clusters.kcore_peel, the fifth "
    "join-based graph operator (round-10 VERDICT #8: graph was the "
    "thinnest family). The FIXED round budget is what makes the result "
    "a pure function of the graph (a fixpoint k-core has a "
    "data-dependent round count — the terminal-rows-only class); each "
    "round is one degree aggregate plus two semi-joins of the edge "
    "list, lineage-cut per round, and the oracle unrolls the same "
    "rounds as MATERIALIZED CTEs and matches end-state (vertex, "
    "degree) VALUES. Returns the surviving vertices with their "
    "end-state degrees.",
)
def u9_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import kcore_peel

    # Lean shared derivation + bounded-domain peeling rounds (round-12
    # re-leg, VERDICT r11 #3 — same move as u9_label_prop).
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = (
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select(F.col("ea").alias("src"), F.col("eb").alias("dst"))
    )
    return kcore_peel(e0, k=8, rounds=3, bounded_domain=True).select(
        F.col("id").cast("long").alias("id"),
        F.col("deg").cast("long").alias("deg"),
    )


@register(
    "d3_chunk_dedup_report",
    "D3 ⊕ (content-addressed chunk-level dedup report)",
    """
    WITH chunked AS (
      SELECT source,
             md5(substring(text, 1 + ci * 512, 512)) AS h
      FROM (
        SELECT source, text,
               unnest(range(0, CAST(ceil(length(text) / 512.0) AS INT))) AS ci
        FROM documents WHERE length(text) > 0
      )
    ),
    per_chunk AS (
      SELECT source, h, count(*) AS c FROM chunked GROUP BY source, h
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_uniq_chunks,
           round(1.0 - count(*) * 1.0 / sum(c), 6) AS dedup_ratio,
           CAST(max(c) AS BIGINT) AS max_chunk_reuse
    FROM per_chunk GROUP BY source
    """,
    doc="Content-addressed STORAGE dedup report — the chunk-store shape "
    "(fixed 512-unit chunks, digest per chunk, reuse census per "
    "source): what fraction of a corpus's chunks a content-addressed "
    "store would deduplicate away, and the hottest single chunk's "
    "reuse count. Complements d3_line_dedup (line granularity) and "
    "d3_exact_dedup (whole-doc): chunk granularity is what object-"
    "store dedup and training-data page-reuse audits actually operate "
    "at. The graded twin chunks by CHARACTER positions so the digest "
    "stream is engine-identical (DuckDB cannot substring BLOBs); the "
    "production byte-chunking path over opaque binary payloads lives "
    "with the multimodal stubs (operators/multimodal.sample_frames — "
    "same fan-out, frame_size in bytes). Scale shape: chunk fan-out is "
    "a row-local sequence+explode (no shuffle), then ONE exchange for "
    "the (source, digest) census with map-side combine; never "
    "O(total-bytes) rows to the driver.",
)
def d3_chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")["documents"]
        .filter(F.length("text") > 0)
        .select("source", "text")
    )
    n_chunks = F.ceil(F.length("text") / F.lit(512.0)).cast("int")
    chunked = docs.select(
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
        "text",
    ).select(
        "source",
        F.md5(F.substring(F.col("text"), F.col("ci") * 512 + 1, F.lit(512))).alias(
            "h"
        ),
    )
    per_chunk = chunked.groupBy("source", "h").agg(F.count(F.lit(1)).alias("c"))
    return per_chunk.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_uniq_chunks"),
        F.round(1.0 - F.count(F.lit(1)) * 1.0 / F.sum("c"), 6).alias("dedup_ratio"),
        F.max("c").cast("long").alias("max_chunk_reuse"),
    )


@register(
    "u9_edge_support",
    "U ⊕ (graph analytics: edge triangle support)",
    """
    WITH pairs AS MATERIALIZED (
      SELECT least(s.s_nationkey, c.c_nationkey) AS ea,
             greatest(s.s_nationkey, c.c_nationkey) AS eb,
             count(*) AS vol
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(vol) AS total, count(*) AS n_pairs FROM pairs),
    e0 AS MATERIALIZED (
      SELECT ea, eb FROM pairs, tot WHERE vol * n_pairs > total
    ),
    sym AS MATERIALIZED (
      SELECT ea AS v, eb AS u FROM e0 UNION ALL SELECT eb, ea FROM e0
    ),
    support AS MATERIALIZED (
      SELECT e.ea, e.eb, count(*) AS sup
      FROM e0 e
      JOIN sym sa ON sa.v = e.ea
      JOIN sym sb ON sb.v = e.eb AND sb.u = sa.u
      GROUP BY e.ea, e.eb
    )
    SELECT CAST(e0.ea AS BIGINT) AS a, CAST(e0.eb AS BIGINT) AS b,
           CAST(coalesce(sup, 0) AS BIGINT) AS support,
           coalesce(sup, 0) = 0 AS is_bridge
    FROM e0 LEFT JOIN support ON support.ea = e0.ea AND support.eb = e0.eb
    """,
    doc="Per-edge TRIANGLE SUPPORT on the sparsified trade graph — "
    "|N(a) ∩ N(b)| for every edge (a,b), the statistic k-truss "
    "decomposition peels on and the zero-support test that finds "
    "BRIDGE-like edges (no triangle reinforcement — the weak ties of "
    "the trade network). Sixth join-based graph operator: common "
    "neighbors per edge via the two-hop equi-join of the symmetrized "
    "adjacency against both endpoints (the u9_triangle_count shape, "
    "grouped per edge instead of globally summed), then a left join "
    "back onto the edge list so triangle-free edges report support 0 "
    "rather than vanishing. Oracle CTEs MATERIALIZED (the r11 LPA "
    "lesson). Scale shape: two shuffle joins on the edge list + one "
    "aggregate; skew bounded by the canonical a<b ordering.",
)
def u9_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cache_registry import track

    # rides the materialized trade-pair census (r14) — identical
    # derivation, persisted once per fixture dir
    pairs = _nation_trade_pairs(spark, sf_dir)
    ptot = pairs.agg(
        F.sum("vol").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    e0 = track(
        pairs.crossJoin(F.broadcast(ptot))
        .filter(F.col("vol") * F.col("n_pairs") > F.col("total"))
        .select("ea", "eb")
    )
    sym = e0.select(F.col("ea").alias("v"), F.col("eb").alias("u")).unionByName(
        e0.select(F.col("eb").alias("v"), F.col("ea").alias("u"))
    )
    sa = sym.select(F.col("v").alias("ea"), F.col("u").alias("cn"))
    sb = sym.select(F.col("v").alias("eb"), F.col("u").alias("cn"))
    support = (
        e0.join(sa, "ea")
        .join(sb, ["eb", "cn"])
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    return (
        e0.join(support, ["ea", "eb"], "left")
        .select(
            F.col("ea").cast("long").alias("a"),
            F.col("eb").cast("long").alias("b"),
            F.coalesce(F.col("sup"), F.lit(0)).cast("long").alias("support"),
            (F.coalesce(F.col("sup"), F.lit(0)) == 0).alias("is_bridge"),
        )
    )
