"""Round-15 probe: the funnel flags pass (VERDICT r14 'Next round' #1).

Decomposes llm_curation_funnel's per-doc flags cost on the Zipf corpus
(lang_id / quality_score / doc_fingerprint) and A/B-tests cheaper native
forms (guide §1.2 step 2 — per-task work, keep-it-native-but-cheaper):

- lang_id V1: ONE regexp_extract_all pass with whitespace lookarounds
  over lower(text) (combined marker alternation) instead of 4 separate
  regexp_count passes over a tokenize+array_join-padded copy; per-lang
  counts come from tiny filters over the matched-marker array.
- lang_id V2: zero-regex single pass — aggregate over tokens with a
  marker->packed-weight map literal (4x16-bit counts in one long).
- quality_score V1: translate()-based char counting (single-pass char
  lookup, no new-string regex) for the alpha-ratio signal.
- funnel: doc_fingerprint gated behind the quality flag (CASE WHEN only
  evaluates the taken branch, and only survivors' fingerprints matter to
  the window min).

Every variant is value-checked on the FULL corpus plus a null/empty/
unicode edge battery before it is timed; timings are interleaved
min-of-5 on the noop sink (guide §1.4).

Usage: python tools/r15_text_probe.py [zipf|sf]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from praw_etl_student_dropout_spark.functions.text import (
    _LANG_MARKERS,
    STOPWORDS,
    _hits,
    clean_text,
    doc_fingerprint,
    lang_id,
    quality_score,
    tokens,
)

_ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_JAVA_WS = " \t\n\x0b\f\r"  # Java regex \s character set, exactly


def lang_id_v1(col: Column) -> Column:
    """One combined-alternation regex pass; same argmax/tiebreak."""
    codes = sorted(c for c, m in _LANG_MARKERS.items() if m)
    all_markers = sorted(
        {m for c in codes for m in _LANG_MARKERS[c]}, key=len, reverse=True
    )
    pat = r"(?<![^\s])(?:" + "|".join(all_markers) + r")(?![^\s])"
    hits_arr = F.regexp_extract_all(F.lower(col), F.lit(pat), 0)
    def lang_count(c: str) -> Column:
        vocab = F.array(*[F.lit(m) for m in _LANG_MARKERS[c]])
        return F.size(F.filter(hits_arr, lambda t: F.array_contains(vocab, t)))

    counts = F.struct(*[lang_count(c).alias(c) for c in codes])

    def pick(s: Column) -> Column:
        best = F.greatest(*[s[c] for c in codes])
        chain = None
        for c in codes:
            branch = F.when(s[c] == best, F.lit(c))
            chain = branch if chain is None else chain.when(s[c] == best, F.lit(c))
        return F.when(best > 0, chain).otherwise(F.lit("und"))

    has_cjk = col.rlike(r"[一-鿿]")
    return F.when(has_cjk, F.lit("zh")).otherwise(
        F.transform(F.array(counts), pick)[0]
    )


def lang_id_v2(col: Column) -> Column:
    """Zero-regex marker counting: map lookup + packed-long aggregate."""
    codes = sorted(c for c, m in _LANG_MARKERS.items() if m)
    weights: dict[str, int] = {}
    for i, c in enumerate(codes):
        for m in _LANG_MARKERS[c]:
            weights[m] = weights.get(m, 0) + (1 << (16 * i))
    kv = []
    for m, w in sorted(weights.items()):
        kv.extend([F.lit(m), F.lit(w)])
    marker_map = F.create_map(*kv)
    toks = tokens(F.lower(col))
    packed = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(F.element_at(marker_map, t), F.lit(0).cast("long")),
    )
    counts = F.struct(
        *[
            (F.shiftright(packed, 16 * i) % F.lit(1 << 16)).cast("int").alias(c)
            for i, c in enumerate(codes)
        ]
    )

    def pick(s: Column) -> Column:
        best = F.greatest(*[s[c] for c in codes])
        chain = None
        for c in codes:
            branch = F.when(s[c] == best, F.lit(c))
            chain = branch if chain is None else chain.when(s[c] == best, F.lit(c))
        return F.when(best > 0, chain).otherwise(F.lit("und"))

    has_cjk = col.rlike(r"[一-鿿]")
    return F.when(has_cjk, F.lit("zh")).otherwise(
        F.transform(F.array(counts), pick)[0]
    )


def quality_score_v1(col: Column) -> Column:
    """translate()-based char counts for the alpha-ratio signal."""
    toks = tokens(col)
    len_ns = F.length(F.translate(col, _JAVA_WS, ""))
    len_a = F.length(col) - F.length(F.translate(col, _ASCII_LETTERS, ""))
    s = F.struct(
        F.size(toks).alias("n_tok"),
        _hits(toks, STOPWORDS).alias("stop_hits"),
        len_ns.alias("len_ns"),
        len_a.alias("len_a"),
    )

    def combine(s: Column) -> Column:
        n_tok = s["n_tok"]
        len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        alpha_ratio = F.when(s["len_ns"] > 0, s["len_a"] / s["len_ns"]).otherwise(
            F.lit(0.0)
        )
        stop_ratio = s["stop_hits"] / F.greatest(n_tok, F.lit(1))
        stop_signal = F.least(stop_ratio, F.lit(0.5)) * 2.0
        return F.round((len_ok + alpha_ratio + stop_signal) / 3.0, 6)

    return F.transform(F.array(s), combine)[0]


def quality_score_v2(col: Column) -> Column:
    """V1 + regex-count token/stopword signals (no token array built)."""
    trimmed = F.trim(col)
    n_tok = F.when(F.length(trimmed) == 0, F.lit(1)).otherwise(
        F.regexp_count(trimmed, F.lit(r"\s+")).cast("int") + F.lit(1)
    )
    stop_pat = r"(?<![^\s])(?:" + "|".join(STOPWORDS) + r")(?![^\s])"
    stop_hits = F.regexp_count(col, F.lit(stop_pat)).cast("int")
    len_ns = F.length(F.translate(col, _JAVA_WS, ""))
    len_a = F.length(col) - F.length(F.translate(col, _ASCII_LETTERS, ""))
    s = F.struct(
        n_tok.alias("n_tok"),
        stop_hits.alias("stop_hits"),
        len_ns.alias("len_ns"),
        len_a.alias("len_a"),
    )

    def combine(s: Column) -> Column:
        n_tok = s["n_tok"]
        len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        alpha_ratio = F.when(s["len_ns"] > 0, s["len_a"] / s["len_ns"]).otherwise(
            F.lit(0.0)
        )
        stop_ratio = s["stop_hits"] / F.greatest(n_tok, F.lit(1))
        stop_signal = F.least(stop_ratio, F.lit(0.5)) * 2.0
        return F.round((len_ok + alpha_ratio + stop_signal) / 3.0, 6)

    return F.transform(F.array(s), combine)[0]


EDGE_TEXTS = [
    None,
    "",
    "   ",
    "\t\n",
    "the",
    "The",
    "the the the is is with and of",
    "el la de que los la",
    "der die und das ist",
    "le la les des est",
    "mixed the el der le text",
    "一 the and of is with",  # CJK wins
    "日本語テキスト",
    "no markers here xyzzy quux",
    "a\tb\nc de\ff\rg",
    "punct!!! 123 the, and. of",
    "les lesson the theory",  # substrings must not count
    " the ",
    "THE AND OF IS WITH",
    "word " * 6000,  # n_tok > 5000
    "the " * 3000,
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs=5):
    fn()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def main() -> int:
    from praw_etl_student_dropout_spark.session import get_spark
    from tools.gen_zipf_corpus import ensure_corpus

    which = sys.argv[1] if len(sys.argv) > 1 else "zipf"
    spark = get_spark(app_name="r15_text_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if which == "zipf":
        sf = ensure_corpus()
    else:
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    docs = docs.repartition(cores, "doc_id")

    # ---------- value checks ----------
    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    for frame, label in ((edge, "edge"), (docs, "corpus")):
        chk = frame.select(
            lang_id(F.col("text")).alias("l0"),
            lang_id_v1(F.col("text")).alias("l1"),
            lang_id_v2(F.col("text")).alias("l2"),
            quality_score(F.col("text")).alias("q0"),
            quality_score_v1(F.col("text")).alias("q1"),
            quality_score_v2(F.col("text")).alias("q2"),
        )
        bad = chk.filter(
            ~(
                (F.col("l0").eqNullSafe(F.col("l1")))
                & (F.col("l0").eqNullSafe(F.col("l2")))
                & (F.col("q0").eqNullSafe(F.col("q1")))
                & (F.col("q0").eqNullSafe(F.col("q2")))
            )
        )
        n_bad = bad.count()
        if n_bad:
            bad.show(20, truncate=80)
            print(f"VALUE MISMATCH on {label}: {n_bad} rows")
            return 1
        print(f"value check {label}: OK ({frame.count()} rows)")

    # ---------- decomposition + A/B (interleaved min-of-5, noop sink) ----
    variants = {
        "lang_current": lambda: docs.select(lang_id(F.col("text")).alias("v")),
        "lang_v1_one_regex": lambda: docs.select(lang_id_v1(F.col("text")).alias("v")),
        "lang_v2_map_agg": lambda: docs.select(lang_id_v2(F.col("text")).alias("v")),
        "qual_current": lambda: docs.select(quality_score(F.col("text")).alias("v")),
        "qual_v1_translate": lambda: docs.select(
            quality_score_v1(F.col("text")).alias("v")
        ),
        "qual_v2_regexcount": lambda: docs.select(
            quality_score_v2(F.col("text")).alias("v")
        ),
        "fp_current": lambda: docs.select(doc_fingerprint(F.col("text")).alias("v")),
        "fp_clean_only": lambda: docs.select(clean_text(F.col("text")).alias("v")),
        "fp_tokens": lambda: docs.select(
            tokens(clean_text(F.col("text"))).alias("v")
        ),
        "fp_sorted": lambda: docs.select(
            F.array_sort(tokens(clean_text(F.col("text")))).alias("v")
        ),
        "scan_only": lambda: docs,
    }
    results: dict[str, float] = {}
    for name, fn in variants.items():
        noop(fn())  # warm codegen
    for name, fn in variants.items():
        results[name] = timed(lambda fn=fn: noop(fn()))
        print(f"{name}: {results[name]}", flush=True)
    print({k: v for k, v in sorted(results.items())})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
