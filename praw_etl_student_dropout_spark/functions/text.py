"""Text expression library (SURVEY.md §2.8 F1-F8, §2.9 U1-U6).

Everything here is built from native ``pyspark.sql.functions`` so the
expressions stay inside Catalyst/whole-stage codegen — the reference's
per-row pandas ``.apply`` UDFs (etl_pipeline.py:77-81) are exactly the
interpreter-bound hot path this file eliminates. The only irreducible
Python UDF in the engine is the swappable TextBlob sentiment backend in
``udfs.py``; the default sentiment is a deterministic lexicon score that
both Spark and an ANSI-SQL oracle can compute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference regexes (etl_pipeline.py:74,80). The alpha class is written
# \p{Alpha} (Java default = US-ASCII [a-zA-Z], identical match set)
# because the JVM regex engine compiles a two-range union class
# ([^a-zA-Z\s]) to a ~20x slower node than the single property: measured
# 4.5 s -> 0.3 s over the 52k-doc Zipfian corpus, and clean_text is in
# the hot path of every text query. Pattern.compile runs with no flags,
# so \p{Alpha} stays ASCII; do NOT add UNICODE_CHARACTER_CLASS.
# DIVERGENT SPELLING, INTENTIONAL: RE2 (DuckDB's regex engine, i.e. the
# oracle side) does not support \p{Alpha}, so plans/catalog.py::SQL_CLEAN
# keeps the [^a-zA-Z\s] form. The two spellings are hand-synchronized;
# tests/test_udfs.py::test_clean_pattern_ascii_class_equivalence is
# the gauntlet pinning byte-equality on mixed-case/Unicode/URL edges —
# change either side only together with it.
CLEAN_PATTERN = r"http\S+|www\S+|[^\p{Alpha}\s]"
DROPOUT_PATTERN = r"(?i)drop[\s-]?out|dropped out"

# Deterministic sentiment lexicon (stands in for TextBlob polarity,
# etl_pipeline.py:78, so the DuckDB oracle can reproduce scores exactly).
POS_WORDS = ["fast", "small", "value", "spark", "good", "great"]
NEG_WORDS = ["slow", "big", "dup", "error", "bad", "crash"]
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in"]


def clean_text(col: Column) -> Column:
    """F1+F2 — strip URLs + non-alpha, lowercase, trim (etl_pipeline.py:73-77).

    Native regexp_replace replaces all occurrences (= re.sub); order
    (replace → lower → strip) mirrors the reference.
    """
    return F.trim(F.lower(F.regexp_replace(col, CLEAN_PATTERN, "")))


def tokens(col: Column) -> Column:
    """U6 — whitespace tokenization → array<string>."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """U6 — token count; 0 for empty/blank strings."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def _hits(toks: Column, words: list[str]) -> Column:
    """Occurrence count of lexicon words (duplicates counted)."""
    vocab = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(vocab, t)))


def sentiment_score(col: Column) -> Column:
    """U2 (deterministic default) — lexicon polarity in [-1, 1].

    (pos_hits - neg_hits) / max(token_count, 1); replaces TextBlob
    (etl_pipeline.py:78) with an oracle-reproducible score. Swap in the
    TextBlob pandas_udf from ``udfs.py`` for production parity.
    """
    toks = tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    return (_hits(toks, POS_WORDS) - _hits(toks, NEG_WORDS)) / n


def sentiment_label(score: Column, pos_threshold: float = 0.1, neg_threshold: float = -0.1) -> Column:
    """P7/U3 — 3-way CASE bucket (etl_pipeline.py:79,152-154)."""
    return (
        F.when(score > pos_threshold, F.lit("positive"))
        .when(score < neg_threshold, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def dropout_mentioned(col: Column) -> Column:
    """P3 — regex flag with na=False semantics (etl_pipeline.py:80)."""
    return F.coalesce(col.rlike(DROPOUT_PATTERN), F.lit(False))


def quality_score(col: Column) -> Column:
    """Text quality heuristic in [0, 1] for pretraining-data filtering.

    Mean of three signals computed natively: (1) length sanity — token
    count in [5, 5000]; (2) alphabetic ratio of non-space chars; (3)
    stopword presence ratio bounded to [0, 0.5] then scaled (natural text
    has some stopwords; token soup has none).
    """
    # The four expensive scalars (tokenize+size, stopword filter, two
    # regex strips) are bound ONCE into a struct and the arithmetic runs
    # inside a transform lambda referencing the bound variable — the
    # lang_id lesson: subexpression elimination does not reach through
    # repeated references, so the bare form re-tokenizes per reference
    # (~1.8x slower on the profile run).
    toks = tokens(col)
    no_space = F.regexp_replace(col, r"\s+", "")
    alpha = F.regexp_replace(no_space, r"[^a-zA-Z]", "")
    s = F.struct(
        F.size(toks).alias("n_tok"),
        _hits(toks, STOPWORDS).alias("stop_hits"),
        F.length(no_space).alias("len_ns"),
        F.length(alpha).alias("len_a"),
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


# Character-frequency markers per language — a classic n-gram-profile
# heuristic reduced to expressions: score each language by marker-token
# and marker-character hits, pick argmax deterministically.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": [],  # CJK detected by codepoint range below
}


def lang_id(col: Column) -> Column:
    """U6⊕ — n-gram-heuristic language ID.

    CJK codepoints → zh; else argmax of marker-token hit counts with a
    deterministic tiebreak (language code ascending); no hits → 'und'.
    Pure expressions — at 100 TB this is a single narrow map stage.

    Two hot-path choices (3x over the naive form on the profile run):
    per-language hits come from ONE regexp_count over the space-padded
    token string (token-exact via the trailing-space lookahead, so
    adjacent markers both count) instead of a higher-order filter per
    language; and the counts struct is bound to a transform lambda
    variable so the argmax/tiebreak chain references it WITHOUT
    re-evaluating it — subexpression elimination does not reach through
    higher-order-function boundaries, so a bare `greatest(...) +
    when-chain` re-computes every count per reference.
    """
    codes = sorted(c for c, m in _LANG_MARKERS.items() if m)
    padded = F.concat(F.lit(" "), F.array_join(tokens(F.lower(col)), " "), F.lit(" "))
    counts = F.struct(
        *[
            F.regexp_count(
                padded, F.lit(" (?:" + "|".join(_LANG_MARKERS[c]) + ")(?= )")
            ).alias(c)
            for c in codes
        ]
    )

    def pick(s: Column) -> Column:
        best = F.greatest(*[s[c] for c in codes])
        chain = None
        for c in codes:  # ascending code order = smallest-code tiebreak
            branch = F.when(s[c] == best, F.lit(c))
            chain = branch if chain is None else chain.when(s[c] == best, F.lit(c))
        return F.when(best > 0, chain).otherwise(F.lit("und"))

    has_cjk = col.rlike(r"[一-鿿]")
    return F.when(has_cjk, F.lit("zh")).otherwise(
        F.transform(F.array(counts), pick)[0]
    )


def term_counts(arr: Column) -> Column:
    """Per-row term frequencies: ``array<struct<term,tf>>`` from a token
    array, computed ROW-LOCALLY in O(n log n) — sort, find run starts,
    diff consecutive starts for run lengths. No explode, no shuffle: the
    raw token stream never leaves its row, which removes the
    (doc, term) shuffle from every downstream tf consumer (TF-IDF,
    entropy, unigram scoring). 4x faster than the filter-count O(n·d)
    form on 2k-token docs.

    Every intermediate (sorted array, run starts) is BOUND via the
    transform-array trick before reuse — an outer expression referenced
    inside a higher-order-function lambda is re-evaluated per element,
    so an unbound array_sort would run once per token (the lang_id
    lesson, measured 3x there).

    NULL elements are dropped (``array_compact``) before counting: a
    NULL token is not a term, and leaving it in would both break the
    run-start comparison (``x != NULL`` is NULL, silently folding the
    run into its neighbour) and emit a meaningless NULL-term row.
    ``tokens()`` never yields NULLs, but this is a public helper.
    """

    def with_sorted(srt: Column) -> Column:
        n = F.size(srt)
        # CASE WHEN, not `|`: conditional expressions evaluate only the
        # taken branch, so element_at(srt, 0) — an ANSI-mode error — can
        # never fire at i == 1 regardless of operand evaluation order.
        starts = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i == F.lit(1), F.lit(True)).otherwise(
                F.element_at(srt, i) != F.element_at(srt, i - 1)
            ),
        )

        def with_starts(st: Column) -> Column:
            nxt = F.concat(
                F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                F.array(n + 1),
            )
            return F.zip_with(
                st,
                nxt,
                lambda a, b: F.struct(
                    F.element_at(srt, a).alias("term"), (b - a).alias("tf")
                ),
            )

        # n == 0 guard: sequence(1, 0) DESCENDS in Spark and zip_with
        # null-pads the shorter side, so the empty array must short-circuit
        return F.when(
            n == 0, F.array().cast("array<struct<term:string,tf:integer>>")
        ).otherwise(F.transform(F.array(starts), with_starts)[0])

    return F.transform(F.array(F.array_sort(F.array_compact(arr))), with_sorted)[0]


def doc_fingerprint(col: Column) -> Column:
    """U6⊕ — order-insensitive document fingerprint.

    md5 over the sorted token multiset of the cleaned text: identical
    token bags → identical fingerprint regardless of word order. Exact
    near-dup pass for D3's cheap first stage.
    """
    return F.md5(F.array_join(F.array_sort(tokens(clean_text(col))), " "))


def rolling_hash(col: Column, base: int = 31, mod: int = (1 << 61) - 1) -> Column:
    """U6⊕ — polynomial rolling hash over tokens (order-sensitive).

    h = Σ h*base + xxhash64(token) (mod 2^61-1), folded left with
    ``aggregate`` — stays in codegen, no UDF. Spark-only (the oracle
    cannot reproduce xxhash64); tested by pytest invariants instead.
    """
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + F.pmod(F.xxhash64(t), F.lit(mod))) % F.lit(mod),
    )


# PII patterns for curation-time redaction. Deliberately conservative,
# RE2/Java-portable syntax (char classes + bounded repeats only) so the
# same pattern string runs identically in Spark and a SQL oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,4}[\- (][0-9()\- ]{5,}[0-9]"
PII_LONG_NUMBER = r"[0-9]{6,}"


def redact_pii(col: Column) -> Column:
    """Training-data PII scrub: emails, phone-shaped runs, long digit runs.

    Chained native regexp_replace (longest/most-specific pattern first so
    an email's digits aren't half-eaten by the number pass). All-native:
    the scrub runs inside codegen at full scan speed — at 100 TB this is
    a per-row hot path where a Python UDF would dominate the job.
    """
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_LONG_NUMBER, "<NUM>")
