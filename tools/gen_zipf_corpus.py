"""Deterministic Zipfian-vocabulary documents corpus (round-5 verdict #1).

The driver fixture's `documents` table draws from a ~31-token vocabulary,
which BASELINE.md records as the WORST case for prefix-filtered Jaccard
(prefixes prune nothing — every doc shares the same few tokens) and the
EASIEST case for LSH recall tests (signatures collide trivially). This
generator produces a corpus shaped like real training data so the
similarity/dedup family's recall and throughput claims are measured on
data shaped like their use case:

- 12,000-word vocabulary, Zipf rank-frequency (s = 1.07), with real
  English stopwords and the `lang_id` marker tokens occupying the top
  ranks (as they do in natural text) so quality/language gates see
  genuine signal;
- 50,000 base documents, log-normal lengths (median ~80 tokens, clipped
  to [8, 600]);
- language mixture 60/10/10/10/10 en/es/de/fr/zh with PER-LANGUAGE
  function-word heads: the top Zipf ranks of a document resolve to its
  OWN language's function words (real Spanish text does not contain
  "the"), content vocabulary shared across languages; zh resolves the
  head to CJK tokens — `lang_id` detects CJK by codepoint range. A
  v1 of this corpus shared one English-ish head across all languages,
  which made the language gate measure corpus artifice rather than the
  heuristic;
- PLANTED ground truth, written alongside the corpus:
  * 400 exact duplicates,
  * 1,500 near-duplicates at token-mutation rates
    {0.02, 0.05, 0.10, 0.20, 0.35} (300 each) — the spectrum from
    boilerplate-with-edits down to loosely-related rewrites,
  * one 200-document boilerplate cluster (shared ~200-token template,
    5 fresh suffix tokens each) — the hot-bucket stress shape,
  all recorded in `planted_pairs.parquet` (id_a, id_b, kind, rate);
- 20,000 unit-norm 64-d embeddings with 1,000 planted neighbour pairs
  at EXACT cosines {0.99, 0.95, 0.90, 0.80} (250 each), recorded in
  `planted_vec_pairs.parquet` (id_a, id_b, target_cos).

Everything derives from one seeded numpy PCG64 stream — same seed, same
bytes, on any host. Regenerate with `python tools/gen_zipf_corpus.py
[out_dir]`; tests and bench call :func:`ensure_corpus`, which generates
only if the directory is missing or incomplete. The output mirrors the
driver fixture's schemas (documents: doc_id,text,lang,source,n_chars;
embeddings: vec_id,embedding,label) so every catalog query runs on it
unchanged.
"""

from __future__ import annotations

import os
import sys

import numpy as np

SEED = 20260814
VOCAB_SIZE = 12_000
ZIPF_S = 1.07
N_BASE = 50_000
N_EXACT = 400
NEAR_RATES = (0.02, 0.05, 0.10, 0.20, 0.35)
N_PER_RATE = 300
N_BOILER = 200
N_VEC = 20_000
VEC_DIM = 64
COS_LEVELS = (0.99, 0.95, 0.90, 0.80)
N_PER_COS = 250

DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "zipf_corpus")

#: Bumped whenever generation changes; ensure_corpus regenerates on
#: mismatch so stale on-disk corpora can't silently feed tests.
CORPUS_VERSION = 2

_TABLES = (
    "documents.parquet",
    "embeddings.parquet",
    "planted_pairs.parquet",
    "planted_vec_pairs.parquet",
)

# Top Zipf ranks: genuine high-frequency function words. This is the
# shared RANK SCAFFOLD — each language's documents resolve these head
# ranks to their OWN function words (_LANG_FUNCTION below), the way real
# text works: the head of a Zipf distribution is function words, and
# function words are what distinguishes languages.
_TOP_WORDS = [
    "the", "a", "an", "and", "of", "to", "in", "is", "with", "that",
    "for", "it", "on", "as", "was", "at", "by", "be", "this", "are",
    "el", "la", "de", "que", "los", "der", "die", "und", "das", "ist",
    "le", "les", "des", "est", "not", "or", "from", "but", "they",
]

_CJK_TOKENS = ["数据", "处理", "分析", "引擎", "查询"]

# Per-language function-word heads (cycled over the _TOP_WORDS ranks).
# Includes every lang_id marker for its language; overlaps that exist in
# the real languages (es/fr "la") are kept — they are exactly what makes
# the marker-argmax heuristic's errors honest.
_LANG_FUNCTION = {
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "with", "that",
           "for", "it", "on", "as", "was", "at", "by", "be", "this", "are"],
    "es": ["el", "la", "de", "que", "los", "y", "un", "por", "con", "se"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "un", "une", "et", "dans", "pour"],
    "zh": _CJK_TOKENS,
}

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ji", "ka", "lo", "mi",
    "na", "po", "qu", "ra", "su", "ta", "vi", "wo", "xe", "za",
    "ber", "con", "dal", "fer", "gan", "hol", "jin", "kor", "lum",
    "mar", "nex", "por", "ril", "sol", "tur", "ven", "wex", "yor",
]


def _build_vocab(rng: np.random.Generator) -> list[str]:
    vocab = list(_TOP_WORDS)
    seen = set(vocab)
    while len(vocab) < VOCAB_SIZE:
        n_syll = int(rng.integers(2, 5))
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n_syll))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_sampler(rng: np.random.Generator):
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    cdf = np.cumsum(p / p.sum())

    def draw(n: int) -> np.ndarray:
        return np.searchsorted(cdf, rng.random(n), side="right")

    return draw


def _gen_documents(rng: np.random.Generator):
    vocab = np.array(_build_vocab(rng), dtype=object)
    draw = _zipf_sampler(rng)

    lengths = np.clip(
        np.exp(rng.normal(np.log(80.0), 0.7, N_BASE)).astype(np.int64), 8, 600
    )
    langs = rng.choice(
        np.array(["en", "es", "de", "fr", "zh"], dtype=object),
        N_BASE,
        p=[0.6, 0.1, 0.1, 0.1, 0.1],
    )
    # Per-language vocab view: head ranks resolve to the language's own
    # function words, the content tail is shared across languages.
    n_head = len(_TOP_WORDS)
    vocab_by_lang = {}
    for lg, fws in _LANG_FUNCTION.items():
        v = vocab.copy()
        v[:n_head] = [fws[j % len(fws)] for j in range(n_head)]
        vocab_by_lang[lg] = v

    all_ids = draw(int(lengths.sum()))
    docs_tokens: list[np.ndarray] = []
    off = 0
    for i in range(N_BASE):
        L = int(lengths[i])
        tok_ids = all_ids[off : off + L]
        off += L
        docs_tokens.append(vocab_by_lang[langs[i]][tok_ids])

    # ---- planted structure ------------------------------------------------
    pair_rows: list[tuple[int, int, str, float]] = []
    next_id = N_BASE
    extra_tokens: list[np.ndarray] = []
    extra_langs: list[str] = []

    eligible = np.flatnonzero(lengths >= 50)

    base_exact = rng.choice(eligible, N_EXACT, replace=False)
    for b in base_exact:
        extra_tokens.append(docs_tokens[b].copy())
        extra_langs.append(str(langs[b]))
        pair_rows.append((int(b), next_id, "exact", 0.0))
        next_id += 1

    for rate in NEAR_RATES:
        base_near = rng.choice(eligible, N_PER_RATE, replace=False)
        for b in base_near:
            toks = docs_tokens[b].copy()
            n_mut = max(1, int(round(rate * len(toks))))
            pos = rng.choice(len(toks), n_mut, replace=False)
            # mutations draw from the SAME language's vocab view — a
            # near-duplicate of a Spanish doc stays Spanish
            toks[pos] = vocab_by_lang[langs[b]][draw(n_mut)]
            extra_tokens.append(toks)
            extra_langs.append(str(langs[b]))
            pair_rows.append((int(b), next_id, "near", float(rate)))
            next_id += 1

    template = vocab_by_lang["en"][draw(200)]
    boiler_ids = []
    for _ in range(N_BOILER):
        toks = np.concatenate([template, vocab_by_lang["en"][draw(5)]])
        extra_tokens.append(toks)
        extra_langs.append("en")
        boiler_ids.append(next_id)
        next_id += 1
    for i, a in enumerate(boiler_ids):
        for b in boiler_ids[i + 1 :]:
            pair_rows.append((a, b, "boiler", 0.0))

    texts = [" ".join(t.tolist()) for t in docs_tokens + extra_tokens]
    all_langs = [str(x) for x in langs] + extra_langs
    doc_ids = np.arange(len(texts), dtype=np.int64)
    return (
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": all_langs,
            "source": [f"src{int(i) % 8}" for i in doc_ids],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        pair_rows,
    )


def _gen_embeddings(rng: np.random.Generator):
    base = rng.normal(size=(N_VEC, VEC_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pair_rows: list[tuple[int, int, float]] = []
    extra: list[np.ndarray] = []
    next_id = N_VEC
    for cos in COS_LEVELS:
        anchors = rng.choice(N_VEC, N_PER_COS, replace=False)
        for a in anchors:
            v = base[a]
            g = rng.normal(size=VEC_DIM)
            u = g - (g @ v) * v
            u /= np.linalg.norm(u)
            w = cos * v + np.sqrt(1.0 - cos * cos) * u
            extra.append(w.astype(np.float32))
            pair_rows.append((int(a), next_id, float(cos)))
            next_id += 1
    vecs = np.vstack([base.astype(np.float32), np.array(extra, dtype=np.float32)])
    labels = np.concatenate(
        [
            rng.integers(0, 16, N_VEC).astype(np.int32),
            np.full(len(extra), -1, dtype=np.int32),
        ]
    )
    return vecs, labels, pair_rows


def generate(out_dir: str = DEFAULT_OUT) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(SEED))
    os.makedirs(out_dir, exist_ok=True)

    docs, pair_rows = _gen_documents(rng)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(docs["doc_id"], pa.int64()),
                "text": pa.array(docs["text"], pa.string()),
                "lang": pa.array(docs["lang"], pa.string()),
                "source": pa.array(docs["source"], pa.string()),
                "n_chars": pa.array(docs["n_chars"], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=8192,
    )
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in pair_rows], pa.int64()),
                "id_b": pa.array([r[1] for r in pair_rows], pa.int64()),
                "kind": pa.array([r[2] for r in pair_rows], pa.string()),
                "rate": pa.array([r[3] for r in pair_rows], pa.float64()),
            }
        ),
        os.path.join(out_dir, "planted_pairs.parquet"),
    )

    vecs, labels, vec_pairs = _gen_embeddings(rng)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=4096,
    )
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in vec_pairs], pa.int64()),
                "id_b": pa.array([r[1] for r in vec_pairs], pa.int64()),
                "target_cos": pa.array([r[2] for r in vec_pairs], pa.float64()),
            }
        ),
        os.path.join(out_dir, "planted_vec_pairs.parquet"),
    )
    with open(os.path.join(out_dir, "VERSION"), "w") as f:
        f.write(str(CORPUS_VERSION))
    return out_dir


def ensure_corpus(out_dir: str = DEFAULT_OUT) -> str:
    """Generate the corpus iff any table is missing or the on-disk
    version predates CORPUS_VERSION; returns out_dir."""
    vfile = os.path.join(out_dir, "VERSION")
    version_ok = (
        os.path.exists(vfile) and open(vfile).read().strip() == str(CORPUS_VERSION)
    )
    if version_ok and all(
        os.path.exists(os.path.join(out_dir, t)) for t in _TABLES
    ):
        return out_dir
    return generate(out_dir)


if __name__ == "__main__":
    out = generate(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    import pyarrow.parquet as pq

    for t in _TABLES:
        md = pq.read_metadata(os.path.join(out, t))
        print(f"{t}: {md.num_rows} rows, {md.num_row_groups} row groups")
