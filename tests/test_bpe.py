"""Distributed BPE training/encoding pinned byte-equal to a pure-Python
reference implementation (the scan-based merge of Sennrich et al. 2016).

The reference twin lives here, not in the engine: the engine's merge fold
must reproduce the classical left-to-right greedy non-overlapping scan
exactly, including argmax tie-breaks, or a learned tokenizer would drift
between a Spark trainer and any single-node consumer.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators import bpe


def ref_bpe_train(texts, n_merges, min_count=2):
    wc = Counter(w for t in texts for w in t.strip().split())
    vocab = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    out = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        out.append({"rank": rank, "left_sym": a, "right_sym": b, "pair_count": cnt})
        new = {}
        for syms, c in vocab.items():
            merged = ref_apply_merge(list(syms), a, b)
            k = tuple(merged)
            new[k] = new.get(k, 0) + c
        vocab = new
    return out


def ref_apply_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_encode(text, merges):
    toks = []
    for w in text.strip().split():
        syms = list(w) + ["</w>"]
        for m in merges:
            syms = ref_apply_merge(syms, m["left_sym"], m["right_sym"])
        toks += syms
    return toks


CORPUS = [
    (0, "low lower lowest"),
    (1, "new newer newest"),
    (2, "wide wider widest"),
    (3, "low low newer"),
    (4, "aaa aab abab"),  # overlap / self-pair edges
    (5, ""),  # empty doc -> single empty word -> no pairs
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_train_matches_reference(docs):
    merges = bpe.bpe_train(docs, n_merges=10, min_pair_count=2)
    ref = ref_bpe_train([t for _, t in CORPUS], 10)
    assert merges == ref


def test_train_deterministic_across_partitioning(docs):
    a = bpe.bpe_train(docs.repartition(7), n_merges=6, min_pair_count=2)
    b = bpe.bpe_train(docs.coalesce(1), n_merges=6, min_pair_count=2)
    assert a == b


def test_encode_matches_reference(docs):
    merges = bpe.bpe_train(docs, n_merges=8, min_pair_count=2)
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(docs, merges).collect()}
    for doc_id, text in CORPUS:
        assert got[doc_id] == ref_encode(text, merges), (doc_id, text)


def test_encode_roundtrip_preserves_text(docs):
    """Concatenating subword units (minus </w> boundaries) rebuilds each word."""
    merges = bpe.bpe_train(docs, n_merges=8, min_pair_count=2)
    enc = bpe.bpe_encode(docs, merges)
    rebuilt = enc.select(
        "doc_id",
        F.array_join(
            F.filter(
                F.split(F.array_join("bpe_tokens", ""), "</w>"),
                lambda w: w != F.lit(""),
            ),
            " ",
        ).alias("rebuilt"),
    ).collect()
    want = {i: " ".join(t.split()) for i, t in CORPUS}
    for r in rebuilt:
        assert r["rebuilt"] == want[r["doc_id"]]


def test_overlapping_self_pair_merges_left_to_right(spark):
    """'aaaa' with pair (a,a) must become [aa, aa, </w>], never [a, aaa...]."""
    docs = spark.createDataFrame([(0, "aaaa aaaa")], ["doc_id", "text"])
    enc = bpe.bpe_encode(
        docs,
        [{"rank": 0, "left_sym": "a", "right_sym": "a", "pair_count": 0}],
    ).collect()
    assert enc[0]["bpe_tokens"] == ["aa", "aa", "</w>", "aa", "aa", "</w>"]


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([(0, "xy zq")], ["doc_id", "text"])
    # every pair occurs exactly once -> below min_pair_count=2 -> no merges
    assert bpe.bpe_train(docs, n_merges=5, min_pair_count=2) == []
