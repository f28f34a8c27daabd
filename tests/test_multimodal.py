"""Multimodal plumbing tests: the mapInPandas schema/batch contracts are
real even though the codec is a deterministic fake (no image libs in this
container — SURVEY.md §2 driver mandate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from praw_etl_student_dropout_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    FRAMES_SCHEMA,
    documents_as_media,
    extract_features,
    sample_frames,
    set_decoder,
    _fake_decode_features,
    _real_decode_unavailable,
)
from praw_etl_student_dropout_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return documents_as_media(docs.limit(50)).cache()


def test_extract_features_schema_and_values(spark, media):
    feats = extract_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r.features) == 16
        # normalized byte histogram sums to ~1 for non-empty payloads
        if r.n_bytes > 0:
            assert abs(sum(r.features) - 1.0) < 1e-9


def test_extract_features_deterministic(spark, media):
    a = {r.media_id: tuple(r.features) for r in extract_features(media).collect()}
    b = {r.media_id: tuple(r.features) for r in extract_features(media).collect()}
    assert a == b


def test_extract_features_matches_local_decoder(spark, media):
    got = {r.media_id: r.features for r in extract_features(media).collect()}
    for r in media.collect():
        assert got[r.media_id] == pytest.approx(_fake_decode_features(bytes(r.payload)))


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, frame_size=64, stride=128)
    assert frames.schema == FRAMES_SCHEMA
    per_media = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    for r in media.collect():
        n = len(bytes(r.payload))
        expected = max((n + 127) // 128, 1)
        assert per_media[r.media_id] == expected
    assert frames.agg(F.max(F.length("frame_bytes"))).first()[0] <= 64


def test_meta_filter_never_touches_payload(spark, media):
    # typed-meta predicate → payload column pruned out of the scan entirely
    q = media.filter(F.col("meta.width") > 100).select("media_id", "meta.height")
    assert q.count() >= 0
    assert "payload" not in q.columns


def test_real_decoder_stub_raises(spark, media):
    set_decoder(_real_decode_unavailable)
    try:
        with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
            extract_features(media).collect()
    finally:
        set_decoder(_fake_decode_features)
