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


def test_binary_file_source_roundtrip_and_scan_pruning(spark, tmp_path):
    """binaryFile ingestion edge (round-7): payload bytes round-trip
    exactly, pathGlobFilter selects by extension, and max_bytes filters
    on the length METADATA (the pushed filter that keeps oversized
    payloads unread at a 100 TB crawl)."""
    import os

    from praw_etl_student_dropout_spark.sources.readers import read_binary_files

    d = tmp_path / "assets"
    os.makedirs(d)
    payloads = {
        "a.jpg": b"\xff\xd8tiny-jpeg-payload",
        "b.jpg": b"\xff\xd8" + b"x" * 1000,
        "c.txt": b"not an image",
    }
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)

    all_rows = {
        r.path.rsplit("/", 1)[-1]: bytes(r.content)
        for r in read_binary_files(spark, str(d)).collect()
    }
    assert all_rows == payloads  # exact byte round-trip

    jpgs = read_binary_files(spark, str(d), path_glob="*.jpg")
    assert {r.path.rsplit("/", 1)[-1] for r in jpgs.collect()} == {"a.jpg", "b.jpg"}

    small = read_binary_files(spark, str(d), path_glob="*.jpg", max_bytes=100)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.jpg"]
    # the length predicate is pushed into the binaryFile scan
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "length" in plan

    # the binary rows adapt onto the MEDIA contract and feed the
    # multimodal feature extractor unchanged
    from pyspark.sql import functions as F

    from praw_etl_student_dropout_spark.operators.multimodal import (
        extract_features,
    )

    media = small.select(
        F.xxhash64("path").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
        F.named_struct(
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("sample_rate"), F.lit(None).cast("int"),
            F.lit("n_frames"), F.lit(None).cast("int"),
        ).alias("meta"),
    )
    feats = extract_features(media)
    assert feats.count() == 1


def test_python_boundary_is_pruned(spark, sf_dir):
    """Round-14 (guide §4.1): the opaque mapInPandas functions must ship
    ONLY the columns they read — extract_features the (media_id, kind,
    payload) triple, sample_frames the (media_id, payload) pair. The
    unused meta struct leaking back in silently re-widens the Arrow
    transfer AND drags n_chars back into the parquet ReadSchema."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    media = documents_as_media(docs)

    feat_plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    (mip_line,) = [l for l in feat_plan.splitlines() if "MapInPandas" in l]
    assert "meta" not in mip_line and "payload" in mip_line

    frame_plan = sample_frames(media)._jdf.queryExecution().executedPlan().toString()
    (mip_line,) = [l for l in frame_plan.splitlines() if "MapInPandas" in l]
    assert "meta" not in mip_line and "kind" not in mip_line
