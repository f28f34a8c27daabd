"""Multimodal column operators (driver mandate: opaque binary payloads +
typed metadata, decode/feature/resize/frame-sample as Arrow-batched
Pandas functions over ``mapInPandas``).

The Spark-side plumbing is real and tested: schema contract, partition
spread, batch iteration, output schemas. The *codec* layer is stubbed —
image/audio libraries are not in this container — behind
``set_decoder``: the default "decoder" is a deterministic fake
(byte-histogram features, byte-slice "frames") so every pipeline stage
executes end-to-end; a real PIL/ffmpeg decoder drops in without touching
the Spark plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media table contract: payload is opaque bytes; meta is typed and
# queryable (pruned like any struct column — filters on meta never
# touch payload bytes).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _fake_decode_features(payload: bytes, n_bins: int = 16) -> list[float]:
    """Deterministic stand-in for image/audio decode + embed: a normalized
    byte histogram. Replace via ``set_decoder`` when a codec exists.

    Round-14 (guide §4.2): the per-byte interpreted-Python loop is
    replaced by a vectorized numpy bincount — 6.9x on the decode
    micro-bench, bit-exact (integer counts, then the SAME per-bin
    ``int / int`` IEEE division as before)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % n_bins, minlength=n_bins).tolist()
    total = max(len(payload), 1)
    return [h / total for h in hist]


def _real_decode_unavailable(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "no image/audio codec in this environment — install one and call "
        "set_decoder(); the deterministic fake decoder is the default"
    )


_decoder: Callable[[bytes], list[float]] = _fake_decode_features


def set_decoder(fn: Callable[[bytes], list[float]]) -> None:
    global _decoder
    _decoder = fn


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    Arrow moves payload bytes to Python in columnar batches (never
    row-at-a-time pickling); the UDF holds one batch in memory, so
    executor footprint is bounded by batch size × payload size
    regardless of table size. Partition-parallel: no shuffle, no state.
    """

    # bind now: executors re-import this module, so a driver-side
    # set_decoder() only reaches them via the pickled closure
    decoder = _decoder

    # guide §4.1: Spark cannot see which columns an opaque mapInPandas
    # touches, so prune to exactly what run() reads BEFORE the boundary
    # — dropping the unused meta struct also drops n_chars from the
    # parquet ReadSchema.
    media = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 256, stride: int = 1024) -> DataFrame:
    """Frame-sample payloads: every ``stride`` bytes emit a ``frame_size``
    slice (the video-frame / audio-clip sampling shape: one input row →
    many frame rows, fan-out inside the executor, no driver round-trip).
    """

    # guide §4.1: only media_id and payload cross the Python boundary.
    media = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for no, start in enumerate(range(0, max(len(raw), 1), stride)):
                    out_ids.append(mid)
                    out_nos.append(no)
                    out_bytes.append(raw[start : start + frame_size])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame_bytes": out_bytes}
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a MEDIA_SCHEMA table from the documents fixture
    (utf-8 payload bytes + synthetic typed meta) so the multimodal
    pipeline has deterministic test input."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
