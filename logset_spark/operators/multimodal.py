"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A 100 TB training-data table carries media as `binary` payload columns next
to typed metadata (mime, n_bytes, content hash); decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
`mapInPandas` so the bytes never cross the JVM<->Python boundary row at a
time.  The reference (NERSC/LogSet) catalogs opaque log *files* the same
way — a ConcreteLog is an opaque artifact plus typed metadata (temporal
extent, subject, format; PK:src/handcoded.py via SURVEY.md §1.1) — so this
module is that idea recast for media payloads.

THE ACTUAL MEDIA DECODE IS STUBBED: this container has no PIL/ffmpeg/
librosa.  `_decode_payload` below is a clearly-marked deterministic fake
(byte-level statistics standing in for pixel decode).  Everything around
it — schema, Arrow batch shape, mapInPandas signature, partition sizing —
is the real production plumbing and is tested; swapping in a real decoder
changes only the body of `_decode_payload`.

Scale notes:
* payloads ride ONE binary column; metadata stays native so filters on
  mime/n_bytes prune parquet row groups without touching bytes;
* `mapInPandas` streams an Iterator of record batches — peak memory is one
  Arrow batch of payloads, not a partition (size with
  spark.sql.execution.arrow.maxRecordsPerBatch);
* feature vectors return as array<double>, ready for the similarity ops in
  operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 8  # byte-histogram bins in the stub decoder

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, features array<double>"
)
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_hash string"
)

HAVE_REAL_DECODER = False  # no PIL/ffmpeg in this container
try:  # pragma: no cover - not present in sandbox
    import PIL.Image  # noqa: F401

    HAVE_REAL_DECODER = True
except ImportError:
    pass


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media fixture: utf-8 bytes of the text stand in for an
    image payload (no external data allowed), plus the typed metadata
    columns a real media table carries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _decode_payload(buf: bytes) -> np.ndarray:
    """STUB DECODER — deterministic fake for PIL.Image.open(...).

    Returns an 8-bin byte-value histogram (density) as the stand-in
    "pixel" feature vector.  A real deployment replaces this body with
    actual decode + model features; the surrounding Spark plumbing does
    not change."""
    if HAVE_REAL_DECODER:  # pragma: no cover
        raise NotImplementedError(
            "real decoder present but intentionally not wired in this sandbox"
        )
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_FEATURES)
    hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
    return hist / arr.size


def extract_features(media: DataFrame) -> DataFrame:
    """payload -> feature vector via mapInPandas (Arrow-batched).

    Input: DataFrame[doc_id, payload, mime, n_bytes, ...]; output per
    FEATURE_SCHEMA.  Batch-at-a-time: one numpy pass per Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_payload(b).round(6).tolist() if b is not None else None
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "payload", "mime", "n_bytes").mapInPandas(
        batches, FEATURE_SCHEMA
    )


def frame_sample(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Video-style frame sampling, stubbed: split the payload into
    `n_frames` evenly-spaced byte windows ("frames") and emit a stable
    hash per frame.  Real path would seek keyframes with ffmpeg; the
    1->N row expansion and batch shape are identical.  md5 (not a faster
    non-crypto hash) so the stub is reproducible by any SQL engine: on an
    ASCII payload the byte windows equal character windows, which is what
    lets q_multimodal_frames carry a DuckDB oracle."""
    from hashlib import md5

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                if buf is None or len(buf) == 0:
                    continue
                step = max(len(buf) // n_frames, 1)
                for k in range(min(n_frames, len(buf))):
                    frame = bytes(buf[k * step: k * step + frame_bytes])
                    ids.append(doc_id)
                    idxs.append(k)
                    hashes.append(md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_hash": hashes}
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def resize_stub(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize, stubbed as byte truncation/padding — native (no Python):
    a real image resize is a decode->scale->re-encode pandas stage, but
    the *plumbing* (payload in, smaller payload out, metadata updated) is
    expressible with native binary functions for the stub."""
    clipped = F.substring(F.col("payload"), 1, target_bytes)
    return media.select(
        "doc_id",
        clipped.alias("payload"),
        F.col("mime"),
        F.octet_length(clipped).alias("n_bytes"),
    )


def pipeline(docs: DataFrame, apply: Callable | None = None) -> DataFrame:
    """attach -> features, the canonical multimodal flow used in tests."""
    media = attach_binary(docs)
    return extract_features(apply(media) if apply else media)
