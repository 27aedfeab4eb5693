"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` feature
extractors.

The Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested; the actual media DECODE is stubbed
behind ``decode_fn`` because no image/audio codec libraries exist in this
container (graft brief: "STUB the decode step ... and make the Spark-side
plumbing real"). Swapping in a real decoder (PIL / torchaudio / pyav) is
a one-argument change; everything distributed stays identical:

  * media bytes never shuffle: the extractor runs inside the scan
    projection and emits fixed-width feature vectors (array<float>),
    which are what downstream joins/ANN operate on;
  * batch shape: one pandas batch per Arrow batch; the extractor is
    vectorized over the batch (no per-row Python beyond the decode call
    itself, which is the codec boundary);
  * deterministic fake decode = seeded from the payload bytes, so tests
    and oracles are stable without codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: features derived from a sha256
    expansion of the payload — stable across processes and platforms."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    out = np.empty(dim, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    raw = b""
    counter = 0
    while len(raw) < dim * 4:
        raw += hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
        counter += 1
    ints = np.frombuffer(raw[: dim * 4], dtype=">u4").astype(np.float64)
    out[:] = (ints / 2**32 - 0.5).astype(np.float32)
    return out


def real_decode(payload: bytes, dim: int) -> np.ndarray:
    """The codec boundary. No media libraries ship in this container."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/pyav/torchaudio) "
        "not present in this environment; inject a decode_fn instead"
    )


def extract_media_features(
    df: DataFrame,
    dim: int = 32,
    payload_col: str = "payload",
    id_cols: list[str] | None = None,
    decode_fn: Callable[[bytes, int], np.ndarray] = fake_decode,
) -> DataFrame:
    """media rows -> (id..., n_bytes, feature array<float>).

    Feature vectors are the shuffle-safe representation; payload bytes
    stay inside the scan-side UDF.
    """
    id_cols = id_cols or ["media_id"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in id_cols
    ) + ", n_bytes bigint, features array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_cols].copy()
            payloads = pdf[payload_col]
            out["n_bytes"] = payloads.map(
                lambda b: len(b) if b is not None else 0
            ).astype("int64")
            out["features"] = payloads.map(
                lambda b: decode_fn(bytes(b) if b is not None else None, dim)
            )
            yield out

    return df.select(*id_cols, payload_col).mapInPandas(fn, schema=schema)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic codec-free stand-in for an image resize: re-keys the
    payload by the target dims and emits a byte string whose length
    scales with the target pixel count — size accounting downstream
    stays realistic, values stay pinned for tests. Never sees None:
    resize_media handles NULL passthrough before the codec boundary."""
    n = max(16, (width * height) // 1024)
    h0 = hashlib.sha256(
        payload + width.to_bytes(4, "big") + height.to_bytes(4, "big")
    ).digest()
    raw = b""
    counter = 0
    while len(raw) < n:
        raw += hashlib.sha256(h0 + counter.to_bytes(4, "big")).digest()
        counter += 1
    return raw[:n]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes | None] = fake_resize,
) -> DataFrame:
    """Resize image rows to (width, height): same schema out, payload
    transformed inside the scan-side Arrow UDF (bytes never shuffle),
    width/height metadata updated. The pixel work is the codec boundary
    (``resize_fn``); swapping in PIL is a one-argument change. Callers
    filter to ``kind = 'image'`` first."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            # NULL passthrough lives HERE, not in each pluggable codec —
            # a real resize_fn (PIL etc.) never sees a None payload
            out[payload_col] = pdf[payload_col].map(
                lambda b: None if b is None
                else resize_fn(bytes(b), width, height)
            )
            if "width" in out.columns:
                out["width"] = np.int32(width)
            if "height" in out.columns:
                out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(fn, schema=df.schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    n_frames_col: str = "n_frames",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index —
    JVM-side sequence explode; the (stubbed) per-frame decode then rides
    the same extract_media_features path keyed by (media_id, frame_idx)."""
    id_cols = id_cols or ["media_id"]
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.select(*id_cols, F.explode(idx).alias("frame_idx"))


def gen_media(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic media fixture rows (MEDIA_SCHEMA shape)."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append((
            i, kind, payload,
            640 if kind == "image" else None,
            480 if kind == "image" else None,
            16000 if kind == "audio" else None,
            rng.randint(30, 300) if kind == "video" else None,
        ))
    return rows
