"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched pandas iterators.

The Spark-side architecture is real and tested — binary columns,
`mapInPandas` with explicit result schemas, per-batch vectorized
work — while the actual media codecs are stubbed: this container has
no image/audio libraries, so `decode_image_batch` falls back to a
clearly-marked deterministic fake when PIL is absent (and raises
`NotImplementedError` from the real path). Swapping in a real decoder
changes one function body, not the plan.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
batch size, not partition size; decode parallelism is the scan
parallelism (one task per input split). Nothing here shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, first_byte INT, width INT, height INT, format STRING"
)

FRAME_SAMPLE_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_offset INT, frame_hash STRING"


def _decode_real(payload: bytes) -> dict[str, Any]:
    """Real decode path — requires an image library this container
    doesn't ship. Kept separate so the stub boundary is explicit."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "install PIL/ffmpeg and implement _decode_real"
    )


def _decode_fake(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a decoder: derives pseudo-dimensions
    from the payload bytes. Stable across engines and reruns."""
    first = payload[0] if payload else 0
    second = payload[1] if len(payload) > 1 else 0
    return {
        "n_bytes": len(payload),
        "first_byte": first,
        "width": 64 + (first % 32),
        "height": 64 + (second % 32),
        "format": "fake/deterministic",
    }


try:  # pragma: no cover - library absent in this container
    import PIL.Image  # noqa: F401

    _HAVE_CODEC = True
except Exception:
    _HAVE_CODEC = False


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized decode of one Arrow batch of binary payloads."""
    decode = _decode_real if _HAVE_CODEC else _decode_fake
    return pd.DataFrame([decode(p if p is not None else b"") for p in payloads])


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media column: utf-8 bytes of the text stand in
    for an image blob (the test corpus has no real media)."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def image_metadata(docs: DataFrame) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    One Arrow round-trip per batch; the output schema is fixed and
    engine-checkable.
    """
    payloads = with_binary_payload(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf["payload"])
            meta.insert(0, "doc_id", pdf["doc_id"].values)
            yield meta

    return payloads.mapInPandas(run, schema=IMAGE_META_SCHEMA)


FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<FLOAT>"

RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, payload BINARY"


def extract_features(docs: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: a fixed-width float vector per
    payload (a real model would replace the byte-histogram with a CNN
    forward pass — the Arrow batch shape, schema, and parallelism are
    exactly what that deployment uses, with the model broadcast).

    The stand-in feature is a normalized byte histogram folded to
    ``dim`` buckets — deterministic, engine-portable, and nonzero for
    any non-empty payload.
    """
    import numpy as np

    payloads = with_binary_payload(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "feature": feats})

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(docs: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: emits a fixed-size payload per input (a real
    resizer would decode → scale → re-encode; the stub truncates/pads
    the byte stream to width*height deterministically)."""
    payloads = with_binary_payload(docs)
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload or b"")
                out = (p * (target // max(len(p), 1) + 1))[:target] if p else b"\x00" * target
                rows.append(
                    {"doc_id": doc_id, "width": width, "height": height, "payload": out}
                )
            yield pd.DataFrame(rows)
            rows = []

    return payloads.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: deterministic byte-offset "frames"
    from each payload (a video decoder would replace the offset
    arithmetic with real frame extraction)."""
    payloads = with_binary_payload(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = payload if payload is not None else b""
                step = max(len(p) // n_frames, 1)
                for idx in range(n_frames):
                    off = min(idx * step, max(len(p) - 1, 0))
                    chunk = p[off : off + step]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_offset": off,
                            "frame_hash": hashlib.md5(bytes(chunk)).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
