"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the media DECODE step is stubbed (the
image/audio libraries are not in this container) behind
``NotImplementedError`` / a deterministic fake, clearly marked.

Decode/feature-extract runs through ``mapInPandas`` (Arrow-batched,
vectorized) — the correct shape for CPU-heavy per-item work at scale:
batches stream through Python workers without materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, digest string"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, kind string, width int, height int, "
    "n_frames int, feature array<float>"
)


def binary_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column — pure Column algebra
    (no decode): byte length + sha256 digest. This is the cheap pass that
    runs over ALL blobs before any decode is scheduled."""
    other = [c for c in df.columns if c != payload_col]
    return df.select(
        *other,
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col(payload_col), 256)).alias("digest"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB: real implementation would be PIL/libvips decode. This
    container has no image libraries, so we return a deterministic fake
    derived from the payload bytes (stable across runs/partitions), which
    keeps the downstream plumbing (schema, batching, joins) fully
    testable."""
    h = hash_bytes(payload)
    return {
        "kind": "image/fake",
        "width": 16 + (h % 16) * 16,
        "height": 16 + ((h >> 8) % 16) * 16,
        "n_frames": 1,
    }


def hash_bytes(payload: bytes) -> int:
    import zlib

    return zlib.crc32(payload or b"")


def decode_features(df: DataFrame, id_col: str, payload_col: str, feat_dim: int = 8) -> DataFrame:
    """mapInPandas decode + feature-extract over Arrow batches.

    Real deployments swap `_decode_image_stub` for an actual decoder and
    the feature block for a model forward pass; the batch shape
    (pandas DataFrames streaming per partition) is exactly what a GPU/CPU
    featurizer wants."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            metas = [_decode_image_stub(p) for p in payloads]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "kind": [m["kind"] for m in metas],
                    "width": pd.array([m["width"] for m in metas], dtype="int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="int32"),
                    "n_frames": pd.array([m["n_frames"] for m in metas], dtype="int32"),
                    # deterministic fake feature: normalized byte histogram head
                    "feature": [
                        _fake_feature(p, feat_dim) for p in payloads
                    ],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


def _fake_feature(payload: bytes | None, dim: int) -> list[float]:
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload[:4096]:
        counts[b % dim] += 1
    total = float(sum(counts)) or 1.0
    return [c / total for c in counts]


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame index.
    The decode itself is stubbed (NotImplementedError at decode time in
    this container); the row-explosion plumbing is the part that matters
    for partition sizing at scale."""
    n_frames = F.greatest((F.octet_length(F.col(payload_col)) / 1024).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col),
        F.explode(idx).alias("frame_idx"),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, max_side: int = 256
) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas): cap the longer side
    at ``max_side`` preserving aspect ratio. The pixel resample itself is
    stubbed (no image libs in this container — a real deployment swaps
    the body for PIL/libvips thumbnail); the deterministic fake keeps the
    CONTRACT testable: output dims are the exact scaled dims the real
    decoder would produce for the stub-decoded input dims, and the
    payload is a stable binary derived from (input bytes, target dims) so
    downstream exact-dedup/caching plumbing behaves as it would on real
    thumbnails. Batch shape, schema, and partition flow are production
    shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, payloads = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                meta = _decode_image_stub(p)
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ids.append(int(i))
                ws.append(nw)
                hs.append(nh)
                # STUB resample: stable bytes keyed by content + dims
                payloads.append(
                    (p or b"")[: 64] + f":{nw}x{nh}".encode()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


def decode_audio(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Audio decode — NOT available in this container. Stub that fails
    loudly at plan time so callers know to deploy with soundfile/ffmpeg."""
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg, not present in this "
        "container; deploy with --py-files including an audio decoder and "
        "swap this stub (see operators/multimodal.py)"
    )
