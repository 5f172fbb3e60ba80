"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the decode
kernels are STUBS behind import guards / deterministic fakes — but the
Spark-side plumbing (schema, Arrow batch shape, partitioning) is real and
tested: this is exactly how a production pipeline isolates heavyweight
per-batch decoders (``mapInPandas``: batch in, batch out, no per-row
Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8


def attach_binary(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal corpus: payload = utf-8 bytes of text (stands
    in for image bytes), plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
    )


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Map-only metadata pass over binary payloads (no decode)."""
    b = attach_binary(docs)
    return b.select(
        "doc_id",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def _decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    try:
        from PIL import Image  # noqa: F401 — not installed in this container
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; deploy with --py-files + conda env"
        ) from e
    raise NotImplementedError("real decode path not exercised in this sandbox")


def _fake_features(
    payload: bytes, dim: int = FEATURE_DIM, normalize: bool = True
) -> list[float]:
    """Deterministic fake 'embedding': byte histogram folded to `dim`
    buckets, normalized — stands in for a CNN/CLIP feature extractor.
    With ``normalize=False`` returns the raw integer counts (exact, so
    the driver's value-hash check is float-free)."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    if not normalize:
        return list(hist)
    total = hist.sum()
    return list(np.round(hist / total, 6)) if total else [0.0] * dim


def extract_features(
    binary_df: DataFrame, use_real_decoder: bool = False, normalize: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape contract: input batches carry (doc_id, payload); output
    (doc_id, features array<double>). The real decoder slot is where a
    Pillow/torchvision kernel drops in unchanged.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                feats = [_decode_image_real(p) for p in pdf["payload"]]
            else:
                feats = [_fake_features(p, normalize=normalize) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binary_df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id bigint, features array<double>"
    )


def frame_sample(binary_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: emit one row per sampled offset of the
    payload (the video-frame analogue: one input row → many output rows,
    exercising the explode-shaped mapInPandas contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, vals = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload or b""
                for off in range(0, len(data), every_n_bytes):
                    ids.append(did)
                    offs.append(off)
                    vals.append(int(data[off]))
            yield pd.DataFrame({"doc_id": ids, "frame_offset": offs, "sample_value": vals})

    return binary_df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id bigint, frame_offset bigint, sample_value bigint"
    )
