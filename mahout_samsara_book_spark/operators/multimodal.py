"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata (north star, BASELINE.json).

The container has no image/audio codecs, so the DECODE step is stubbed —
``decode_features`` computes a deterministic fake feature vector from raw
bytes for ``application/octet-stream``-ish payloads and raises
``NotImplementedError`` for real media types — but the Spark-side
plumbing is real and tested: binary schema, Arrow batching through
``mapInPandas``, fixed-shape feature output, partition-preserving
narrow execution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long, checksum string"
)

_REAL_CODECS_MSG = (
    "media codec for {mt!r} is not available in this environment; "
    "plug a real decoder into decode_features (stub contract)"
)


def attach_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model the docs' payload as an opaque binary media column with
    typed metadata — the ingestion shape a real image/audio table has:
    ``(doc_id, media: binary, media_type, n_bytes, checksum)``."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(media).cast("long").alias("n_bytes"),
        F.md5(media).alias("checksum"),
    )


def _fake_decode(buf: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: fold the byte stream into
    out_dim accumulators (sum of bytes at stride positions, normalized).
    Pure function of the bytes — stable across partitions/engines."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(out_dim, dtype=np.float64)
    pad = (-arr.size) % out_dim
    folded = np.pad(arr, (0, pad)).reshape(-1, out_dim).sum(axis=0, dtype=np.int64)
    return (folded % 997) / 997.0


def decode_features(
    media_df: DataFrame, out_dim: int = 8
) -> DataFrame:
    """Arrow-batched decode: binary → fixed-width ``array<double>``
    feature vector. Real media types raise (stub); the plumbing —
    schema, batch shape, narrow partition-preserving execution — is the
    production path a real decoder drops into."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for mt, buf in zip(pdf["media_type"], pdf["media"]):
                if mt.startswith(("image/", "audio/", "video/")):
                    raise NotImplementedError(_REAL_CODECS_MSG.format(mt=mt))
                feats.append(_fake_decode(bytes(buf), out_dim).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pd.Series(feats, dtype=object),
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return media_df.mapInPandas(
        op, schema="doc_id long, features array<double>, n_bytes long"
    )


def resize_features(
    feat_df: DataFrame, out_dim: int, feat_col: str = "features"
) -> DataFrame:
    """Resize stub: adaptive average-pool a variable/fixed-width feature
    vector to ``out_dim`` (the 1-D analog of an image resize — a real
    ``PIL.Image.resize`` drops into the same batch loop). Arrow-batched,
    narrow, shape-checked output."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pooled = []
            for v in pdf[feat_col]:
                arr = np.asarray(v, dtype=np.float64)
                # split indices of an adaptive average pool
                edges = np.linspace(0, arr.size, out_dim + 1).astype(int)
                pooled.append(
                    [
                        float(arr[a:b].mean()) if b > a else 0.0
                        for a, b in zip(edges[:-1], edges[1:])
                    ]
                )
            out = pdf.drop(columns=[feat_col]).copy()
            out[feat_col] = pd.Series(pooled, dtype=object)
            yield out

    kept = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in feat_df.schema.fields
        if f.name != feat_col
    )
    return feat_df.mapInPandas(
        op, schema=f"{kept}, {feat_col} array<double>"
    )


def frame_sample(
    media_df: DataFrame, stride: int = 64, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling stub: every ``stride``-th byte as a 'frame marker'
    (stand-in for video frame extraction), capped at max_frames —
    exercises the one-row-in / many-rows-out explode shape a real frame
    sampler has. ``(doc_id, frame_idx, frame_byte)``."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_idx, out_byte = [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)[::stride][:max_frames]
                for i, b in enumerate(arr):
                    out_doc.append(did)
                    out_idx.append(i)
                    out_byte.append(int(b))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_byte": out_byte}
            )

    return media_df.mapInPandas(
        op, schema="doc_id long, frame_idx int, frame_byte int"
    )
