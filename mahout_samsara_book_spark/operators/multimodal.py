"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata (north star, BASELINE.json).

The container has no codec LIBRARIES (PIL/ffmpeg), so compressed media
decode stays stubbed — ``decode_features`` computes a deterministic
fake feature vector from raw bytes for ``application/octet-stream``-ish
payloads and raises ``NotImplementedError`` for media types without a
stdlib decoder — but the Spark-side plumbing is real and tested: binary
schema, Arrow batching through ``mapInPandas``, fixed-shape feature
output, partition-preserving narrow execution.

AUDIO and PPM IMAGES are real (round-5): ``attach_wav`` writes genuine
RIFF/PCM WAV payloads with the stdlib ``wave`` module and
``decode_wav_features`` parses them back (header + frame extraction +
int16 PCM decode); ``attach_ppm``/``decode_ppm_features`` do the same
for binary Netpbm P6 images (comment-tolerant header parse + RGB plane
decode). Actual byte-level codec round trips, not folds of raw bytes.
"""

from __future__ import annotations

import io
import wave

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


def attach_wav(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    rate: int = 8000,
) -> DataFrame:
    """Synthesize a REAL mono 16-bit PCM WAV payload per doc with the
    stdlib ``wave`` writer. Sample t of doc d is the deterministic
    ``((d*7919 + t*104729) mod 65536) - 32768`` — a pure integer
    function, so an analytic oracle can verify the decoded output
    without itself parsing RIFF. Arrow-batched, narrow (no shuffle):
    the per-doc payload synthesis is exactly where a production table's
    binary column would arrive from storage."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = []
            t = np.arange(n_samples, dtype=np.int64)
            for did in pdf["doc_id"]:
                pcm = ((int(did) * 7919 + t * 104729) % 65536) - 32768
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(pcm.astype("<i2").tobytes())
                blobs.append(bio.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    media = docs.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        op, schema="doc_id long, media binary"
    )
    return media.select(
        "doc_id",
        "media",
        F.lit("audio/wav").alias("media_type"),
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("checksum"),
    )


def _wav_segment_sums(buf: bytes, segments: int) -> tuple[int, int, np.ndarray]:
    """Parse one WAV payload: returns (framerate, n_samples, per-segment
    int64 sample sums). Mono 16-bit PCM only — the type ``attach_wav``
    writes and the only uncompressed WAV flavor worth a fast path."""
    with wave.open(io.BytesIO(buf), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise NotImplementedError(
                "decode_wav_features handles mono 16-bit PCM; got "
                f"{w.getnchannels()}ch/{w.getsampwidth() * 8}-bit"
            )
        rate = w.getframerate()
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
    edges = np.linspace(0, pcm.size, segments + 1).astype(int)
    sums = np.array(
        [pcm[a:b].sum() for a, b in zip(edges[:-1], edges[1:])], dtype=np.int64
    )
    return rate, pcm.size, sums


def decode_wav_features(
    media_df: DataFrame, segments: int = 8
) -> DataFrame:
    """Real audio decode: RIFF parse → int16 PCM → per-segment sample
    sums, exploded to ``(doc_id, rate, n_samples, seg, seg_sum)``.
    Integer-exact (int64 sums of int16 samples never lose precision),
    Arrow-batched, narrow — one output row per (doc, segment)."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc, rates, ns, seg, ssum = [], [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["media"]):
                rate, n, sums = _wav_segment_sums(bytes(buf), segments)
                for i, s in enumerate(sums):
                    doc.append(did)
                    rates.append(rate)
                    ns.append(n)
                    seg.append(i)
                    ssum.append(int(s))
            yield pd.DataFrame(
                {
                    "doc_id": doc,
                    "rate": rates,
                    "n_samples": ns,
                    "seg": seg,
                    "seg_sum": ssum,
                }
            )

    return media_df.mapInPandas(
        op,
        schema="doc_id long, rate long, n_samples long, seg long, seg_sum long",
    )


def attach_ppm(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 12,
) -> DataFrame:
    """Synthesize a REAL binary PPM (P6) image payload per doc: the
    standard Netpbm header (``P6\\n{w} {h}\\n255\\n``) followed by
    row-major RGB bytes. Pixel (x, y) channel c of doc d is the
    deterministic ``(d*31 + (y*w + x)*7 + c*13) mod 256`` so an
    analytic oracle can verify the decoded output without parsing
    Netpbm itself. Arrow-batched, narrow."""

    def op(batches):
        npix = width * height
        idx = np.arange(npix, dtype=np.int64)  # y*w + x, row-major
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = []
            header = f"P6\n{width} {height}\n255\n".encode()
            for did in pdf["doc_id"]:
                base = int(did) * 31 + idx * 7
                rgb = np.empty((npix, 3), dtype=np.int64)
                for c in range(3):
                    rgb[:, c] = (base + c * 13) % 256
                blobs.append(header + rgb.astype(np.uint8).tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    media = docs.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        op, schema="doc_id long, media binary"
    )
    return media.select(
        "doc_id",
        "media",
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("checksum"),
    )


def _ppm_parse(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Minimal but real P6 parser: magic, whitespace/comment-tolerant
    header tokens (width, height, maxval), then the raw RGB plane.
    Returns (width, height, pixels[h*w, 3] int64)."""
    if buf[:2] != b"P6":
        raise NotImplementedError("only binary PPM (P6) supported")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval per spec
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pix = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, pix.reshape(-1, 3).astype(np.int64)


def decode_ppm_features(media_df: DataFrame) -> DataFrame:
    """Real image decode: Netpbm P6 parse → per-channel pixel sums,
    ``(doc_id, width, height, channel, ch_sum)`` — integer-exact,
    Arrow-batched, narrow; three output rows per image."""

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc, ws, hs, ch, s = [], [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["media"]):
                w, h, pix = _ppm_parse(bytes(buf))
                sums = pix.sum(axis=0)
                for c in range(3):
                    doc.append(did)
                    ws.append(w)
                    hs.append(h)
                    ch.append(c)
                    s.append(int(sums[c]))
            yield pd.DataFrame(
                {"doc_id": doc, "width": ws, "height": hs,
                 "channel": ch, "ch_sum": s}
            )

    return media_df.mapInPandas(
        op,
        schema="doc_id long, width long, height long, channel long, ch_sum long",
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
                if mt == "audio/wav":
                    # real codec path: RIFF parse → PCM segment means
                    _, n, sums = _wav_segment_sums(bytes(buf), out_dim)
                    edges = np.linspace(0, n, out_dim + 1).astype(int)
                    widths = np.maximum(np.diff(edges), 1)
                    feats.append((sums / widths).tolist())
                elif mt == "image/x-portable-pixmap":
                    # real codec path: P6 parse → pooled pixel means
                    _, _, pix = _ppm_parse(bytes(buf))
                    flat = pix.reshape(-1).astype(np.float64)
                    edges = np.linspace(0, flat.size, out_dim + 1).astype(int)
                    feats.append(
                        [
                            float(flat[a:b].mean()) if b > a else 0.0
                            for a, b in zip(edges[:-1], edges[1:])
                        ]
                    )
                elif mt.startswith(("image/", "audio/", "video/")):
                    raise NotImplementedError(_REAL_CODECS_MSG.format(mt=mt))
                else:
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
