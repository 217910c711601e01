"""Multimodal-column operators (north-star M4): image/audio/video as
opaque ``binary`` payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The reference has no media handling (text/KG only); this is the
north-star extension for LLM-training-data pipelines (BASELINE.json
"multimodal columns").  Design for 100 TB:

  - payloads are **opaque bytes** in a ``binary`` column — Spark never
    interprets them; Parquet stores them as BYTE_ARRAY pages, scans
    prune them unless selected (column pruning keeps metadata-only
    queries payload-free);
  - typed metadata travels in plain top-level columns (``media_type``,
    ``n_bytes``, ``width`` …) so predicates on it push down to the
    parquet scan without touching payload bytes;
  - all per-payload compute (decode, resize, frame-sample, feature
    extraction) is ``mapInPandas`` — Arrow-batched, one Python worker
    per partition, payload bytes never shuffle unless the caller
    repartitions first.

The container ships no image/audio codecs, so the *codec* step is
stubbed: :func:`decode_payload_real` raises ``NotImplementedError``
(clearly marked), and the default pipeline uses a **deterministic fake
decoder** (byte values = pixel/sample intensities) so every downstream
stage — batch shapes, schemas, partitioning, feature math — is real and
testable, and even DuckDB-oracle-checkable (byte values of ASCII text
are just ``ascii()`` codes, computable in SQL on both engines).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic synthetic-corpus parameters (shared with the DuckDB
# oracles in queries/multimodal_queries.py — keep in sync)
WIDTH_MOD = 97
HEIGHT_MOD = 61
FRAME_BYTES = 64
SAMPLE_EVERY = 4
MEDIA_TYPES = ("image", "audio", "video")


def attach_media(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a media catalog: opaque binary
    payload + typed metadata columns.

    Pure-SQL projection (codegen, no Python): payload = utf-8 bytes of
    the text (an *opaque* stand-in for real image/audio bytes),
    media_type round-robins by doc_id, width/height derive
    deterministically from payload length.  At scale this is the
    ingestion step that normalizes heterogeneous blobs into one schema.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.length(payload).cast("long")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        n_bytes.alias("n_bytes"),
        (F.lit(32) + n_bytes % WIDTH_MOD).cast("int").alias("width"),
        (F.lit(32) + n_bytes % HEIGHT_MOD).cast("int").alias("height"),
        (n_bytes * 1000 / F.lit(16000)).cast("long").alias("duration_ms"),
        F.ceil(n_bytes / FRAME_BYTES).cast("long").alias("n_frames"),
    )


def decode_payload_real(payload: bytes, media_type: str) -> np.ndarray:
    """REAL codec hook — intentionally unimplemented in this container.

    A deployment with PIL/ffmpeg/soundfile installed swaps this in for
    :func:`decode_payload_fake`; everything downstream (schemas, batch
    shapes, feature math) is codec-agnostic.
    """
    raise NotImplementedError(
        "no image/audio codecs in this container; "
        "use decode_payload_fake (deterministic) or install codecs"
    )


def decode_payload_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in decoder: raw byte values as uint8
    intensities (1-D).  Same numbers any engine can recompute."""
    return np.frombuffer(payload, dtype=np.uint8)


def image_features(
    media: DataFrame, n_bins: int = 4, decoder=decode_payload_fake
) -> DataFrame:
    """Per-image intensity stats + ``n_bins``-bin histogram.

    ``mapInPandas``: Arrow delivers each partition as pandas batches;
    NumPy does the per-payload math in C.  Output drops the payload, so
    the expensive bytes die at this stage boundary (nothing shuffles).
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decoder(bytes(payload), "image").astype(np.float64)
                if px.size == 0:
                    px = np.zeros(1)
                edges = np.linspace(0, 256, n_bins + 1)
                hist, _ = np.histogram(px, bins=edges)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "mean_intensity": round(float(px.mean()), 6),
                        "max_intensity": float(px.max()),
                        "histogram": hist.astype(np.int64).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload")
        .mapInPandas(
            batch,
            "doc_id long, mean_intensity double, max_intensity double, "
            "histogram array<long>",
        )
    )


def resize_image(
    media: DataFrame, out_w: int = 4, out_h: int = 4,
    decoder=decode_payload_fake,
) -> DataFrame:
    """Fake-decode → reshape to (height, width) padded grid → block-mean
    "resize" to (out_h, out_w) → flat array<float>.

    The real-codec version only swaps ``decoder``; the Spark plumbing
    (schema, Arrow batching, partition-local compute) is identical.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                px = decoder(bytes(payload), "image").astype(np.float64)
                grid = np.zeros(int(w) * int(h))
                grid[: min(px.size, grid.size)] = px[: grid.size]
                grid = grid.reshape(int(h), int(w))
                # block-mean pooling via split indices (any w,h)
                ys = np.array_split(np.arange(int(h)), out_h)
                xs = np.array_split(np.arange(int(w)), out_w)
                out = np.array(
                    [
                        grid[np.ix_(y, x)].mean()
                        for y in ys
                        for x in xs
                    ]
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "thumb": np.round(out, 6).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload", "width", "height")
        .mapInPandas(batch, "doc_id long, thumb array<float>")
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = SAMPLE_EVERY,
) -> DataFrame:
    """Frame-sample "videos": chunk the payload into fixed-size frames,
    keep every ``every``-th, emit (doc_id, frame_no, offset, frame_mean).

    ``mapInPandas`` so frame extraction is partition-local; only the
    tiny per-frame rows (no payload) leave the stage.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "offset": [], "frame_mean": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = int(np.ceil(px.size / frame_bytes))
                for fi in range(0, n_frames, every):
                    chunk = px[fi * frame_bytes:(fi + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(fi)
                    out["offset"].append(fi * frame_bytes)
                    out["frame_mean"].append(
                        round(float(chunk.mean()), 6) if chunk.size else 0.0
                    )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(
            batch,
            "doc_id long, frame_no long, offset long, frame_mean double",
        )
    )


def audio_windows(
    media: DataFrame, window_bytes: int = 256
) -> DataFrame:
    """Windowed "audio" energy: RMS per fixed-size sample window —
    the shape of real feature extraction (fbank/MFCC) with the codec
    stubbed to raw bytes."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "win_no": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.float64
                )
                n_win = int(np.ceil(px.size / window_bytes))
                for wi in range(n_win):
                    chunk = px[wi * window_bytes:(wi + 1) * window_bytes]
                    rms = float(np.sqrt((chunk**2).mean())) if chunk.size else 0.0
                    out["doc_id"].append(doc_id)
                    out["win_no"].append(wi)
                    out["rms"].append(round(rms, 6))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "audio")
        .select("doc_id", "payload")
        .mapInPandas(batch, "doc_id long, win_no long, rms double")
    )
