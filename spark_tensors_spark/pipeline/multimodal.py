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

Codec status (real since r5 — this paragraph is the authoritative
one): :func:`decode_payload_real` REALLY decodes PNG images (pure
stdlib/numpy: chunk walk, zlib inflate, all five filter types,
:func:`decode_png`) and RIFF/WAVE PCM audio (:func:`decode_wav_pcm`).
Only formats whose codecs this container genuinely lacks raise
``NotImplementedError`` (JPEG/WebP need PIL, video needs ffmpeg — a
deployment swaps those branches in).  The **deterministic fake
decoder** (:func:`decode_payload_fake`, byte values = pixel/sample
intensities) remains available so downstream stages — batch shapes,
schemas, partitioning, feature math — are DuckDB-oracle-checkable
(byte values of ASCII text are just ``ascii()`` codes, computable in
SQL on both engines); the declared `mm_image_features` query runs the
REAL PNG path under a sample-exact pixel oracle.
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


def _round6(x: float) -> float:
    """Half-up 6-dp rounding ≡ DuckDB/Spark ROUND(x, 6) for x ≥ 0.

    Python's round() is banker's (half-to-even): byte-derived means are
    DYADIC rationals (e.g. 95.4140625) that land exactly on 6-dp ties,
    where the two modes split — found as a real sf0.1 oracle mismatch.
    x·1e6 is exact for dyadic x (1e6 is an exact double), floor(+0.5)
    is the same half-up DuckDB's ROUND applies.
    """
    return float(np.floor(x * 1e6 + 0.5) / 1e6)


def decode_wav_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE decode in pure numpy: walks the chunk list, parses
    the ``fmt `` chunk, and converts the ``data`` chunk to a mono
    float64 waveform in [-1, 1].  Supports PCM (format 1) at
    8/16/24/32-bit and IEEE float (format 3) at 32/64-bit, any channel
    count (channels are averaged).  Returns (samples, sample_rate).

    This is the non-fake proof for the multimodal decode path: WAV is a
    container simple enough to parse without codec libraries, while
    exercising the exact plumbing (binary column → mapInPandas →
    numeric features) a PIL/ffmpeg deployment uses.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_channels = max(1, int.from_bytes(fmt[2:4], "little"))
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned, biased at 128
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (raw.size // 3) * 3].reshape(-1, 3)
            as_int = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            as_int = np.where(as_int >= 1 << 23, as_int - (1 << 24), as_int)
            x = as_int.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_fmt == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dt).astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code: {audio_fmt}")
    if n_channels > 1:
        x = x[: (x.size // n_channels) * n_channels]
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, sample_rate


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Inverse of :func:`decode_wav_pcm` for 16-bit PCM — used to build
    real WAV payloads for tests and the mm_wav_* query without any
    audio library."""
    clipped = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    # half-up quantization (floor(x+0.5)), not banker's np.round: an SQL
    # oracle can restate FLOOR(x*32767 + 0.5) exactly
    pcm = np.floor(clipped * 32767.0 + 0.5).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(
    img: np.ndarray, filter_fn=None
) -> bytes:
    """Pure-stdlib PNG encoder (zlib + numpy): 8-bit, non-interlaced,
    grayscale (h, w), RGB (h, w, 3) or RGBA (h, w, 4).

    ``filter_fn(row_index) -> 0..4`` selects the per-row filter type
    (default 0 = None); the deterministic synthetic corpus varies it so
    decoding exercises every unfilter branch (Sub/Up/Average/Paeth).
    """
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w = img.shape[:2]
        channels = img.shape[2]
        color_type = 2 if channels == 3 else 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])  # depth 8, deflate, adaptive, none
    )
    raw = img.reshape(h, w * channels)
    prior = np.zeros(w * channels, dtype=np.uint8)
    lines = []
    for y in range(h):
        row = raw[y]
        ft = int(filter_fn(y)) if filter_fn is not None else 0
        left = np.concatenate(
            (np.zeros(channels, dtype=np.uint8), row[:-channels])
        ) if w * channels > channels else np.zeros_like(row)
        upleft = np.concatenate(
            (np.zeros(channels, dtype=np.uint8), prior[:-channels])
        ) if w * channels > channels else np.zeros_like(prior)
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = row - left
        elif ft == 2:  # Up
            enc = row - prior
        elif ft == 3:  # Average
            enc = row - (
                (left.astype(np.int32) + prior.astype(np.int32)) // 2
            ).astype(np.uint8)
        elif ft == 4:  # Paeth
            enc = row - _paeth(left, prior, upleft)
        else:
            raise ValueError(f"bad filter type {ft}")
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prior = row
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder (zlib inflate + numpy unfiltering):
    8-bit non-interlaced grayscale/RGB/RGBA.  Returns (h, w) uint8 for
    grayscale, (h, w, c) for color.  This is the real-codec proof for
    the image branch of the multimodal path (the WAV parser's sibling):
    chunk walk → inflate → per-row reverse of the five PNG filter
    types — no PIL."""
    import zlib

    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_MAGIC), None, []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"unsupported color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = line + prior
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a scan
            row = line
            for x in range(stride):
                left = int(row[x - channels]) if x >= channels else 0
                if ft == 1:
                    row[x] = (int(row[x]) + left) & 255
                elif ft == 3:
                    row[x] = (
                        int(row[x]) + (left + int(prior[x])) // 2
                    ) & 255
                else:
                    upleft = (
                        int(prior[x - channels]) if x >= channels else 0
                    )
                    pred = int(
                        _paeth(
                            np.array([left], dtype=np.uint8),
                            np.array([prior[x]], dtype=np.uint8),
                            np.array([upleft], dtype=np.uint8),
                        )[0]
                    )
                    row[x] = (int(row[x]) + pred) & 255
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = row
        prior = row
    if channels == 1:
        return out
    return out.reshape(h, w, channels)


def decode_payload_real(payload: bytes, media_type: str) -> np.ndarray:
    """REAL codec dispatch.  Audio: full RIFF/WAVE PCM decode (pure
    numpy, :func:`decode_wav_pcm`).  Image: pure-stdlib PNG decode
    (:func:`decode_png`), returned flattened to match the 1-D intensity
    contract of the feature stages.  Other image formats (JPEG) and
    video (mp4) need PIL/ffmpeg, which this container does not ship — a
    deployment swaps those branches in; everything downstream (schemas,
    batch shapes, feature math) is codec-agnostic.
    """
    if media_type == "audio":
        return decode_wav_pcm(payload)[0]
    if media_type == "image":
        if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
            return decode_png(payload).reshape(-1)
        raise NotImplementedError(
            "only PNG images decodable without codec libraries; "
            "install PIL for JPEG/WebP or use decode_payload_fake"
        )
    raise NotImplementedError(
        f"no {media_type} codecs in this container; "
        "use decode_payload_fake (deterministic) or install codecs"
    )


def decode_payload_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in decoder: raw byte values as uint8
    intensities (1-D).  Same numbers any engine can recompute."""
    return np.frombuffer(payload, dtype=np.uint8)


# deterministic WAV-synthesis parameters (shared with the DuckDB oracle
# in queries/multimodal_queries.py — keep in sync)
WAV_RATE = 8000


def _wav_params(doc_id: int) -> tuple[int, float, int]:
    """(n_samples, amplitude, frequency) derived from doc_id."""
    return (
        160 + (doc_id % 5) * 80,
        0.1 + (doc_id % 8) * 0.1,
        100 + (doc_id % 400),
    )


def synth_wav(docs: DataFrame) -> DataFrame:
    """doc_id → real RIFF/WAVE payload (16-bit PCM sine, parameters a
    deterministic function of doc_id).  Stands in for an ingestion scan
    of .wav blobs: downstream stages see genuine WAV binary."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n, amp, freq = _wav_params(int(doc_id))
                i = np.arange(n, dtype=np.float64)
                wave = amp * np.sin(2 * np.pi * freq * i / float(WAV_RATE))
                payloads.append(encode_wav_pcm16(wave, WAV_RATE))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        batch, "doc_id long, payload binary"
    )


def _png_params(doc_id: int) -> tuple[int, int]:
    """(width, height) derived from doc_id."""
    return 8 + doc_id % 9, 8 + doc_id % 7


def synth_png(docs: DataFrame) -> DataFrame:
    """doc_id → real PNG payload (8-bit grayscale, pixel(y,x) =
    (doc_id·7 + y·5 + x·3) mod 256, per-row filter type (doc_id+y) mod 5
    so every unfilter branch is exercised).  Stands in for an ingestion
    scan of .png blobs: downstream stages see genuine PNG binary."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = _png_params(d)
                y, x = np.mgrid[0:h, 0:w]
                img = ((d * 7 + y * 5 + x * 3) % 256).astype(np.uint8)
                payloads.append(
                    encode_png(img, filter_fn=lambda r, d=d: (d + r) % 5)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        batch, "doc_id long, payload binary"
    )


def wav_features(wavs: DataFrame) -> DataFrame:
    """Real-codec feature extraction: decode each RIFF/WAVE payload with
    :func:`decode_payload_real` (full chunk-walking PCM parse) and emit
    (n_samples, sample_rate, rms).  Same mapInPandas shape as the fake-
    decoder stages — this is the proof the plumbing carries a real
    codec."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x, rate = decode_wav_pcm(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": x.size,
                        "sample_rate": rate,
                        "rms": _round6(float(np.sqrt((x * x).mean()))),
                    }
                )
            yield pd.DataFrame(rows)

    return wavs.mapInPandas(
        batch, "doc_id long, n_samples long, sample_rate long, rms double"
    )


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
                        "mean_intensity": _round6(float(px.mean())),
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
                        # half-up 6-dp (engine doctrine, see _round6):
                        # block means of integer bytes are dyadic
                        # rationals where banker's np.round splits from
                        # SQL ROUND
                        "thumb": (np.floor(out * 1e6 + 0.5) / 1e6)
                        .astype(np.float32)
                        .tolist(),
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
                        _round6(float(chunk.mean())) if chunk.size else 0.0
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
                    out["rms"].append(_round6(rms))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "audio")
        .select("doc_id", "payload")
        .mapInPandas(batch, "doc_id long, win_no long, rms double")
    )
