"""Declared queries + DuckDB oracles for the multimodal operators
(pipeline/multimodal.py).

The corpus is derived deterministically from ``documents`` (ASCII text →
payload bytes), so even the ``mapInPandas`` stages are oracle-checkable:
DuckDB recomputes the same numbers from ``ascii()`` codes in pure SQL
while Spark runs the real Arrow-batched Python path.  That is the
strongest check available for UDF plumbing — two totally different
execution paths, identical results.

Constants (WIDTH_MOD etc.) must stay in sync with pipeline/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline import multimodal as mm

# DuckDB fragments shared by the oracles
_MEDIA_TYPE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)
_NBYTES_SQL = "octet_length(encode(text))"
_CODES_SQL = (
    "list_transform(range(1, length(text) + 1), "
    "i -> ascii(substr(text, CAST(i AS INT), 1)))"
)


def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only catalog rollup: never touches payload bytes (column
    pruning drops the binary column at the parquet scan)."""
    media = mm.attach_media(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.sum("n_frames").alias("total_frames"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("media_type")
    )


MM_MEDIA_CATALOG_SQL = f"""
SELECT {_MEDIA_TYPE_SQL} AS media_type,
       COUNT(*) AS n,
       CAST(SUM({_NBYTES_SQL}) AS BIGINT) AS total_bytes,
       ROUND(AVG(32 + {_NBYTES_SQL} % {mm.WIDTH_MOD}), 6) AS avg_width,
       ROUND(AVG(32 + {_NBYTES_SQL} % {mm.HEIGHT_MOD}), 6) AS avg_height,
       CAST(SUM(CAST(ceil({_NBYTES_SQL} / {mm.FRAME_BYTES}.0) AS BIGINT)) AS BIGINT) AS total_frames,
       MAX(CAST(floor({_NBYTES_SQL} * 1000.0 / 16000) AS BIGINT)) AS max_duration_ms
FROM documents
GROUP BY 1
ORDER BY media_type
"""


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec image path: synthesize genuine PNG payloads (8-bit
    grayscale, per-row filter type cycling through all five PNG
    filters), decode them with the pure-stdlib PNG decoder
    (decode_payload_real → zlib inflate + numpy unfiltering), and emit
    intensity stats + 4-bin histogram (h0..h3 scalar columns for
    cross-engine hashing).  The oracle recomputes the decoded pixels
    symbolically — pixel(y,x) = (doc_id·7 + y·5 + x·3) mod 256 — so the
    whole binary encode/decode round trip is value-checked, the
    mm_wav_energy doctrine applied to images."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    media = mm.synth_png(subset).withColumn("media_type", F.lit("image"))
    feats = mm.image_features(
        media, n_bins=4, decoder=mm.decode_payload_real
    )
    return feats.select(
        "doc_id",
        "mean_intensity",
        "max_intensity",
        *[F.element_at("histogram", i + 1).alias(f"h{i}") for i in range(4)],
    ).orderBy("doc_id")


# pixel(y,x) = (doc_id·7 + y·5 + x·3) % 256 over h=8+doc_id%7 rows ×
# w=8+doc_id%9 cols — identical to multimodal.synth_png/_png_params.
# The integer pixel sum is exact in double, so AVG association order is
# irrelevant; ROUND is half-up on both engines (engine _round6).
MM_IMAGE_FEATURES_SQL = """
WITH px AS (
    SELECT d.doc_id,
           (d.doc_id * 7 + yy.y * 5 + xx.x * 3) % 256 AS p
    FROM documents d,
         UNNEST(range(8 + d.doc_id % 7)) AS yy(y),
         UNNEST(range(8 + d.doc_id % 9)) AS xx(x)
    WHERE d.doc_id % 3 = 0
)
SELECT doc_id,
       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS mean_intensity,
       CAST(MAX(p) AS DOUBLE) AS max_intensity,
       CAST(SUM(CASE WHEN p < 64 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
       CAST(SUM(CASE WHEN p >= 64 AND p < 128 THEN 1 ELSE 0 END)
            AS BIGINT) AS h1,
       CAST(SUM(CASE WHEN p >= 128 AND p < 192 THEN 1 ELSE 0 END)
            AS BIGINT) AS h2,
       CAST(SUM(CASE WHEN p >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS h3
FROM px GROUP BY doc_id ORDER BY doc_id
"""


def mm_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over "video" payloads: every 4th 64-byte frame."""
    media = mm.attach_media(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(media).orderBy("doc_id", "frame_no")


MM_FRAME_INDEX_SQL = f"""
SELECT doc_id,
       f * {mm.SAMPLE_EVERY} AS frame_no,
       f * {mm.SAMPLE_EVERY} * {mm.FRAME_BYTES} AS offset,
       ROUND(list_avg(list_transform(
           range(1 + f * {mm.SAMPLE_EVERY} * {mm.FRAME_BYTES},
                 1 + least((f * {mm.SAMPLE_EVERY} + 1) * {mm.FRAME_BYTES},
                           length(text))),
           i -> ascii(substr(text, CAST(i AS INT), 1)))), 6) AS frame_mean
FROM documents,
     UNNEST(range(CAST(ceil(length(text) / ({mm.SAMPLE_EVERY} * {mm.FRAME_BYTES}.0)) AS BIGINT))) AS t(f)
WHERE doc_id % 3 = 2
ORDER BY doc_id, frame_no
"""


def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS over "audio" payloads (256-byte windows)."""
    media = mm.attach_media(load_table(spark, sf_dir, "documents"))
    return mm.audio_windows(media, window_bytes=256).orderBy(
        "doc_id", "win_no"
    )


MM_AUDIO_ENERGY_SQL = """
SELECT doc_id,
       w AS win_no,
       ROUND(sqrt(list_avg(list_transform(
           range(1 + w * 256, 1 + least((w + 1) * 256, length(text))),
           i -> ascii(substr(text, CAST(i AS INT), 1))
                * ascii(substr(text, CAST(i AS INT), 1))))), 6) AS rms
FROM documents,
     UNNEST(range(CAST(ceil(length(text) / 256.0) AS BIGINT))) AS t(w)
WHERE doc_id % 3 = 1
ORDER BY doc_id, win_no
"""


def mm_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4×4 block-mean resize, value-oracled: DuckDB replays the exact
    numpy geometry symbolically — np.array_split row/col groups, zero
    padding to the w×h grid, per-block integer sums (exact in double),
    half-up 6-dp rounding, float32 quantization, and the same
    left-to-right fold over the 16 block values."""
    media = mm.attach_media(load_table(spark, sf_dir, "documents"))
    thumbs = mm.resize_image(media)
    return thumbs.select(
        "doc_id",
        F.round(
            F.aggregate(
                "thumb", F.lit(0.0), lambda a, x: a + x.cast("double")
            )
            / F.size("thumb"),
            6,
        ).alias("thumb_mean"),
    ).orderBy("doc_id")


# np.array_split(range(n), 4): first n%4 groups get n//4+1 rows, the
# rest n//4 — replicated below with integer arithmetic.  Block sums of
# uint8 values are exact integers in ANY association order, so only the
# final 16-value fold needs order-matching (list_reduce = the same
# left fold as Spark's F.aggregate with a 0.0 init).
MM_THUMBNAILS_SQL = f"""
WITH img AS (
    SELECT doc_id, text, length(text) AS n,
           32 + {_NBYTES_SQL} % {mm.WIDTH_MOD} AS w,
           32 + {_NBYTES_SQL} % {mm.HEIGHT_MOD} AS h
    FROM documents WHERE doc_id % 3 = 0
),
blocks AS (
    SELECT doc_id, text, n, w,
           yb.g AS yg, xb.g AS xg,
           (h // 4) + CASE WHEN yb.g < h % 4 THEN 1 ELSE 0 END AS yl,
           yb.g * (h // 4) + least(yb.g, h % 4) AS ys,
           (w // 4) + CASE WHEN xb.g < w % 4 THEN 1 ELSE 0 END AS xl,
           xb.g * (w // 4) + least(xb.g, w % 4) AS xs
    FROM img, UNNEST(range(4)) AS yb(g), UNNEST(range(4)) AS xb(g)
),
cells AS (
    SELECT doc_id, yg, xg, yl, xl,
           (ys + t.k // xl) * w + (xs + t.k % xl) AS idx, n, text
    FROM blocks, UNNEST(range(yl * xl)) AS t(k)
),
bmeans AS (
    SELECT doc_id, yg, xg,
           CAST(CAST(ROUND(
               SUM(CASE WHEN idx < n
                        THEN ascii(substr(text, CAST(idx + 1 AS INT), 1))
                        ELSE 0 END) / CAST(MAX(yl * xl) AS DOUBLE), 6)
             AS REAL) AS DOUBLE) AS bval
    FROM cells GROUP BY doc_id, yg, xg
),
lists AS (
    SELECT doc_id, list(bval ORDER BY yg, xg) AS tl
    FROM bmeans GROUP BY doc_id
)
SELECT doc_id,
       ROUND(list_reduce(tl, (a, b) -> a + b) / 16, 6) AS thumb_mean
FROM lists ORDER BY doc_id
"""


def mm_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec round trip: synthesize genuine RIFF/WAVE 16-bit PCM
    payloads (sine waves parameterized by doc_id), decode them with the
    full chunk-walking WAV parser (decode_payload_real), and emit
    per-doc sample counts + RMS.  The oracle recomputes the decoded
    samples symbolically — sin → half-up int16 quantization → /32768 —
    so the entire binary encode/decode path is value-checked, not just
    row-counted."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # cap the corpus so the oracle's per-sample lateral expansion stays
    # small; the Spark path is identical at any cardinality
    subset = docs.filter(F.col("doc_id") % 7 == 0)
    return mm.wav_features(mm.synth_wav(subset)).orderBy("doc_id")


# the decoded sample at index i is FLOOR(amp·sin(2π·f·i/rate)·32767 + ½)
# / 32768 — identical arithmetic, identical association order as the
# numpy encoder (pipeline/multimodal.py _wav_params/synth_wav).  Every
# fractional literal is CAST(… AS DOUBLE): DuckDB parses bare 0.1 as
# DECIMAL, whose exact arithmetic diverges from the IEEE doubles numpy
# uses.
MM_WAV_ENERGY_SQL = f"""
SELECT d.doc_id,
       (160 + (d.doc_id % 5) * 80) AS n_samples,
       CAST({mm.WAV_RATE} AS BIGINT) AS sample_rate,
       ROUND(SQRT(AVG(POW(
           FLOOR((CAST(0.1 AS DOUBLE) + (d.doc_id % 8) * CAST(0.1 AS DOUBLE))
                 * SIN(2 * PI() * (100 + (d.doc_id % 400)) * s.i
                       / CAST({mm.WAV_RATE} AS DOUBLE))
                 * 32767 + CAST(0.5 AS DOUBLE))
           / CAST(32768 AS DOUBLE), 2))), 6) AS rms
FROM documents d,
     UNNEST(range(160 + (d.doc_id % 5) * 80)) AS s(i)
WHERE d.doc_id % 7 = 0
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "mm_media_catalog": mm_media_catalog,
    "mm_image_features": mm_image_features,
    "mm_frame_index": mm_frame_index,
    "mm_audio_energy": mm_audio_energy,
    "mm_thumbnails": mm_thumbnails,
    "mm_wav_energy": mm_wav_energy,
}

ORACLES = {
    "mm_media_catalog": MM_MEDIA_CATALOG_SQL,
    "mm_image_features": MM_IMAGE_FEATURES_SQL,
    "mm_frame_index": MM_FRAME_INDEX_SQL,
    "mm_audio_energy": MM_AUDIO_ENERGY_SQL,
    "mm_thumbnails": MM_THUMBNAILS_SQL,
    "mm_wav_energy": MM_WAV_ENERGY_SQL,
}
