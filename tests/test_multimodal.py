"""Multimodal-column operators: oracle parity at sf0.001 + unit
properties for the mapInPandas plumbing (schemas, geometry, stub)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline import multimodal as mm
from spark_tensors_spark.queries import multimodal_queries as mq
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

SF = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.fixture(scope="module")
def media(spark):
    return mm.attach_media(load_table(spark, SF, "documents")).cache()


@pytest.mark.parametrize("name", sorted(mq.ORACLES))
def test_multimodal_query_matches_oracle(spark, duck, name):
    ok, detail = compare(
        mq.QUERIES[name], mq.ORACLES[name], spark, SF, con=duck
    )
    assert ok, f"{name}: {detail}"


def test_attach_media_schema_and_partition(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("media_type = 'image'").first()
    assert row.n_bytes == len(row.payload)
    assert 32 <= row.width < 32 + mm.WIDTH_MOD
    assert 32 <= row.height < 32 + mm.HEIGHT_MOD


def test_real_decoder_stubs_and_dispatch():
    # non-PNG image bytes and video stay stubbed; PNG dispatches to the
    # real decoder
    with pytest.raises(NotImplementedError):
        mm.decode_payload_real(b"\x00\x01", "image")
    with pytest.raises(NotImplementedError):
        mm.decode_payload_real(b"\x00\x01", "video")
    import numpy as np

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = mm.decode_payload_real(mm.encode_png(img), "image")
    assert out.tolist() == list(range(12))  # flattened per the contract


def test_png_roundtrip_all_filters_and_colors():
    """encode→decode is the identity for every PNG filter type and all
    three supported color types, including 1-pixel-wide edge cases."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(7, 5), (1, 1), (3, 1), (16, 16, 3), (5, 9, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            got = mm.decode_png(mm.encode_png(img, filter_fn=lambda r, ft=ft: ft))
            assert got.shape == img.shape and (got == img).all(), (shape, ft)


def test_png_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")


def test_png_golden_bytes_decode():
    """A fixed PNG byte string (produced once by encode_png and pinned)
    decodes to the known pixel grid — guards the byte format itself
    (magic, chunk layout, CRC placement, zlib stream), not just the
    round trip."""
    import numpy as np

    golden = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000030000000208000000"
        "00b81f39c60000001049444154789c636060646264666404000028000a"
        "2fbe40450000000049454e44ae426082"
    )
    # regenerate: encode_png([[0,1,2],[3,4,5]], filter_fn=r%5)
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert mm.encode_png(img, filter_fn=lambda r: r % 5) == golden
    assert (mm.decode_png(golden) == img).all()


def test_fake_decoder_deterministic():
    px = mm.decode_payload_fake(b"abc", "image")
    assert px.tolist() == [97, 98, 99]


def test_resize_geometry(media):
    """Thumb is always out_h*out_w regardless of source width/height."""
    thumbs = mm.resize_image(media, out_w=4, out_h=4)
    sizes = {len(r.thumb) for r in thumbs.limit(20).collect()}
    assert sizes == {16}


def test_resize_matches_numpy(media):
    """Spark-side pooling equals a direct numpy computation."""
    row = media.filter("media_type = 'image'").first()
    got = {
        r.doc_id: r.thumb
        for r in mm.resize_image(media).filter(
            f"doc_id = {row.doc_id}"
        ).collect()
    }[row.doc_id]
    px = np.frombuffer(row.payload, dtype=np.uint8).astype(np.float64)
    grid = np.zeros(row.width * row.height)
    grid[: min(px.size, grid.size)] = px[: grid.size]
    grid = grid.reshape(row.height, row.width)
    ys = np.array_split(np.arange(row.height), 4)
    xs = np.array_split(np.arange(row.width), 4)
    want = [grid[np.ix_(y, x)].mean() for y in ys for x in xs]
    assert np.allclose(got, np.round(want, 6), atol=1e-4)


def test_frame_sampling_stride(media):
    frames = mm.sample_frames(media).collect()
    assert frames, "no video rows"
    for r in frames:
        assert r.frame_no % mm.SAMPLE_EVERY == 0
        assert r.offset == r.frame_no * mm.FRAME_BYTES
        assert 0.0 <= r.frame_mean <= 255.0


def test_audio_window_count(media):
    """Window count per doc = ceil(n_bytes / window)."""
    wins = mm.audio_windows(media, window_bytes=256)
    got = {
        r.doc_id: r.n for r in wins.groupBy("doc_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    for row in media.filter("media_type = 'audio'").collect():
        assert got[row.doc_id] == int(np.ceil(row.n_bytes / 256))


def test_wav_roundtrip_16bit():
    """encode_wav_pcm16 → decode_wav_pcm recovers the waveform to
    quantization precision (1/32768)."""
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal(500) * 0.3, -1, 1)
    payload = mm.encode_wav_pcm16(x, sample_rate=22050)
    y, rate = mm.decode_wav_pcm(payload)
    assert rate == 22050
    assert y.size == 500
    # x*32767 quantize, /32768 dequantize: max err ~1.5/32768
    assert np.abs(y - x).max() <= 2.0 / 32768


def test_wav_decode_is_the_real_dispatch():
    x = np.sin(np.linspace(0, 10, 200))
    payload = mm.encode_wav_pcm16(x)
    got = mm.decode_payload_real(payload, "audio")
    assert np.abs(got - x).max() <= 2.0 / 32768
    with pytest.raises(NotImplementedError):
        mm.decode_payload_real(payload, "image")
    with pytest.raises(ValueError):
        mm.decode_wav_pcm(b"not a wav file at all....")


def test_wav_decode_stereo_and_depths():
    """Hand-built fmt/data chunks: stereo averaging, 8/24/32-bit PCM,
    IEEE float32, and chunk-walking past an extra LIST chunk."""

    def wav(fmt_code, channels, rate, bits, data, extra=b""):
        fmt = (
            fmt_code.to_bytes(2, "little")
            + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * channels * bits // 8).to_bytes(4, "little")
            + (channels * bits // 8).to_bytes(2, "little")
            + bits.to_bytes(2, "little")
        )
        chunks = extra + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        chunks += b"data" + len(data).to_bytes(4, "little") + data
        return (
            b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks
        )

    # stereo int16: L=0.5, R=-0.5 → mono mean 0
    lr = np.array([16384, -16384] * 10, dtype="<i2").tobytes()
    y, _ = mm.decode_wav_pcm(wav(1, 2, 8000, 16, lr))
    assert np.allclose(y, 0.0)
    # 8-bit unsigned: 128 == silence
    y, _ = mm.decode_wav_pcm(wav(1, 1, 8000, 8, bytes([128] * 16)))
    assert np.allclose(y, 0.0)
    # 24-bit: max positive value
    s24 = bytes([0xFF, 0xFF, 0x7F] * 4)
    y, _ = mm.decode_wav_pcm(wav(1, 1, 8000, 24, s24))
    assert np.allclose(y, (2**23 - 1) / 2**23)
    # 32-bit int
    s32 = np.array([1 << 30] * 4, dtype="<i4").tobytes()
    y, _ = mm.decode_wav_pcm(wav(1, 1, 8000, 32, s32))
    assert np.allclose(y, 0.5)
    # float32 + a LIST chunk before fmt (chunk walking)
    f32 = np.array([0.25, -0.25], dtype="<f4").tobytes()
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    y, rate = mm.decode_wav_pcm(wav(3, 1, 44100, 32, f32, extra=extra))
    assert rate == 44100 and np.allclose(y, [0.25, -0.25])


def test_wav_energy_query_matches_oracle(spark):
    from spark_tensors_spark.queries import multimodal_queries as mq
    from tests.oracle_harness import compare

    ok, detail = compare(
        mq.QUERIES["mm_wav_energy"], mq.ORACLES["mm_wav_energy"],
        spark, SF,
    )
    assert ok, detail
