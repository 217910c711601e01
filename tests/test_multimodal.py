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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_payload_real(b"\x00\x01", "image")


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
