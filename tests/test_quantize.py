"""int8 scalar quantization: exact code values, roundtrip error bound,
zero-vector guard."""

from __future__ import annotations

import numpy as np

from spark_tensors_spark.pipeline.quantize import scalar_quantize_int8


def test_exact_codes_and_roundtrip_bound(spark):
    vecs = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.1, 0.2, -0.4, 0.3]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector
        (3, [-2.0, 1.0, 0.5, -1.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: (r.scale, r.codes)
        for r in scalar_quantize_int8(df).collect()
    }
    # the max-|v| element maps to ±127 exactly
    assert out[0][1] == [127, -64, 32, 0]          # round half-up: 31.75→32
    assert out[2] == (0.0, [0, 0, 0, 0])
    assert out[3][1][0] == -127
    for vid, vec in vecs:
        scale, codes = out[vid]
        for v, c in zip(vec, codes):
            assert abs(c) <= 127
            # compare against the float32 value actually stored —
            # the double literal 0.2 is NOT the float32 0.2
            v32 = float(np.float32(v))
            assert abs(v32 - c * scale) <= scale / 2 + 1e-9, (vid, v, c)


def test_quantize_roundtrip_on_random_float32(spark):
    rng = np.random.default_rng(5)
    mats = rng.standard_normal((20, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mats[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    for r in scalar_quantize_int8(df).collect():
        v = mats[r.vec_id].astype(np.float64)
        deq = np.array(r.codes) * r.scale
        assert np.max(np.abs(v - deq)) <= r.scale / 2 + 1e-12


def test_kmeans_lloyd_step_hand_check(spark):
    """Assignment by exact integer L2 against pseudo_centroids, ties to
    the smaller cluster id, and the count/sum/mean update."""
    import numpy as np

    from spark_tensors_spark.pipeline.similarity import (
        kmeans_lloyd_step,
        pseudo_centroids,
    )

    k, d = 3, 4
    cents = pseudo_centroids(k, d).astype(int)
    vecs = [
        list(cents[0]),          # exactly centroid 0
        list(cents[2]),          # exactly centroid 2
        [int(v) + 1 for v in cents[1]],  # near centroid 1
    ]
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1, 2], "codes": vecs})
    )
    got = kmeans_lloyd_step(df, k, d).collect()
    # expected assignment via numpy
    arr = np.array(vecs)
    d2 = ((arr[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    for r in got:
        members = arr[assign == r.cluster_id]
        assert r.n == len(members)
        assert r.sum_code == members[:, r.dim].sum()
        assert r.mean_code == members[:, r.dim].sum() / len(members)
