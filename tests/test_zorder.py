"""Z-order layout: interleave correctness vs a python reference, and
the actual file-skipping payoff — after zorder_layout, a point query's
z-value intersects ~1 of 8 files' [min,max] ranges; before, all 8."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.operators.zorder import zorder_layout, zvalue_col
from tests.conftest import SF_SMOKE


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(
        pd.DataFrame(cases, columns=["x", "y"]), "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zvalue_col("x", "y").alias("z")
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == _morton_ref(x, y)


def test_zorder_is_monotone_block_structured(spark):
    """Coarse z-prefix equality = same 2^k × 2^k tile: two points in the
    same tile share the z >> (2k) prefix."""
    df = spark.createDataFrame(
        pd.DataFrame(
            [(16, 32), (17, 33), (16, 200), (200, 32)],
            columns=["x", "y"],
        ),
        "x long, y long",
    )
    z = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue_col("x", "y").alias("z")).collect()
    }
    # (16,32) and (17,33) share the 16×16 tile; the others don't
    assert z[(16, 32)] >> 8 == z[(17, 33)] >> 8
    assert z[(16, 32)] >> 8 != z[(16, 200)] >> 8
    assert z[(16, 32)] >> 8 != z[(200, 32)] >> 8


def _files_containing(df_with_z, v):
    per_file = (
        df_with_z.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
        .collect()
    )
    return sum(1 for r in per_file if r.lo <= v <= r.hi), len(per_file)


def test_layout_prunes_point_queries(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    z = zvalue_col(
        F.col("user_id") % 65536,
        F.expr("unix_micros(ts) div 3600000000") % 65536,
    )

    clustered_dir = str(tmp_path / "zorder")
    zorder_layout(
        ev.select("event_id", "user_id", "ts"),
        F.col("user_id") % 65536,
        F.expr("unix_micros(ts) div 3600000000") % 65536,
        n_files=8,
    ).write.mode("overwrite").parquet(clustered_dir)

    shuffled_dir = str(tmp_path / "shuffled")
    ev.select("event_id", "user_id", "ts").withColumn(
        "_z", z
    ).repartition(8).write.mode("overwrite").parquet(shuffled_dir)

    # a z-value that actually occurs, away from the global min/max
    probe = (
        spark.read.parquet(clustered_dir)
        .approxQuantile("_z", [0.5], 0.01)[0]
    )
    n_hit_z, n_files_z = _files_containing(
        spark.read.parquet(clustered_dir), probe
    )
    n_hit_r, n_files_r = _files_containing(
        spark.read.parquet(shuffled_dir), probe
    )
    assert n_files_z == 8 and n_files_r == 8
    # range partitioning: a point value lives in exactly 1 file's range
    # (2 if it straddles a boundary); random placement leaves every
    # file's range covering it
    assert n_hit_z <= 2
    assert n_hit_r >= 6
    assert n_hit_z < n_hit_r


def test_interleave_random_batch_matches_reference(spark):
    """200 seeded-random 16-bit pairs in one frame == python reference;
    and deinterleaving the even/odd bits recovers (x, y)."""
    import numpy as np

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 65536, size=200)
    ys = rng.integers(0, 65536, size=200)
    df = spark.createDataFrame(
        pd.DataFrame({"x": xs, "y": ys}), "x long, y long"
    )
    rows = df.select("x", "y", zvalue_col("x", "y").alias("z")).collect()
    for r in rows:
        assert r.z == _morton_ref(r.x, r.y)
        # deinterleave: even bits -> x, odd bits -> y
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r.x, r.y)
