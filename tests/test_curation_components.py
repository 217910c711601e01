"""Property tests for the curation operators (stratified split,
sequence packing, quality filter) and connected-components dedup.

The declared-query oracles in test_pipeline_queries.py pin engine
parity; these pin the semantic invariants on hand-built fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline import curation
from spark_tensors_spark.pipeline.components import (
    connected_components,
    duplicate_components,
)


# ------------------------------------------------------------ components
# threshold 0 forces a distributed loop (min-label pointer jumping or
# the Kiveris large-star/small-star alternation); the default takes the
# driver union-find path — all three must agree everywhere.
PATHS = pytest.mark.parametrize(
    "cc_kwargs",
    [
        dict(driver_threshold=0),
        dict(driver_threshold=2_000_000),
        dict(driver_threshold=0, method="twostar"),
    ],
    ids=["distributed", "driver", "twostar"],
)


@PATHS
def test_cc_chain_is_one_component(spark, cc_kwargs):
    # a-b, b-c, c-d: transitive closure must land all four on min id
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["a", "b"]
    )
    got = {
        (r.node, r.comp)
        for r in connected_components(edges, **cc_kwargs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


@PATHS
def test_cc_separate_components_stay_separate(spark, cc_kwargs):
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)],
        ["a", "b"],
    )
    comp = {
        r.node: r.comp
        for r in connected_components(edges, **cc_kwargs).collect()
    }
    assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


@PATHS
def test_cc_converges_on_long_chain(spark, cc_kwargs):
    # path graph of 40 nodes: worst-case diameter for label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["a", "b"]
    )
    comp = {
        r.node: r.comp
        for r in connected_components(edges, **cc_kwargs).collect()
    }
    assert all(c == 0 for c in comp.values())
    assert len(comp) == 41


def test_cc_paths_agree_on_random_graph(spark):
    import random

    rng = random.Random(11)
    edges = spark.createDataFrame(
        [
            (rng.randrange(120), rng.randrange(120))
            for _ in range(150)
        ],
        ["a", "b"],
    )
    dist = sorted(
        map(tuple, connected_components(edges, driver_threshold=0).collect())
    )
    drv = sorted(map(tuple, connected_components(edges).collect()))
    two = sorted(
        map(
            tuple,
            connected_components(
                edges, driver_threshold=0, method="twostar"
            ).collect(),
        )
    )
    assert dist == drv == two


def test_twostar_matches_union_find_fuzz(spark):
    """Randomized parity of the Kiveris alternation against driver
    union-find over graph shapes that stress it differently: sparse
    forests, dense near-cliques, and a duplicate-heavy multigraph."""
    import random

    for seed, n, m in [(1, 60, 30), (2, 40, 200), (3, 90, 90)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ] * 2  # duplicates must be harmless
        edges = spark.createDataFrame(pairs, ["a", "b"])
        two = sorted(
            map(
                tuple,
                connected_components(
                    edges, driver_threshold=0, method="twostar"
                ).collect(),
            )
        )
        drv = sorted(map(tuple, connected_components(edges).collect()))
        assert two == drv, seed


def test_duplicate_components_excludes_keepers(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 7)], ["doc_a", "doc_b"]
    )
    rows = {
        (r.doc_id, r.keep_doc_id)
        for r in duplicate_components(edges).collect()
    }
    # 5 is the keeper (min id) and must not appear as a doc_id
    assert rows == {(7, 5), (9, 5)}


# ------------------------------------------------------------- curation
@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "s%d" % (i % 3), "word " * (5 + i % 17))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_stratified_split_exact_proportions(spark, docs):
    out = curation.stratified_split(docs, ["source"], (0.8, 0.1))
    counts = {
        (r.source, r.split): r.c
        for r in out.groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for s in ("s0", "s1", "s2"):
        assert counts[(s, "train")] == 80
        assert counts[(s, "valid")] == 10
        assert counts[(s, "test")] == 10


def test_stratified_split_deterministic(spark, docs):
    a = curation.stratified_split(docs, ["source"]).collect()
    b = curation.stratified_split(docs, ["source"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # different seed moves at least one row across splits
    c = curation.stratified_split(docs, ["source"], seed=7).collect()
    assign_a = {r.doc_id: r.split for r in a}
    assign_c = {r.doc_id: r.split for r in c}
    assert assign_a != assign_c


def test_pack_sequences_bin_invariants(spark, docs):
    with_tokens = docs.withColumn(
        "n_tokens",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long"),
    )
    packed = curation.pack_sequences(with_tokens, budget_tokens=64)
    rows = packed.collect()
    # bin ids contiguous from 0 per group; start offset within budget
    by_group: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.bin_start_offset < 64
        by_group.setdefault(r.source, []).append(r.bin_id)
    for bins in by_group.values():
        bs = sorted(set(bins))
        assert bs == list(range(len(bs)))
    # total tokens conserved
    total = sum(r.n_tokens for r in rows)
    assert total == with_tokens.agg(F.sum("n_tokens")).first()[0]


def test_quality_filter_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is that good for now"),
            (2, "x"),
            (3, ",,,,.... !!!! ;;;; ???? " * 5),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.keep for r in curation.quality_filter(df).collect()}
    assert out[1] is True
    assert out[2] is False  # too short
    assert out[3] is False  # punctuation soup


def test_weighted_sample_prefers_heavy_weights(spark):
    # 250 heavy (w=100) + 250 light (w=1) items: an ES top-50 draw is
    # overwhelmingly heavy (P[light beats heavy] ≈ 1/101 per race)
    rows = [(i, 100 if i < 250 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = curation.weighted_sample(df, k=50, weight_col="w").collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.w == 100)
    assert heavy >= 45
    # ranks are contiguous 1..k
    assert sorted(r.sample_rank for r in got) == list(range(1, 51))


def test_weighted_sample_excludes_nonpositive_and_is_stable(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, 7)], "doc_id long, w long"
    )
    a = sorted(r.doc_id for r in curation.weighted_sample(df, 10, "w").collect())
    b = sorted(r.doc_id for r in curation.weighted_sample(df, 10, "w").collect())
    assert a == b == [1, 4]


def test_weighted_sample_seed_changes_draw(spark):
    df = spark.createDataFrame([(i, 1) for i in range(200)], "doc_id long, w long")
    a = {r.doc_id for r in curation.weighted_sample(df, 20, "w", seed=1).collect()}
    b = {r.doc_id for r in curation.weighted_sample(df, 20, "w", seed=2).collect()}
    assert a != b


def test_weighted_sample_plan_group_limits(spark):
    # the rank<=k filter must truncate per-stratum before the exchange
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, f"s{i % 4}", i % 7 + 1) for i in range(100)],
        "doc_id long, source string, w long",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curation.weighted_sample(
            df, 5, "w", strata_cols=["source"]
        ).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_chunk_windows_overlap_semantics(spark):
    from spark_tensors_spark.pipeline.curation import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i:03d}" for i in range(150))),  # 3 chunks
            (2, "a b c"),                                     # 1 short chunk
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_no): (r.start_tok, r.n_tokens, r.len_sum)
        for r in chunk_windows(docs, window=64, stride=48).collect()
    }
    # doc 1: starts 0, 48, 96; lengths 64, 64, 54
    assert rows[(1, 0)] == (0, 64, 64 * 4)
    assert rows[(1, 1)] == (48, 64, 64 * 4)
    assert rows[(1, 2)] == (96, 54, 54 * 4)
    # doc 2: one partial chunk
    assert rows[(2, 0)] == (0, 3, 3)
    assert len(rows) == 4
    # overlap: chunk 1 of doc 1 starts inside chunk 0 (stride < window)
    import pytest

    with pytest.raises(ValueError):
        chunk_windows(docs, window=0)


def test_mixture_allocation_exact_and_deterministic():
    from spark_tensors_spark.pipeline.curation import mixture_allocation

    w = {"a": 1.0, "b": 2.0, "c": 3.0, "d": 1.5}
    q = mixture_allocation(w, 100)
    assert sum(q.values()) == 100
    total = sum(w.values())
    for k in w:
        assert abs(q[k] - 100 * w[k] / total) < 1
    assert q == mixture_allocation(w, 100)
    # remainder ties break by key: equal weights, n not divisible
    q2 = mixture_allocation({"x": 1.0, "y": 1.0, "z": 1.0}, 4)
    assert q2 == {"x": 2, "y": 1, "z": 1}


def test_mixture_sample_quotas_and_short_domains(spark):
    import pandas as pd

    from spark_tensors_spark.pipeline.curation import mixture_sample

    rows = [(i, "big" if i < 50 else "small") for i in range(55)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source"]),
        "doc_id long, source string",
    )
    out = mixture_sample(
        df, {"big": 3.0, "small": 1.0, "absent": 1.0}, 20
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.sample_rank)
    # quotas: big 12, small 4, absent 4 (largest remainder on 3/1/1)
    assert len(per["big"]) == 12
    # "small" has 5 members >= its quota of 4; "absent" contributes 0
    assert len(per["small"]) == 4
    assert "absent" not in per
    assert sorted(per["big"]) == list(range(1, 13))


def test_mixture_allocation_properties_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_tensors_spark.pipeline.curation import mixture_allocation

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.text(
                alphabet="abcdefgh", min_size=1, max_size=4
            ),
            st.floats(
                min_value=0.01, max_value=100.0,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1,
            max_size=12,
        ),
        st.integers(min_value=0, max_value=1000),
    )
    def prop(weights, n):
        q = mixture_allocation(weights, n)
        assert sum(q.values()) == n
        total = sum(weights.values())
        for k, w in weights.items():
            assert abs(q[k] - n * w / total) < 1 + 1e-9
        assert q == mixture_allocation(weights, n)

    prop()


def test_temperature_mixture_flattens_skewed_domains(spark):
    """temperature_mixture_sample invariants on a hand-built skewed
    corpus: (a) exactly n rows, quotas sum to n; (b) per-domain quota
    ordering follows domain size; (c) alpha=0.5 FLATTENS toward the
    uniform share n/|domains|: every domain whose natural share
    exceeds uniform shrinks, every domain below uniform grows; (d)
    alpha=1.0
    reproduces the proportional largest-remainder allocation; (e)
    members are the md5-rank prefix (ranks 1..quota, no gaps)."""
    import pandas as pd

    from spark_tensors_spark.pipeline.curation import (
        mixture_allocation,
        temperature_mixture_sample,
    )

    sizes = {"web": 500, "books": 300, "code": 150, "wiki": 50}
    rows, i = [], 0
    for dom, k in sizes.items():
        for _ in range(k):
            rows.append((i, dom))
            i += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source"]),
        "doc_id long, source string",
    )
    n = 200
    out = temperature_mixture_sample(df, n, alpha=0.5).collect()
    assert len(out) == n
    quota = {}
    ranks = {}
    for r in out:
        quota[r.source] = r.quota
        ranks.setdefault(r.source, []).append(r.sample_rank)
    assert sum(quota.values()) == n
    # ordering follows size
    assert quota["web"] > quota["books"] > quota["code"] > quota["wiki"]
    # flattening toward uniform (n/4 = 50): natural shares are web 100,
    # books 60 (both above uniform → shrink), code 30, wiki 10 (below
    # uniform → grow)
    total = sum(sizes.values())
    for dom in ("web", "books"):
        assert quota[dom] < n * sizes[dom] / total
    for dom in ("code", "wiki"):
        assert quota[dom] > n * sizes[dom] / total
    # member sets are rank prefixes
    for dom, rk in ranks.items():
        assert sorted(rk) == list(range(1, quota[dom] + 1))
    # alpha=1.0 ≡ proportional largest remainder on the raw counts
    out1 = temperature_mixture_sample(df, n, alpha=1.0).collect()
    quota1 = {r.source: r.quota for r in out1}
    assert quota1 == mixture_allocation(
        {k: float(v) for k, v in sizes.items()}, n
    )


def test_temperature_mixture_short_domain_yields_full_membership(spark):
    """Flattening makes quota > count the EXPECTED regime for tiny
    domains: a short domain contributes its full membership and the
    output then carries fewer than n rows (documented contract, same
    as mixture_sample's short-domain rule)."""
    import pandas as pd

    from spark_tensors_spark.pipeline.curation import (
        temperature_mixture_sample,
    )

    rows = [(i, "big" if i < 397 else "tiny") for i in range(400)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source"]),
        "doc_id long, source string",
    )
    # sqrt weights ~19.92 vs 1.73 → quotas ~184/16, but tiny has 3 rows
    out = temperature_mixture_sample(df, 200, alpha=0.5).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r)
    assert len(per["tiny"]) == 3          # full membership, not quota
    assert per["tiny"][0].quota > 3       # the quota really was larger
    assert len(per["big"]) == per["big"][0].quota  # big fills its quota
    assert len(out) < 200                 # documented short-domain gap
