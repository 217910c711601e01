"""rank_of_true_agg (the sort-free scale path) must agree with
rank_candidates' window rank on the true candidate, for random scored
candidate sets including score ties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.kg.eval import rank_candidates, rank_of_true_agg


@pytest.mark.parametrize("seed", [3, 17])
def test_agg_rank_equals_window_rank_of_true(spark, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(12):  # 12 query groups
        n = int(rng.integers(5, 40))
        # small integer scores force plenty of ties
        scores = rng.integers(0, 6, size=n)
        true_c = int(rng.integers(n))
        for c in range(n):
            rows.append((g, c, int(scores[c]), true_c, int(scores[true_c])))
    pdf = pd.DataFrame(
        rows, columns=["s_id", "c_id", "score", "true_c", "true_score"]
    )
    df = spark.createDataFrame(
        pdf,
        "s_id long, c_id long, score long, true_c long, true_score long",
    )

    # window path: rank all candidates, keep the true one
    win = (
        rank_candidates(
            df, group_cols=("s_id",), score_col="score", cand_col="c_id"
        )
        .filter(F.col("c_id") == F.col("true_c"))
        .select("s_id", "r")
    )
    win_r = {r.s_id: r.r for r in win.collect()}

    agg = rank_of_true_agg(
        df,
        group_cols=("s_id",),
        score_col="score",
        cand_col="c_id",
        true_score_col="true_score",
        true_cand_col="true_c",
        ascending=False,
    )
    agg_r = {r.s_id: r.r for r in agg.collect()}
    assert agg_r == win_r


def test_agg_rank_ascending_orientation(spark):
    """ascending=True ranks by smaller-is-better (distances)."""
    pdf = pd.DataFrame(
        {
            "s_id": [0, 0, 0],
            "c_id": [0, 1, 2],
            "score": [5, 2, 9],  # distances; true candidate is c=0 (5)
            "true_c": [0, 0, 0],
            "true_score": [5, 5, 5],
        }
    )
    df = spark.createDataFrame(
        pdf, "s_id long, c_id long, score long, true_c long, true_score long"
    )
    r = rank_of_true_agg(
        df, group_cols=("s_id",), score_col="score", cand_col="c_id",
        true_score_col="true_score", true_cand_col="true_c",
        ascending=True,
    ).collect()[0].r
    assert r == 2  # only the distance-2 candidate beats the true one


@pytest.mark.parametrize("model", ["transe", "rescal", "hole"])
def test_trainer_agg_path_bit_identical_to_closure_path(spark, model):
    """KGETrainer.evaluate must produce IDENTICAL metrics through the
    table-streaming agg ranker and the closure-matrix ranker, for all
    three models, filtered and raw — the wiring contract behind making
    the agg path the default above AGG_RANK_ENTITY_THRESHOLD."""
    import pandas as pd

    from spark_tensors_spark.train import AdaGrad, KGETrainer

    rng = np.random.default_rng(11)
    tri = rng.integers(0, 60, size=(120, 3)) % [60, 3, 60]
    tdf = spark.createDataFrame(
        pd.DataFrame(tri, columns=["s_id", "p_id", "o_id"])
    ).coalesce(2)
    t = KGETrainer(
        spark, n_entities=60, n_relations=3, dim=8, model=model,
        optimizer=AdaGrad(lr=0.2), seed=5, neg_per_pos=2,
    )
    t.fit(tdf, epochs=2)
    test = tdf.limit(25)
    for known in (None, tri):
        a = t.evaluate(test, known_triples=known,
                       force_path="agg").collect()[0]
        c = t.evaluate(test, known_triples=known,
                       force_path="closure").collect()[0]
        assert tuple(a) == tuple(c), (model, known is None, a, c)


@pytest.mark.parametrize("model", ["transe", "rescal", "hole"])
def test_joinmerge_evaluate_matches_matrix_ranker(spark, model):
    """JoinMergeKGETrainer.evaluate (fully table-resident: join-gathered
    test params, streamed entity table, join-based filtered protocol)
    must be BIT-IDENTICAL to ranking the same trainer's collected
    parameter matrices through the closure ranker — same floats, same
    kernels, different topology."""
    import pandas as pd

    from spark_tensors_spark.kg.eval import (
        link_prediction_metrics,
        rank_against_all_entities_np,
    )
    from spark_tensors_spark.train.joinmerge import JoinMergeKGETrainer
    from spark_tensors_spark.train.models import score_all_fn

    rng = np.random.default_rng(23)
    tri = rng.integers(0, 50, size=(100, 3)) % [50, 3, 50]
    tdf = spark.createDataFrame(
        pd.DataFrame(tri, columns=["s_id", "p_id", "o_id"])
    ).coalesce(2)
    t = JoinMergeKGETrainer(
        spark, n_entities=50, n_relations=3, dim=6, model=model,
        optimizer="adagrad", lr=0.2, seed=9, neg_per_pos=2,
    )
    t.fit(tdf, epochs=2)
    test = tdf.limit(20)

    # reference: collect this trainer's own tables and rank via the
    # closure path with the shared kernels
    erows = t.entity_embeddings().orderBy("id").collect()
    emat = np.stack([np.asarray(r["vec"]) for r in erows])
    eids = np.array([r["id"] for r in erows])
    prows = t.relation_embeddings().orderBy("id").collect()
    pmat = np.stack([np.asarray(r["vec"]) for r in prows])
    if model == "rescal":
        pmat = pmat.reshape(len(prows), 6, 6)
    for known in (None, tri):
        want = link_prediction_metrics(
            rank_against_all_entities_np(
                test, emat, eids, pmat, score_all_fn(model),
                known_triples=known,
            )
        ).collect()[0]
        got = t.evaluate(test, known_triples=known).collect()[0]
        assert tuple(got) == tuple(want), (model, known is None, got, want)
