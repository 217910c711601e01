"""REAL-DATA quality regime: bounded TransE training on the actual
FB15k benchmark (VERDICT r9 #5 — the reference's headline lineage,
`README.md:6-8` quality rows; Bordes et al. 2013 report raw Hits@10
34.9% at d=50 at convergence on the full 483k-triple train split).

The reference data directory ships only the valid (50k) / test (59k)
splits + id dictionaries, so this bounded run trains on the 50k valid
split (d=50, 8 epochs, AdaGrad — capped budget, ~35 s) and evaluates
the FILTERED object-side protocol (`kg/eval.py` masking,
`kge/hole.py:394-399` candidate semantics) on a deterministic 200-test
subset.  Measured: **filtered Hits@10 = 0.31, MRR = 0.1255** — ≈460×
the 10/14951 random baseline and within the published direction at
~1/10 the training data and a fraction of the epochs.  The exact
metrics are golden-pinned (everything is seeded + deterministic);
BASELINE.md carries the measured row.

The pickles are UNTRUSTED reference content: they are loaded through a
restricted unpickler that only admits builtin containers/scalars (a
stock pickle.load would execute arbitrary callables).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import pytest

FB_DIR = "/root/reference/kge/data/freebase15k"
N_ENT = 14951
N_REL = 1345

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FB_DIR), reason="FB15k reference data not present"
)


class _SafeUnpickler(pickle.Unpickler):
    """Admit only builtin containers/scalars — the reference pickles
    are public-but-untrusted content."""

    _ALLOWED = {
        ("builtins", n) for n in ("dict", "list", "tuple", "int", "str")
    }

    def find_class(self, module, name):
        if (module, name) in self._ALLOWED:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(f"forbidden global {module}.{name}")


def _load(name: str):
    with open(os.path.join(FB_DIR, f"freebase_15k-{name}.pkl"), "rb") as fh:
        return _SafeUnpickler(fh).load()


def _parse(rows: list[str]) -> np.ndarray:
    """'s\\tr\\to' lines with relation ids offset by N_ENT
    (`hole.py:440-447` eval loop reads triplet[1] as the relation and
    the id2relation keys start at 14951) → (n, 3) [s, p, o]."""
    a = np.array([list(map(int, r.split("\t"))) for r in rows], dtype=np.int64)
    return np.stack([a[:, 0], a[:, 1] - N_ENT, a[:, 2]], axis=1)


def test_fb15k_dictionaries_shape():
    ents = _load("id2entity")
    rels = _load("id2relation")
    assert len(ents) == N_ENT and len(rels) == N_REL
    assert min(ents) == 0 and max(ents) == N_ENT - 1
    assert min(rels) == N_ENT and max(rels) == N_ENT + N_REL - 1


def test_fb15k_bounded_transe_quality(spark):
    train = _parse(_load("valid"))
    test = _parse(_load("test"))
    assert train.shape == (50000, 3) and test.shape == (59071, 3)

    from spark_tensors_spark.train import AdaGrad, KGETrainer

    tdf = (
        spark.createDataFrame(
            pd.DataFrame(train, columns=["s_id", "p_id", "o_id"])
        )
        .coalesce(4)
        .persist()
    )
    tdf.count()
    t = KGETrainer(
        spark, n_entities=N_ENT, n_relations=N_REL, dim=50,
        model="transe", optimizer=AdaGrad(lr=0.2), seed=42, neg_per_pos=4,
    )
    t.fit(tdf, epochs=8)
    tdf.unpersist()
    # training converges: monotone loss, ≥97% reduction over 8 epochs
    assert all(b < a for a, b in zip(t.loss_history, t.loss_history[1:]))
    assert t.loss_history[-1] < 0.03 * t.loss_history[0]

    # deterministic 200-triple test subset; filter against every known
    # triple from BOTH shipped splits (Bordes filtered protocol)
    h = (test[:, 0] * 2654435761 + test[:, 1] * 40503 + test[:, 2]) % (2**31)
    sub = test[np.argsort(h)[:200]]
    known = np.concatenate([train, test])
    sdf = spark.createDataFrame(
        pd.DataFrame(sub, columns=["s_id", "p_id", "o_id"])
    ).coalesce(1)
    m = t.evaluate(sdf, known_triples=known).collect()[0]

    # semantic claim: orders of magnitude above the random baseline
    random_hits10 = 10 / N_ENT  # ≈ 0.000669
    assert m.n == 200
    assert m.hits10 >= 100 * random_hits10
    # exact golden (seeded + deterministic end-to-end): the measured
    # capped-budget regime — filtered Hits@10 0.31 vs the published
    # 0.349 raw at full data + convergence
    assert (m.hits1, m.hits3, m.hits10) == (0.03, 0.175, 0.31)
    assert (m.mrr, m.mean_rank) == (0.125503, 1586.11)
