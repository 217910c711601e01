"""Training / eval queries (rows-only: iterative SGD is not
SQL-expressible — the driver records the weaker check; semantics are
covered by gradient checks + determinism tests in tests/test_training.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F



def kge_transe_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end M3 pipeline: derive KG → encode → 2 TransE epochs →
    link-prediction metrics on a held-out sample (1 row out)."""
    from spark_tensors_spark.train import AdaGrad, KGETrainer

    from spark_tensors_spark.queries.kg import _encoded

    _raw, ent, rel, enc = _encoded(spark, sf_dir)
    n_ent = ent.count()
    n_rel = rel.count()
    # fixed training budget: the smoke measures the training machinery,
    # not corpus size — deterministic hash-ordered sample keeps the
    # bench cost flat across scale factors
    train = (
        enc.filter(F.xxhash64("s_id", "p_id", "o_id") % 10 != 0)
        .orderBy(F.xxhash64("s_id", "p_id", "o_id"))
        .limit(8000)
    )
    test = enc.filter(F.xxhash64("s_id", "p_id", "o_id") % 10 == 0).limit(20)
    t = KGETrainer(
        spark, n_entities=n_ent, n_relations=n_rel, dim=8, model="transe",
        optimizer=AdaGrad(lr=0.2), seed=42, neg_per_pos=2,
    )
    t.fit(train, epochs=2)
    return t.evaluate(test)  # enc stays persisted (shared _encoded cache)


def _small_train_eval(spark, sf_dir, model, dim, optimizer):
    """Shared harness for the RESCAL/HolE smokes: fixed 2k-triple budget
    (machinery check, not corpus-scaling work)."""
    from spark_tensors_spark.queries.kg import _encoded
    from spark_tensors_spark.train import KGETrainer

    _raw, ent, rel, enc = _encoded(spark, sf_dir)
    n_ent = ent.count()
    n_rel = rel.count()
    h = F.xxhash64("s_id", "p_id", "o_id")
    train = enc.filter(h % 10 != 0).orderBy(h).limit(2000)
    test = enc.filter(h % 10 == 0).limit(10)
    t = KGETrainer(
        spark, n_entities=n_ent, n_relations=n_rel, dim=dim, model=model,
        optimizer=optimizer, seed=42, neg_per_pos=1,
    )
    t.fit(train, epochs=1)
    return t.evaluate(test)


def kge_rescal_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESCAL (bilinear sᵀWᵖo, `holek.py:136-137`) epoch + eval."""
    from spark_tensors_spark.train import Adam

    return _small_train_eval(spark, sf_dir, "rescal", 6, Adam(lr=0.01))


def kge_hole_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HolE (σ(rᵀccorr(s,o)), `hole.py:19-20`) epoch + eval."""
    from spark_tensors_spark.train import SGD

    return _small_train_eval(spark, sf_dir, "hole", 8, SGD(lr=0.05))


QUERIES = {
    "kge_transe_train_metrics": kge_transe_train_metrics,
    "kge_rescal_train_metrics": kge_rescal_train_metrics,
    "kge_hole_train_metrics": kge_hole_train_metrics,
}
ORACLES: dict[str, str] = {}
