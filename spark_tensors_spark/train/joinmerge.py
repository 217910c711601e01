"""Join-merge KGE trainer — the 100 TB parameter-update path
(SURVEY §4.3: "at scale the optimizer step becomes a join-merge against
an embeddings DataFrame").

The driver-side :class:`~spark_tensors_spark.train.trainer.KGETrainer`
collects per-epoch gradient aggregates and updates numpy matrices — the
right physical plan while parameters are MBs, and the one declared
100×-scale cliff.  This trainer removes it: parameters LIVE as
DataFrames and never pass through the driver.

Per epoch (all distributed):
  1. training rows from the shared deterministic sampler
     (`trainer.build_training_rows` — identical rows, same seed);
  2. **join-gather**: each row picks up its s/o/o_neg/p vectors via
     equi-joins against the parameter tables (the standard distributed
     embedding-gather; each join is one hash shuffle of the row table,
     broadcast when the parameter side is small);
  3. ``mapInPandas`` computes the same gathered-array gradient kernels
     (`models.*_g`) and pre-aggregates per id within the batch;
  4. the same A6 segment-sum (posexplode → JVM hash agg, mean
     normalization by multiplicity);
  5. **join-merge update**: parameter table LEFT JOINs its gradient
     rows; AdaGrad/SGD arithmetic runs as array expressions
     (`zip_with` / indexed `transform` — whole-stage codegen, no
     Python); rows without gradients pass through untouched.

Only a single 1-row collect happens per epoch (the `_loss`
pseudo-parameter row).  Numerics match the driver path op-for-op:
same init hash, same sampled rows, same kernels, same mean
normalization, same update-formula order — the ring-KG parity test
pins the loss trajectories against each other.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.functions.init import init_embeddings
from spark_tensors_spark.train import models as M
from spark_tensors_spark.train.trainer import (
    build_training_rows,
    segment_sum_arrays,
)

_PAIRWISE_G = {
    "transe": M.transe_pairwise_g,
    "rescal": M.rescal_pairwise_g,
    "hole": M.hole_pairwise_g,
}
_POINTWISE_G = {
    "rescal": M.rescal_pointwise_g,
    "hole": M.hole_pointwise_g,
}


class JoinMergeKGETrainer:
    """model ∈ {'transe','rescal','hole'}; optimizer ∈ {'adagrad','sgd',
    'adam'} (stateful optimizers keep their state as array columns of
    the parameter table — AdaGrad's Σg² rides along as ``acc``; Adam's
    first/second moments as ``m``/``v`` with a per-parameter timestep
    on the trainer, matching the driver path's per-key ``t``).

    Adam is the reference's own TransE optimizer (`TransE.scala:98` —
    lr 0.001, weight decay 1e-4), so the 100 TB path supports the
    reference's published training config."""

    def __init__(
        self,
        spark: SparkSession,
        n_entities: int,
        n_relations: int,
        dim: int = 16,
        model: str = "transe",
        margin: float = 1.0,
        optimizer: str = "adagrad",
        lr: float = 0.1,
        eps: float = 1e-8,
        seed: int = 42,
        neg_per_pos: int = 1,
        objective: str | None = None,
        beta1: float = 0.9,
        beta2: float = 0.999,
        weight_decay: float = 0.0001,
    ):
        if optimizer not in ("adagrad", "sgd", "adam"):
            raise ValueError(f"unsupported optimizer: {optimizer!r}")
        self.spark = spark
        self.model = model
        if objective is None:
            objective = "pairwise" if model == "transe" else "pointwise"
        if model == "transe" and objective != "pairwise":
            raise ValueError("transe implements only the pairwise objective")
        self.objective = objective
        self.margin = margin
        self.optimizer = optimizer
        self.lr = lr
        self.eps = eps
        self.beta1 = beta1
        self.beta2 = beta2
        self.wd = weight_decay
        self.seed = seed
        self.neg = neg_per_pos
        self.n_entities = n_entities
        self.n_relations = n_relations
        self.dim = dim
        self.pname = "W" if model == "rescal" else "R"
        p_width = dim * dim if model == "rescal" else dim
        self.widths = {"E": dim, self.pname: p_width, "_loss": 1}

        # distributed init (no driver-side matrix): same counter-hash
        # values as the driver trainer's init_matrix_np
        self.E_df = self._with_state(
            init_embeddings(spark, n_entities, dim, "nunif", seed), dim
        ).persist()
        self.P_df = self._with_state(
            init_embeddings(spark, n_relations, p_width, "nunif", seed + 1),
            p_width,
        ).persist()
        self.loss_history: list[float] = []
        # per-parameter Adam timestep — the driver path bias-corrects
        # each parameter by ITS OWN update count (optim.Adam._t)
        self._t = {"E": 0, self.pname: 0}

    def _with_state(self, df: DataFrame, width: int) -> DataFrame:
        if self.optimizer == "adagrad":
            return df.withColumn(
                "acc", F.array_repeat(F.lit(0.0), width)
            )
        if self.optimizer == "adam":
            return df.withColumn(
                "m", F.array_repeat(F.lit(0.0), width)
            ).withColumn("v", F.array_repeat(F.lit(0.0), width))
        return df

    # ------------------------------------------------------------ epoch

    def _epoch_contributions(self, rows: DataFrame) -> DataFrame:
        """Join-gather + gradient kernels → (param, id, g, cnt) rows."""
        model, margin = self.model, self.margin
        pairwise = self.objective == "pairwise"
        dim = self.dim
        pname = self.pname

        ev = self.E_df.select("id", "vec")
        pv = self.P_df.select("id", "vec")
        gathered = (
            rows
            .join(ev.select(F.col("id").alias("s_id"),
                            F.col("vec").alias("sv")), "s_id")
            .join(ev.select(F.col("id").alias("o_id"),
                            F.col("vec").alias("ov")), "o_id")
            .join(pv.select(F.col("id").alias("p_id"),
                            F.col("vec").alias("rv")), "p_id")
        )
        if pairwise:
            gathered = gathered.join(
                ev.select(F.col("id").alias("o_neg"),
                          F.col("vec").alias("nv")),
                "o_neg",
            )

        def batch_grads(batches):
            for pdf in batches:
                S = np.stack(pdf["sv"].to_numpy()).astype(np.float64)
                O = np.stack(pdf["ov"].to_numpy()).astype(np.float64)
                P = np.stack(pdf["rv"].to_numpy()).astype(np.float64)
                if model == "rescal":
                    P = P.reshape(len(pdf), dim, dim)
                if pairwise:
                    N = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
                    loss, slots = _PAIRWISE_G[model](S, P, O, N, margin)
                else:
                    y = pdf["label"].to_numpy()
                    loss, slots = _POINTWISE_G[model](S, P, O, y)
                slot_ids = {
                    "s": ("E", pdf["s_id"].to_numpy()),
                    "o": ("E", pdf["o_id"].to_numpy()),
                    "p": (pname, pdf["p_id"].to_numpy()),
                }
                if pairwise:
                    slot_ids["o_neg"] = ("E", pdf["o_neg"].to_numpy())

                out_param, out_id, out_g, out_c = [], [], [], []
                for slot, g in slots:
                    name, ids = slot_ids[slot]
                    uniq, inv = np.unique(ids, return_inverse=True)
                    acc = np.zeros((len(uniq),) + g.shape[1:])
                    np.add.at(acc, inv, g)
                    cnt = np.bincount(inv, minlength=len(uniq))
                    out_param.extend([name] * len(uniq))
                    out_id.extend(uniq.tolist())
                    out_g.extend(acc.reshape(len(uniq), -1).tolist())
                    out_c.extend(cnt.tolist())
                # loss rides as a pseudo-parameter row: ONE action per
                # epoch yields gradients AND loss
                out_param.append("_loss")
                out_id.append(0)
                out_g.append([float(loss.sum())])
                out_c.append(len(pdf))
                yield pd.DataFrame(
                    {
                        "param": out_param,
                        "id": out_id,
                        "g": out_g,
                        "cnt": out_c,
                    }
                )

        schema = "param string, id long, g array<double>, cnt long"
        return gathered.mapInPandas(batch_grads, schema)

    def _merge_step(self, agg: DataFrame, param_df: DataFrame,
                    pname: str) -> DataFrame:
        """LEFT JOIN the mean-normalized gradient arrays into the
        parameter table and apply the optimizer as array expressions.

        ``agg`` is the `segment_sum_arrays` output (param, id, g, c)."""
        lr, eps = self.lr, self.eps
        width = self.widths[pname]
        g = agg.filter(F.col("param") == pname).select(
            "id",
            F.transform(
                # slice off the NULL padding beyond this param's width
                F.slice("g", 1, width),
                lambda x: x / F.col("c").cast("double"),
            ).alias("g"),
        )
        joined = param_df.join(g, "id", "left")
        has_g = F.col("g").isNotNull()

        if self.optimizer == "adam":
            # mirror optim.Adam.step op-for-op: decayed grads, moment
            # EMAs, bias correction by this parameter's own timestep
            self._t[pname] += 1
            t = self._t[pname]
            b1, b2, wd = self.beta1, self.beta2, self.wd
            bc1, bc2 = 1.0 - b1**t, 1.0 - b2**t
            joined = (
                joined.withColumn(
                    "gw",
                    F.zip_with(
                        "g", "vec", lambda x, vv: x + F.lit(wd) * vv
                    ),
                )
                .withColumn(
                    "m",
                    F.when(
                        has_g,
                        F.zip_with(
                            "m",
                            "gw",
                            lambda m, x: F.lit(b1) * m
                            + F.lit(1.0 - b1) * x,
                        ),
                    ).otherwise(F.col("m")),
                )
                .withColumn(
                    "v",
                    F.when(
                        has_g,
                        F.zip_with(
                            "v",
                            "gw",
                            lambda v_, x: F.lit(b2) * v_
                            + F.lit(1.0 - b2) * x * x,
                        ),
                    ).otherwise(F.col("v")),
                )
            )
            adam_step = lambda vv, i: vv - F.lit(lr) * (  # noqa: E731
                F.get(F.col("m"), i) / F.lit(bc1)
            ) / (
                F.sqrt(F.get(F.col("v"), i) / F.lit(bc2)) + F.lit(eps)
            )
            new_vec = F.when(
                has_g, F.transform(F.col("vec"), adam_step)
            ).otherwise(F.col("vec"))
            return joined.select("id", new_vec.alias("vec"), "m", "v")

        def updated_vec(acc_col: Column | None) -> Column:
            gi = lambda i: F.get(F.col("g"), i)  # noqa: E731
            if acc_col is None:  # plain SGD
                step = lambda v, i: v - F.lit(lr) * gi(i)  # noqa: E731
            else:  # AdaGrad: uses the ALREADY-updated accumulator
                step = lambda v, i: v - F.lit(lr) * gi(i) / (  # noqa: E731
                    F.sqrt(F.get(acc_col, i)) + F.lit(eps)
                )
            return F.when(
                has_g, F.transform(F.col("vec"), step)
            ).otherwise(F.col("vec"))

        if self.optimizer == "adagrad":
            joined = joined.withColumn(
                "acc",
                F.when(
                    has_g,
                    F.zip_with("acc", "g", lambda a, x: a + x * x),
                ).otherwise(F.col("acc")),
            )
            return joined.select(
                "id", updated_vec(F.col("acc")).alias("vec"), "acc"
            )
        return joined.select("id", updated_vec(None).alias("vec"))

    def fit(self, triples: DataFrame, epochs: int = 5) -> "JoinMergeKGETrainer":
        triples = triples.select("s_id", "p_id", "o_id").cache()
        triples.count()
        for epoch in range(epochs):
            rows = build_training_rows(
                triples, epoch, self.seed, self.objective, self.neg,
                self.n_entities,
            )
            contrib = self._epoch_contributions(rows)
            agg = segment_sum_arrays(
                contrib, max(self.widths.values())
            ).persist()
            lrow = agg.filter(F.col("param") == "_loss").collect()
            if lrow:
                self.loss_history.append(
                    float(lrow[0]["g"][0]) / max(int(lrow[0]["c"]), 1)
                )
            # eager localCheckpoint: materializes AND truncates lineage.
            # persist alone keeps the logical plan, which embeds the
            # previous epoch's parameter plans ~9× (3 gather joins × 3
            # segment-sum branches) — exponential plan growth that OOMs
            # plan stringification after a few epochs
            e_new = self._merge_step(agg, self.E_df, "E").localCheckpoint()
            p_new = self._merge_step(
                agg, self.P_df, self.pname
            ).localCheckpoint()
            old_e, old_p = self.E_df, self.P_df
            self.E_df, self.P_df = e_new, p_new
            old_e.unpersist()
            old_p.unpersist()
            agg.unpersist()
        triples.unpersist()
        return self

    # ----------------------------------------------------------- export

    def entity_embeddings(self) -> DataFrame:
        return self.E_df.select("id", "vec")

    def relation_embeddings(self) -> DataFrame:
        return self.P_df.select("id", "vec")

    def evaluate(
        self,
        test: DataFrame,
        known_triples: "np.ndarray | None" = None,
    ) -> DataFrame:
        """Table-resident link-prediction metrics — the evaluation that
        matches this trainer's 100 TB posture: parameters NEVER leave
        their DataFrames except for the test split's own rows.

        The test-row parameter gathers are semi-join lookups against
        the embedding tables (collected output is test-sized — eval
        splits are bounded by contract), ranking streams the full
        entity table through `kg.eval.rank_against_all_entities_agg`
        (map-side partial better-counts; closure O(|test|·d)), and the
        filtered protocol's known set enters the plan as a join, not a
        shipped dict.  Scores use the same per-model kernels as the
        driver trainer (`models.score_all_fn`), so ranks are
        bit-identical to ranking the collected matrices — pinned by
        tests/test_rank_agg.py."""
        import numpy as np

        from spark_tensors_spark.kg import eval as kgeval
        from spark_tensors_spark.train.models import score_all_fn

        tp = test.select("s_id", "p_id", "o_id")
        E = self.entity_embeddings()
        P = self.relation_embeddings()
        e_need = tp.select(F.col("s_id").alias("id")).unionByName(
            tp.select(F.col("o_id").alias("id"))
        ).distinct()
        emap = {
            r["id"]: np.asarray(r["vec"])
            for r in E.join(e_need, "id").collect()
        }
        p_need = tp.select(F.col("p_id").alias("id")).distinct()
        pmap = {
            r["id"]: np.asarray(r["vec"])
            for r in P.join(p_need, "id").collect()
        }
        d = self.dim

        def gather_e(ids):
            return np.stack([emap[int(i)] for i in ids])

        def gather_r(ids):
            m = np.stack([pmap[int(i)] for i in ids])
            if self.model == "rescal":
                return m.reshape(len(ids), d, d)
            return m

        ranked = kgeval.rank_against_all_entities_agg(
            test,
            E,
            gather_s=gather_e,
            gather_r=gather_r,
            gather_true=gather_e,
            score_batch=score_all_fn(self.model),
            known_triples=known_triples,
        )
        return kgeval.link_prediction_metrics(ranked)
