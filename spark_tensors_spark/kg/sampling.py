"""Negative-sampling operator family (SURVEY §2.8 N1–N6).

Reference (`sample.py`): driver-side rejection loops — draw a corrupt
triple, test membership in a Python set, retry ≤ ntries.  That shape
cannot distribute.  The Spark-native form is *oversample → anti-join →
label*: generate n candidates per positive in one pass (`explode`), drop
collisions with the training set via a single left-anti join (J4), and
optionally constrain admissibility (LCWA semi-join J5, type-index join
J6).

Randomness: every draw is ``xxhash64(row, k, seed)`` — a pure function of
the data, so samples are identical on any partitioning / task retry
(Spark may re-execute tasks; ``F.rand`` would resample differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ("s_id", "p_id", "o_id")


def _draw(cols: list, n_values, salt: str, seed: int):
    """Deterministic pseudo-uniform draw in [0, n_values)."""
    h = F.xxhash64(*cols, F.lit(salt), F.lit(seed))
    return F.pmod(h, n_values).cast("long")


def _with_candidates(triples: DataFrame, n: int) -> DataFrame:
    return triples.withColumn(
        "_k", F.explode(F.sequence(F.lit(1), F.lit(int(n))))
    )


def _reject_known(cands: DataFrame, triples: DataFrame) -> DataFrame:
    """J4: corrupt triples colliding with true triples are dropped
    (`sample.py:39-47` membership test, distributed)."""
    return cands.join(triples, on=list(TRIPLE_COLS), how="left_anti")


def random_mode_sampler(
    triples: DataFrame,
    n_entities: int,
    n: int = 1,
    seed: int = 42,
    mode: str = "o",
    reject_known: bool = True,
) -> DataFrame:
    """N2 `RandomModeSampler` (`sample.py:29-47`): corrupt one slot
    uniformly over the entity id space.  mode ∈ {'s','o'} (slot 'p' would
    draw from the relation space — pass n_entities=N_relations)."""
    assert mode in ("s", "o", "p")
    col = f"{mode}_id"
    cands = _with_candidates(triples, n).select(
        *[
            _draw(
                [F.col("s_id"), F.col("p_id"), F.col("o_id"), F.col("_k")],
                n_entities,
                mode,
                seed,
            ).alias(c)
            if c == col
            else F.col(c)
            for c in TRIPLE_COLS
        ]
    )
    if reject_known:
        cands = _reject_known(cands, triples)
    return cands.withColumn("label", F.lit(-1.0))


def random_sampler(
    triples: DataFrame,
    n_entities: int,
    n_relations: int,
    n: int = 1,
    seed: int = 42,
    reject_known: bool = True,
) -> DataFrame:
    """N3 `RandomSampler` (`sample.py:50-66`): corrupt all three slots."""
    base = _with_candidates(triples, n)
    keys = [F.col("s_id"), F.col("p_id"), F.col("o_id"), F.col("_k")]
    cands = base.select(
        _draw(keys, n_entities, "s", seed).alias("s_id"),
        _draw(keys, n_relations, "p", seed).alias("p_id"),
        _draw(keys, n_entities, "o", seed).alias("o_id"),
    )
    if reject_known:
        cands = _reject_known(cands, triples)
    return cands.withColumn("label", F.lit(-1.0))


def type_index(triples: DataFrame) -> DataFrame:
    """A5: per-relation candidate sets (`sample.py:114-121`), sorted for
    deterministic indexing (collect_set order is not stable)."""
    return triples.groupBy("p_id").agg(
        F.sort_array(F.collect_set("s_id")).alias("s_cands"),
        F.sort_array(F.collect_set("o_id")).alias("o_cands"),
    )


def corrupted_sampler(
    triples: DataFrame,
    n: int = 1,
    seed: int = 42,
    mode: str = "o",
    reject_known: bool = True,
) -> DataFrame:
    """N4 `CorruptedSampler` (`sample.py:69-89`): corrupt within the
    type-compatible candidates seen for the relation (J6 join against the
    A5 table; per-relation candidate arrays are broadcast — |relations|
    rows, small by construction)."""
    assert mode in ("s", "o")
    cand_col = f"{mode}_cands"
    idx = F.broadcast(type_index(triples).select("p_id", cand_col))
    base = _with_candidates(triples, n).join(idx, "p_id")
    pick = F.element_at(
        F.col(cand_col),
        (
            F.pmod(
                F.xxhash64("s_id", "p_id", "o_id", "_k", F.lit(seed)),
                F.size(F.col(cand_col)),
            )
            + 1
        ).cast("int"),
    )
    cands = base.select(
        pick.alias("s_id") if mode == "s" else F.col("s_id"),
        F.col("p_id"),
        pick.alias("o_id") if mode == "o" else F.col("o_id"),
    )
    if reject_known:
        cands = _reject_known(cands, triples)
    return cands.withColumn("label", F.lit(-1.0))


def lcwa_sampler(
    triples: DataFrame,
    n_entities: int,
    n: int = 1,
    seed: int = 42,
    reject_known: bool = True,
) -> DataFrame:
    """N5 `LCWASampler` (`sample.py:92-111`): random object corruption
    admitted only if the (s,p) pair exists in the training set (local
    closed-world assumption) — J5 left-semi join."""
    sp_seen = triples.select("s_id", "p_id").distinct()
    cands = random_mode_sampler(
        triples, n_entities, n=n, seed=seed, mode="o", reject_known=False
    ).drop("label")
    cands = cands.join(sp_seen, on=["s_id", "p_id"], how="left_semi")
    if reject_known:
        cands = _reject_known(cands, triples)
    return cands.withColumn("label", F.lit(-1.0))


def with_positives(triples: DataFrame, negatives: DataFrame) -> DataFrame:
    """Labeled training set: positives y=+1 ∪ negatives y=−1
    (`base.py:117-118`, `sample.py:45`)."""
    pos = triples.select(*TRIPLE_COLS).withColumn("label", F.lit(1.0))
    return pos.unionByName(negatives.select(*TRIPLE_COLS, "label"))
