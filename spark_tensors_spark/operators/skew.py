"""Skew-mitigation operators (SURVEY §4.2 / north-star scale list:
"skewed keys → salting or AQE skew-join").

AQE's skew-join splitting handles join-side skew automatically
(enabled in `session.py`); *aggregation* skew on a hot key still
funnels every row of that key through one reducer.  `salted_agg` is the
standard two-phase fix: pre-aggregate on (key, salt) — spreading a hot
key over `n_salts` reducers — then combine the partials.  For algebraic
aggregates (sum/count/min/max) the result is exactly the plain groupBy.

At 100 TB with a Zipf key (the KG's `placed_by` object side, FIXTURES
A1), phase 1 bounds any single task at ~|hot key|/n_salts rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name →
    (input column, fn) with fn ∈ {count, sum, min, max}.

    The salt must be a deterministic function of the ROW (not `rand()`:
    retried tasks would re-salt differently and double-count).  Default
    salt hashes all columns.
    """
    salt = (
        F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
        if salt_on is None
        else salt_on
    )
    phase1_aggs, phase2_aggs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def hot_cold_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame | None = None,
    rel_threshold_num: int = 3,
    rel_threshold_den: int = 2,
) -> DataFrame:
    """Differentiated equi-join for a skewed fact key: the HOT keys'
    dim rows are broadcast so their (huge) fact row sets join map-side
    without ever shuffling, while the remaining keys take the normal
    shuffle join.  The union is EXACTLY ``fact ⋈ dim`` — the split is a
    physical-plan decision, not a semantic one — so the oracle for any
    query built on this operator is the plain join.

    ``hot_keys``: caller-supplied one-column frame of keys to treat as
    hot; when None, keys whose fact count exceeds
    ``rel_threshold_num/rel_threshold_den ×`` the mean per-key count
    are hot (pure integer comparison: cnt·den·n_keys > num·total — no
    float threshold to drift).  The hot set is assumed broadcastable
    (it is by construction: a 1000-executor cluster has room for every
    key that is individually large).

    At 100 TB this is the complement of AQE's skew-split: AQE splits an
    already-shuffled skewed partition, this avoids shuffling the hot
    rows at all — useful when ONE key holds whole-partition-scale data
    and even a split shuffle would move it twice.
    """
    if hot_keys is None:
        counts = fact.groupBy(key).agg(F.count(F.lit(1)).alias("_cnt"))
        totals = counts.agg(
            F.sum("_cnt").alias("_total"), F.count(F.lit(1)).alias("_nk")
        )
        hot_keys = (
            counts.join(F.broadcast(totals))
            .filter(
                F.col("_cnt") * rel_threshold_den * F.col("_nk")
                > rel_threshold_num * F.col("_total")
            )
            .select(key)
        )
    hot = F.broadcast(hot_keys.select(key).distinct())
    fact_hot = fact.join(hot, key, "left_semi")
    fact_cold = fact.join(hot, key, "left_anti")
    dim_hot = dim.join(hot, key, "left_semi")
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key)
    joined_cold = fact_cold.join(dim, key)
    return joined_hot.unionByName(joined_cold)
