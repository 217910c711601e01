"""Incremental aggregate maintenance — materialized-view refresh
without recompute: keep a keyed snapshot of MERGEABLE partial
aggregates (count / sum / min / max) and fold each new data batch into
it, so maintaining an aggregate over a 100 TB history costs one pass
over the NEW data plus a merge over the (small) snapshot, never a
rescan of the history.

Mergeability is the whole design: these aggregates satisfy
``agg(A ∪ B) = merge(agg(A), agg(B))``, so the snapshot is itself a
partial-aggregate state (exactly what Spark's own partial/final
aggregation exchanges between stages, lifted to a stored table).
Averages derive as sum/count at READ time — storing avg would not
merge.  Non-mergeable aggregates (exact distinct, median) need a
sketch (HLL in functions/sketches.py) or a re-aggregation.

Scale shape: one aggregate over the batch (shuffle = #groups), one
full-outer join against the snapshot on the group key (snapshot is
group-cardinality-sized, usually broadcastable), zero history scans.
Snapshot storage composes with the crash-safe versioned commits in
operators/merge.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "sum": lambda a, b: (
        F.when(a.isNull(), b)
        .when(b.isNull(), a)
        .otherwise(a + b)
    ),
    "min": lambda a, b: F.least(a, b),  # least/greatest skip NULLs
    "max": lambda a, b: F.greatest(a, b),
}

_AGGS = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(F.col(c)),
    "min": lambda c: F.min(F.col(c)),
    "max": lambda c: F.max(F.col(c)),
}


def partial_agg(
    batch: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """One mergeable partial-aggregate pass over a batch.

    ``aggs`` maps output column → (kind, input column) with kind in
    count / sum / min / max; count ignores its input column.
    """
    exprs = []
    for out, (kind, col) in aggs.items():
        if kind not in _AGGS:
            raise ValueError(f"unsupported aggregate kind {kind!r}")
        exprs.append(_AGGS[kind](col).alias(out))
    return batch.groupBy(*key_cols).agg(*exprs)


def merge_agg_snapshot(
    snapshot: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold one data batch into an aggregate snapshot and return the
    refreshed snapshot (same schema: key cols + one column per entry
    in ``aggs``).  ``snapshot=None`` starts a fresh view.

    The merge is a full-outer join on the group keys: groups only in
    the batch insert, groups only in the snapshot carry over, shared
    groups combine per aggregate kind.
    """
    delta = partial_agg(batch, key_cols, aggs)
    if snapshot is None:
        return delta
    s = snapshot.select(
        *[F.col(k).alias(f"_s_{k}") for k in key_cols],
        *[F.col(c).alias(f"_s_{c}") for c in aggs],
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (delta[k].eqNullSafe(F.col(f"_s_{k}")))
    joined = delta.join(s, on=cond, how="full_outer")
    out_keys = [
        F.coalesce(F.col(k), F.col(f"_s_{k}")).alias(k)
        for k in key_cols
    ]
    out_aggs = [
        _MERGES[kind](F.col(f"_s_{out}"), F.col(out)).alias(out)
        for out, (kind, _col) in aggs.items()
    ]
    return joined.select(*out_keys, *out_aggs)


def delta_join_increment(
    a_old: DataFrame,
    b_old: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of an equi-join view over APPEND-ONLY
    inputs: the new join rows contributed by one batch of appends
    (ΔA, ΔB) are exactly

        ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so ``J' = J ∪ delta_join_increment(...)`` — the classic delta-join
    rule (count-preserving for bag semantics; the three terms are
    disjoint because each row pair is classified by which sides are
    new).  Maintaining a 100 TB join view this way costs joins that are
    DELTA-sized on at least one side; the history sides (A_old, B_old)
    are key-filtered by the delta's join keys, which is an index/
    partition-pruned lookup under bucketed or partitioned storage —
    never a history × history re-join.
    """
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
