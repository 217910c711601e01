"""SCD2 history tables — slowly-changing-dimension versioning, the
warehouse primitive for "what was this entity's state at time T".

``history_table`` compresses an ordered change stream into validity
ranges: consecutive rows whose tracked attributes are unchanged
collapse into one version row (valid_from = first ts of the run,
valid_to = next version's valid_from, open version flagged current).
The as-of lookup against the result is the interval join the engine
already ships (`operators/temporal.bucketed_range_join`:
valid_from ≤ ts < valid_to).

Scale shape: two ordered windows over the SAME (key, ts) partitioning
— a change-flag lag pass and a valid_to lead pass on the compressed
rows — fused by Catalyst into one sort per key; no self-joins, no
Python.  Pure integer/timestamp codegen, so the SQL oracle restates it
exactly.  Timestamps surface as epoch µs with a −1 open-end sentinel
(NULL doubles/timestamps break the cross-engine hash — r1 doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def history_table(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """(*key_cols, *attr_cols, valid_from_us, valid_to_us, is_current)
    — one row per distinct consecutive attribute state per key.

    A run of equal attribute tuples keeps its FIRST row's timestamp as
    ``valid_from``; ``valid_to`` is the next run's ``valid_from``
    (half-open ranges chain without gaps), −1 on the open (current)
    version.
    """
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.when(
        F.lag(attrs).over(w).isNull()
        | (F.lag(attrs).over(w) != attrs),
        F.lit(1),
    ).otherwise(F.lit(0))
    starts = df.withColumn("_chg", changed).filter(F.col("_chg") == 1)
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    valid_from = F.unix_micros(F.col(ts_col))
    valid_to = F.lead(valid_from).over(w2)
    return starts.select(
        *key_cols,
        *attr_cols,
        valid_from.alias("valid_from_us"),
        F.coalesce(valid_to, F.lit(-1)).alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    dim_prefix: str = "dim_",
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the dimension version valid at the fact's
    timestamp — the "state as of event time" lookup every SCD2 table
    exists for: ``valid_from_us <= ts`` and (open version or
    ``ts < valid_to_us``).  Versions are disjoint half-open ranges, so
    a fact matches AT MOST ONE version — a plain left join needs no
    dedup and emits no spurious rows.

    Output = all fact columns + the history's non-key columns under
    ``dim_prefix`` (NULL on unmatched facts with ``how='left'``;
    ``how='inner'`` drops them).

    Scale shape: an EQUI-join on the key columns (SortMergeJoin /
    shuffled hash after AQE) with the validity range as a join filter —
    never a cross product.  Version counts per key are change counts,
    not event counts, so the per-key right side stays small; a small
    dimension can be broadcast by wrapping ``history`` in
    ``F.broadcast`` at the call site.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    # rename the entire right side first so a shared-lineage self-join
    # (facts and history derived from the same scan) cannot produce
    # ambiguous column references
    dim = history.select(
        *[F.col(k).alias(f"_pit_{k}") for k in key_cols],
        *[
            F.col(c).alias(f"{dim_prefix}{c}")
            for c in history.columns
            if c not in key_cols
        ],
    )
    ts_us = F.unix_micros(F.col(ts_col))
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_pit_{k}"))
    vf = F.col(f"{dim_prefix}valid_from_us")
    vt = F.col(f"{dim_prefix}valid_to_us")
    cond = cond & (vf <= ts_us) & ((vt == -1) | (ts_us < vt))
    return facts.join(dim, on=cond, how=how).drop(
        *[f"_pit_{k}" for k in key_cols]
    )
