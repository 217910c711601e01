"""Bloom-filter join pruning: pre-filter a huge fact table against a
dimension key set BEFORE the join shuffle.

The scale problem this solves: a shuffled semi/inner join moves every
fact row to its hash partition, even rows that can never match.  AQE's
runtime bloom filters cover some shapes automatically; this operator is
the explicit form for when the planner doesn't inject one (multi-stage
pipelines, checkpointed intermediates, non-equi follow-up logic).

Mechanism: the dim side is reduced to its set of OCCUPIED bloom bit
positions — at most ``m`` rows (one per set bit), independent of dim
cardinality — which is broadcast; the fact side computes its ``k``
salted-hash positions scan-side and keeps only rows whose positions are
all present (``k`` broadcast left-semi joins, whole-stage codegen, no
exchange of the fact).  False positives then die in the exact join,
which now shuffles only survivors.

Hashes are the same portable md5 primitives as functions/sketches.py,
so the filter is deterministic across engines and retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_tensors_spark.functions.sketches import portable_hash60_col

BLOOM_M = 1 << 16
BLOOM_K = 3


def bloom_position_col(col: Column | str, j: int, m: int) -> Column:
    """Bit position of hash function ``j`` for one value — salted md5,
    identical math to the count-min cells."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash60_col(F.concat(F.lit(f"b{j}:"), c.cast("string"))) % m


def bloom_bits(
    dim: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The dim key set's occupied bloom positions: DataFrame(pos), at
    most ``m`` rows no matter how many keys — the broadcastable stand-in
    for a dim too large to broadcast itself."""
    pos = F.array(
        *[bloom_position_col(key_col, j, m) for j in range(k)]
    )
    return (
        dim.select(F.explode(pos).alias("pos"))
        .distinct()
    )


def bloom_prefilter(
    fact: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Fact rows whose key passes the bloom membership test (superset of
    the true matches).  ``k`` broadcast semi-joins against the bits
    table — the fact side is never shuffled.

    The bits table is materialized eagerly (``localCheckpoint``): it is
    bounded at ``m`` rows regardless of dim cardinality, and under AQE
    the k broadcast builds would otherwise each re-plan the distinct's
    shuffle subtree (stage reuse is a runtime decision; checkpointing
    makes the single execution structural)."""
    bits = bits.localCheckpoint(eager=True)
    out = fact
    bcast = F.broadcast(bits)
    for j in range(k):
        # join on an explicit condition, NOT a per-j renamed column: the
        # broadcast child plan stays identical across the k joins, so the
        # checkpointed blocks are scanned, never recomputed
        out = out.join(
            bcast,
            bloom_position_col(out[key_col], j, m) == bits["pos"],
            "left_semi",
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Exact semi-join with bloom pre-pruning: result-identical to
    ``fact.join(dim, fact[fact_key] == dim[dim_key], "left_semi")`` but
    only bloom survivors reach the join shuffle."""
    bits = bloom_bits(dim.select(F.col(dim_key).alias("k")), "k", m, k)
    pruned = bloom_prefilter(fact, bits, fact_key, m, k)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
