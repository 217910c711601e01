"""Frequency/cardinality sketches, cross-engine-deterministic:
HyperLogLog (distinct counts) and count-min (frequency estimates).

``approx_count_distinct`` already gives Spark users an HLL, but its
register hashing is engine-private, so its estimates can never be
checked against another engine.  This module builds the *same* HLL
(Flajolet et al. 2007) from portable primitives — md5 for the hash,
pure integer arithmetic for register index and rank — so DuckDB
reproduces every register and therefore the exact estimate.  That makes
the sketch itself oracle-checkable, not just "within error bounds".
The count-min sketch (Cormode & Muthukrishnan 2005) follows the same
discipline: salted md5 cell hashes, integer counts, so every estimate
is bit-identical across engines.

Scale shape: one scan projecting (register, rank), a groupBy(register)
max — partial-aggregated map-side to ≤ m rows per group key — then a
tiny final agg.  At 100 TB the shuffle carries at most ``m`` rows per
grouping key; the sketch *is* the aggregation state.

The estimator uses the standard bias-corrected harmonic mean with the
small-range (linear counting) correction.  ``2^-rank`` terms are exact
binary fractions, so the register sum is order-independent; the final
``ln``/division are one libm call on matching IEEE doubles — results
are rounded by the caller (4 dp in the declared query) far above ulp
noise.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash from the md5 hex prefix: 15 hex digits keeps the value
# positive in a signed 64-bit BIGINT on both engines
HASH_HEX_DIGITS = 15
HASH_BITS = 4 * HASH_HEX_DIGITS


def portable_hash60_col(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column — identical
    in Spark (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HASH_HEX_DIGITS), 16, 10).cast(
        "long"
    )


def hll_register_cols(
    col: Column | str, p: int = 10
) -> tuple[Column, Column]:
    """(register_index, rank) for one row's value.

    register = low ``p`` bits of the hash; rank = position of the
    highest set bit in the remaining ``HASH_BITS - p`` bits, counted
    from the top (1-based), or that width + 1 if they are all zero —
    i.e. leading zeros + 1, the classic HLL rho.
    """
    h = portable_hash60_col(col)
    m = 1 << p
    w_bits = HASH_BITS - p
    reg = (h % m).alias("hll_reg")
    # h >> p, NOT h/m: float division would round away the low bits of a
    # 60-bit hash (doubles carry 53).  DuckDB's `//` is exact BIGINT math.
    w = F.shiftright(h, p)
    # rho via an integer comparison ladder (no log2 — floor(log2(w))
    # is exact integer logic, immune to libm rounding at 2^k edges):
    # rho = w_bits - floor(log2(w)) for w > 0, else w_bits + 1
    rho = F.lit(w_bits + 1)
    for bits in range(1, w_bits + 1):
        # w >= 2^(bits-1) ⇒ floor(log2 w) >= bits-1 ⇒ rho <= w_bits-bits+1
        rho = F.when(w >= (1 << (bits - 1)), F.lit(w_bits - bits + 1)).otherwise(
            rho
        )
    return reg, rho.alias("hll_rho")


def hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group register table (*group_cols, hll_reg, max_rho) — the
    sketch itself.  Register tables MERGE by per-register max: a
    commutative, associative, idempotent fold, which is what makes the
    sketch both map-side combinable and streaming/CRDT-safe."""
    reg, rho = hll_register_cols(value_col, p)
    return (
        df.select(*group_cols, reg, rho)
        .groupBy(*group_cols, "hll_reg")
        .agg(F.max("hll_rho").alias("max_rho"))
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Estimate from a (possibly merged) register table — shared by the
    batch path and the streaming register-state path."""
    m = 1 << p
    alpha = hll_alpha(m)
    sums = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("occupied_sum"),
        F.count(F.lit(1)).alias("n_occupied"),
    )
    # empty registers contribute 2^0 = 1 each to the harmonic sum
    s = F.col("occupied_sum") + (F.lit(m) - F.col("n_occupied"))
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("n_occupied")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return sums.select(*group_cols, est.alias("hll_estimate"))


def hll_estimate(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group HLL cardinality estimate: DataFrame(*group_cols,
    hll_estimate).  Deterministic — any engine implementing the same
    register math produces the identical float."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def hll_oracle_sql(
    source_sql: str, value_expr: str, group_cols: list[str], p: int = 10
) -> str:
    """DuckDB SQL computing the identical estimate over
    ``source_sql`` (a relation producing ``group_cols`` + the value)."""
    m = 1 << p
    w_bits = HASH_BITS - p
    alpha = hll_alpha(m)
    groups = ", ".join(group_cols)
    rho_cases = " ".join(
        # descending so the first true WHEN is the highest set bit
        f"WHEN w >= {1 << (bits - 1)} THEN {w_bits - bits + 1}"
        for bits in range(w_bits, 0, -1)
    )
    return f"""
WITH hashed AS (
    SELECT {groups},
           CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1,
                 {HASH_HEX_DIGITS})) AS BIGINT) AS h
    FROM ({source_sql})
),
regs AS (
    SELECT {groups}, h % {m} AS hll_reg,
           MAX(CASE {rho_cases} ELSE {w_bits + 1} END) AS max_rho
    FROM (SELECT {groups}, h, h // {m} AS w FROM hashed)
    GROUP BY {groups}, hll_reg
),
sums AS (
    SELECT {groups},
           SUM(POWER(2.0, -max_rho)) AS occupied_sum,
           COUNT(*) AS n_occupied
    FROM regs GROUP BY {groups}
)
SELECT {groups},
       CASE WHEN ({alpha * m * m} / (occupied_sum + ({m} - n_occupied)))
                 <= {2.5 * m}
            AND ({m} - n_occupied) > 0
            THEN {float(m)} * LN({float(m)} / ({m} - n_occupied))
            ELSE {alpha * m * m} / (occupied_sum + ({m} - n_occupied))
       END AS hll_estimate
FROM sums
"""


# ------------------------------------------------------------------ KMV

KMV_K = 64
KMV_SALTS = 32
# size of the 60-bit hash space; (KMV_K-1) * KMV_SPACE = 63 * 2^60 needs
# only a 6-bit mantissa, so the numerator is an EXACT double
KMV_SPACE = 1 << HASH_BITS


def kmv_signature(
    df: DataFrame,
    value_col: Column | str,
    group_cols: list[str],
    k: int = KMV_K,
    n_salts: int = KMV_SALTS,
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k) signature: the ``k``
    smallest DISTINCT portable 60-bit hashes of ``value_col`` —
    DataFrame(*group_cols, kmv_rank, kmv_h), ≤ k rows per group.

    Unlike the HLL register table, a KMV signature supports SET ALGEBRA:
    the k smallest of (sig_A ∪ sig_B) is exactly the signature of A ∪ B,
    so union sizes — and via the in-both fraction, intersections and
    Jaccard — are estimable from the sketches alone (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations").  Merging is min-k over unions: commutative,
    associative, idempotent — map-side combinable and streaming-safe.

    Scale shape: distinct (group, hash) pairs, then a salted partial
    top-k — each (group, hash%n_salts) slice keeps its own k smallest,
    bounding every sort at a 1/n_salts shard — then a final top-k over
    ≤ n_salts·k candidates per group.  No group ever sorts its full
    distinct set on one task.
    """
    from pyspark.sql.window import Window

    h = portable_hash60_col(value_col).alias("kmv_h")
    d = df.select(*group_cols, h).distinct()
    w1 = Window.partitionBy(*group_cols, "_kmv_salt").orderBy("kmv_h")
    part = (
        d.withColumn("_kmv_salt", F.col("kmv_h") % n_salts)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
    )
    w2 = Window.partitionBy(*group_cols).orderBy("kmv_h")
    return (
        part.withColumn("kmv_rank", F.row_number().over(w2))
        .filter(F.col("kmv_rank") <= k)
        .select(*group_cols, "kmv_rank", "kmv_h")
    )


def kmv_estimate_from_signature(
    sig: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate from a (possibly merged) signature:
    exact count when the group has < k distinct hashes (the signature IS
    the distinct set), else the classic (k−1)·H / h_(k) estimator.
    Both engines evaluate the same exact-integer → one-division float
    path, so estimates are bit-identical cross-engine.

    The input need NOT be a truncated ≤k-row signature: the aggregate
    below re-truncates to the k smallest DISTINCT hashes itself
    (`collect_set` → sort → slice — one hash agg, no window), so an
    untruncated min-k union of several signatures estimates correctly
    instead of silently reading a non-k-th hash as h_(k).  Signatures
    are ≤k rows per input by construction, so the per-group set the
    aggregate buffers is bounded by k × (#merged inputs)."""
    hs = F.slice(F.array_sort(F.collect_set("kmv_h")), 1, k)
    agg = sig.groupBy(*group_cols).agg(hs.alias("_kmv_hs")).select(
        *group_cols,
        F.size("_kmv_hs").alias("kmv_n"),
        F.element_at("_kmv_hs", F.size("_kmv_hs")).alias("kmv_kth"),
    )
    est = F.when(
        F.col("kmv_n") < k, F.col("kmv_n").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * KMV_SPACE)) / F.col("kmv_kth").cast("double")
    )
    return agg.select(*group_cols, est.alias("kmv_estimate"))


def kmv_signature_sql(
    source_sql: str,
    value_expr: str,
    group_cols: list[str],
    k: int = KMV_K,
) -> str:
    """DuckDB relation producing the identical (group_cols, kmv_rank,
    kmv_h) signature over ``source_sql``.  The salted two-phase is a
    Spark-side execution detail — k-smallest is k-smallest."""
    groups = ", ".join(group_cols)
    return f"""
SELECT {groups},
       ROW_NUMBER() OVER (PARTITION BY {groups} ORDER BY kmv_h)
           AS kmv_rank,
       kmv_h
FROM (
    SELECT DISTINCT {groups},
           CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1,
                 {HASH_HEX_DIGITS})) AS BIGINT) AS kmv_h
    FROM ({source_sql})
)
QUALIFY kmv_rank <= {k}
"""


# ------------------------------------------------------------------ count-min

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cells(col: Column | str, depth: int, width: int) -> Column:
    """Array of (cms_d, cms_col) structs — one sketch cell per hash row.

    Cell hash = portable 60-bit md5 hash of ``"<d>:<value>"``: the depth
    index is folded into the *input string*, not a separate seed, so any
    engine with md5 reproduces every cell.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("cms_d"),
                (portable_hash60_col(F.concat(F.lit(f"{j}:"), s)) % width).alias(
                    "cms_col"
                ),
            )
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of ``value_col``: DataFrame(cms_d, cms_col, cnt),
    at most ``depth × width`` rows regardless of input size.

    Scale shape: one scan exploding ``depth`` cell rows per input row,
    then a hash aggregate whose map-side partial combine bounds the
    shuffle at ``depth × width`` rows per input partition — the sketch
    IS the aggregation state, same as the HLL above.
    """
    return (
        df.select(F.explode(_cms_cells(value_col, depth, width)).alias("cell"))
        .select("cell.cms_d", "cell.cms_col")
        .groupBy("cms_d", "cms_col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``:
    DataFrame(key_col, cms_estimate) with estimate = min over the
    ``depth`` cells — the classic CMS upper bound (never underestimates).

    The sketch is broadcast (≤ depth×width rows by construction), so the
    key side never shuffles.
    """
    keyed = keys.select(
        key_col, F.explode(_cms_cells(key_col, depth, width)).alias("cell")
    ).select(key_col, "cell.cms_d", "cell.cms_col")
    joined = keyed.join(F.broadcast(sketch), ["cms_d", "cms_col"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate")
    )


def cms_cells_sql(value_expr: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    """DuckDB relation body producing (val, cms_d, cms_col) — one row per
    (input row, depth) — identical cell math to `_cms_cells`.  Caller
    wraps it with its source FROM clause via `{src}` substitution."""
    branches = [
        f"""SELECT {value_expr} AS val, {j} AS cms_d,
           CAST(('0x' || substr(md5('{j}:' || CAST({value_expr} AS VARCHAR)),
                 1, {HASH_HEX_DIGITS})) AS BIGINT) % {width} AS cms_col
    FROM {{src}}"""
        for j in range(depth)
    ]
    return "\n    UNION ALL\n    ".join(branches)


# ------------------------------------------------------------ histogram

HIST_LO = 0.0
HIST_WIDTH = 8.0
HIST_BINS = 80


def histogram_sketch(
    df: DataFrame,
    value_col: Column | str,
    group_cols: list[str],
    lo: float = HIST_LO,
    width: float = HIST_WIDTH,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group fixed-bin integer histogram sketch —
    DataFrame(*group_cols, hist_bin, cnt), ≤ ``n_bins`` rows per group.

    bin = clamp(floor((value − lo) / width), 0, n_bins−1): a pure
    scan-side codegen expression on the identical IEEE double in any
    engine, so the sketch itself is value-oracle-able — unlike KLL/
    t-digest whose compaction paths are engine-specific.  Fixed bands
    (not NTILE) for the same reason doc_quality_histogram uses them: a
    decile funnels 100 TB through one window task and moves when the
    corpus grows; a fixed band is one hash aggregate and stable.

    The state is MERGEABLE (hist(A∪B) = bin-wise cnt sum — commutative,
    associative, map-side combinable), so it composes with the
    incremental snapshot / streaming-MV machinery
    (operators/incremental.py) as the quantile answer those count/sum/
    min/max snapshots were missing: quantiles read out of the merged
    state with bin resolution (±width/2), never a history rescan.

    NULL values land in a NULL bin — preserved EXPLICITLY, because
    Spark's least/greatest SKIP nulls: without the guard,
    greatest(0, floor(NULL)) silently clamps every NULL into bin 0,
    inflating bin-0 counts, n_total, and every quantile read out of
    the sketch.  Filter NULLs upstream if the quantile read-out should
    ignore them — NULL-bin ordering inside the read-out window is
    engine-specific (Spark NULLS FIRST vs DuckDB NULLS LAST).
    """
    if n_bins < 1 or width <= 0:
        raise ValueError(
            f"need n_bins >= 1 and width > 0, got {n_bins}, {width}"
        )
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    b = F.floor((v - F.lit(float(lo))) / F.lit(float(width)))
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b)).cast("long")
    b = F.when(v.isNull(), F.lit(None).cast("long")).otherwise(b)
    return (
        df.select(*group_cols, b.alias("hist_bin"))
        .groupBy(*group_cols, "hist_bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge histogram states onto coarser keys (e.g. hourly → daily):
    bin-wise count sum, one hash aggregate over ≤ n_bins·groups rows."""
    return (
        sketches.groupBy(*group_cols, "hist_bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def quantiles_from_histogram(
    sketch: DataFrame,
    group_cols: list[str],
    percents: list[int],
    lo: float = HIST_LO,
    width: float = HIST_WIDTH,
) -> DataFrame:
    """Quantile read-out from a (possibly merged) histogram sketch: for
    each integer percent p, the smallest bin whose cumulative count
    reaches ceil(p·N/100) — computed as the INTEGER (N·p + 99) div 100,
    so the rank is exact cross-engine (no float ceil).  Emits
    (*group_cols, p, n_total, hist_bin, upper_edge) where upper_edge =
    lo + (bin+1)·width bounds the true quantile from above within one
    bin width.

    One cumulative window per group ordered by bin (≤ n_bins rows per
    group — the window input is sketch-sized, never data-sized).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("hist_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    cum = sketch.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_n", F.sum("cnt").over(wn)
    )
    # ONE window pass for every requested percent: explode the (tiny)
    # percent list against the sketch-sized cum frame instead of
    # re-running the window per p
    x = cum.select(
        *group_cols,
        "hist_bin",
        "_cum",
        "_n",
        F.explode(
            F.array(*[F.lit(int(p)) for p in percents])
        ).alias("p"),
    )
    # (N·p + 99) // 100: N·p ≤ ~1e7 is double-exact and the true
    # quotient is ≥ 0.01 away from any other integer, so the float
    # floor equals the integer floor-div on both engines
    target = F.floor(
        (F.col("_n") * F.col("p") + 99) / F.lit(100)
    ).cast("long")
    return (
        x.filter(F.col("_cum") >= target)
        .groupBy(*group_cols, "p", "_n")
        .agg(F.min("hist_bin").alias("hist_bin"))
        .select(
            *group_cols,
            F.col("p").cast("long").alias("p"),
            F.col("_n").cast("long").alias("n_total"),
            "hist_bin",
            (
                F.lit(float(lo))
                + (F.col("hist_bin") + 1) * F.lit(float(width))
            ).alias("upper_edge"),
        )
    )
