"""Z-order (Morton) clustering — multi-dimensional data layout for
scan pruning, the technique behind Delta Lake's OPTIMIZE ZORDER BY and
every kd-locality file layout.

Why it matters at 100 TB: min/max statistics on a file (parquet
row-group / footer) can only skip data when the file's value range is
narrow.  Sorting by ONE column makes its ranges narrow but leaves every
other column's range full-width; interleaving the bits of several
bounded keys into one Morton code and range-partitioning + sorting by
it gives every participating column locality, so a selective filter on
ANY of them prunes most files (pinned by the locality test in
tests/test_zorder.py: point-range queries intersect ~1 file after
layout vs nearly all files before).

The code itself is pure integer codegen (shift/mask/or fold — no
Python, no UDF), identical arithmetic in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_col(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of two ``bits``-bit non-negative ints: bit i of
    x lands at 2i, bit i of y at 2i+1.  Callers bound the inputs
    (e.g. ``col % 65536``); values wider than ``bits`` alias, they
    never error."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    xl = x.cast("long")
    yl = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as engine-portable SQL (DuckDB oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bits: int = 16,
    n_files: int = 8,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton code
    (each output file owns a contiguous z-interval → tight min/max
    stats on BOTH source columns), then sort within partitions so
    row-group stats are tight too.  Follow with ``.write.parquet(...)``."""
    z = zvalue_col(x, y, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
    )
