"""Declarative data-quality validation — the expectations/DQ-check
primitive (the Deequ/Great-Expectations core, Spark-first): a rule list
compiles into ONE scan-side wide aggregate, so validating a 100 TB
table costs one pass regardless of rule count.

Rules (all null-safe, each counting VIOLATING rows):
- ``not_null(col)``            — NULL values
- ``in_range(col, lo, hi)``    — non-null values outside [lo, hi]
- ``matches(col, regex)``      — non-null strings not fully matching
  (Java-regex/RE2 common subset only — the scrub doctrine — so a SQL
  oracle can restate the pattern)
- ``unique(col)``              — surplus duplicate copies among
  non-null values (count − distinct-count; 0 ⇔ unique)

Scale note: ``unique`` compiles to an exact ``countDistinct``, which
plans an Expand replica of the input per distinct aggregate (the
profiler trade-off, SCALE.md #10) — budget one or two unique rules per
validation, or check uniqueness approximately with the profiler's
default path first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(column: str) -> dict:
    return {"kind": "not_null", "column": column}


def in_range(column: str, lo: float, hi: float) -> dict:
    return {"kind": "in_range", "column": column, "lo": lo, "hi": hi}


def matches(column: str, pattern: str) -> dict:
    return {"kind": "matches", "column": column, "pattern": pattern}


def unique(column: str) -> dict:
    return {"kind": "unique", "column": column}


def _violation_agg(rule: dict):
    c = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if kind == "in_range":
        bad = c.isNotNull() & (
            (c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"]))
        )
        return F.sum(bad.cast("long"))
    if kind == "matches":
        bad = c.isNotNull() & ~c.rlike(f"^(?:{rule['pattern']})$")
        return F.sum(bad.cast("long"))
    if kind == "unique":
        # surplus copies among non-null values: count(col) ignores
        # NULLs on both engines, countDistinct likewise
        return F.count(c) - F.countDistinct(c)
    raise ValueError(f"unknown rule kind {kind!r}")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """DataFrame(rule, column, n_violations, n_rows), one row per rule,
    ONE input scan (a single wide aggregate, melted with ``stack`` over
    the 1-row result — the profiler's shape)."""
    if not rules:
        raise ValueError("validate: rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, rule in enumerate(rules):
        # coalesce: F.sum over ZERO rows is NULL, and a zero-row table
        # vacuously satisfies every rule — it must audit as 0, not
        # NULL (an empty staged WAP snapshot could otherwise never
        # publish: None == 0 is False)
        aggs.append(
            F.coalesce(_violation_agg(rule).cast("long"), F.lit(0))
            .alias(f"v_{i}")
        )
    one = df.agg(*aggs).localCheckpoint()
    stack_args = ", ".join(
        f"'{r['kind']}', '{r['column']}', v_{i}"
        for i, r in enumerate(rules)
    )
    return one.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) "
            "AS (rule, column, n_violations)"
        ),
        F.col("n_rows"),
    ).select("rule", "column", "n_violations", "n_rows")


def zscore_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score anomaly detection: rows whose value deviates
    more than ``threshold`` standard deviations from their key's mean
    — the statistical DQ check next to the rule engine (population
    variance over the key's own history).

    Scale shape: one grouped aggregate for the per-key moments + one
    equi-join back on the key (both shuffle on key_cols, AQE-sized).

    Cross-engine exactness: Σx and Σx² accumulate in DECIMAL (exact,
    associative — a double sum is partial-agg-order dependent); the
    per-row square is one double op, bit-identical on any engine; mean
    / variance / σ / z are then a fixed tree of double ops on
    identical inputs, so the UNROUNDED z hash-matches a SQL oracle.
    Zero-variance keys are excluded before the division (no NULL/NaN
    in output).
    """
    c = F.col(value_col)
    stats = df.groupBy(*key_cols).agg(
        F.count(c).alias("_n"),
        F.sum(c.cast("decimal(18,6)")).cast("double").alias("_s1"),
        F.sum((c * c).cast("decimal(27,12)")).cast("double").alias("_s2"),
    )
    mu = F.col("_s1") / F.col("_n")
    var = F.greatest(
        F.col("_s2") / F.col("_n") - mu * mu, F.lit(0.0)
    )
    sigma = F.sqrt(var)
    joined = df.join(
        stats.select(*key_cols, mu.alias("_mu"), sigma.alias("_sigma")),
        key_cols,
    ).filter(F.col("_sigma") > 0)
    z = (c - F.col("_mu")) / F.col("_sigma")
    return (
        joined.withColumn("z", z)
        .filter(F.abs(F.col("z")) > F.lit(threshold))
        .drop("_mu", "_sigma")
    )
