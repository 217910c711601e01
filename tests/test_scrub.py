"""PII scrub operator: crafted-string behavior + byte-for-byte
cross-engine parity of the Java-regex/RE2 pattern subset (the property
the doc_pii_scrub oracle depends on)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline import scrub

CRAFTED = [
    "plain text with no pii at all",
    "mail me at alice.smith+tag@sub.example.co.uk today",
    "two mails a@b.io and c_d%x@y-z.org here",
    "server at 192.168.0.1 and 10.0.0.255, port ignored",
    "call +1-555-0100 or +49-123-4567 now",
    "edge 999.999.999.999 still matches the lexical ipv4 shape",
    "no boundary x192.168.0.1 should not match the ip",
    "email then ip alice@example.com 8.8.8.8 +1-222-3333",
    "dots.but.not.ip and @lone and +1-22-333 stay",
    "",
]


@pytest.fixture(scope="module")
def crafted_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"id": range(len(CRAFTED)), "text": CRAFTED}),
        "id long, text string",
    )


def test_counts(spark, crafted_df):
    rows = {
        r.id: (r.e, r.i, r.p)
        for r in crafted_df.select(
            "id",
            scrub.pii_count_col("text", "email").alias("e"),
            scrub.pii_count_col("text", "ipv4").alias("i"),
            scrub.pii_count_col("text", "phone").alias("p"),
        ).collect()
    }
    assert rows[0] == (0, 0, 0)
    assert rows[1] == (1, 0, 0)
    assert rows[2] == (2, 0, 0)
    assert rows[3] == (0, 2, 0)
    assert rows[4] == (0, 0, 2)
    assert rows[5] == (0, 1, 0)  # lexical shape, no range validation
    assert rows[6] == (0, 0, 0)  # \b blocks the x-prefixed ip
    assert rows[7] == (1, 1, 1)
    assert rows[9] == (0, 0, 0)


def test_scrub_redacts_all_matches(spark, crafted_df):
    out = {
        r.id: r.s
        for r in crafted_df.select(
            "id", scrub.scrub_pii_col("text").alias("s")
        ).collect()
    }
    assert out[1] == "mail me at <PII> today"
    assert out[2] == "two mails <PII> and <PII> here"
    assert out[3] == "server at <PII> and <PII>, port ignored"
    assert out[4] == "call <PII> or <PII> now"
    assert out[7] == "email then ip <PII> <PII> <PII>"
    # deliberate non-matches survive verbatim: \b-guarded ip (6),
    # local-part-less @ and short phone (8)
    assert out[6] == CRAFTED[6]
    assert out[8] == CRAFTED[8]


def test_cross_engine_parity(spark, crafted_df):
    """Byte-for-byte: Spark's chained Java regexp_replace == DuckDB's
    chained RE2 regexp_replace on the same strings — the exact contract
    the doc_pii_scrub oracle assumes."""
    got = {
        r.id: r.s
        for r in crafted_df.select(
            "id", scrub.scrub_pii_col("text").alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.register("crafted", pd.DataFrame({"id": range(len(CRAFTED)), "text": CRAFTED}))
    duck = dict(
        con.sql(
            r"""
            SELECT id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<PII>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<PII>', 'g'),
                       '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PII>', 'g') AS s
            FROM crafted
            """
        ).fetchall()
    )
    con.close()
    assert got == duck
