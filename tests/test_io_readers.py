"""S1–S4 source readers: N-Triples regex parse + TSV triples."""

from __future__ import annotations

import pytest

from spark_tensors_spark.io.readers import read_ntriples, read_tsv_triples

NT = """\
<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> .
<http://ex.org/b> <http://ex.org/knows> <http://ex.org/c> .
<http://ex.org/a> <http://ex.org/name> "Alice" .
<http://ex.org/c> <http://ex.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
malformed line without triple
"""


@pytest.fixture(scope="module")
def nt_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "g.nt"
    p.write_text(NT)
    return str(p)


def test_ntriples_uri_only_matches_scala_semantics(spark, nt_file):
    """`RDFDatasetReader.scala:22-25` keeps all-URI triples; the rdflib
    path inverted this (`rdfio.py:46-47`) — we follow the Scala side."""
    rows = {
        (r.s, r.p, r.o) for r in read_ntriples(spark, nt_file).collect()
    }
    assert rows == {
        ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
        ("http://ex.org/b", "http://ex.org/knows", "http://ex.org/c"),
    }


def test_ntriples_with_literals(spark, nt_file):
    rows = read_ntriples(spark, nt_file, uri_only=False).collect()
    assert len(rows) == 4  # malformed line dropped
    objs = {r.o for r in rows}
    assert '"Alice"' in objs
    assert any(o.startswith('"42"^^') for o in objs)


def test_tsv_triples_named_schema(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("e1\tr1\te2\ne2\tr1\te3\n")
    df = read_tsv_triples(spark, str(p), columns=("head", "rel", "tail"))
    assert df.columns == ["head", "rel", "tail"]
    assert df.count() == 2
    # TransE.scala:89-91 layout (head, tail, relation) is a caller-side
    # column naming, not a positional convention baked into the reader
    df2 = read_tsv_triples(spark, str(p), columns=("h", "t", "r"))
    assert {tuple(r) for r in df2.collect()} == {
        ("e1", "r1", "e2"), ("e2", "r1", "e3")
    }


def test_load_table_normalizes_every_events_ts_layout(spark, tmp_path):
    """Round-2 regression class: the driver has shipped events.ts as
    TIMESTAMP(NANOS) (read as raw-nanos long) and as TIMESTAMP(MICROS)
    without timezone (read as TIMESTAMP_NTZ).  load_table must
    normalize EVERY layout to a session-tz TIMESTAMP with identical
    wall-clock values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from spark_tensors_spark.io.readers import load_table

    wall = [
        datetime.datetime(2024, 3, 1, 12, 0, 0, 250_000),
        datetime.datetime(2024, 3, 1, 12, 0, 1, 0),
    ]
    layouts = {
        "ntz_us": pa.timestamp("us"),
        "tz_us": pa.timestamp("us", tz="UTC"),
        "nanos": pa.timestamp("ns"),
    }
    got = {}
    for name, ty in layouts.items():
        d = tmp_path / name
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(wall, ty),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            name, df.schema["ts"].dataType,
        )
        got[name] = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got["ntz_us"] == got["tz_us"] == got["nanos"], got
