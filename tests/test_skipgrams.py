"""Skip-gram pair generator (pipeline/corpus.py): codegen column vs a
plain-Python oracle, edge cases, and §2.10 breadth — a Python UDTF
(Spark 4 user-defined table function) producing the identical pair
stream.  The UDTF stays OFF the declared query plan (Python row path);
the codegen form is the 100 TB path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline.corpus import (
    skipgram_pairs_col,
    skipgram_topk,
)

DOCS = [
    (0, "the quick brown fox"),
    (1, "the the the"),
    (2, "single"),
    (3, ""),
    (4, "a b"),
]


def _py_pairs(text, window=2):
    toks = [t for t in text.split(" ") if t]
    out = []
    for i in range(len(toks)):
        for d in range(1, window + 1):
            if i + d < len(toks):
                out.append((toks[i], toks[i + d]))
    return out + [(b, a) for a, b in out]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def test_codegen_matches_python_oracle(spark):
    got = sorted(
        (r.doc_id, r.p.center, r.p.context)
        for r in _df(spark)
        .select("doc_id", F.explode(skipgram_pairs_col("text", 2)).alias("p"))
        .collect()
    )
    want = sorted(
        (i, a, b) for i, t in DOCS for a, b in _py_pairs(t, 2)
    )
    assert got == want
    # edge cases explicit: empty + 1-token docs emit nothing
    assert not [g for g in got if g[0] in (2, 3)]
    assert [g for g in got if g[0] == 4] == [(4, "a", "b"), (4, "b", "a")]


def test_topk_counts(spark):
    rows = {
        (r.center, r.context): r.c
        for r in skipgram_topk(_df(spark), window=2, k=100).collect()
    }
    from collections import Counter

    want = Counter(p for _i, t in DOCS for p in _py_pairs(t, 2))
    assert rows == dict(want)


def test_udtf_parity(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="center string, context string")
    class SkipGrams:
        def eval(self, text: str, window: int):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks)):
                for d in range(1, window + 1):
                    if i + d < len(toks):
                        yield toks[i], toks[i + d]
                        yield toks[i + d], toks[i]

    spark.udtf.register("skipgrams_udtf", SkipGrams)
    _df(spark).createOrReplaceTempView("_skipgram_docs")
    got = sorted(
        (r.center, r.context)
        for r in spark.sql(
            "SELECT s.center, s.context FROM _skipgram_docs, "
            "LATERAL skipgrams_udtf(text, 2) s"
        ).collect()
    )
    want = sorted(
        (a, b)
        for r in _df(spark)
        .select(F.explode(skipgram_pairs_col("text", 2)).alias("p"))
        .collect()
        for a, b in [(r.p.center, r.p.context)]
    )
    assert got == want


def test_fuzz_random_texts_match_python(spark):
    """Seeded fuzz: 200 random texts (unicode tokens, runs of spaces,
    leading/trailing whitespace, empty) — codegen pairs == python."""
    import random

    rng = random.Random(99)
    alphabet = ["a", "bb", "ccc", "Ω", "日本", "x1", "-", "''"]
    texts = []
    for _ in range(200):
        n = rng.randrange(0, 8)
        toks = [rng.choice(alphabet) for _ in range(n)]
        sep = lambda: " " * rng.randrange(1, 4)
        t = sep().join([""] + toks + [""]) if rng.random() < 0.3 else (
            sep().join(toks)
        )
        texts.append(t)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.p.center, r.p.context)
        for r in df.select(
            "doc_id", F.explode(skipgram_pairs_col("text", 2)).alias("p")
        ).collect()
    )
    want = sorted(
        (i, a, b)
        for i, t in enumerate(texts)
        for a, b in _py_pairs(t, 2)
    )
    assert got == want
