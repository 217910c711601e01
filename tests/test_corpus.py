"""Fixture-level semantics for the corpus-analysis operators
(decontamination, TF-IDF, repetition, n-gram counts); the declared-query
oracles in test_pipeline_queries.py pin engine parity at SF."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline import corpus as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e", "s0"),
        (2, "x y z a b", "s0"),      # shares trigram with nothing (no 3-run)
        (3, "c d e f g", "s1"),      # shares trigram "c d e" with doc 1
        (4, "q r", "s1"),            # too short for trigrams
        (5, "m m m m m", "s1"),      # maximally repetitive
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_word_ngrams_basic(spark, docs):
    got = {
        r.doc_id: r.gs
        for r in docs.select(
            "doc_id", C.word_ngrams_col("text", 3).alias("gs")
        ).collect()
    }
    assert got[1] == ["a b c", "b c d", "c d e"]
    assert got[4] == []
    assert got[5] == ["m m m"] * 3


def test_decontaminate_flags_shared_trigrams(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corp = docs.filter(F.col("doc_id") != 1)
    flags = {
        r.doc_id: r.contaminated
        for r in C.decontaminate(corp, bench, n=3).collect()
    }
    # doc 3 shares "c d e"; docs 2/4/5 share no trigram with doc 1
    assert flags == {2: False, 3: True, 4: False, 5: False}


def test_decontaminate_ratio_grades_overlap(spark, docs):
    """decontaminate_ratio semantics on the hand fixture: doc 3 has 3
    distinct trigrams of which exactly 1 ("c d e") is in the benchmark
    → ratio 1/3, flagged at tau=0.2 but not at tau=0.5; doc 5's
    repeated "m m m" collapses to ONE distinct gram (array_distinct),
    n_grams=1; the too-short doc 4 has n_grams=0, ratio 0.0, never
    flagged."""
    bench = docs.filter(F.col("doc_id") == 1)
    corp = docs.filter(F.col("doc_id") != 1)
    lo = {
        r.doc_id: r
        for r in C.decontaminate_ratio(corp, bench, n=3, tau=0.2).collect()
    }
    assert (lo[3].n_grams, lo[3].n_hit) == (3, 1)
    assert abs(lo[3].overlap_ratio - 1 / 3) < 1e-12
    assert lo[3].contaminated is True
    assert (lo[5].n_grams, lo[5].n_hit) == (1, 0)
    assert (lo[4].n_grams, lo[4].n_hit) == (0, 0)
    assert lo[4].overlap_ratio == 0.0 and lo[4].contaminated is False
    hi = {
        r.doc_id: r.contaminated
        for r in C.decontaminate_ratio(corp, bench, n=3, tau=0.5).collect()
    }
    assert hi == {2: False, 3: False, 4: False, 5: False}


def test_decontaminate_broadcasts_benchmark_side(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corp = docs.filter(F.col("doc_id") != 1)
    plan = C.decontaminate(corp, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_tfidf_scores_match_hand_computation(spark, docs):
    out = C.tfidf_top_terms(docs, k=50).collect()
    by_key = {(r.source, r.term): r for r in out}
    # term "a" appears in docs 1,2 → df=2, N=5; tf in s0 = 2
    r = by_key[("s0", "a")]
    assert r.tf == 2 and r.df == 2
    assert r.tfidf == round(2 * math.log(5 / 2), 6)
    # term "m": df=1, tf in s1 = 5
    r = by_key[("s1", "m")]
    assert r.tfidf == round(5 * math.log(5 / 1), 6)
    # ranks are 1..k contiguous per source, sorted by score desc
    for src in ("s0", "s1"):
        rows = sorted(
            (r for r in out if r.source == src), key=lambda r: r.rk
        )
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.tfidf for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_repetition_stats_values(spark, docs):
    out = {
        r.doc_id: (r.n_ngrams, r.dup_frac)
        for r in C.repetition_stats(docs, n=3).collect()
    }
    assert out[1] == (3, 0.0)          # all trigrams distinct
    assert out[4] == (0, 0.0)          # too short → defined as 0
    assert out[5] == (3, round(1 - 1 / 3, 6))  # "m m m" ×3 → 1 distinct


def test_ngram_topk_counts_and_ties(spark, docs):
    rows = C.ngram_topk(docs, n=3, k=3).collect()
    # "c d e" (docs 1,3) and "m m m" (×3 in doc 5) lead
    assert rows[0].gram == "m m m" and rows[0].c == 3
    assert rows[1].gram == "c d e" and rows[1].c == 2
    # remaining all count 1 → lexicographically smallest gram third
    assert rows[2].c == 1


def test_duplicated_spans_crafted(spark):
    """Shared 8-token span across docs is found; unique text is not;
    n_occ counts occurrences, n_docs distinct documents."""
    from spark_tensors_spark.pipeline import corpus

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (0, f"intro {shared} tail words here"),
            (1, f"other head {shared} closing"),
            (2, "completely unrelated text with no repeated span at all x y"),
            (3, f"{shared} {shared} doubled inside one doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r.gram: r for r in corpus.duplicated_spans(docs, n=8).collect()}
    assert shared in rows
    assert rows[shared].n_docs == 3
    # doc 3 contains the span 3 times as an 8-gram? the doubled text
    # yields overlapping grams; count occurrences of the exact gram
    assert rows[shared].n_occ >= 4
    assert all(r.n_docs > 1 for r in rows.values())


def test_bm25_hand_computation_and_ranking(spark):
    """BM25 on a crafted 4-doc corpus equals the hand formula (Lucene
    idf, k1=1.2, b=0.75) and ranks the term-dense short doc first."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    from spark_tensors_spark.pipeline import corpus

    docs = spark.createDataFrame(
        [
            (0, "join join join"),                    # dense, short
            (1, "join scan filler filler filler filler filler filler"),
            (2, "filler filler filler filler"),       # no query terms
            (3, "scan"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           corpus.bm25_topk(docs, ("join", "scan"), k=10).collect()}
    assert 2 not in out                      # no matching terms, no row
    assert set(out) == {0, 1, 3}
    assert out[0].n_terms == 1 and out[1].n_terms == 2

    def bm25(pairs, dl, n=4, avgdl=(3 + 8 + 4 + 1) / 4, k1=1.2, b=0.75):
        s = 0.0
        for tf, df in pairs:
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            contrib = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
            )
            s += float(__import__("decimal").Decimal(repr(contrib))
                       .quantize(__import__("decimal").Decimal("1E-12")))
        return round(s, 6)

    # doc 0: tf(join)=3, df(join)=2, dl=3; doc 3: tf(scan)=1, df=2, dl=1
    assert abs(out[0].bm25 - bm25([(3, 2)], 3)) < 2e-6
    assert abs(out[3].bm25 - bm25([(1, 2)], 1)) < 2e-6
    assert abs(out[1].bm25 - bm25([(1, 2), (1, 2)], 8)) < 2e-6
    # ranking: short dense doc first
    ranked = sorted(out.values(), key=lambda r: (-r.bm25, r.doc_id))
    assert ranked[0].doc_id in (0, 3)


def test_compression_signal_separates_boilerplate(spark):
    """Repetitive text compresses well below prose; ratios are sane and
    the empty doc is safe."""
    from spark_tensors_spark.pipeline.text import compression_signal

    docs = spark.createDataFrame(
        [
            (0, "spam " * 200),                       # highly repetitive
            (1, "The quarterly report outlines a diverse range of "
                "operational findings, strategic considerations, and "
                "unanticipated market shifts across regions." * 2),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_signal(docs).collect()}
    assert out[2].n_chars == 0 and out[2].ratio == 0.0
    assert 0 < out[0].ratio < out[1].ratio <= 1.2
    assert out[0].ratio < 0.3  # boilerplate band
    assert out[0].n_zlib < out[1].n_zlib


def test_compression_signal_numeric_carry_col(spark):
    """carry_cols keep their SOURCE types (a bigint group key used to
    be hardcoded as string in the Arrow output schema)."""
    from spark_tensors_spark.pipeline.text import compression_signal

    docs = spark.createDataFrame(
        [(0, 7, "alpha beta gamma"), (1, 9, "x " * 50)],
        "doc_id long, grp long, text string",
    )
    out = compression_signal(docs, carry_cols=("grp",))
    assert dict(out.dtypes)["grp"] == "bigint"
    got = {r.doc_id: r.grp for r in out.collect()}
    assert got == {0: 7, 1: 9}


def test_bm25_guards(spark):
    """Empty query_terms raises a clear error; NULL text is treated as
    an empty doc (no -1 dl corrupting Σdl) and never scores."""
    import pytest

    from spark_tensors_spark.pipeline import corpus

    docs = spark.createDataFrame(
        [(0, "join scan"), (1, None), (2, "join")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="non-empty"):
        corpus.bm25_topk(docs, ())
    out = {r.doc_id: r for r in
           corpus.bm25_topk(docs, ("join",), k=10).collect()}
    assert set(out) == {0, 2}
    # avgdl uses dl=0 (not -1) for the NULL doc: N=3, Σdl = 2+0+1 = 3,
    # so the two scoring docs see avgdl=1.0; with dl=2 doc 0 scores
    # strictly below doc 2 (same tf/df, longer doc)
    assert out[2].bm25 > out[0].bm25


def test_zlib_compression_rollup_golden(spark):
    """The zlib per-source rollup doc_compression_stats returned before
    r10 (the declared query is now the ORACLED exact shingle-dictionary
    proxy; zlib byte counts are library-specific).  Same computation,
    same r9 digest — the library-backed operator's contract is
    unchanged."""
    import hashlib

    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline.text import compression_signal
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import normalize

    docs = load_table(spark, SF_SMOKE, "documents")
    sig = compression_signal(docs, carry_cols=("source",))
    df = (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,12)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
            F.sum((F.col("ratio") < 0.3).cast("long")).alias("n_boiler"),
        )
        .orderBy("source")
    )
    cols, out = normalize(df.columns, [tuple(r) for r in df.collect()])
    got = hashlib.md5(repr((cols, out)).encode()).hexdigest()
    assert (len(out), got) == (20, "b81109d991de1252ccdd08240e004afb")


def test_max_dup_spans_property(spark):
    """VERDICT r14 acceptance property: every maximal span consists
    ONLY of flagged 8-grams (each window inside it appears in >=2
    docs), and it is MAXIMAL (the window just before/after the run is
    not flagged or out of range).  Crafted corpus: a 12-token shared
    block (=> one 12-token span, 5 flagged windows) plus an 8-token
    shared block, embedded in distinct filler."""
    shared_a = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    shared_b = "t1 t2 t3 t4 t5 t6 t7 t8"
    texts = [
        (0, f"f0a f0b {shared_a} f0c f0d {shared_b} f0e"),
        (1, f"g0a {shared_a} g0b g0c g0d"),
        (2, f"h0a h0b h0c {shared_b} h0d h0e h0f"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    spans = C.max_dup_spans(docs, n=8).collect()
    # flagged gram set, recomputed independently
    toks = {i: t.split() for i, t in texts}
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for i, tk in toks.items():
        for p in range(len(tk) - 7):
            gram_docs[" ".join(tk[p : p + 8])].add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) > 1}

    def flagged(i, pos1):  # 1-based start position
        tk = toks[i]
        p = pos1 - 1
        if p < 0 or p + 8 > len(tk):
            return False
        return " ".join(tk[p : p + 8]) in dup

    assert spans, "crafted dups must surface"
    for r in spans:
        # run structure: n_grams consecutive flagged windows
        assert r.n_tokens == r.n_grams + 7
        for p in range(r.start_pos, r.start_pos + r.n_grams):
            assert flagged(r.doc_id, p), (r, p)
        # maximality on both sides
        assert not flagged(r.doc_id, r.start_pos - 1)
        assert not flagged(r.doc_id, r.start_pos + r.n_grams)
    # the 12-token shared block shows up as a 12-token span in docs 0,1
    lens = {(r.doc_id, r.n_tokens) for r in spans}
    assert (0, 12) in lens and (1, 12) in lens
    assert (2, 8) in lens  # the 8-token block in doc 2
    assert all(r.doc_id != 3 for r in spans)  # unique doc -> no spans
