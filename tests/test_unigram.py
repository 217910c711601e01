"""Parity of the unigram Viterbi codegen fold (pipeline/unigram.py)
against a pure-Python reference decoder, over random words and crafted
edge shapes (the test_bpe fuzz-harness model)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline.unigram import (
    MAX_PIECE,
    SENTINEL,
    viterbi_segment_stats,
)


def _ref_viterbi(word: str) -> tuple[int, int]:
    """(score, n_pieces) — independent max-sum segmentation with the
    fewest-pieces tie-break applied explicitly (not via the 64× fold),
    so it cross-checks the combined-integer encoding too."""
    n = len(word)
    dp: list[tuple[int, int] | None] = [None] * (n + 1)
    dp[0] = (0, 0)  # (score, -n_pieces) lexicographic max
    for i in range(1, n + 1):
        best = None
        for k in range(1, MAX_PIECE + 1):
            if k > i or dp[i - k] is None:
                continue
            p = word[i - k : i]
            c1, cl = ord(p[0]), ord(p[-1])
            if k == 1:
                w = 1 + c1 % 5
            else:
                c2 = ord(p[1])
                if (c1 * 5 + c2 * 3 + cl * 2 + k) % 3 != 0:
                    continue
                w = 3 * k + (c1 * 7 + cl) % 11
            cand = (dp[i - k][0] + w, dp[i - k][1] - 1)
            if best is None or cand > best:
                best = cand
        dp[i] = best
    s, negp = dp[n]
    return s, -negp


@pytest.fixture(scope="module")
def words():
    rng = random.Random(1234)
    ws = set()
    # random lowercase words over a SMALL alphabet (more multi-char
    # vocab hits) and the full one, all lengths 2..16
    for _ in range(150):
        L = rng.randint(2, 16)
        ws.add("".join(rng.choice("abcde") for _ in range(L)))
    for _ in range(100):
        L = rng.randint(2, 16)
        ws.add(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(L)
            )
        )
    # crafted: repeats, runs, palindromes
    ws |= {"aa", "abab", "aaaa", "abcabcabcabcabca", "zzzzzzzzzzzzzzzz",
           "racecar", "banana"}
    return sorted(ws)


def test_viterbi_fold_matches_python_reference(spark, words):
    df = spark.createDataFrame(
        pd.DataFrame({"word": words}), "word string"
    ).coalesce(1)
    got = {
        r.word: (r.score, r.n_pieces)
        for r in viterbi_segment_stats(df).collect()
    }
    assert len(got) == len(words)
    for w in words:
        assert got[w] == _ref_viterbi(w), w


def test_combined_encoding_separates_tiebreak(spark):
    """n_pieces < 64 always (word ≤ 16 chars), so the 64× encoding is
    a true lexicographic (score, fewest-pieces) order; the sentinel
    never leaks into reachable states."""
    df = spark.createDataFrame(
        pd.DataFrame({"word": ["q", "qq", "abcdefghijklmnop"]}),
        "word string",
    )
    rows = viterbi_segment_stats(df).collect()
    for r in rows:
        assert 1 <= r.n_pieces <= 16
        assert r.score > 0 > SENTINEL
