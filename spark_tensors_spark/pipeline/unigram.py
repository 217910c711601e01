"""Unigram-LM tokenizer segmentation (SentencePiece-unigram family).

The OTHER production tokenizer besides BPE: segment a word into the
vocabulary pieces that maximize the summed piece score (SentencePiece
runs EM over piece log-probs, then Viterbi-decodes; here the vocab and
its integer weights are FIXED AND FORMULA-DEFINED — the pseudo-planes
doctrine — so the decode itself is deterministic integer arithmetic
that a SQL engine can replay exactly, and EM is explicitly out of
scope).

Vocabulary (a pure function of the piece string, no lookup table):
  - every single character, weight ``1 + (ascii % 5)``;
  - a len-k piece (k = 2..4) is IN-vocab iff
    ``(c1*5 + c2*3 + cl*2 + k) % 3 == 0`` (c1/c2/cl = codepoints of
    the first/second/last char), weight ``3k + (c1*7 + cl) % 11``.

Viterbi objective with deterministic tie-break folded into ONE integer:
each piece adds ``64*weight − 1``, so maximizing the total is exactly
lexicographic (max Σweight, then FEWEST pieces); n_pieces ≤ word length
≤ 16 < 64 keeps the two orders separable.  dp[i] (best over prefixes)
is computed with a zero-seeded array fold — pure codegen, no UDF, the
whole decode runs at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4
MAX_WORD = 16
SENTINEL = -(10**15)


def _char_w(c: Column) -> Column:
    return (F.lit(1) + F.ascii(c) % 5).cast("long")


def _piece_w(p: Column, k: int) -> Column:
    c1 = F.ascii(p)
    cl = F.ascii(F.substring(p, k, 1))
    return (F.lit(3 * k) + (c1 * 7 + cl) % 11).cast("long")


def _piece_in_vocab(p: Column, k: int) -> Column:
    c1 = F.ascii(p)
    c2 = F.ascii(F.substring(p, 2, 1))
    cl = F.ascii(F.substring(p, k, 1))
    return ((c1 * 5 + c2 * 3 + cl * 2 + F.lit(k)) % 3) == 0


def viterbi_combined(word: Column) -> Column:
    """The combined dp value ``64·score − n_pieces`` of the best
    segmentation of ``word`` (assumed non-empty, length ≤ MAX_WORD)."""
    sent = F.lit(SENTINEL).cast("long")

    def step(acc: Column, i: Column) -> Column:
        cands = []
        for k in range(1, MAX_PIECE + 1):
            p = word.substr(i - F.lit(k - 1), F.lit(k))
            if k == 1:
                add = _char_w(p) * 64 - 1
                valid = i >= k
            else:
                add = _piece_w(p, k) * 64 - 1
                valid = (i >= k) & _piece_in_vocab(p, k)
            # defensive clamp: for i < k the index i-k+1 is ≤ 0 —
            # element_at(arr, 0) is a runtime error in Spark and a
            # negative index silently reads from the END — today only
            # CASE WHEN's lazy evaluation of the `valid` gate keeps the
            # bad index from evaluating, which any refactor that hoists
            # `prev` (or engine-side CSE) would break.  The clamp makes
            # the expression total; when(valid, ...) stays the semantic
            # guard (a clamped read is always discarded).
            prev = F.coalesce(
                F.element_at(
                    acc,
                    F.greatest(F.lit(1), (i - F.lit(k) + 1)).cast("int"),
                ),
                sent,
            )
            cands.append(F.when(valid, prev + add).otherwise(sent))
        return F.concat(acc, F.array(F.greatest(*cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        step,
    )
    return F.element_at(dp, -1)


def viterbi_segment_stats(
    words: DataFrame, word_col: str = "word"
) -> DataFrame:
    """(word, score, n_pieces) of the max-score segmentation of each
    word — score = Σ piece weights, ties broken toward fewer pieces.

    Scale shape: one codegen projection per word (the dp fold inlines
    into whole-stage codegen) — no shuffle, no UDF, no vocab join; at
    100 TB the decode cost rides the scan like every other scan-side
    text operator."""
    c = viterbi_combined(F.col(word_col))
    out = words.select(
        F.col(word_col).alias("word"), c.alias("_c")
    )
    npieces = F.lit(64) - F.col("_c") % 64
    return out.select(
        "word",
        ((F.col("_c") + npieces) / 64).cast("long").alias("score"),
        npieces.cast("long").alias("n_pieces"),
    )
