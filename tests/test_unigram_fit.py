"""Fit-parity pin for the distributed unigram-LM hard-EM fit
(pipeline/unigram.unigram_fit_em) against a pure-Python reference that
implements the same spec — seed vocab, integer-quantized log2 costs,
smallest-k Viterbi tie-break, Viterbi-count M-step with multi-piece
pruning.  Every quantity is exact integer arithmetic, so the
comparison is EXACT equality, round for round, piece for piece
(the BPE fit's merge-for-merge parity doctrine, applied to unigram)."""

from __future__ import annotations

import re
from collections import Counter

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline.unigram import unigram_fit_em
from tests.conftest import SF_SMOKE


def py_unigram_fit(texts, rounds=2, max_multi=96, min_seed=2):
    wf: Counter = Counter()
    for t in texts:
        for tk in (t or "").split(" "):
            if tk:
                w = tk.lower()
                if re.fullmatch(r"[a-z]{1,12}", w):
                    wf[w] += 1
    c0: Counter = Counter()
    for w, f in wf.items():
        for i in range(1, len(w) + 1):
            for k in (1, 2, 3):
                if k <= i:
                    c0[w[i - k : i]] += f
    vocab = {p: c for p, c in c0.items() if len(p) == 1}
    vocab.update(
        dict(
            sorted(
                (
                    (p, c)
                    for p, c in c0.items()
                    if len(p) > 1 and c >= min_seed
                ),
                key=lambda pc: (-pc[1], pc[0]),
            )[:max_multi]
        )
    )
    out = []
    for t in range(1, rounds + 1):
        total = sum(vocab.values())
        nv = len(vocab)
        d64 = (total + nv + 1) * 64
        cost = {p: (d64 // (c + 1)).bit_length() - 1 for p, c in vocab.items()}
        counts: Counter = Counter()
        obj = 0
        tok = 0
        for w, f in wf.items():
            dp: list = [(0, [])]
            for i in range(1, len(w) + 1):
                best = None
                for k in (1, 2, 3):
                    if k <= i:
                        p = w[i - k : i]
                        if p in cost:
                            v = dp[i - k][0] - (64 * cost[p] + 1)
                            if best is None or v > best[0]:
                                best = (v, dp[i - k][1] + [p])
                dp.append(best)
            v, path = dp[-1]
            obj += f * v
            tok += f * len(path)
            for p in path:
                counts[p] += f
        out.extend((t, p, c) for p, c in counts.items())
        out.extend(
            [(t, "<obj>", obj), (t, "<tok>", tok), (t, "<vocab>", nv)]
        )
        nxt = {p: counts.get(p, 0) for p in vocab if len(p) == 1}
        nxt.update(
            {
                p: counts[p]
                for p in vocab
                if len(p) > 1 and counts.get(p, 0) >= 1
            }
        )
        vocab = nxt
    return sorted(out)


def _spark_rows(df):
    return sorted((r["round"], r["piece"], r["cnt"]) for r in df.collect())


def test_fit_parity_toy(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat today",
        "catcat the the the matmat",
        "a b c Xyz UPPER lower12 toolongawordhere",
        None,
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = _spark_rows(unigram_fit_em(docs, rounds=2, max_multi=8, min_seed=2))
    want = py_unigram_fit(texts, rounds=2, max_multi=8, min_seed=2)
    assert got == want


def test_fit_parity_sf0001(spark):
    """Exact parity on the real corpus at the DECLARED parameters —
    the same frame the driver's oracle gates."""
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = _spark_rows(unigram_fit_em(docs, rounds=2, max_multi=96, min_seed=2))
    want = py_unigram_fit(texts, rounds=2, max_multi=96, min_seed=2)
    assert got == want


def test_em_prunes_and_keeps_chars(spark):
    """Round-2 vocab = round-1 chars (always) + multi pieces that won
    Viterbi occurrences; '<vocab>' row pins the prune."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = unigram_fit_em(docs, rounds=2, max_multi=96, min_seed=2)
    rows = {(r["round"], r["piece"]): r["cnt"] for r in out.collect()}
    assert rows[(2, "<vocab>")] <= rows[(1, "<vocab>")]
    # counts rows are strictly positive Viterbi counts
    assert all(
        c > 0
        for (t, p), c in rows.items()
        if not p.startswith("<")
    )
