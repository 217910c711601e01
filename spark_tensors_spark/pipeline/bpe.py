"""Distributed BPE vocabulary induction (byte-pair-encoding merges).

The classic tokenizer-fitting algorithm (Sennrich et al. 2016) mapped
to DataFrame ops.  BPE operates on the WORD-FREQUENCY table, not the
corpus: the corpus-scale work is exactly one distinct+count aggregate
(`word_symbol_table`), after which every merge round runs on the
distinct-word table — millions of rows for a 100 TB corpus, not
trillions.  Per round:

- `pair_counts`: posexplode adjacent symbol pairs weighted by word
  frequency → hash agg (shuffle is O(distinct pairs));
- `top_pair`: deterministic argmax (count desc, pair asc) — a 1-row
  collect, the only driver data per round;
- `merge_pair`: a left fold over each word's symbol array
  (`F.aggregate` with a (acc, prev) struct accumulator) implementing
  the standard greedy left-to-right non-overlapping merge — pure
  codegen, no Python;
- the word table is `localCheckpoint`ed per round (same plan-growth
  control as the iterative trainers).

`fit_bpe` returns the ordered merge list — the learned tokenizer.
Reference parity is pinned against a pure-Python BPE in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_symbol_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(symbols array<string>, c bigint): distinct words of the corpus
    split into single-character symbols, with occurrence counts — the
    one corpus-scale aggregate of BPE fitting."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return wc.select(
        F.split(F.col("w"), "").alias("symbols"),
        F.col("c").cast("long").alias("c"),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts weighted by word
    frequency.  The explode multiplies by symbols-per-word (bounded by
    word length), never by corpus size."""
    pos = words.select(
        "symbols",
        "c",
        F.posexplode(
            F.slice("symbols", 1, F.size("symbols") - 1)
        ).alias("i", "a"),
    ).filter(F.size("symbols") >= 2)
    return (
        pos.select(
            "a",
            F.element_at("symbols", F.col("i") + 2).alias("b"),
            "c",
        )
        .groupBy("a", "b")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def top_pair(pairs: DataFrame) -> tuple[str, str, int] | None:
    """Deterministic argmax: highest count, ties by (a, b) ascending."""
    row = pairs.orderBy(
        F.col("cnt").desc(), F.col("a"), F.col("b")
    ).first()
    if row is None:
        return None
    return row["a"], row["b"], int(row["cnt"])


def merge_pair(words: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every non-overlapping left-to-right occurrence of the
    adjacent pair (a, b) into the single symbol a+b — the standard BPE
    merge, as a codegen left fold (accumulator = (acc, prev))."""
    merged = a + b

    def step(st, x):
        return (
            F.when(
                st["prev"].isNull(),
                F.struct(st["acc"].alias("acc"), x.alias("prev")),
            )
            .when(
                (st["prev"] == F.lit(a)) & (x == F.lit(b)),
                F.struct(
                    F.concat(
                        st["acc"], F.array(F.lit(merged))
                    ).alias("acc"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(st["acc"], F.array(st["prev"])).alias("acc"),
                    x.alias("prev"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("prev"),
    )
    folded = F.aggregate(
        "symbols",
        init,
        step,
        lambda st: F.when(st["prev"].isNull(), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["prev"]))
        ),
    )
    return words.select(folded.alias("symbols"), "c")


def apply_merges(
    symbols: list[str], merges: list[tuple[str, str]]
) -> list[str]:
    """Pure-Python reference of the merge fold: apply the ordered merge
    list to one word's symbol sequence (greedy left-to-right
    non-overlapping — exactly `merge_pair`'s accumulator semantics)."""
    for a, b in merges:
        out: list[str] = []
        i, n = 0, len(symbols)
        while i < n:
            if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def merge_substring_index(
    merges: list[tuple[str, str]]
) -> dict[str, list[int]]:
    """a+b → [merge ranks], for :func:`apply_merges_indexed`.  Distinct
    merges can share a concatenation (("ab","c") and ("a","bc")) —
    both ranks are kept."""
    idx: dict[str, list[int]] = {}
    for i, (a, b) in enumerate(merges):
        idx.setdefault(a + b, []).append(i)
    return idx


def apply_merges_indexed(
    symbols: list[str],
    merges: list[tuple[str, str]],
    index: dict[str, list[int]],
) -> list[str]:
    """EXACTLY :func:`apply_merges` (the ordered fold), skipping
    provable no-ops: every symbol is a contiguous substring of the
    word (merges only concatenate adjacent spans), so a merge (a, b)
    can only fire if ``a+b`` is a substring — enumerate the word's
    O(len²) substrings once, look up which merge concatenations occur,
    and fold ONLY those ranks in order.  Per-word cost drops from
    O(total_merges · len) to O(len² + hits · len): at a 32k-merge
    vocabulary and ~8-char words that is the ~100× constant cut
    (SCALE.md #11).  Skipping a non-firing merge is the identity, so
    parity with the fold is exact (pinned in tests/test_bpe.py,
    including shared-concatenation collisions)."""
    word = "".join(symbols)
    n = len(word)
    ranks: set[int] = set()
    seen: set[str] = set()
    for i in range(n):
        for j in range(i + 2, n + 1):  # a+b is at least 2 chars
            sub = word[i:j]
            if sub in seen:
                continue
            seen.add(sub)
            hit = index.get(sub)
            if hit:
                ranks.update(hit)
    return apply_merges(symbols, [merges[r] for r in sorted(ranks)])


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
) -> DataFrame:
    """TOKENIZE with a trained merge list — the apply side of BPE.

    Scale design: encoding runs over the DISTINCT-WORD table (Zipf:
    vocabulary ≪ corpus), one Arrow batch pass with the merge list in
    the task closure; the corpus then joins word → tokens (broadcast at
    real vocabulary/corpus ratios), so per-token work is paid once per
    word, not once per occurrence.  Returns (word, tokens, n_tokens).
    """
    import pandas as pd

    index = merge_substring_index(merges)

    def batch(it):
        for pdf in it:
            toks = [
                apply_merges_indexed(list(w), merges, index)
                for w in pdf[word_col].astype(str)
            ]
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "tokens": toks,
                    "n_tokens": pd.Series(
                        [len(t) for t in toks], dtype="int64"
                    ),
                }
            )

    return words.select(word_col).mapInPandas(
        batch, f"{word_col} string, tokens array<string>, n_tokens long"
    )


def top_pairs(pairs: DataFrame, k: int) -> list[tuple[str, str, int]]:
    """Top-``k`` pairs by (count desc, pair asc) — one bounded collect
    (TakeOrderedAndProject)."""
    rows = pairs.orderBy(
        F.col("cnt").desc(), F.col("a"), F.col("b")
    ).limit(k).collect()
    return [(r["a"], r["b"], int(r["cnt"])) for r in rows]


def _sequential_safe_prefix(
    cands: list[tuple[str, str, int]], truncated: bool
) -> list[tuple[str, str]]:
    """Accept a prefix of the (count desc, pair asc)-ordered candidates
    that is PROVABLY identical, merge-for-merge, to what the strictly
    sequential fit would pick — so batching rounds never changes the
    learned tokenizer.

    Conflict definition: a pair touches an accepted pair's symbols OR
    its concatenated string (merging (a, b) creates the symbol ``a+b``;
    a pre-existing pair mentioning that same string can GAIN
    occurrences, so symbol-disjointness alone is not count-invariance
    — round-6 review counterexample in tests/test_bpe.py).

    Invariants (with that definition):
    - a truly disjoint pair's count is exactly INVARIANT (its
      adjacencies are neither consumed nor created by the merges);
    - any pair the sequential fit could prefer instead must conflict,
      and its count after the accepted merges is bounded by
      old(q) + old(creator) ≤ 2·C, where C is the max CURRENT count
      over every conflicting candidate — in the full list (``ceiling``,
      recomputed against the accepted set each step: an equal-count
      conflicting pair can sort BELOW a disjoint one, so a running
      maximum over "seen so far" is unsound) or below the truncation
      cut (≤ ``floor``).

    Hence: accept the first candidate unconditionally (no merges
    precede it — it IS the sequential argmax); afterwards accept the
    next disjoint candidate only while its count is STRICTLY above
    2·max(ceiling, floor) (strictness also kills count-ties, where the
    (a, b) lex tie-break could favor a created pair).  Stop at the
    first disjoint candidate that fails — everything below fails too.
    Conservative by design: fewer accepts per round, never a different
    tokenizer.
    """
    if not cands:
        return []
    a0, b0, _c0 = cands[0]
    accepted = [(a0, b0)]
    used = {a0, b0, a0 + b0}
    floor = cands[-1][2] if truncated else 0
    for a, b, c in cands[1:]:
        if a in used or b in used:
            continue
        # max count over candidates conflicting with the accepted set —
        # excluding the accepted pairs themselves (they are consumed,
        # not alternatives the sequential fit could still pick)
        ceiling = max(
            (
                cq
                for aq, bq, cq in cands
                if (aq in used or bq in used)
                and (aq, bq) not in accepted
            ),
            default=0,
        )
        if c <= 2 * max(ceiling, floor):
            break
        accepted.append((a, b))
        used.update((a, b, a + b))
    return accepted


def fit_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    merges_per_round: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list.

    ``merges_per_round=1`` is the plain sequential loop (one
    pair-count aggregate + one 1-row collect per merge).  That is one
    Spark job pair PER MERGE — fine for a handful of merges, a cliff
    for a real 32k-merge tokenizer fit (32k aggregates over the
    distinct-word table).  ``merges_per_round=K`` amortizes WITHOUT
    changing the result: each round runs ONE pair-count aggregate,
    collects the top-K candidates (bounded,
    ``TakeOrderedAndProject``), and accepts the
    ``_sequential_safe_prefix`` — a prefix provably identical to the
    sequential fit's next picks (see its docstring for the invariant
    argument; parity is also pinned merge-for-merge in
    tests/test_bpe.py).  All accepted merges apply as chained codegen
    folds under a single checkpoint, so the per-merge driver
    round-trip amortizes by the acceptance length (corpus-dependent;
    Zipf pair-count decay keeps it well above 1).
    """
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    words = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        cands = [
            c for c in top_pairs(pair_counts(words), want) if c[2] >= 1
        ]
        accepted = _sequential_safe_prefix(
            cands, truncated=len(cands) == want and want > 1
        )
        accepted = accepted[: n_merges - len(merges)]
        if not accepted:
            break
        for a, b in accepted:
            words = merge_pair(words, a, b)
        words = words.localCheckpoint()
        merges.extend(accepted)
    return merges
