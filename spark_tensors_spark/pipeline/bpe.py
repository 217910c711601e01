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
    cands: list[tuple[str, str, int]],
    truncated: bool,
    known_symbols: frozenset[str] | set[str] = frozenset(),
) -> list[tuple[str, str]]:
    """Accept a prefix of the (count desc, pair asc)-ordered candidates
    that is PROVABLY identical, merge-for-merge, to what the strictly
    sequential fit would pick — so batching rounds never changes the
    learned tokenizer.

    After applying the accepted merges, every pair the sequential fit
    could prefer instead of the next disjoint candidate falls into one
    of three classes, each with a provable count bound:

    1. SYMBOL-CONFLICTING existing pairs (share a symbol with an
       accepted pair): merging only CONSUMES their adjacencies, so
       new(q) ≤ old(q) ≤ ``base`` (max conflicting count anywhere in
       the list — recomputed against the accepted set each step, since
       an equal-count conflicting pair can sort BELOW a disjoint one —
       or ≤ ``floor`` below the truncation cut).
    2. CREATED pairs (X, aᵢbᵢ) / (aᵢbᵢ, Y): each occurrence comes from
       a pre-merge adjacency (X, aᵢ) / (bᵢ, Y) — symbol-conflicting,
       so ≤ ``base`` — EXCEPT the self-chained (aᵢbᵢ, aᵢbᵢ), whose
       occurrences come from old (bᵢ, aᵢ): that reversed pair may BE
       the accepted pair itself (a run 'ddd…' under (d,d) — the r6
       ADVICE counterexample), so ``base`` also takes each accepted
       pair's reversed count (list lookup, else ``floor``).
    3. GROWING pairs — existing pairs that mention an accepted
       CONCATENATION as one of their own symbols can GAIN occurrences
       (each gain is a created adjacency, ≤ ``base``; at most one per
       side): new(q) ≤ old(q) + 2·base.  This class is only populated
       when the concat string aᵢ+bᵢ ALREADY EXISTS as a symbol, and
       BPE starts from single characters, so every multi-char symbol
       is a prior merge's concat: the caller passes ``known_symbols``
       (prior concat strings) and the threshold only pays the
       old(q) + 2·base term when an accepted concat is in it.

    Hence: accept the first candidate unconditionally (no merges
    precede it — it IS the sequential argmax); afterwards accept the
    next disjoint candidate only while its count is STRICTLY above the
    class-wise maximum (strictness also kills count-ties, where the
    (a, b) lex tie-break could favor a created pair).  Stop at the
    first disjoint candidate that fails — everything below fails too.
    Conservative by design: fewer accepts per round, never a different
    tokenizer.  Fuzzed against a faithful sequential simulation
    (tests/test_bpe.py: thousands of skewed-count corpora, plus the
    two r6 ADVICE counterexamples that falsified the old 2×-ceiling
    rule, which excluded accepted pairs' own counts and so missed
    self-chained created pairs).
    """
    if not cands:
        return []
    a0, b0, _c0 = cands[0]
    accepted = [(a0, b0)]
    used = {a0, b0, a0 + b0}
    floor = cands[-1][2] if truncated else 0
    counts = {(a, b): c for a, b, c in cands}
    for a, b, c in cands[1:]:
        # concat collision also conflicts: accepting ('a','bc') after
        # ('ab','c') would create the SAME symbol string twice in one
        # round, letting one created pair sum gains from both merges
        # (up to 2·base) — outside every class bound below
        if a in used or b in used or a + b in used:
            continue
        acc = set(accepted)
        # classes 1+2: symbol-conflicting counts (excluding accepted
        # pairs themselves — consumed, not alternatives) + reversed
        # accepted counts (self-chain bound) + truncation floor
        base = floor
        for aq, bq, cq in cands:
            if (aq, bq) in acc:
                continue
            # concat-colliding candidates (aq+bq in used) are SKIPPED
            # alternatives with un-consumed counts — they bound too
            if aq in used or bq in used or aq + bq in used:
                base = max(base, cq)
        for ai, bi in accepted:
            base = max(base, counts.get((bi, ai), floor))
        # class 3: only when an accepted concat pre-exists as a symbol
        grow = [ai + bi for ai, bi in accepted if ai + bi in known_symbols]
        threshold = base
        if grow:
            s = floor
            for aq, bq, cq in cands:
                if (aq, bq) not in acc and (aq in grow or bq in grow):
                    s = max(s, cq)
            threshold = max(base, s + 2 * base)
        if c <= threshold:
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
    round-trip amortizes by the acceptance length.  The amortization
    is corpus-dependent and modest on natural text (top pairs share
    high-frequency characters, so they conflict): provable sequential
    parity caps how aggressively any rule can batch.  A production
    32k-merge fit that accepts approximate batching (tokenizers-style
    frequency-threshold rounds, NO parity guarantee) would amortize
    ~K per round; this implementation deliberately keeps the exact
    contract — see SCALE.md.
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
            cands,
            truncated=len(cands) == want and want > 1,
            known_symbols={a + b for a, b in merges},
        )
        accepted = accepted[: n_merges - len(merges)]
        if not accepted:
            break
        for a, b in accepted:
            words = merge_pair(words, a, b)
        words = words.localCheckpoint()
        merges.extend(accepted)
    return merges
