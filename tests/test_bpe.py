"""Distributed BPE fitting vs a pure-Python reference implementation
(the Sennrich et al. 2016 algorithm: word-frequency dict, greedy
left-to-right non-overlapping merges, argmax pair by count with a
deterministic (a, b) tie-break)."""

from __future__ import annotations

from collections import Counter

from spark_tensors_spark.pipeline import bpe


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new wider wide",
    "low newer wide wide lowest",
    "banana bandana ban banana",
]


def test_fit_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe.fit_bpe(docs, n_merges=8)
    want = _ref_bpe(TEXTS, n_merges=8)
    assert got == want, (got, want)


def test_fit_bpe_batched_rounds_parity(spark):
    """The scale path (merges_per_round=K: ONE pair-count aggregate +
    one bounded collect per round instead of per merge) produces the
    SAME merge list, merge-for-merge, as the exact sequential fit —
    the class-wise acceptance rule (see _sequential_safe_prefix) only
    batches merges it can prove the sequential fit would pick next."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    seq = bpe.fit_bpe(docs, n_merges=8)
    for k in (3, 8):
        batched = bpe.fit_bpe(docs, n_merges=8, merges_per_round=k)
        assert batched == seq, (k, batched, seq)


def test_sequential_safe_prefix_rule():
    """The acceptance rule: first candidate always; a disjoint
    candidate is accepted only STRICTLY above the class-wise ceiling —
    max over symbol-conflicting counts anywhere in the list (they can
    only LOSE occurrences), reversed-accepted counts (self-chained
    created pairs), and the truncation floor; pairs mentioning an
    accepted concat that pre-exists as a symbol add old(q) + 2*base
    (see _sequential_safe_prefix's class argument)."""
    cands = [
        ("a", "b", 10),   # accepted (first = sequential argmax)
        ("b", "c", 9),    # conflict (shares b): base 9
        ("d", "e", 8),    # disjoint but 8 <= 9 -> stop
        ("f", "g", 6),
    ]
    assert bpe._sequential_safe_prefix(cands, truncated=False) == [
        ("a", "b")
    ]
    # a conflicting pair BELOW the disjoint candidate bounds it — but
    # 8 is STRICTLY above the 7-count conflict (which can only lose
    # occurrences) and no created pair can exceed 7 either: accept
    cands2 = [
        ("a", "b", 10),
        ("d", "e", 8),
        ("b", "c", 7),
    ]
    assert bpe._sequential_safe_prefix(cands2, truncated=False) == [
        ("a", "b"), ("d", "e")
    ]
    # ...whereas a TIE with the conflict blocks (created pairs can
    # reach the conflicting count and win the lex tie-break)
    assert bpe._sequential_safe_prefix(
        [("a", "b", 10), ("d", "e", 7), ("b", "c", 7)], truncated=False
    ) == [("a", "b")]
    # the reversed accepted pair bounds self-chained created pairs:
    # merging (b,a) on 'abab...' creates (ba,ba) up to old(a,b)'s count
    assert bpe._sequential_safe_prefix(
        [("b", "a", 10), ("a", "b", 9), ("d", "e", 8)], truncated=False
    ) == [("b", "a")]
    # self-adjacent accepted pair (d,d) IS its own reversal: its own
    # count bounds created (dd,dd) — the r6 ADVICE hole
    assert bpe._sequential_safe_prefix(
        [("d", "d", 18), ("c", "b", 2)], truncated=False
    ) == [("d", "d")]
    # same-round concat collision conflicts: ('a','bc') after
    # ('ab','c') would create the same 'abc' symbol twice
    assert bpe._sequential_safe_prefix(
        [("ab", "c", 10), ("a", "bc", 9), ("x", "y", 1)], truncated=False
    ) == [("ab", "c")]
    # a concat pre-existing as a symbol raises the threshold to
    # old(q) + 2*base for pairs mentioning it
    assert bpe._sequential_safe_prefix(
        [("a", "b", 10), ("x", "ab", 3), ("d", "e", 8)],
        truncated=False,
        known_symbols={"ab"},
    ) == [("a", "b")]   # 8 <= 3 + 2*3 = 9 -> stop
    assert bpe._sequential_safe_prefix(
        [("a", "b", 20), ("d", "e", 10), ("x", "ab", 3)],
        truncated=False,
        known_symbols={"ab"},
    ) == [("a", "b"), ("d", "e")]   # 10 > 3 + 2*3
    # zero conflicts anywhere: every disjoint candidate accepts
    assert bpe._sequential_safe_prefix(
        [("a", "b", 10), ("d", "e", 9), ("f", "g", 4)], truncated=False
    ) == [("a", "b"), ("d", "e"), ("f", "g")]
    # pairs touching an accepted CONCATENATION conflict (count can grow)
    assert bpe._sequential_safe_prefix(
        [("a", "b", 10), ("x", "ab", 9), ("d", "e", 8)], truncated=False
    ) == [("a", "b")]
    # truncation floor: unseen pairs bound created-pair counts too
    assert bpe._sequential_safe_prefix(
        [("a", "b", 10), ("d", "e", 8), ("f", "g", 8)], truncated=True
    ) == [("a", "b")]
    assert bpe._sequential_safe_prefix(
        [("a", "b", 50), ("d", "e", 40), ("f", "g", 8)], truncated=True
    ) == [("a", "b"), ("d", "e")]


def test_fit_bpe_batched_tie_counterexample(spark):
    """Round-6 review counterexample: corpus 'aybc' — all three initial
    pairs tie, and the sequential fit's SECOND pick is the CREATED pair
    ('ay','b') (ties at the same count, wins the lex tie-break).  A
    disjoint-only acceptance rule wrongly batched ('b','c') second;
    the 2x-ceiling rule must fall back to one merge per round here and
    stay merge-for-merge sequential."""
    docs = spark.createDataFrame([(0, "aybc aybc")],
                                 "doc_id long, text string")
    seq = bpe.fit_bpe(docs, n_merges=3)
    assert seq == [("a", "y"), ("ay", "b"), ("ayb", "c")]
    for k in (2, 3):
        assert bpe.fit_bpe(docs, n_merges=3, merges_per_round=k) == seq


def _sim_pair_counts(vocab):
    pairs = Counter()
    for syms, c in vocab.items():
        for x, y in zip(syms, syms[1:]):
            pairs[(x, y)] += c
    return pairs


def _sim_apply(vocab, a, b):
    nv = {}
    for syms, c in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        nv[tuple(out)] = nv.get(tuple(out), 0) + c
    return nv


def _sim_batch_fit(words: dict[str, int], n: int, k: int):
    """Pure-Python mirror of fit_bpe's batched loop (same candidate
    ordering, truncation flag, known-symbol tracking) — lets the
    parity fuzz run thousands of corpora without Spark."""
    vocab = {tuple(w): c for w, c in words.items()}
    merges, known = [], set()
    while len(merges) < n:
        want = min(k, n - len(merges))
        p = _sim_pair_counts(vocab)
        cands = [
            (a, b, c)
            for (a, b), c in sorted(
                p.items(), key=lambda kv: (-kv[1], kv[0])
            )[:want]
            if c >= 1
        ]
        acc = bpe._sequential_safe_prefix(
            cands,
            truncated=(len(cands) == want and want > 1),
            known_symbols=known,
        )
        acc = acc[: n - len(merges)]
        if not acc:
            break
        for a, b in acc:
            vocab = _sim_apply(vocab, a, b)
            known.add(a + b)
        merges.extend(acc)
    return merges


def _sim_seq_fit(words: dict[str, int], n: int):
    wc = Counter()
    for w, c in words.items():
        wc[w] += c
    texts = [" ".join(w for w in [wd] * c) for wd, c in wc.items()]
    return _ref_bpe(texts, n)


def test_batched_advice_counterexamples():
    """The two corpora that falsified the old 2x-ceiling rule (r6
    ADVICE): a self-adjacent accepted pair creates (dd,dd) bounded by
    its OWN count (which the old ceiling excluded), and a run corpus
    where batching learned a merge the sequential fit never picks."""
    for words, n, k in [
        ({"bbb": 6, "cc": 6}, 3, 3),
        ({"cbcb": 1, "ddddddd": 3}, 4, 5),
    ]:
        seq = _sim_seq_fit(words, n)
        got = _sim_batch_fit(words, n, k)
        assert got == seq, (words, got, seq)


def test_batched_parity_fuzz():
    """Thousands of skewed-count random corpora (the shape that found
    the r6 unsoundness within ~2500 trials) — batched fit must equal
    the sequential fit merge-for-merge on every one."""
    import random

    rng = random.Random(7)
    for t in range(4000):
        mode = t % 5
        if mode == 0:
            alpha, wl, nw, cmax = "ab", 8, 4, 9
        elif mode == 1:
            alpha, wl, nw, cmax = "abc", 6, 5, 9
        elif mode == 2:
            alpha, wl, nw, cmax = "abcd", 10, 3, 50
        elif mode == 3:
            alpha, wl, nw, cmax = "ab", 12, 2, 99
        else:
            alpha, wl, nw, cmax = "ab", 14, 5, 20
        words: dict[str, int] = {}
        for _ in range(rng.randint(1, nw)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, wl))
            )
            words[w] = rng.randint(1, cmax)
        n = rng.randint(1, 10)
        k = rng.randint(2, 6)
        seq = _sim_seq_fit(dict(words), n)
        got = _sim_batch_fit(dict(words), n, k)
        assert got == seq, (t, words, n, k, got, seq)


def test_fit_bpe_batched_randomized_parity(spark):
    """Randomized corpora over a tiny alphabet (maximal tie pressure):
    batched fitting must equal the sequential fit merge-for-merge."""
    import random

    rng = random.Random(5)
    for trial in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 10))
        ]
        docs = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        seq = bpe.fit_bpe(docs, n_merges=5)
        for k in (2, 4):
            got = bpe.fit_bpe(docs, n_merges=5, merges_per_round=k)
            assert got == seq, (trial, k, words, got, seq)


def test_merge_pair_greedy_left_nonoverlapping(spark):
    """'aaa' with pair (a,a) merges LEFT-greedily to [aa, a] — the
    overlap rule every real BPE implements."""
    words = spark.createDataFrame(
        [(["a", "a", "a"], 2), (["a", "a", "a", "a"], 1), (["b"], 3)],
        "symbols array<string>, c long",
    )
    out = {
        tuple(r["symbols"]): r["c"]
        for r in bpe.merge_pair(words, "a", "a").collect()
    }
    assert out == {("aa", "a"): 2, ("aa", "aa"): 1, ("b",): 3}


def test_word_symbol_table_counts(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab b"), (1, "b ab")], "doc_id long, text string"
    )
    rows = {
        tuple(r["symbols"]): r["c"]
        for r in bpe.word_symbol_table(docs).collect()
    }
    assert rows == {("a", "b"): 3, ("b",): 2}


def test_encode_words_matches_iterated_merges(spark):
    """The APPLY path (`encode_words` with the learned merge list) must
    reproduce EXACTLY the word table the fit loop built by iterating
    `merge_pair` — two different code paths (Arrow Python vs codegen
    fold), one answer."""
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide low",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe.fit_bpe(docs, n_merges=6)
    assert merges  # the corpus has mergeable pairs

    # iterate merge_pair (the fit loop's own machinery)
    words = bpe.word_symbol_table(docs)
    for a, b in merges:
        words = bpe.merge_pair(words, a, b)
    iterated = {
        "".join(r.symbols): tuple(r.symbols) for r in words.collect()
    }

    vocab = spark.createDataFrame(
        [(w,) for w in iterated], "w string"
    )
    encoded = {
        r.w: tuple(r.tokens)
        for r in bpe.encode_words(vocab, merges).collect()
    }
    assert encoded == iterated


def test_apply_merges_order_matters():
    """Merges apply in LEARNED order (later merges can consume earlier
    merge outputs)."""
    assert bpe.apply_merges(list("abc"), [("a", "b"), ("ab", "c")]) == ["abc"]
    assert bpe.apply_merges(list("abc"), [("ab", "c"), ("a", "b")]) == ["ab", "c"]
    # greedy left-to-right non-overlap
    assert bpe.apply_merges(list("aaa"), [("a", "a")]) == ["aa", "a"]


def test_apply_merges_indexed_exact_parity():
    """The substring-indexed apply is EXACTLY the ordered fold on
    randomized merge tables — including merges that only fire because
    an earlier merge created their symbols, shared-concatenation
    collisions, and merges that never fire."""
    import random

    rng = random.Random(11)
    alphabet = "abcd"
    # include a collision: ("ab","c") and ("a","bc") share concat "abc"
    fixed = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc"),
             ("c", "d"), ("ab", "cd"), ("d", "a")]
    for trial in range(200):
        merges = list(fixed)
        rng.shuffle(merges)
        extra = [
            (
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 2))),
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 2))),
            )
            for _ in range(rng.randint(0, 5))
        ]
        merges += extra
        index = bpe.merge_substring_index(merges)
        word = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 10)))
        want = bpe.apply_merges(list(word), merges)
        got = bpe.apply_merges_indexed(list(word), merges, index)
        assert got == want, (word, merges, got, want)


def test_encode_words_uses_indexed_path(spark):
    """encode_words (now routed through apply_merges_indexed) still
    matches the plain fold on real fitted merges."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe.fit_bpe(docs, n_merges=8)
    words = spark.createDataFrame(
        [("lowest",), ("banana",), ("unseen",), ("w",)], "w string"
    )
    got = {r.w: list(r.tokens) for r in
           bpe.encode_words(words, merges).collect()}
    for w in got:
        assert got[w] == bpe.apply_merges(list(w), merges), w


def test_fixture_corpus_is_pipe_free():
    """The doc_bpe_encode_stats oracle's replace-based merge is only
    boundary-safe because '|' never occurs in the documents text —
    verify that precondition at every scale so regenerated testdata
    cannot silently break the replay."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet') "
            f"WHERE contains(text, '|')"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} documents contain '|'"
