"""Corpus-level text analysis: word n-grams, benchmark decontamination,
TF-IDF term scoring, within-document repetition stats, corpus n-gram
counts (north-star M4 — the analysis passes a pre-training corpus gets
between dedup and packing).

Everything is pure Spark SQL (codegen, scan-side n-gram expansion) plus
ordinary shuffled aggregates — no Python in any hot path.  The one
broadcast is the benchmark n-gram set in :func:`decontaminate`, which is
small by construction (eval suites are MBs, the corpus is the 100 TB
side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.pipeline.text import tokens_col


def word_ngrams_col(
    text: Column | str = "text", n: int = 3
) -> Column:
    """Space-joined word n-grams of the whitespace tokens; empty array
    when the document has fewer than ``n`` tokens."""
    toks = tokens_col(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with the
    benchmark set (the standard eval-decontamination rule: drop training
    docs that could leak test data).

    The benchmark n-gram set is broadcast — eval suites are tiny next to
    the corpus — so the corpus side is one scan + one broadcast
    left-semi join; no shuffle of corpus data at all.
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams_col(text_col, n)).alias("g")
        )
        .distinct()
    )
    hit_ids = (
        corpus.select(
            F.col(id_col), F.explode(word_ngrams_col(text_col, n)).alias("g")
        )
        .join(F.broadcast(bench_grams), "g")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return corpus.join(hit_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce("contaminated", F.lit(False))
    )


def decontaminate_ratio(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    tau: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlap-RATIO decontamination: a corpus document is flagged when
    more than ``tau`` of its DISTINCT word ``n``-grams appear in the
    benchmark set — the graded refinement of :func:`decontaminate`'s
    binary any-hit rule (the GPT-3-appendix-C family of contamination
    filters measures overlap fractions; one shared n-gram in a long
    document is usually noise, a 30% overlap is a leak).

    Scale shape: per-doc distinct grams come from ``array_distinct``
    in ONE scan projection — ``explode_outer`` carries (n_grams, gram)
    together so the tokenize→n-gram→distinct work runs exactly once
    per corpus pass (it used to run twice: once for the size, once for
    the hit stream); the benchmark gram set broadcasts onto that
    stream as a map-side LEFT join (no shuffle), and (n_grams, n_hit)
    fall out of one map-side-combinable hash aggregate keyed on the
    doc id — the shuffle is doc-sized, not gram-sized, thanks to
    partial aggregation.  The ratio is a single exact IEEE division of
    two BIGINTs, identical on every engine.

    Returns ``corpus`` plus (n_grams, n_hit, overlap_ratio,
    contaminated); documents with fewer than ``n`` tokens have
    n_grams = 0 and ratio 0.0 (never flagged)."""
    distinct_grams = F.array_distinct(word_ngrams_col(text_col, n))
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams_col(text_col, n)).alias("g")
        )
        .distinct()
        .withColumn("_bench_hit", F.lit(1).cast("long"))
    )
    gram_stream = corpus.select(
        F.col(id_col),
        F.size(distinct_grams).cast("long").alias("n_grams"),
        F.explode_outer(distinct_grams).alias("g"),
    )
    stats = (
        gram_stream.join(F.broadcast(bench_grams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.coalesce(F.sum("_bench_hit"), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
        .withColumn(
            "overlap_ratio",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "contaminated", F.col("overlap_ratio") > F.lit(float(tau))
        )
    )
    return corpus.join(stats, id_col, "left")


def dsir_features_col(text: Column | str = "text") -> Column:
    """The DSIR feature stream of a document: its whitespace unigrams
    plus space-joined bigrams (Xie et al. 2023 use hashed uni+bigram
    bag-of-words for both the target and raw models)."""
    return F.concat(tokens_col(text), word_ngrams_col(text, 2))


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw-corpus document by the log likelihood ratio of a hashed
    n-gram bag-of-words model of the TARGET domain over one of the RAW
    corpus —

        log w(doc) = Σ_feature [ln p̂_target(bucket) − ln p̂_raw(bucket)]

    with uni+bigram features hashed into ``n_buckets`` buckets
    (portable md5 hash, identical in DuckDB) and add-one smoothing on
    both models.  High-weight documents look like the target domain;
    resampling ∝ w is the DSIR selection step (the weights themselves
    are the oracle-checked artifact; pair with
    ``es_sample_key_col``-style weighted sampling to materialize the
    resample).

    Cross-engine doctrine: each bucket's two ln terms are snapped to
    DECIMAL(18,12) separately (the lm_perplexity per-token rule), so
    the per-doc weight is an EXACT decimal sum both engines replay;
    the single final cast+round emits it as a double.

    Scale shape: two bucket-count aggregates (B-bounded outputs, one
    pass over each side's feature stream), the ≤B-row log-ratio table
    broadcasts onto the corpus feature stream (map-side join, no
    shuffle), and the per-doc sum is one map-side-combinable hash
    aggregate — the corpus is scanned once per model and once for
    scoring, nothing else is data-sized.

    Returns (id_col, n_feat, log_w) for raw docs with ≥1 feature."""
    from spark_tensors_spark.functions.sketches import portable_hash60_col

    def feats(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(dsir_features_col(text_col)).alias("g"),
        ).select(
            id_col,
            (portable_hash60_col(F.col("g")) % n_buckets).alias("b"),
        )

    raw_feats = feats(corpus)
    # the two fitted models are ≤n_buckets rows but are each consumed
    # twice (the totals and the ratio join); without a barrier each
    # consumer re-runs the full tokenize+explode feature stream behind
    # them, turning 2 corpus passes into 4
    q = (
        raw_feats.groupBy("b")
        .agg(F.count(F.lit(1)).alias("q_c"))
        .localCheckpoint()
    )
    p = (
        feats(target)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("p_c"))
        .localCheckpoint()
    )
    tot = q.agg(F.sum("q_c").alias("q_tot")).crossJoin(
        p.agg(F.sum("p_c").alias("p_tot"))
    )
    # every corpus-doc bucket appears in q by construction, so the
    # ratio table is keyed on q's buckets; absent target buckets
    # smooth to (0+1)
    snap = "decimal(18,12)"
    lr = (
        q.join(p, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce("p_c", F.lit(0)) + 1).cast("double")
                    / (F.col("p_tot") + n_buckets).cast("double")
                ).cast(snap)
                - F.log(
                    (F.col("q_c") + 1).cast("double")
                    / (F.col("q_tot") + n_buckets).cast("double")
                ).cast(snap)
            ).alias("lr"),
        )
    )
    return (
        raw_feats.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.round(F.sum("lr").cast("double"), 6).alias("log_w"),
        )
    )


def rrf_fuse(
    rankings,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    standard hybrid-retrieval combiner (lexical ⊕ semantic lists in
    every RAG stack): score(d) = Σ_lists 1/(k + rank_l(d)), k=60.

    Exactness: each 1/(k+rank) term is one IEEE division of two exact
    integers snapped to DECIMAL(18,12) (the lm_perplexity per-term
    rule), so the fused sum is an exact decimal both engines replay;
    ranks must be 1-based exact integers (rank on integer keys, never
    on rounded floats — a float-ranked list can flip on a ulp and RRF
    amplifies rank flips).

    Scale shape: candidate lists are top-N frames (bounded), so the
    union + id-keyed hash aggregate is list-sized — never corpus-sized.

    Returns (id_col, n_lists, best_rank, rrf_score)."""
    contribs = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("_rk"),
            (
                F.lit(1.0)
                / (F.lit(k) + F.col(rank_col)).cast("double")
            ).cast("decimal(18,12)").alias("_c"),
        )
        for r in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return allc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.min("_rk").alias("best_rank"),
        F.round(F.sum("_c").cast("double"), 6).alias("rrf_score"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval scoring of every document against a fixed
    query-term set — the classic lexical ranking function (Robertson &
    Zaragoza 2009), with the Lucene idf form
    ``ln((N − df + ½)/(df + ½) + 1)``.

    Scale shape: the token explode filters to the query terms AT THE
    SCAN (the corpus-sized token stream never shuffles un-filtered);
    df / N / Σdl are three tiny broadcast aggregates; scoring is one
    codegen projection; the global top-k is TakeOrderedAndProject.
    Cross-engine doctrine: each per-term contribution is snapped to
    DECIMAL(18,12) before the sum, so aggregation order cannot flip the
    6th decimal.  Returns (id, n_terms, bm25) top-``k`` by (bm25 desc,
    id).
    """
    qset = list(query_terms)
    if not qset:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    # NULL text would yield F.size() = -1 under non-ANSI mode,
    # silently corrupting dl and the Σdl corpus statistic — treat a
    # NULL document as empty instead
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    # filter INSIDE the token array before exploding: the explode emits
    # only query-term hits, not the whole corpus token stream
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: t.isin(*qset)).alias("_qt"),
    )
    tok = base.select(id_col, "dl", F.explode("_qt").alias("term"))
    # dl rides through the grouping key (functional in id) — no join
    # back to a length table
    tf = tok.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = (
        tok.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # N and Σdl in ONE tiny broadcast frame
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    contrib = (
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + (F.lit(b) * F.col("dl"))
                / (F.col("sum_dl") / F.col("n_docs"))
            )
        )
    ).cast("decimal(18,12)")
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", contrib)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("contrib").cast("double"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def lm_perplexity(
    docs: DataFrame,
    train_mod: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style LM quality signal (Wenzek et al. 2020): score each
    document by its log-perplexity under a language model fitted on a
    held-out slice of the corpus — high perplexity ⇒ unusual/noisy
    text, the classic pre-training quality filter beyond heuristics.

    Simplified honestly: a unigram LM with add-one smoothing over the
    training slice's vocabulary (CCNet uses KenLM 5-gram; the fit →
    score → filter pipeline shape is identical).  Train slice =
    ``doc_id % train_mod == 0``; every other document is scored:

        log_ppl(doc) = −(1/|doc|) Σ_w ln((cnt(w)+1) / (T + V + 1))

    with cnt(w)=0 for out-of-vocabulary tokens.

    Scale shape: the fit is ONE corpus aggregate over the train slice
    (term counts); the model (vocab-sized, bounded) broadcasts to the
    scoring scan, so the corpus token stream joins map-side and
    shuffles only per-doc partial sums.  Cross-engine doctrine: every
    per-token ln-contribution is DECIMAL(18,12)-snapped before the sum
    (the bm25/adamic-adar ln doctrine).

    Returns (id, n_tokens, log_ppl) for scored docs with ≥1 token.
    """
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    d = docs.select(F.col(id_col), toks.alias("_tk"))
    cnt = (
        d.filter(F.col(id_col) % train_mod == 0)
        .select(F.explode("_tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = cnt.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t_total"),
        F.count(F.lit(1)).alias("v"),
    )
    ev = d.filter(F.col(id_col) % train_mod != 0).select(
        F.col(id_col), F.explode("_tk").alias("term")
    )
    lp = (
        F.log(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1).cast("double"))
        - F.log((F.col("t_total") + F.col("v") + 1).cast("double"))
    ).cast("decimal(18,12)")
    scored = (
        ev.join(F.broadcast(cnt), "term", "left")
        .crossJoin(F.broadcast(stats))
        .select(id_col, lp.alias("lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                (-F.sum("lp")).cast("double") / F.count(F.lit(1)), 6
            ).alias("log_ppl"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per group by summed TF-IDF
    (idf = ln(N_docs / doc_freq), natural log, 6-dp rounded score).

    Two aggregates (doc-frequency over distinct (doc, term); term
    frequency per group) + one broadcast of the 1-row corpus size — the
    100 TB plan is two shuffles keyed on the term.
    """
    tok = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = (
        tok.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tf = tok.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group_col, "rk", "term", "tf", "df", "tfidf")
    )


def repetition_stats(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document repeated-n-gram fraction (1 − distinct/total — the
    Gopher-style repetition quality signal), computed entirely inside
    the row's token array: zero shuffle, scan-side codegen."""
    grams = word_ngrams_col(text_col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    dup_frac = F.when(
        total > 0, 1.0 - distinct.cast("double") / total
    ).otherwise(F.lit(0.0))
    return docs.withColumn("n_ngrams", total.cast("long")).withColumn(
        "dup_frac", F.round(dup_frac, 6)
    )


def ngram_topk(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` word n-grams by count (ties broken
    lexicographically) — one partial-agg shuffle + TakeOrdered."""
    return (
        docs.select(F.explode(word_ngrams_col(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("gram"))
        .limit(k)
    )


def skipgram_pairs_col(
    text: Column | str = "text", window: int = 2
) -> Column:
    """word2vec-style (center, context) skip-gram pairs within
    ±``window`` positions, as ONE scan-side codegen array expression
    (sequence → nested transform → flatten) — both directions emitted,
    no Python, no explode until the caller counts.  The training-pair
    generator of embedding pipelines, ×(2·window) row expansion."""
    if window < 1:
        # sequence(1, 0) is DESCENDING in Spark — a 0 window would emit
        # bogus d=0 self-pairs instead of an empty list
        raise ValueError(f"window must be >= 1, got {window}")
    toks = tokens_col(text)
    # guard short docs: sequence(1, 0) is DESCENDING in Spark, and ANSI
    # element_at throws out-of-range — so build pairs only when ≥ 2
    # tokens, with try_element_at + a null filter for the tail offsets
    fwd_raw = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.lit(window)),
                lambda d: F.struct(
                    F.try_element_at(toks, i.cast("int")).alias(
                        "center"
                    ),
                    F.try_element_at(toks, (i + d).cast("int")).alias(
                        "context"
                    ),
                ),
            ),
        )
    )
    fwd = F.filter(fwd_raw, lambda p: p["context"].isNotNull())
    rev = F.transform(
        fwd,
        lambda p: F.struct(
            p["context"].alias("center"), p["center"].alias("context")
        ),
    )
    empty = F.array().cast(
        "array<struct<center:string,context:string>>"
    )
    return F.when(F.size(toks) >= 2, F.concat(fwd, rev)).otherwise(
        empty
    )


def skipgram_topk(
    docs: DataFrame,
    window: int = 2,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` skip-gram pairs by count (ties broken by
    (center, context)) — scan-side pair expansion, one partial-agg
    shuffle, TakeOrdered."""
    pairs = docs.select(
        F.explode(skipgram_pairs_col(text_col, window)).alias("p")
    ).select("p.center", "p.context")
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "center", "context")
        .limit(k)
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document EXACT n-token span duplication — the span-level
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"): a span appearing in ≥2 documents is
    memorization fuel that document-level MinHash can miss when the
    containing docs are otherwise different.

    Returns (gram, n_docs, n_occ) for every n-gram seen in more than
    one document.  Shape at scale: scan-side n-gram expansion (×~n_tok
    rows) feeding ONE hash aggregate — the partial agg collapses each
    partition to its distinct grams before the shuffle, and the result
    is vocabulary-scale, not corpus-scale.  (A full suffix-array pass à
    la Lee et al. finds arbitrary-length spans; fixed-n grams are the
    standard distributed approximation.)
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams_col(text_col, n)).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") > 1)
    )


def max_dup_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MAXIMAL cross-document repeated spans (VERDICT r13 item 5) —
    the variable-length generalization of :func:`duplicated_spans`,
    approximating Lee et al. 2022's suffix-array exact-substring dedup
    on the distributed n-gram stream: a token span is repeated across
    documents iff EVERY one of its n-token windows is (an n-gram seen
    in ≥2 docs), so the maximal repeated spans of a doc are exactly
    the maximal RUNS of consecutive flagged n-gram start positions
    (gaps-and-islands over the position stream; a run i..j certifies
    the span tokens[i .. j+n-1], length j−i+n).

    Shape at scale: the flagged-gram set is vocabulary-scale (one hash
    aggregate, same as duplicated_spans); the position join is a
    semi-join against it; the island detection is a PER-DOC window
    (partitioned by doc_id — never a global sort).  Returns
    (doc_id, start_pos, n_tokens, n_grams): 1-based token start, span
    token length, and the number of flagged windows in the run.
    """
    from pyspark.sql.window import Window

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_col(text_col, n)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("gram")
    )
    flagged = grams.join(dup, "gram", "left_semi").select(
        "doc_id", "pos"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = flagged.withColumn(
        "isle", F.col("pos") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_id", "isle")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") - F.min("pos") + n).alias("n_tokens"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "start_pos", "n_tokens", "n_grams")
    )
