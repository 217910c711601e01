"""Training-data curation operators: deterministic stratified splits,
sequence packing, and quality filtering (north-star M4 — the steps
between "deduped corpus" and "training batches").

Engine-portability note: split/pack ordering uses md5 of the row key
(not xxhash64) so the DuckDB oracle can reproduce the exact ordering —
md5 is the one hash both engines share.  At 100 TB both operators are a
scan + one partitioned window: no shuffle wider than the stratum /
source partitioning, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_hash_col(id_col: str, seed: int = 42) -> Column:
    """Portable deterministic per-row hash: md5 over "<id>_<seed>".
    Hex strings compare identically in Spark and DuckDB."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"_{seed}")))


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    fractions: tuple[float, float] = (0.8, 0.1),
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign train/valid/test EXACTLY proportionally within each
    stratum (not just in expectation): rows are ranked by a
    deterministic hash inside their stratum, and the first
    ``fractions[0]`` of each stratum becomes train, the next
    ``fractions[1]`` valid, the rest test.

    One partitioned window over the strata — the 100 TB plan is a
    single shuffle on the stratum key.
    """
    f_train, f_valid = fractions
    w = Window.partitionBy(*strata_cols).orderBy(
        split_hash_col(id_col, seed), id_col
    )
    n = Window.partitionBy(*strata_cols)
    frac = (F.row_number().over(w) - 1) / F.count(F.lit(1)).over(n)
    return df.withColumn(
        "split",
        F.when(frac < f_train, "train")
        .when(frac < f_train + f_valid, "valid")
        .otherwise("test"),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Concat-then-chunk sequence packing (the LLM-pretraining layout):
    documents are laid out deterministically within each group and cut
    into fixed token windows; a document belongs to the bin where it
    STARTS (bin = floor(preceding-token-count / budget)).

    Pure window arithmetic: running sum per group, one shuffle on the
    group key, no driver state — packing 100 TB is a single pass.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(split_hash_col(id_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).cast("long")
    return df.withColumn(
        "bin_id", F.floor(start / budget_tokens).cast("long")
    ).withColumn("bin_start_offset", start % budget_tokens)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    min_quality: float = 0.2,
) -> DataFrame:
    """Heuristic quality gate over the text-stats columns (length,
    punctuation density, composite quality score) — the standard
    pre-training corpus filter chain, entirely scan-side codegen."""
    from spark_tensors_spark.pipeline.text import (
        punct_ratio_col,
        quality_score_col,
        token_count_col,
    )

    return (
        df.withColumn("n_tokens", token_count_col(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio_col(text_col), 6))
        .withColumn("quality", F.round(quality_score_col(text_col), 6))
        .withColumn(
            "keep",
            (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("quality") >= min_quality),
        )
    )


def canonicalize_groups(
    members: DataFrame,
    scores: DataFrame,
    member_id: str = "node",
    group_id: str = "comp",
    score_id: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-document selection: for every duplicate group, keep the
    highest-scoring member (ties broken by smallest id) — the decision
    step that turns transitive dedup groups into an actual curated
    corpus ("drop all but the best copy").

    ``members`` is (member_id, group_id) — e.g. the output of
    ``components.connected_components``; ``scores`` is (score_id,
    score_col) — e.g. ``text.quality_score_col`` over the documents.

    Shape at scale: ONE shuffle join on the member id (both sides keyed
    by it), then one window shuffle on the group id; group sizes are
    dup-cluster sizes (small by construction), so the window never
    skews.  Returns one row per group: (group_id, n_docs, best_doc_id,
    best_quality).
    """
    m = members.join(
        scores.select(
            F.col(score_id).alias(member_id), F.col(score_col)
        ),
        member_id,
    )
    w_all = Window.partitionBy(group_id)
    w_rank = Window.partitionBy(group_id).orderBy(
        F.col(score_col).desc(), F.col(member_id).asc()
    )
    return (
        m.withColumn("n_docs", F.count(F.lit(1)).over(w_all))
        .withColumn("_rk", F.row_number().over(w_rank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(group_id).alias("group_id"),
            F.col("n_docs"),
            F.col(member_id).alias("best_doc_id"),
            F.col(score_col).alias("best_quality"),
        )
    )


def mixture_allocation(weights: dict[str, float], n: int) -> dict[str, int]:
    """Exact integer quotas for a weighted domain mixture via the
    largest-remainder method (deterministic, ties by key): quotas sum
    to exactly ``n`` and deviate from n·w/Σw by < 1 each — the
    allocation step of Pile/DoReMi-style domain weighting."""
    total = float(sum(weights.values()))
    exact = {k: n * w / total for k, w in weights.items()}
    quotas = {k: int(exact[k]) for k in weights}
    shortfall = n - sum(quotas.values())
    by_remainder = sorted(
        weights, key=lambda k: (-(exact[k] - quotas[k]), k)
    )
    for k in by_remainder[:shortfall]:
        quotas[k] += 1
    return quotas


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    n: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted domain mixture: exactly ``n`` rows with
    per-domain counts fixed by :func:`mixture_allocation`, members
    chosen by portable md5 rank within each domain (reproducible on
    any engine — the same discipline as :func:`stratified_split`).

    Shape at scale: one partitioned window per domain + a broadcast
    join against the quota table (|weights| rows).  Domains absent
    from ``weights`` are dropped (inner join), short domains yield
    their full membership.  Returns (strat_col, id_col, sample_rank).
    """
    import pandas as pd

    quotas = mixture_allocation(weights, n)
    alloc = df.sparkSession.createDataFrame(
        pd.DataFrame(
            sorted(quotas.items()), columns=[strat_col, "_quota"]
        ),
        f"{strat_col} string, _quota long",
    )
    return _rank_prefix_sample(
        df, alloc, strat_col, id_col, f"_mx{seed}", "_quota"
    ).select(strat_col, id_col, "sample_rank")


def _rank_prefix_sample(
    df: DataFrame,
    alloc: DataFrame,
    strat_col: str,
    id_col: str,
    seed_tag: str,
    quota_col: str,
) -> DataFrame:
    """Shared sampling tail for the mixture operators: portable md5
    rank within each domain (ties by id), broadcast-join the quota
    table, keep the rank prefix.  ONE statement of the hash recipe /
    tie-break / broadcast hint, so the explicit-weight and
    temperature variants can never drift apart."""
    w = Window.partitionBy(strat_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed_tag))),
        id_col,
    )
    ranked = df.select(strat_col, id_col).withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(alloc), strat_col).filter(
        F.col("sample_rank") <= F.col(quota_col)
    )


def temperature_mixture_sample(
    df: DataFrame,
    n: int,
    alpha: float = 0.5,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based domain mixture: exactly ``n`` rows with
    per-domain quotas ∝ count^alpha — the T5/mT5/Pile source-balancing
    step (alpha=1 reproduces natural proportions, alpha→0 flattens to
    uniform; alpha≈0.3-0.7 is the usual pretraining regime).  Unlike
    :func:`mixture_sample` the weights are DERIVED FROM THE DATA, so
    the whole allocation runs as DataFrame ops — no driver collect:

      counts (one hash aggregate, |domains| rows)
      → integer weights floor(count^alpha · scale + 0.5)
      → largest-remainder quotas in EXACT BIGINT arithmetic
        ((n·w) div W / (n·w) mod W over one whole-frame window on the
        |domains|-row frame — a single-partition exchange of a few
        rows, not a data shuffle)
      → broadcast-join the quota row onto the per-domain md5 rank
        (same portable rank as mixture_sample/stratified_split).

    Cross-engine exactness: for alpha=0.5 the weight uses sqrt(), which
    IEEE 754 requires to be correctly rounded — bit-identical on every
    engine, so floor(·scale+0.5) and everything after it is exact
    integer arithmetic DuckDB replays verbatim.  Other alphas go
    through pow(), which libm does NOT guarantee to the last ulp; the
    declared query pins alpha=0.5 (doc_temperature_mixture), other
    alphas are engine-exact only in the integer stage.

    Contract edges: like :func:`mixture_sample`, a SHORT domain
    (count < its quota) yields its full membership, so the output can
    then carry fewer than ``n`` rows — and temperature flattening
    makes quota > count the EXPECTED regime for very small domains at
    alpha < 1, so size ``n`` to the corpus, not the other way.  The
    integer stage requires n·max(wt) < 2⁶³, i.e.
    n · weight_scale · max(count)^alpha < 9.2e18 (at the defaults:
    n·sqrt(max domain count) < 9.2e12 — a 1e12-doc domain caps n at
    ~9e6); a raise_error guard checks the PRECONDITION directly
    (wt ≤ (2⁶³−1) div n, so n·wt can never wrap — not even twice —
    and ΣW is summed in DECIMAL(38,0) and bounds-checked before the
    cast back to BIGINT) rather than letting non-ANSI Spark diverge
    from DuckDB's out-of-range error.

    Returns (strat_col, id_col, sample_rank, quota) — quota is carried
    in the output so the allocation itself sits under the value oracle,
    not just the membership."""
    counts = df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("_n_s"))
    if alpha == 0.5:
        raw_w = F.sqrt(F.col("_n_s").cast("double"))
    else:
        raw_w = F.pow(F.col("_n_s").cast("double"), F.lit(float(alpha)))
    wts = counts.select(
        strat_col,
        F.floor(raw_w * F.lit(weight_scale) + F.lit(0.5))
        .cast("long")
        .alias("_wt"),
    )
    w_all = Window.partitionBy()
    # int64 guards check the PRECONDITIONS, not the products' signs
    # (a product can wrap past 2^64 back to positive and a wrapped sum
    # can land anywhere): wt must satisfy n·wt ≤ 2^63−1 exactly, and
    # W = Σwt is summed in DECIMAL(38,0) — exact for any realistic
    # domain count — and bounds-checked before casting back to BIGINT.
    wt_limit = (2**63 - 1) // max(int(n), 1)
    overflow = F.raise_error(
        F.lit(
            "temperature_mixture_sample: n * weight overflows int64 "
            "— lower n or weight_scale "
            "(need n * scale * max(count)^alpha < 9.2e18)"
        )
    ).cast("long")
    base = (
        wts.withColumn(
            "_wt",
            F.when(F.col("_wt") > F.lit(wt_limit), overflow).otherwise(
                F.col("_wt")
            ),
        )
        .withColumn(
            "_W_dec", F.sum(F.col("_wt").cast("decimal(38,0)")).over(w_all)
        )
        .withColumn(
            "_W",
            F.when(
                F.col("_W_dec") > F.lit(2**63 - 1).cast("decimal(38,0)"),
                overflow,
            ).otherwise(F.col("_W_dec").cast("long")),
        )
        .withColumn("_nw", F.lit(n).cast("long") * F.col("_wt"))
        .select(
            strat_col,
            F.expr("_nw div _W").alias("_q0"),
            (F.col("_nw") % F.col("_W")).alias("_rem"),
        )
    )
    rr = (
        base.withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy().orderBy(
                    F.col("_rem").desc(), F.col(strat_col)
                )
            ),
        )
        .withColumn("_k", F.lit(n).cast("long") - F.sum("_q0").over(w_all))
    )
    alloc = rr.select(
        strat_col,
        (
            F.col("_q0")
            + F.when(F.col("_r") <= F.col("_k"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("quota"),
    )
    return _rank_prefix_sample(
        df, alloc, strat_col, id_col, f"_tmx{seed}", "quota"
    ).select(strat_col, id_col, "sample_rank", "quota")


def es_sample_key_col(
    id_col: str, weight_col: str, seed: int = 42
) -> Column:
    """Efraimidis–Spirakis weighted-sampling key ``-ln(u)/w`` with a
    deterministic md5-derived uniform ``u ∈ (0,1)`` — taking the k
    SMALLEST keys draws a weighted sample without replacement with
    exactly the sequential-sampling inclusion law (ES 2006, the
    exponential-race formulation).

    Portable: the 60-bit integer hash is engine-exact (see
    functions/sketches.portable_hash60_col); the int→double cast, +0.5,
    division, and ln are IEEE ops both engines perform identically
    (modulo ≤1 ulp in libm's ln, far below any realistic key gap).
    """
    from spark_tensors_spark.functions.sketches import portable_hash60_col

    h = portable_hash60_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"_ws{seed}"))
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return -F.log(u) / F.col(weight_col).cast("double")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sample without replacement: the ``k``
    smallest ES keys per stratum (rows with non-positive weight are
    excluded).  Adds ``sample_rank`` (1-based within stratum).

    Scale shape: one shuffle on the stratum key; the ``row_number() ≤ k``
    filter triggers Spark's WindowGroupLimit, so each map task forwards
    at most ``k`` rows per stratum — the shuffle carries O(k·strata)
    rows, not the corpus.
    """
    strata = list(strata_cols or [])
    w = Window.partitionBy(*strata).orderBy(F.col("_es_key"), id_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", es_sample_key_col(id_col, weight_col, seed))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_es_key")
    )


def chunk_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking with overlap — the standard LM
    training-data op: split each document's token sequence into
    ``window``-token chunks every ``stride`` tokens (overlap =
    window − stride), final partial chunk kept.

    Pure codegen (split → sequence of chunk starts → posexplode →
    slice): the explode multiplies rows by ~n/stride, never by token
    count, and nothing wider than one chunk's tokens leaves the scan
    stage.  Output is integer-exact — (doc_id, chunk_no, start_tok,
    n_tokens, len_sum) with len_sum = Σ token lengths in the chunk —
    so the operator carries its own slicing checksum for the oracle.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != ""
    )
    n = F.size(toks)
    # number of extra chunks past the first: ceil(max(n - window, 0)/stride)
    extra = F.floor(
        (F.greatest(n - window, F.lit(0)) + stride - 1) / stride
    ).cast("int")
    chunked = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(F.sequence(F.lit(0), extra)).alias("chunk_no", "_k"),
    ).select(
        id_col,
        "chunk_no",
        (F.col("_k") * stride).alias("start_tok"),
        F.slice("_toks", F.col("_k") * stride + 1, window).alias("_chunk"),
    )
    return chunked.select(
        id_col,
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform("_chunk", F.length),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("long").alias("len_sum"),
    )


def shard_assignments(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "_shard42",
) -> DataFrame:
    """Deterministic 16-way training-export sharding: shard = first
    hex nibble of md5(id || salt), within-shard order = the md5 value
    itself (a seeded global shuffle — two runs over the same corpus
    produce byte-identical shard files, which is what makes a training
    run reproducible and resumable).  Returns (shard, <id>,
    shard_rank); writing is then `df.repartition("shard")
    .sortWithinPartitions("shard_rank").write.partitionBy("shard")`,
    all narrow after the one hash shuffle.

    Scale shape: one shuffle on the shard key (16 uniform buckets by
    md5 uniformity — no skew), one per-shard sort; rank is a window
    WITHIN a shard, never a global row_number.  md5, not xxhash64, so
    the assignment is engine-portable (the DuckDB oracle recomputes it
    symbolically).
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", F.substring(F.col("h"), 1, 1))
        .withColumn(
            "shard_rank", F.row_number().over(w).cast("long")
        )
        .select("shard", id_col, "shard_rank")
    )
