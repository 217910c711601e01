"""LLM-pipeline declared queries over `documents` / `embeddings`
(north-star M4; graded alongside SURVEY §2.11).

Engine side reuses ``pipeline.{text,dedup,similarity}``; oracle side
recomputes the identical arithmetic in DuckDB (list comprehensions,
ascii-packed shingles, universal hashing, list_cosine_similarity on
DOUBLE[]).  Engine-specific signatures (SimHash FNV, LSH hyperplanes)
have no oracle → driver records the weaker rows-only check; their
semantics are covered by pytest property tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.io.readers import ensure_scan_parallelism, load_table
from spark_tensors_spark.pipeline import dedup, similarity, text
from spark_tensors_spark.pipeline.dedup import MERSENNE_P, MINHASH_PARAMS


def doc_source_hash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup accounting per source: docs vs distinct content
    hashes (hash-groupBy dedup shape, always non-empty)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .orderBy("source")
    )


def doc_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_ids is rendered as a sorted comma-joined STRING: the compared
    # output must stay scalar-only (driver-contract invariant — the
    # driver's canonicalizer cannot sort array-typed columns; pinned by
    # tests/test_plan_hygiene.py) while still covering every member
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        dedup.exact_duplicate_groups(docs)
        .select(
            "content_hash",
            "cnt",
            "keep_doc_id",
            F.concat_ws(",", F.col("doc_ids")).alias("doc_ids_csv"),
        )
        .orderBy("content_hash")
    )


# MinHash signatures are a deterministic derived table consumed by
# three declared queries — memoized per (session, dataset) like the
# encoded KG (signature computation is ingestion work, not query work)
_SIGS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIGS_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        docs = ensure_scan_parallelism(docs)
        _SIGS_CACHE[key] = dedup.minhash_signatures(docs).persist()
    return _SIGS_CACHE[key]


def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sigs(spark, sf_dir).orderBy("doc_id")


# the banded-bucket candidate-pair join is itself consumed twice
# (doc_lsh_pairs, doc_lsh_components) — memoize alongside the
# signatures so the bucket join runs once per (session, dataset)
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = dedup.lsh_candidate_pairs(
            _sigs(spark, sf_dir)
        ).persist()
    return _PAIRS_CACHE[key]


def doc_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def doc_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATION (Broder): est = fraction of agreeing
    signature components — the statistical use of the signatures the
    LSH queries only band.  Adjacent doc-id pairs keep the pair list
    N-sized; n_match ∈ 0..8 and est = n_match/8 are exact (dyadic), so
    the oracle matches bit-for-bit.  One self-join on doc_id+1 over the
    memoized signature table."""
    sigs = _sigs(spark, sf_dir)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{j}").alias(f"a{j}") for j in range(8)],
    )
    b = sigs.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{j}").alias(f"b{j}") for j in range(8)],
    )
    n_match = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("long") for j in range(8)
    )
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_match"),
            (n_match / F.lit(8.0)).alias("mh_jaccard_est"),
        )
        .orderBy("doc_a")
    )


def doc_lsh_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-in-bucket-size dedup decision (scales past the degenerate
    buckets that the pair form must cap)."""
    sigs = _sigs(spark, sf_dir)
    return dedup.lsh_duplicate_groups(sigs).orderBy("doc_id")


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=5 char-grams, window 4):
    per-doc fingerprint count + min/max/sum — the content-defined
    signature set used for plagiarism-style overlap detection."""
    from spark_tensors_spark.pipeline import text as T

    docs = dedup._with_char_codes(
        ensure_scan_parallelism(load_table(spark, sf_dir, "documents")),
        "text",
    )
    fp = docs.select(
        "doc_id", T.rolling_hashes_col("codes").alias("h")
    ).select("doc_id", T.winnow_col("h").alias("fps"))
    return fp.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fp"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
        F.aggregate(
            "fps", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("fp_sum"),
    ).orderBy("doc_id")


def emb_similarity_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 similarity zoo THROUGH the Arrow pandas_udf path, pinned by a
    DuckDB oracle computing the same formulas in SQL — the strongest
    in-engine check the kernel layer gets (unit tests only cover the
    numpy functions).  Adjacent vec_id pairs keep the row count = N."""
    from spark_tensors_spark.functions.kernels import similarity_udf

    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, "id_a")
    cos = similarity_udf("cosine")
    rbf = similarity_udf("rbf", gamma=0.01)
    l1 = similarity_udf("l1")
    euc = similarity_udf("euclidean")
    poly = similarity_udf("polynomial", gamma=0.1, c=1.0, d=2)
    return pairs.select(
        "id_a",
        "id_b",
        F.round(cos("va", "vb"), 6).alias("cos"),
        F.round(rbf("va", "vb"), 6).alias("rbf"),
        F.round(l1("va", "vb"), 6).alias("l1"),
        F.round(euc("va", "vb"), 6).alias("euclid"),
        F.round(poly("va", "vb"), 6).alias("poly2"),
    ).orderBy("id_a")


_CODES_CACHE: dict = {}


def _int8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, codes array<int>) — the cross-engine-exact int8
    quantization of the embedding column (the SAME projection the green
    emb_int8_quantize oracle gates).  All four declared ANN queries run
    on these integer vectors with fixed integer geometry
    (`similarity.pseudo_*`), which makes every bucket id, cell
    assignment, and (ADC) distance an exact integer on both engines —
    the r4 kg_distmult doctrine applied to ANN.

    MEMOIZED + eagerly checkpointed (r14): consumers reference `codes`
    many times (K distance expressions in kmeans_assign, explode +
    assignment in the Lloyd step), and a collapsed projection re-runs
    the quantize transform per reference — emb_kmeans_step measured
    15.9 s at sf1.0 of which ~14 s was re-quantization; materializing
    the tiny (n × d int) frame once cuts it to ~2 s.  Keyed on
    applicationId like every derived-table memo (ROUND_NOTES r1 #2)."""
    from spark_tensors_spark.pipeline.quantize import scalar_quantize_int8

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    out = (
        scalar_quantize_int8(emb)
        .select("vec_id", "codes")
        .localCheckpoint()
    )
    _CODES_CACHE[key] = out
    return out


def emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN self-top-k (coarse quantizer + probed-cell exact re-rank)
    through the PRODUCTION plan — mapInPandas probe, cell-keyed
    applyInPandas re-rank, global window — on int8 codes with the fixed
    integer pseudo-centroids, so the DuckDB oracle recomputes every
    cell assignment and distance exactly.  The Lloyd-trained float path
    keeps its recall/digest pins in tests/test_pq.py +
    tests/test_trained_ann_goldens.py."""
    codes = _int8_codes(spark, sf_dir)
    cents = similarity.pseudo_centroids(16, 64)
    return (
        similarity.ivf_topk(
            codes, k=5, n_cells=16, nprobe=2, vec_col="codes",
            centroids=cents, metric="l2",
        )
        .select("query_id", "nn_id", "dist", "rk")
        .orderBy("query_id", "rk")
    )


def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (m=8 subspaces × 16 codes):
    corpus scanned as codes, asymmetric distances via table gather —
    the production encode/gather/rank plan on int8 codes with the
    fixed integer pseudo-codebooks (oracle recomputes the per-subspace
    argmin encoding and the ADC sums exactly).  Lloyd-trained
    codebooks keep their recall + reconstruction-error pins in
    tests/test_pq.py."""
    from spark_tensors_spark.pipeline import pq

    codes = _int8_codes(spark, sf_dir)
    cb = similarity.pseudo_codebooks(8, 16, 8)
    queries = codes.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("query_vec"),
    )
    return (
        pq.pq_topk(codes, queries, cb, k=5, vec_col="codes")
        .select("query_id", "nn_id", "adc_dist", "rk")
        .orderBy("query_id", "rk")
    )


def emb_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) composed ANN: inverted lists from the coarse
    quantizer + residual product quantization + per-probed-cell ADC
    (`pq.ivfpq_topk`) — the scan reads nprobe/n_cells of the corpus at
    m bytes/vector.  Runs on int8 codes with fixed integer
    pseudo-centroids/codebooks: residuals, encodings, and ADC distances
    are all exact integers, so the full IVFADC pipeline is value-gated
    by the DuckDB oracle.  The trained path keeps its recall pin in
    tests/test_pq.py."""
    from spark_tensors_spark.pipeline import pq

    codes = _int8_codes(spark, sf_dir)
    cents = similarity.pseudo_centroids(8, 64)
    cb = similarity.pseudo_codebooks(8, 16, 8, mod=201, shift=100)
    queries = codes.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("query_vec"),
    )
    return (
        pq.ivfpq_topk(
            codes, queries, k=5, n_cells=8, nprobe=3, m=8, n_codes=16,
            vec_col="codes", centroids=cents, codebooks=cb,
        )
        .select("query_id", "nn_id", "adc_dist", "rk")
        .orderBy("query_id", "rk")
    )


def emb_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF path against exact brute force — the ANN
    quality-evaluation harness AS a query, both sides on int8 codes
    with the integer pseudo-centroids so the oracle recomputes exact
    AND approximate top-k symbolically and checks the intersection
    count per query.  One extra equi-join over two top-k tables; the
    query subset (vec_id % 25 = 0) keeps the exact side's candidate
    expansion bounded."""
    codes = _int8_codes(spark, sf_dir)
    cents = similarity.pseudo_centroids(16, 64)
    queries = codes.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("query_vec"),
    )
    exact = similarity.l2_topk(
        codes, queries, k=5, vec_col="codes"
    ).select("query_id", "nn_id")
    approx = (
        similarity.ivf_topk(
            codes, k=5, n_cells=16, nprobe=2, vec_col="codes",
            centroids=cents, metric="l2",
        )
        .filter(F.col("query_id") % 25 == 0)
        .select("query_id", "nn_id")
    )
    matched = approx.join(exact, ["query_id", "nn_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_match"))
    return (
        queries.select("query_id")
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_match", F.lit(0)).cast("long").alias("n_match"),
            (F.coalesce("n_match", F.lit(0)) / F.lit(5.0)).alias(
                "recall_at_5"
            ),
        )
        .orderBy("query_id")
    )


def doc_trigram_jaccard_adjacent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """n-gram Jaccard similarity for adjacent doc-id pairs — exercises
    the shingle + set-similarity kernel with a bounded pair list."""
    docs = dedup._with_char_codes(
        ensure_scan_parallelism(load_table(spark, sf_dir, "documents")),
        "text",
    ).select("doc_id", dedup.shingle_codes_col("text").alias("sh"))
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sb"),
    )
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(dedup.jaccard_col(F.col("sa"), F.col("sb")), 6).alias(
                "jaccard"
            ),
        )
        .orderBy("doc_a")
    )


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return text.text_stats(docs).orderBy("doc_id")


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.cosine_topk(emb, queries, k=5).orderBy(
        "query_id", "rk"
    )


def emb_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.l2_topk(emb, q, k=3).orderBy("query_id", "rk")


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension)."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", F.col("pos"))
        .agg(
            # per-row DECIMAL(18,12) snap → associative sum (identical
            # doubles quantize identically on both engines)
            F.round(
                F.sum(F.col("col").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("v")
        )
        .orderBy("label", "pos")
    )


def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine pair scan (bounded to vec_id<300 — the N²
    oracle baseline, not the scale path).  Threshold 0.35 sits inside
    the synthetic embeddings' similarity range (max ≈ 0.49), so the
    oracle compares real pairs rather than empty-vs-empty."""
    emb = ensure_scan_parallelism(
        load_table(spark, sf_dir, "embeddings")
    ).filter(
        F.col("vec_id") < 300
    )
    return (
        dedup.embedding_near_dups(emb, threshold=0.35)
        .orderBy("id_a", "id_b")
    )


def doc_lsh_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVE dedup groups over the LSH candidate-pair graph
    (iterative min-label propagation, O(diameter) join rounds); the
    oracle computes the same closure with a recursive CTE.  Strictly
    stronger than the single-hop keeper rule of doc_lsh_dup_groups:
    a ≈ b, b ≈ c lands all three in one group even when (a, c) never
    shared a bucket."""
    from spark_tensors_spark.pipeline import components

    pairs = _lsh_pairs(spark, sf_dir)
    return components.duplicate_components(pairs).orderBy("doc_id")


def doc_lsh_components_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME transitive groups FORCED through the distributed CC
    path (driver_threshold=0: symmetrize → iterative min-label
    propagation → pointer jumping, localCheckpointed rounds) — this
    puts the 100 TB implementation itself under the driver's value
    oracle, not just the small-graph union-find shortcut that
    `doc_lsh_components` takes below 2M edges."""
    from spark_tensors_spark.pipeline import components

    pairs = _lsh_pairs(spark, sf_dir)
    return components.duplicate_components(
        pairs, driver_threshold=0
    ).orderBy("doc_id")


def emb_gram_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix Cᵀ C over the int8-quantized embeddings
    (`quantize.int8_gram_matrix`): per-Arrow-batch BLAS partials, one
    d²/2-row final aggregate — exact integer output, so the oracle (a
    symbolic DuckDB recompute of codes → pairwise products) matches
    bit-for-bit.  The covariance/PCA/whitening input statistic computed
    the way a 100 TB pass must: reduce in the map task, shuffle only
    the d×d statistic."""
    from spark_tensors_spark.pipeline import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    return quantize.int8_gram_matrix(emb, dims=64).orderBy("i", "j")


def doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact 8-token span duplication
    (`corpus.duplicated_spans`, the Lee-et-al span-dedup signal): the
    25 most-shared spans by (n_docs, n_occ)."""
    from spark_tensors_spark.pipeline import corpus

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        corpus.duplicated_spans(docs, n=8)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("gram")
        )
        .limit(25)
    )


def doc_max_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL cross-document repeated spans (`corpus.max_dup_spans`,
    VERDICT r13 item 5 — Lee et al. 2022 exact-substring dedup on the
    8-gram stream): maximal runs of consecutive flagged 8-gram
    positions certify variable-length repeated spans.  Output: the 25
    longest spans (ties → doc_id, start) + the total maximal-span
    count; per-doc window only — no global sort of corpus data."""
    from spark_tensors_spark.pipeline import corpus

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    spans = corpus.max_dup_spans(docs, n=8).localCheckpoint()
    total = spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_spans_total")
    )
    return (
        spans.select(
            "doc_id",
            F.col("start_pos").cast("long").alias("start_pos"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_grams").cast("long").alias("n_grams"),
        )
        .orderBy(F.col("n_tokens").desc(), "doc_id", "start_pos")
        .limit(25)
        .crossJoin(F.broadcast(total))
    )


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (`similarity.hard_negative_topk`): for each
    anchor (vec_id % 50 == 0), the 3 most-cosine-similar vectors with a
    DIFFERENT label — the contrastive-training pair miner.  Exact, so
    the oracle is the label-masked cross join + window."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    return similarity.hard_negative_topk(emb, queries, k=3).orderBy(
        "query_id", "rk"
    )


MIXTURE_WEIGHTS = {f"src{i}": float((i % 4) + 1) for i in range(20)}
MIXTURE_N = 120


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixture (`curation.mixture_sample`): exactly 120
    docs with per-source quotas from largest-remainder allocation over
    explicit weights (1..4 cycling), members picked by portable md5
    rank — the Pile/DoReMi-style domain-weighting step, integer/string
    exact so the oracle restates quotas as a VALUES table."""
    from spark_tensors_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return curation.mixture_sample(
        docs, MIXTURE_WEIGHTS, MIXTURE_N
    ).orderBy("source", "sample_rank")


def _mixture_sample_oracle() -> str:
    from spark_tensors_spark.pipeline.curation import mixture_allocation

    quotas = mixture_allocation(MIXTURE_WEIGHTS, MIXTURE_N)
    values = ", ".join(
        f"('{s}', {q})" for s, q in sorted(quotas.items())
    )
    return f"""
        WITH alloc(source, quota) AS (VALUES {values}),
        ranked AS (
            SELECT source, doc_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || '_mx42'),
                                doc_id) AS BIGINT) AS sample_rank
            FROM documents
        )
        SELECT r.source, r.doc_id, r.sample_rank
        FROM ranked r JOIN alloc a ON a.source = r.source
        WHERE r.sample_rank <= a.quota
        ORDER BY r.source, r.sample_rank
    """


def doc_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-export sharding
    (`pipeline/curation.shard_assignments`): 16 md5-nibble shards with
    a seeded within-shard global-shuffle order — two runs over the
    same corpus produce byte-identical shard files, the contract a
    resumable training run needs.  One hash shuffle + per-shard
    window; md5 keeps the assignment engine-portable, so the oracle
    recomputes shard AND rank symbolically."""
    from spark_tensors_spark.pipeline.curation import shard_assignments

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return shard_assignments(docs).orderBy("shard", "shard_rank")


ORACLE_DOC_SHARD_EXPORT = """
WITH t AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || '_shard42') AS h
    FROM documents
)
SELECT substr(h, 1, 1) AS shard, doc_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id
       ) AS BIGINT) AS shard_rank
FROM t
ORDER BY shard, shard_rank
"""


def emb_whiten_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA WHITENING under the driver gate: fit_pca (distributed
    moment pass + driver eigh) → `pca.whiten_pca` (one matmul per
    Arrow batch) → the whitened output's own second-moment table
    (reusing `pca.moment_table` at dims=8).  The whitened covariance
    must be ≈ I (diag λ/(λ+eps), off-diag 0); 4-dp half-up rounding
    snaps every entry to an exact grid point (diag → 1.0, off-diag →
    0.0 ± engine-noise ≪ the boundary).  The DuckDB oracle states that
    INVARIANT (the exact identity table) — the provable output of ANY
    correct whitening at these eigenvalue scales, independent of the
    eigenbasis, which itself is not SQL-expressible; a wrong
    eigh/moment/matmul anywhere in the chain breaks it.  Also
    golden-pinned (tests/test_rows_only_goldens.py) and
    property-tested vs direct numpy whitening in tests/test_pca.py."""
    import decimal

    import pandas as pd

    from spark_tensors_spark.pipeline import pca

    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    model = pca.fit_pca(emb, dims=64, k=8)
    white = pca.whiten_pca(emb, model)
    vals = {
        r.slot: r.v
        for r in pca.moment_table(white, dims=8, vec_col="white").collect()
    }
    n = int(round(vals[-1]))
    mw = [vals[i] / n for i in range(8)]

    def _round4(x: float) -> float:
        # `+ 0.0` snaps IEEE -0.0 to +0.0: the off-diagonal noise sign
        # is run-dependent (partition fold order), and the driver's
        # value hash distinguishes sign of zero — this exact query
        # failed the r6 gate emitting -0.0 against the oracle's 0.0.
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1E-4"), rounding=decimal.ROUND_HALF_UP
            )
        ) + 0.0

    rows = []
    for a in range(8):
        for b in range(a, 8):
            g = vals[a * 8 + b + 8]
            cov = (g - n * mw[a] * mw[b]) / (n - 1)
            rows.append((a, b, _round4(cov)))
    pdf = pd.DataFrame(rows, columns=["a", "b", "cov"])
    return spark.createDataFrame(pdf, "a long, b long, cov double")


def emb_pca_topvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-variance dimension selection over the EXACT distributed
    moment pass (`pca.moment_table` on int8 codes — the same pass the
    green emb_pca_moments oracle gates): per input dimension the
    unnormalized variance numerator n·Σx² − (Σx)² is exact BIGINT, the
    sample variance is ONE division of two exact int64s (bit-identical
    across engines), and the top-8 selection is a total ORDER BY —
    the feature-selection half of PCA, fully value-oracled (VERDICT r9
    #3: "a pure ORDER BY over the already-oracled emb_pca_moments
    output").  The eigensolve spectrum this query previously returned
    is NOT SQL-expressible and stays pinned in tests/test_pca.py
    (numpy parity, orthonormality, projection-variance = eigenvalue,
    plus the exact r9 golden digest)."""
    from spark_tensors_spark.pipeline.pca import moment_table

    d = 64
    codes = _int8_codes(spark, sf_dir)
    # diag_only: this query needs variances, not covariances — O(d)
    # per-row compute and partial instead of O(d²) (values identical);
    # exact_int: int64 partials + LONG aggregate, exact to 2⁶³ rather
    # than the float path's 2⁵³ (the oracle sums exact integers, so
    # the claimed BIGINT parity now holds at full scale — ADVICE r10)
    mt = moment_table(codes, d, "codes", diag_only=True, exact_int=True)
    n_row = mt.filter(F.col("slot") == -1).select(
        F.col("v").cast("long").alias("n")
    )
    sums = mt.filter((F.col("slot") >= 0) & (F.col("slot") < d)).select(
        F.col("slot").cast("long").alias("dim"),
        F.col("v").cast("long").alias("s"),
    )
    # gram diagonal: slot = d + i·d + i = d + i·(d+1)
    diag = (
        mt.filter(
            (F.col("slot") >= d) & ((F.col("slot") - d) % (d + 1) == 0)
        ).select(
            F.floor((F.col("slot") - d) / (d + 1)).cast("long").alias("dim"),
            F.col("v").cast("long").alias("gii"),
        )
    )
    var_num = F.col("n") * F.col("gii") - F.col("s") * F.col("s")
    return (
        sums.join(diag, "dim")
        .crossJoin(F.broadcast(n_row))
        .select(
            "dim",
            var_num.alias("var_num"),
            (
                var_num.cast("double")
                / (F.col("n") * (F.col("n") - 1)).cast("double")
            ).alias("variance"),
        )
        .orderBy(F.desc("var_num"), "dim")
        .limit(8)
    )


def emb_pca_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed moment pass behind `fit_pca` — count, per-dim
    sums, Gram upper triangle via `pca.moment_table` (per-Arrow-batch
    fixed-size partials, one slot-keyed fold) — run on int8 codes so
    every statistic is an exact BIGINT the DuckDB oracle recomputes.
    This value-gates the half of PCA that is SQL-expressible; the
    driver eigensolve stays golden-pinned in emb_pca_topvar /
    tests/test_pca.py."""
    from spark_tensors_spark.pipeline.pca import moment_table

    d = 64
    codes = _int8_codes(spark, sf_dir)
    # exact_int: int8 codes are integer-valued, so partials accumulate
    # in int64 and the BIGINT claim below holds past 2^53 rows·x² —
    # the same overflow discipline as emb_pca_topvar (review r11)
    mt = moment_table(codes, d, "codes", exact_int=True)
    slot = F.col("slot")
    s2 = slot - F.lit(d)
    return (
        mt.select(
            F.when(slot == -1, F.lit("n"))
            .when(slot < d, F.lit("sum"))
            .otherwise(F.lit("gram"))
            .alias("stat"),
            F.when(slot == -1, F.lit(-1))
            .when(slot < d, slot)
            .otherwise(F.floor(s2 / d))
            .cast("int")
            .alias("i"),
            F.when(slot < d, F.lit(-1))
            .otherwise(s2 % d)
            .cast("int")
            .alias("j"),
            F.col("v").cast("long").alias("val"),
        )
        .orderBy("stat", "i", "j")
    )


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction accounting (`pipeline/scrub.py`).  The synthetic
    corpus carries no PII, so the query first derives a deterministic
    PII-bearing column from doc_id (emails on %3, IPv4 on %5, phone
    numbers on %7 — both engines replay the identical construction),
    then counts and scrubs it: per source, detection counts, redacted
    char volume, and an md5-prefix checksum of every scrubbed document.
    Pure scan-side codegen (regexp_count + chained regexp_replace)."""
    from spark_tensors_spark.pipeline import scrub

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" reach user"),
                did.cast("string"),
                F.lit("@mail-svc.example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" src 10."),
                (did % 200).cast("string"),
                F.lit(".0."),
                (did % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    a = docs.select("source", aug.alias("aug"))
    s = a.select(
        "source",
        "aug",
        scrub.pii_count_col("aug", "email").alias("ce"),
        scrub.pii_count_col("aug", "ipv4").alias("ci"),
        scrub.pii_count_col("aug", "phone").alias("cp"),
        scrub.scrub_pii_col("aug").alias("scrubbed"),
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ce").cast("long").alias("n_emails"),
            F.sum("ci").cast("long").alias("n_ips"),
            F.sum("cp").cast("long").alias("n_phones"),
            F.sum(F.length("aug") - F.length("scrubbed"))
            .cast("long")
            .alias("redacted_chars"),
            F.sum(
                F.conv(F.substring(F.md5("scrubbed"), 1, 8), 16, 10).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("scrub_check"),
        )
        .orderBy("source")
    )


def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection per transitive dup group: join the LSH
    connected components with the composite quality score and keep the
    best-scoring member of every group (ties → smallest doc_id) — the
    step that turns "these docs are near-dups" into "keep THIS one".
    One join + one group-partitioned window (`curation.
    canonicalize_groups`); the oracle replays the closure with a
    recursive CTE and the identical quality formula."""
    from spark_tensors_spark.pipeline import components, curation, text

    pairs = _lsh_pairs(spark, sf_dir)
    cc = components.connected_components(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    scores = docs.select(
        "doc_id", text.quality_score_col("text").alias("quality")
    )
    return curation.canonicalize_groups(
        cc.select(F.col("node").alias("doc_id"), "comp"),
        scores,
        member_id="doc_id",
        group_id="comp",
    ).orderBy("group_id")


def doc_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (prefix filtering, Vernica et al.
    SIGMOD 2010): all doc pairs with token-Jaccard ≥ 9/10 on a doc_id%11
    subset (the synthetic corpus is heavily templated — most pairs
    clear 0.6 — so the subset keeps the verified pair set bounded).  Integer-exact output and an integer threshold predicate
    (10·|A∩B| ≥ 9·|A∪B|) — zero float surface, so the oracle matches
    bit-for-bit.  The no-false-negative complement to the MinHash-LSH
    family above.  Declared form disables the hot-token cap (the scale
    knob) so semantics are exactly the brute-force oracle's.

    FIXTURE-BOUNDED (VERDICT r13): at τ=9/10 on this templated corpus
    the TRUE answer is ~8% of n² — the output itself is quadratic, so
    no algorithm makes this declaration linear at 100×.  The
    scale-bounded contract is doc_jaccard_topk (per-doc top-k at
    τ=97/100).  Since r14 the declared form runs the identical-set-
    GROUPED join (same output, property-tested ≡ the ungrouped form):
    in-group pairs skip the per-pair intersect entirely and cross-group
    pairs verify once per group pair, so the residual quadratic term is
    pure output materialization."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 11 == 0
    )
    docs = ensure_scan_parallelism(docs)
    return (
        dedup.jaccard_similarity_join_grouped(
            docs, threshold_num=9, threshold_den=10, max_token_bucket=None
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_union").cast("long").alias("n_union"),
        )
        .orderBy("doc_a", "doc_b")
    )


def doc_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-output set-similarity join (VERDICT r13 item 2): each
    doc's 3 most Jaccard-similar neighbors among pairs with
    token-Jaccard ≥ 97/100, on a doc_id%5 subset — same Vernica
    prefix+length-filter candidate machinery as doc_jaccard_join, but
    a per-doc top-k contract so the OUTPUT grows linearly in n where
    the all-pairs answer on this templated corpus is ~quadratic, and a
    threshold high enough (0.97) that the prefix filter prunes the
    same-template 0.87-0.93 mass BEFORE verification — at 9/10 the
    verified set itself is ~8% of n² and no top-k can un-pay it
    (measured 48×/decade; 97/100 measures ~5×/decade).
    Ranking is integer-exact up to one IEEE division (n_common/n_union)
    with an id tie-break, so rows are deterministic and hashable.
    Declared form disables the hot-token cap so semantics are exactly
    the brute-force oracle's."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    docs = ensure_scan_parallelism(docs)
    topk = dedup.jaccard_topk(
        docs, k=3, threshold_num=97, threshold_den=100,
        max_token_bucket=None,
    )
    return topk.select(
        "doc_id",
        F.col("rk").cast("long").alias("rk"),
        "nbr",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_union").cast("long").alias("n_union"),
    ).orderBy("doc_id", "rk")


def doc_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-proportional train/valid/test split within
    each source stratum (md5-ranked, one partitioned window)."""
    from spark_tensors_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        curation.stratified_split(docs, ["source"], (0.8, 0.1))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("source", "split")
    )


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing into 512-token bins per source
    (running-sum window); per-bin doc count + token sum."""
    from spark_tensors_spark.pipeline import curation, text

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).withColumn(
        "n_tokens", text.token_count_col("text")
    )
    packed = curation.pack_sequences(docs, budget_tokens=512)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tok_sum"),
        )
        .orderBy("source", "bin_id")
    )


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap (64-token windows every 48
    tokens, final partial chunk kept) — the standard LM training-data
    chunker, integer-exact with a per-chunk length checksum; subsets
    doc_id%13 to keep the oracle's lateral expansion bounded."""
    from spark_tensors_spark.pipeline import curation

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).filter(
        F.col("doc_id") % 13 == 0
    )
    return curation.chunk_windows(docs, window=64, stride=48).orderBy(
        "doc_id", "chunk_no"
    )


def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column
    (pipeline/quantize.py): per-vector integer code aggregates (sum,
    min, max, squared norm — all exact BIGINTs) + the 6-dp-rounded
    scale.  Codes are integer-exact cross-engine: both engines compute
    round(v·127/max|v|) on the identical IEEE double."""
    from spark_tensors_spark.pipeline import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    emb = ensure_scan_parallelism(emb)
    q = quantize.scalar_quantize_int8(emb)
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("qsum"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, x: a + x * x
        ).alias("qnorm_sq"),
        F.array_min("codes").cast("long").alias("qmin"),
        F.array_max("codes").cast("long").alias("qmax"),
    ).orderBy("vec_id")


def emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-integer k-means Lloyd iteration over the int8-quantized
    embeddings (`pipeline/similarity.kmeans_lloyd_step`): nearest of 8
    integer pseudo-centroids by squared-L2 (scan-side codegen, ties to
    the smaller id), then the per-(cluster, dim) count/sum/mean update.
    The only float is the final BIGINT/BIGINT mean division — the
    iterative-clustering primitive under a full value oracle via the
    r5 integer pseudo-geometry doctrine."""
    codes = _int8_codes(spark, sf_dir)
    return similarity.kmeans_lloyd_step(codes, 8, 64).orderBy(
        "cluster_id", "dim"
    )


def emb_kmeans_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO Lloyd iterations under the full value oracle
    (`similarity.kmeans_lloyd_iters`): round 1 assigns against the
    integer pseudo-centroids, the K·d mean table is collected (bounded
    driver state, the MLlib centroid-loop shape), re-quantized as
    floor(mean+0.5) — the one tie rule Python/Spark/DuckDB all agree
    on — and re-embedded as round-2 scan literals; empty clusters
    carry their centroid forward.  Gates the iterative-DataFrame
    checkpoint discipline end-to-end: the oracle replays both rounds
    in MATERIALIZED CTEs (the r6 DuckDB CTE re-expansion gotcha), and
    every assignment is exact-integer squared-L2 so only the final
    emission's mean is float."""
    codes = _int8_codes(spark, sf_dir)
    return similarity.kmeans_lloyd_iters(codes, 8, 64, iters=2).orderBy(
        "cluster_id", "dim"
    )


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (`pipeline/dedup.semantic_dedup`):
    k-means cluster assignment (16 integer pseudo-centroids, exact
    scan-side squared-L2) then near-dup ONLY within a cluster — the
    cluster partition turns N² into Σ cluster², the published
    SemDeDup recipe for web-scale corpora.  A vector is removed when a
    smaller-id same-cluster vector has cosine ≥ 0.35 (the synthetic
    embeddings have no true near-dups, max cos ≈ 0.6, so the declared
    threshold is set where the rule fires — same machinery); emits
    (cluster_id, removed_id, kept_id, n_dups).  Integer dot products →
    the UNROUNDED cosine compare is bit-identical cross-engine (r5
    dyadic doctrine).

    K SCALES WITH THE CORPUS (VERDICT r13 item 3): K =
    clamp(⌈n/512⌉, 16, 4096) — fixed EXPECTED cluster size, so the
    in-cluster Σc² term stays linear as n grows (the SemDeDup-
    prescribed first mitigation; the max_cluster LSH guard in
    `semantic_dedup` remains the backstop for refuse-to-cluster skew).
    The oracle replays the data-derived K from the same count, so the
    compare stays exact at every scale.  The one .count() is a scalar
    over the memoized codes frame, not data-scaled driver state."""
    codes = _int8_codes(spark, sf_dir)
    n = codes.count()
    k_cells = max(16, min(4096, -(-n // 512)))
    cents = similarity.pseudo_centroids(k_cells, 64).astype(int)
    return dedup.semantic_dedup(
        codes, cents, threshold=0.35, id_col="vec_id", codes_col="codes"
    ).orderBy("cluster_id", "removed_id")


def doc_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality-score histogram in fixed 0.05 bands: band id =
    floor(quality·20) — deliberately NOT a global NTILE, which would
    funnel 100 TB through one window task; a fixed-band histogram is
    scan-side codegen + one tiny aggregate, and band boundaries are
    stable across corpus growth (a decile isn't).  floor(q·20) is
    computed on the identical round-6 double by both engines (same
    float path ⇒ same band even at representation edges)."""
    from spark_tensors_spark.pipeline import text

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    q = docs.select(
        text.quality_score_col("text").alias("quality")
    )
    return (
        q.withColumn(
            "band", F.floor(F.col("quality") * 20).cast("long")
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("quality").alias("min_q"),
            F.max("quality").alias("max_q"),
        )
        .orderBy("band")
    )


def doc_quality_clf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality-classifier fit (`pipeline/quality_clf.py`) —
    the GPT-3/CCNet trained-filter curation stage: hashed-feature
    (64 md5 buckets + bias) logistic regression, positives = lang='en'
    docs, fit by TWO full-batch gradient steps on the doc_id%5≠0 train
    split (docs with doc_id%5=0 are the held-out set the AUC golden
    test scores).  Hard-sigmoid surrogate + power-of-two lr keep every
    gradient and weight an exact dyadic double (the exactstep doctrine
    generalized beyond KGE), so DuckDB replays the whole trajectory.

    Output: 'W' rows (step, feat, summed grad, updated weight) for
    both steps and 'L' rows (step, Σp, Σ(p−y)² Brier sum, n_docs)."""
    from spark_tensors_spark.pipeline import quality_clf

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).filter(F.col("doc_id") % 5 != 0)
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("long").alias("y")
    )
    feats = quality_clf.hashed_features(docs, n_features=64)
    per_step, stats, _w = quality_clf.exact_fit_steps(
        feats, labels, n_steps=2, lr_bits=10
    )
    w_rows = per_step.select(
        F.lit("W").alias("kind"),
        "step",
        F.col("feat").alias("id"),
        F.col("grad").alias("v1"),
        F.col("w").alias("v2"),
        F.lit(0).cast("long").alias("n"),
    )
    l_rows = stats.select(
        F.lit("L").alias("kind"),
        "step",
        F.lit(-1).cast("long").alias("id"),
        F.col("sum_p").alias("v1"),
        F.col("brier").alias("v2"),
        F.col("n_docs").alias("n"),
    )
    return w_rows.unionByName(l_rows).orderBy("kind", "step", "id")


def doc_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round over the corpus: adjacent character-pair
    counts weighted by word frequency, top 20 (count desc, pair asc).
    The corpus-scale step of tokenizer fitting (pipeline/bpe.py) under
    a full integer-exact oracle; the iterative merge loop is pinned
    against a pure-Python reference BPE in tests/test_bpe.py."""
    from spark_tensors_spark.pipeline import bpe

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    pairs = bpe.pair_counts(bpe.word_symbol_table(docs))
    return pairs.orderBy(
        F.col("cnt").desc(), F.col("a"), F.col("b")
    ).limit(20)


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement: top-5 docs per
    source, inclusion probability proportional to token count
    (curation.weighted_sample — Efraimidis–Spirakis exponential race
    over md5-derived uniforms, so the oracle reproduces the exact
    draw).  WindowGroupLimit keeps the shuffle at O(k·strata) rows."""
    from spark_tensors_spark.pipeline import curation, text

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).withColumn(
        "n_tokens", text.token_count_col("text")
    )
    samp = curation.weighted_sample(
        docs, k=5, weight_col="n_tokens", strata_cols=["source"]
    )
    return samp.select(
        "source",
        "doc_id",
        "n_tokens",
        F.col("sample_rank").cast("long").alias("sample_rank"),
    ).orderBy("source", "sample_rank")


def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate accounting per source: kept/dropped counts and mean
    quality of the kept set — the corpus-filter chain, scan-side."""
    from spark_tensors_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        curation.quality_filter(docs)
        .groupBy("source", "keep")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,12)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("source", "keep")
    )


def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination accounting: docs with doc_id % 97 == 0
    stand in for the benchmark suite; corpus docs sharing any word
    3-gram with it are flagged (broadcast of the benchmark n-gram set —
    the corpus side never shuffles)."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    return (
        C.decontaminate(corp, bench, n=3)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
        )
        .orderBy("source")
    )


def doc_decontaminate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-RATIO decontamination accounting
    (`corpus.decontaminate_ratio`): same benchmark fixture as
    doc_decontaminate (doc_id % 97 == 0), but each corpus doc is graded
    by the FRACTION of its distinct 3-grams found in the benchmark —
    the GPT-3-family contamination filter where one shared n-gram is
    noise and a 30% overlap is a leak.  Per-source output carries the
    exact integer gram/hit sums plus flag counts at two thresholds
    (ratio > 0.2 and > 0.5), so the oracle value-verifies the whole
    graded pipeline: distinct-gram counting, broadcast hit counting,
    the ratio division, and both threshold comparisons."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    graded = C.decontaminate_ratio(corp, bench, n=3, tau=0.2)
    return (
        graded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("n_grams_sum"),
            F.sum("n_hit").alias("n_hit_sum"),
            F.sum(
                (F.col("overlap_ratio") > 0.2).cast("long")
            ).alias("n_contam_20"),
            F.sum(
                (F.col("overlap_ratio") > 0.5).cast("long")
            ).alias("n_contam_50"),
        )
        .orderBy("source")
    )


def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection importance weights (`corpus.dsir_weights`,
    Xie et al. 2023): docs with doc_id % 7 == 0 stand in for the
    target domain; every other document is scored by the hashed
    uni+bigram log likelihood ratio of target over raw — the
    importance weight DSIR resamples by.  Two B-bounded bucket-count
    aggregates fit both models, the ≤1024-row log-ratio table
    broadcasts onto the scoring scan, per-token ln terms
    DECIMAL(18,12)-snapped (lm_perplexity doctrine) so the oracle
    replays fit + score end-to-end.  Weight monotonicity in target
    overlap is property-pinned in tests/test_dsir.py."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    target = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    return (
        C.dsir_weights(raw, target, n_buckets=1024)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_feat", "log_w")
        .orderBy("doc_id")
    )


def doc_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval RANK FUSION (`corpus.rrf_fuse`, Cormack et al.
    2009 — the combiner every RAG stack runs over its lexical ⊕
    semantic lists): two exact-integer rankers over the query terms
    ('hash','join','scan') — a term-FREQUENCY list and a
    coverage-then-brevity list (distinct terms matched, shorter doc
    wins) — each top-100 with ranks assigned on the bounded candidate
    frame (TakeOrderedAndProject, never a corpus-wide window), fused
    by Σ 1/(60+rank) with per-term DECIMAL(18,12) snaps.  Integer
    ranker keys mean no rank can flip on a float ulp, so the fusion is
    value-exact end to end."""
    from pyspark.sql.window import Window

    from spark_tensors_spark.pipeline import corpus as C
    from spark_tensors_spark.pipeline.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    terms = ("hash", "join", "scan")
    tq = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    ).filter(F.col("term").isin(*terms))
    w1 = Window.orderBy(F.desc("tf"), F.asc("doc_id"))
    r1 = (
        tq.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(100)
        .withColumn("rank", F.row_number().over(w1))
    )
    ntok = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tok")
    )
    w2 = Window.orderBy(
        F.desc("cov"), F.asc("n_tok"), F.asc("doc_id")
    )
    r2 = (
        tq.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("cov"))
        .join(ntok, "doc_id")
        .orderBy(F.desc("cov"), F.asc("n_tok"), F.asc("doc_id"))
        .limit(100)
        .withColumn("rank", F.row_number().over(w2))
    )
    fused = C.rrf_fuse(
        [r1.select("doc_id", "rank"), r2.select("doc_id", "rank")]
    )
    return (
        fused.select("doc_id", "n_lists", "best_rank", "rrf_score")
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(25)
    )


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 terms per source by summed TF-IDF (natural-log idf,
    ranked on the 6-dp-rounded score, ties broken by term)."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return C.tfidf_top_terms(docs, k=10).orderBy("source", "rk")


def doc_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE (`bpe.encode_words`): fit 8 merges on the
    corpus, tokenize the distinct-word vocabulary with them, and roll
    up the post-BPE token-length distribution weighted by word
    frequency.  HASH-GREEN since r6: the DuckDB oracle replays the
    ENTIRE fit + apply symbolically — 8 unrolled rounds of pair-count
    aggregate → (cnt desc, a, b) argmax → greedy left-to-right merge
    via string `replace` on a '|'-wrapped symbol representation (see
    `_bpe_encode_stats_oracle`).  Also pinned by cross-path parity
    (encode(initial) ≡ iterated merge_pair table, tests/test_bpe.py)
    and the r5 golden digest."""
    from spark_tensors_spark.pipeline import bpe

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    # r14: batched-K rounds (merges_per_round=8) — ONE pair-count
    # aggregate collects the top-8 candidates per round and accepts the
    # provably-sequential-identical prefix (fit_bpe docstring /
    # tests/test_bpe.py parity), amortizing the per-merge job pair
    # without changing a single accepted merge (guide §1.2: fix the
    # distributed algorithm's pass count first)
    merges = bpe.fit_bpe(docs, n_merges=8, merges_per_round=8)
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        # both sides of the stats join below read this corpus aggregate
        # — materialize once (guide §5)
        .localCheckpoint()
    )
    enc = bpe.encode_words(words, merges)
    return (
        enc.join(words, "w")
        .groupBy("n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("c").cast("long").alias("n_occurrences"),
        )
        .orderBy("n_tokens")
    )


COMP_W = 8  # shingle width of the dictionary-compressibility proxy


def doc_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility rollup (the Gopher/RefinedWeb
    boilerplate filter) restated as an EXACT LZ-dictionary proxy so the
    whole signal sits under the value oracle (VERDICT r9 #3):
    ratio = |distinct 8-char shingles| / |shingles| — a low ratio means
    the text re-uses phrases (a small LZ77 dictionary covers it), the
    same ordering zlib's byte ratio induces.  Both counts are exact
    integers, the per-doc ratio is ONE division of identical int64s
    (bit-identical across engines), extremes ship UNROUNDED (r5 dyadic
    ROUND doctrine), and the average uses the DECIMAL(18,12) per-row
    snap (doc_repetition_stats shape).  The zlib-byte variant
    (`text.compression_signal`) remains the library-backed operator —
    golden-pinned in tests/test_text.py (digest + monotonicity)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    w = COMP_W
    t = docs.filter(F.length("text") >= w).select(
        "source", (F.length("text") - (w - 1)).cast("long").alias("n_sh"),
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - (w - 1)),
                    lambda p: F.col("text").substr(p, F.lit(w)),
                )
            )
        ).cast("long").alias("n_dist"),
    )
    t = t.select(
        "source",
        (F.col("n_dist").cast("double") / F.col("n_sh").cast("double")).alias(
            "ratio"
        ),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,12)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_ratio"),
            F.min("ratio").alias("min_ratio"),
            F.max("ratio").alias("max_ratio"),
            F.sum((F.col("ratio") < 0.3).cast("long")).alias("n_boiler"),
        )
        .orderBy("source")
    )


BM25_TERMS = ("hash", "join", "scan")


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 3-term query (`corpus.bm25_topk`):
    scan-side term filter, three broadcast statistics, one codegen
    scoring projection, TakeOrderedAndProject — every per-term
    contribution DECIMAL(18,12)-snapped so the oracle matches exactly
    (identical expression tree, identical double literals)."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return C.bm25_topk(docs, BM25_TERMS, k=20)


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter (`corpus.lm_perplexity`): unigram
    add-one LM fitted on the doc_id%10==0 slice, every other document
    scored by average negative token log-likelihood; the 20 most
    perplexing (= most filterable) docs.  Fit = one aggregate; model
    broadcasts to the scoring scan; per-token ln contributions
    DECIMAL(18,12)-snapped (bm25 doctrine) so the oracle replays the
    fit + score end-to-end."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        C.lm_perplexity(docs, train_mod=10)
        .orderBy(F.desc("log_ppl"), F.asc("doc_id"))
        .limit(20)
    )


def doc_unigram_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer segmentation (`pipeline/unigram.py` —
    SentencePiece's decode half, EM explicitly out of scope): Viterbi-
    segment every distinct lowercase word under the FIXED formula-
    defined integer-weight vocabulary; the 25 highest-scoring words
    with their piece counts.  The dp fold is one codegen projection
    (no UDF, no vocab join); the oracle replays it as a last-4-window
    recursive CTE — integer weights make the whole decode exact."""
    from spark_tensors_spark.pipeline.unigram import viterbi_segment_stats

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.coalesce("text", F.lit("")), " "),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]{2,16}$"))
        .distinct()
    )
    return (
        viterbi_segment_stats(words)
        .orderBy(F.desc("score"), F.asc("word"))
        .limit(25)
    )


def doc_unigram_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed unigram-LM tokenizer FIT
    (`pipeline/unigram.unigram_fit_em` — the SentencePiece hard-EM
    loop: seed vocab from frequent substrings, then two Viterbi-
    re-estimation rounds).  Scores are integer-quantized
    log-likelihoods (exact binary-digit-count log2, never a float op),
    so segmentations, piece counts, the '<obj>' objective and '<tok>'/
    '<vocab>' summaries are all exact BIGINTs both engines reproduce
    bit-for-bit; the oracle replays both EM rounds with last-3-window
    recursive-CTE Viterbi folds (strict-> smallest-k tie-break, same
    rule as the Spark fold).  Parity with a pure-Python EM reference
    is pinned in tests/test_unigram_fit.py."""
    from spark_tensors_spark.pipeline.unigram import unigram_fit_em

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return unigram_fit_em(docs, rounds=2, max_multi=96, min_seed=2)


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: per-source mean/max repeated
    3-gram fraction and the count of repetitive docs — all computed
    inside each row's token array (zero pre-agg shuffle)."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return (
        C.repetition_stats(docs, n=3)
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("dup_frac").cast("decimal(18,12)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_dup_frac"),
            F.round(F.max("dup_frac"), 6).alias("max_dup_frac"),
            F.sum((F.col("dup_frac") > 0.1).cast("long")).alias("n_repetitive"),
        )
        .orderBy("source")
    )


def doc_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word trigrams (count desc, gram asc) — the
    classic n-gram count, partial-agg + TakeOrdered."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return C.ngram_topk(docs, n=3, k=20)


def doc_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style skip-gram training pairs (corpus.skipgram_topk):
    every (center, context) word pair within ±2 positions, both
    directions, counted corpus-wide, top-30 — the embedding-training
    pair generator as pure scan-side codegen (sequence → nested
    transform → flatten; no Python).  A Python UDTF producing the
    identical pair stream is parity-pinned in tests/test_skipgrams.py
    (§2.10 breadth) but stays OFF the declared plan: the codegen form
    is the 100 TB path."""
    from spark_tensors_spark.pipeline import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    return C.skipgram_topk(docs, window=2, k=30)


DOC_SKIPGRAMS_SQL = """
WITH toks AS (
    SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
    FROM documents
),
fwd AS (
    SELECT t[CAST(i AS INT)] AS center,
           t[CAST(i + d AS INT)] AS context
    FROM toks,
         UNNEST(range(1, len(t) + 1)) AS ii(i),
         UNNEST(range(1, 3)) AS dd(d)
    WHERE i + d <= len(t)
),
pairs AS (
    SELECT center, context FROM fwd
    UNION ALL
    SELECT context AS center, center AS context FROM fwd
)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS c
FROM pairs
GROUP BY center, context
ORDER BY c DESC, center, context
LIMIT 30
"""


# ---------------------------------------------------------------- rows-only
# (engine-specific signatures; semantics pytest-covered, no SQL oracle)


# SimHash signatures feed the count scan + both self-join sides inside
# simhash_candidates; memoized like _SIGS_CACHE so the Python signature
# build runs once per (session, dataset) instead of leaking an
# unreleased persist inside the operator
_SIMHASH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _simhashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIMHASH_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        docs = ensure_scan_parallelism(docs)
        _SIMHASH_CACHE[key] = dedup.simhash64(
            docs, token_hash_sql=dedup.PSEUDO_TOKEN_HASH_SQL
        ).persist()
    return _SIMHASH_CACHE[key]


def doc_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates through the PRODUCTION plan (JVM
    token hashing, Arrow bit-vote, 16-bit band self-join with the
    oversized-bucket cap) — on the polynomial pseudo-token hash
    (`dedup.PSEUDO_TOKEN_HASH_SQL`), so every signature bit is
    integer-exact and the DuckDB oracle recomputes the 64-bit majority
    vote + all 4 chunks symbolically (the r5 ANN pseudo-geometry
    doctrine applied to SimHash).  The xxhash64 production hash keeps
    its exact sf0.001 digest pin in tests/test_trained_ann_goldens.py."""
    sim = _simhashes(spark, sf_dir)
    return dedup.simhash_candidates(sim).orderBy("doc_a", "doc_b")


def emb_near_dup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE near-dup path on the declared surface: hyperplane-LSH
    buckets → exact cosine within bucket (candidate space Σ bucket², not
    N²).  The synthetic embeddings have no true near-dups (max cos
    ≈ 0.49), so the declared form reports the top-50 in-bucket
    candidate pairs by cosine — always non-empty, same machinery.
    Runs on int8 codes with the fixed integer `pseudo_planes`, so
    bucket bits and all three dot products are exact integers and the
    UNROUNDED cosine `dot/√(na²·nb²)` is bit-identical cross-engine
    (hash-gated by the driver since r6); the random-hyperplane float
    path keeps its digest pin in tests/test_trained_ann_goldens.py and
    its subset-of-brute-force property in tests/test_pipeline_queries.

    Since r13 the declared form carries the GIANT-BUCKET GUARD
    (max_bucket=128, 4 sub-planes of the same pseudo family): the
    sf1.0 decade measured clustered embeddings pushing one bucket to
    ~1.6k vectors (in-bucket join Θ(N²), 175 s) — the guard sub-buckets
    only buckets past the cap, a no-op at every driver scale (max
    bucket 105 at sf0.1), and the oracle replays the size-conditional
    key exactly."""
    codes = _int8_codes(spark, sf_dir)
    planes = similarity.pseudo_planes(12, 64)
    return (
        dedup.embedding_near_dups_bucketed(
            codes, threshold=-1.0, planes=planes,
            id_col="vec_id", vec_col="codes", round_decimals=None,
            max_bucket=128, sub_planes=4,
        )
        .orderBy(F.desc("cos"), "id_a", "id_b")
        .limit(50)
    )


def emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (`similarity.matryoshka_topk`,
    Kusupati et al. 2022): coarse top-64 by the 16-dim PREFIX dot,
    exact full-64-dim cosine re-rank to top-10 — the adaptive-retrieval
    cascade MRL embeddings exist for (score with 1/4 of the dims, pay
    full-dim cost only on survivors).  On int8 codes both stages'
    dots are exact BIGINTs and the final unrounded cosine is
    bit-identical cross-engine, so the whole cascade — coarse ranks,
    survivor set, re-ranked order — sits under the value oracle.
    Queries = vec_id % 500 == 0."""
    codes = _int8_codes(spark, sf_dir)
    queries = codes.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("qcodes"),
    )
    return similarity.matryoshka_topk(
        codes, queries, prefix_dim=16, k_coarse=64, k=10
    ).orderBy("query_id", "rk")


def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversification through the
    PRODUCTION plan (candidate×vector equi-join + one applyInPandas
    greedy per ≤k-row query group, `similarity.mmr_rerank`), fed by
    the LSH top-10 on int8 codes with pseudo_planes — `normalize=False`
    keeps the redundancy term a raw integer dot, so every selection
    score is λ·sim − (1−λ)·red over exact integers (bit-identical
    doubles) and the DuckDB oracle replays the n=5 greedy selection as
    five unrolled argmax CTEs.  Output is integer-only (query_id,
    nn_id, mmr_rank)."""
    codes = _int8_codes(spark, sf_dir)
    planes = similarity.pseudo_planes(6, 64)
    scored = similarity.lsh_bucketed_topk(
        codes, k=10, vec_col="codes", planes=planes, metric="dot",
        query_filter=F.col("vec_id") % 5 == 0,
    ).select("query_id", "nn_id", "sim")
    out = similarity.mmr_rerank(
        scored, codes, n=5, lambda_=0.7,
        vec_col="codes", normalize=False,
    )
    return out.orderBy("query_id", "mmr_rank")


def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH ANN self-top-k through the production plan
    (mapInPandas projection, bucket-keyed applyInPandas re-rank,
    global window) on int8 codes with fixed integer hyperplanes —
    every projection sign and inner product is an exact integer, so
    buckets, probes, and ranks hash-match the DuckDB oracle.  The
    random-hyperplane float path keeps its digest pin in
    tests/test_trained_ann_goldens.py."""
    codes = _int8_codes(spark, sf_dir)
    planes = similarity.pseudo_planes(6, 64)
    return (
        similarity.lsh_bucketed_topk(
            codes, k=5, vec_col="codes", planes=planes, metric="dot"
        )
        .select(
            "query_id", "nn_id",
            F.col("sim").cast("long").alias("dot"), "rk",
        )
        .orderBy("query_id", "rk")
    )


def doc_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline as ONE fused plan — the 100 TB
    story is the composition, not the stages: exact-dup removal →
    quality gate → eval-set decontamination → sequence packing, each
    stage already value-oracled alone (doc_exact_dup_groups,
    doc_quality_filter, doc_decontaminate, doc_pack_sequences), here
    chained so Catalyst plans the whole corpus pass at once.

    Stage shapes at scale: dedup is one window over md5(text) (group
    sizes = dup-cluster sizes); the quality gate is scan-side codegen
    (filters before any shuffle); decontamination broadcasts the
    benchmark n-gram set (corpus side never shuffles for it); packing
    is one running-sum window per source.  Total: three shuffles for
    the whole pipeline, none keyed on a skewed column, no collect —
    the plan-hygiene sweep covers the fused plan like every other
    declared query.

    Benchmark set = doc_id % 97 == 0 (the doc_decontaminate fixture),
    excluded from the corpus up front."""
    from spark_tensors_spark.pipeline import corpus as C
    from spark_tensors_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_scan_parallelism(docs)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    # stage 1 — exact dedup: keep the smallest doc_id per content hash.
    # r14 (guide §8/§2.3/§2.5): the min-id DECISION runs on metadata
    # only — a map-side-combinable (md5, min(doc_id)) aggregate — and
    # survivors re-attach by a doc_id semi-join, so the full document
    # payload is never hash-exchanged by content hash (the previous
    # row_number window shuffled every text byte AND serialized giant
    # dup-groups onto single keys; doc_id is unique, so the join key
    # cannot skew, and AQE turns the join into a broadcast when the
    # keeper-id set is small enough).  Identical output: doc_id is
    # unique, so "rank 1 by doc_id within hash" ≡ "doc_id ∈ {min ids}".
    keeps = (
        corp.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = corp.join(keeps, "doc_id", "left_semi")
    # stage 2 — quality gate (adds n_tokens, reused by packing)
    gated = curation.quality_filter(deduped).filter(F.col("keep"))
    # stage 3 — decontaminate against the benchmark 3-grams
    clean = C.decontaminate(gated, bench, n=3).filter(
        ~F.col("contaminated")
    )
    # stage 4 — pack into 512-token bins per source
    packed = curation.pack_sequences(clean, budget_tokens=512)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tok_sum"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source", "bin_id")
    )


TEMP_MIX_N = 200

# deterministic skewed pretraining domains (50/30/15/5%): valid in both
# Spark SQL and DuckDB verbatim
TEMP_MIX_DOMAIN = (
    "CASE WHEN doc_id % 100 < 50 THEN 'web' "
    "WHEN doc_id % 100 < 80 THEN 'books' "
    "WHEN doc_id % 100 < 95 THEN 'code' ELSE 'wiki' END"
)


def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source balancing
    (`curation.temperature_mixture_sample`, alpha=0.5): per-domain
    quotas ∝ sqrt(count) by exact-BIGINT largest remainder, members by
    portable md5 rank — the T5/mT5/Pile flattening step that upweights
    small domains at pretraining-mixture time.  The fixture's `source`
    column is uniform (20 equal sources — flattening would be
    invisible), so the query stratifies on a deterministic SKEWED
    domain (50/30/15/5% by doc_id) and the temperature visibly lifts
    the small domains: quotas = 76/59/41/24 of 200 vs the 100/60/30/10
    natural proportions.  Everything from the count aggregate down is
    either IEEE-pinned (sqrt is correctly rounded by the standard) or
    pure integer arithmetic, so the oracle replays the WHOLE
    allocation — weights, div/mod quotas, remainder ranking, shortfall
    top-up — not just the membership; the quota column rides along in
    the compared output."""
    from spark_tensors_spark.pipeline import curation

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).select(
        F.expr(TEMP_MIX_DOMAIN).alias("domain"), "doc_id"
    )
    return curation.temperature_mixture_sample(
        docs, TEMP_MIX_N, alpha=0.5, strat_col="domain"
    ).orderBy("domain", "sample_rank")


_TEMP_MIX_SQL = f"""
    WITH doms AS MATERIALIZED (
        SELECT {TEMP_MIX_DOMAIN} AS domain, doc_id FROM documents
    ),
    counts AS (
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM doms GROUP BY domain
    ),
    wts AS MATERIALIZED (
        SELECT domain,
               CAST(FLOOR(sqrt(CAST(n_s AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS wt
        FROM counts
    ),
    base AS MATERIALIZED (
        SELECT domain,
               ({TEMP_MIX_N} * wt) // (SELECT SUM(wt) FROM wts) AS q0,
               ({TEMP_MIX_N} * wt) % (SELECT SUM(wt) FROM wts) AS rem
        FROM wts
    ),
    rr AS (
        SELECT domain, q0,
               ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS r
        FROM base
    ),
    alloc AS (
        SELECT domain,
               CAST(q0 + CASE WHEN r <= {TEMP_MIX_N} - (SELECT SUM(q0)
                                                        FROM base)
                              THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM rr
    ),
    ranked AS (
        SELECT domain, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '_tmx42'),
                            doc_id) AS BIGINT) AS sample_rank
        FROM doms
    )
    SELECT r.domain, r.doc_id, r.sample_rank, a.quota
    FROM ranked r JOIN alloc a USING (domain)
    WHERE r.sample_rank <= a.quota
    ORDER BY domain, sample_rank
"""


PAD_MAXLEN = 12


def doc_pad_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 padding as a declared, value-oracled query — the reference's
    keras batch prep (`kge/hole.py:268-285`): convert words to vocab
    ids (`convert`: ``rvocab.get(w, 0)``), then
    ``pad_sequences(maxlen, padding='post', truncating='post',
    value=0)``.  Vocab here is the deterministic dense rank of the
    distinct token (the reference's insertion-order vocab is
    process-local; rank order is the cluster-stable equivalent — the
    J1–J3 dictionary-encode doctrine).

    Plan at 100 TB: the vocab is built by the SAME
    :func:`~spark_tensors_spark.kg.dictionary.assign_ids` that builds
    the entity dictionary (range-bucketed windows over a sampled
    boundary set — dense rank order WITHOUT a global single-partition
    sort), then one shuffle join token→id and one groupBy re-assembly;
    the pad itself
    (:func:`~spark_tensors_spark.functions.columns.pad_sequences_col`)
    is pure codegen.  The padded array is compared ELEMENT-WISE via
    ``posexplode`` into scalar ``(doc_id, pos, id_at_pos)`` rows — the
    oracle still checks every element position, but the compared
    output schema stays scalar-only (driver-contract invariant: the
    driver's canonicalizer cannot sort array-typed columns, the sole
    r11 CORRECTNESS failure; pinned repo-wide by
    ``tests/test_plan_hygiene.py``).
    """
    from spark_tensors_spark.functions.columns import pad_sequences_col
    from spark_tensors_spark.kg.dictionary import assign_ids

    docs = ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(text.tokens_col("text")).alias("pos", "tok"),
    )
    vocab = assign_ids(toks.select(F.col("tok").alias("uri")), "uri").select(
        F.col("uri").alias("tok"),
        (F.col("id") + 1).cast("long").alias("tok_id"),
    )
    seqs = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
                lambda x: x["tok_id"],
            ).alias("ids"),
            F.count(F.lit(1)).alias("orig_len"),
        )
    )
    padded = seqs.select(
        "doc_id",
        "orig_len",
        pad_sequences_col("ids", PAD_MAXLEN).alias("padded"),
        F.greatest(
            F.lit(0), F.lit(PAD_MAXLEN) - F.col("orig_len")
        ).cast("long").alias("n_pad"),
    )
    return padded.select(
        "doc_id",
        "orig_len",
        F.posexplode("padded").alias("pos", "id_at_pos"),
        "n_pad",
    ).withColumn("pos", F.col("pos").cast("long")).orderBy("doc_id", "pos")


QUERIES = {
    "doc_source_hash_stats": doc_source_hash_stats,
    "doc_exact_dup_groups": doc_exact_dup_groups,
    "doc_minhash_signatures": doc_minhash_signatures,
    "doc_lsh_pairs": doc_lsh_pairs,
    "doc_lsh_dup_groups": doc_lsh_dup_groups,
    "doc_winnow_fingerprints": doc_winnow_fingerprints,
    "emb_similarity_zoo": emb_similarity_zoo,
    "doc_trigram_jaccard_adjacent": doc_trigram_jaccard_adjacent,
    "doc_text_stats": doc_text_stats,
    "emb_cosine_topk": emb_cosine_topk,
    "emb_l2_topk": emb_l2_topk,
    "emb_label_centroids": emb_label_centroids,
    "emb_near_dup_pairs": emb_near_dup_pairs,
    "doc_lsh_components": doc_lsh_components,
    "doc_lsh_components_dist": doc_lsh_components_dist,
    "doc_stratified_split": doc_stratified_split,
    "doc_bpe_pair_counts": doc_bpe_pair_counts,
    "emb_int8_quantize": emb_int8_quantize,
    "emb_kmeans_step": emb_kmeans_step,
    "doc_skipgrams": doc_skipgrams,
    "emb_kmeans_iters": emb_kmeans_iters,
    "emb_semantic_dedup": emb_semantic_dedup,
    "doc_quality_histogram": doc_quality_histogram,
    "doc_quality_clf_fit": doc_quality_clf_fit,
    "doc_chunk_windows": doc_chunk_windows,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_quality_filter": doc_quality_filter,
    "doc_decontaminate": doc_decontaminate,
    "doc_decontaminate_ratio": doc_decontaminate_ratio,
    "doc_pipeline_e2e": doc_pipeline_e2e,
    "doc_pad_sequences": doc_pad_sequences,
    "doc_tfidf_top_terms": doc_tfidf_top_terms,
    "doc_bm25_topk": doc_bm25_topk,
    "doc_lm_perplexity": doc_lm_perplexity,
    "doc_unigram_encode_stats": doc_unigram_encode_stats,
    "doc_unigram_fit": doc_unigram_fit,
    "doc_dsir_weights": doc_dsir_weights,
    "doc_rrf_fusion": doc_rrf_fusion,
    "doc_repetition_stats": doc_repetition_stats,
    "doc_ngram_topk": doc_ngram_topk,
    "doc_jaccard_join": doc_jaccard_join,
    "doc_jaccard_topk": doc_jaccard_topk,
    "doc_dedup_keep_best": doc_dedup_keep_best,
    "emb_gram_int8": emb_gram_int8,
    "doc_pii_scrub": doc_pii_scrub,
    "doc_dup_spans": doc_dup_spans,
    "doc_max_dup_spans": doc_max_dup_spans,
    "doc_mixture_sample": doc_mixture_sample,
    "doc_temperature_mixture": doc_temperature_mixture,
    "doc_shard_export": doc_shard_export,
    "emb_hard_negatives": emb_hard_negatives,
    "doc_minhash_jaccard_est": doc_minhash_jaccard_est,
    # value-oracled since r5/r6 (integer pseudo-geometry / int8 codes)
    "emb_ann_lsh_topk": emb_ann_lsh_topk,
    "emb_ann_ivf_topk": emb_ann_ivf_topk,
    "emb_pq_topk": emb_pq_topk,
    "emb_ann_ivfpq_topk": emb_ann_ivfpq_topk,
    "emb_pca_moments": emb_pca_moments,
    "emb_ann_ivf_recall": emb_ann_ivf_recall,
    "emb_near_dup_bucketed": emb_near_dup_bucketed,
    "emb_matryoshka_topk": emb_matryoshka_topk,
    "doc_simhash_candidates": doc_simhash_candidates,
    "emb_mmr_rerank": emb_mmr_rerank,
    # invariant-oracled (cov(white) = I; eigenbasis not SQL-expressible)
    "emb_whiten_moments": emb_whiten_moments,
    # oracled since r6: full symbolic fit+apply replay (see
    # _bpe_encode_stats_oracle)
    "doc_bpe_encode_stats": doc_bpe_encode_stats,
    # rows-only (eigensolve / zlib)
    "emb_pca_topvar": emb_pca_topvar,
    "doc_compression_stats": doc_compression_stats,
}

_SHINGLES = (
    "[ascii(substr(text, CAST(i AS INT), 1)) * 65536"
    " + ascii(substr(text, CAST(i AS INT) + 1, 1)) * 256"
    " + ascii(substr(text, CAST(i AS INT) + 2, 1))"
    " FOR i IN range(1, greatest(length(text) - 1, 2))]"
)

_MINHASH_COLS = ",\n           ".join(
    f"list_min([(CAST({a} AS BIGINT) * x + {b}) % {MERSENNE_P} FOR x IN sh])"
    f" AS m{j}"
    for j, (a, b) in enumerate(MINHASH_PARAMS)
)

_SIGS_CTE = f"""
WITH sh_t AS (
    SELECT doc_id, {_SHINGLES} AS sh FROM documents
),
sigs AS (
    SELECT doc_id,
           {_MINHASH_COLS}
    FROM sh_t
)
"""

_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

# word trigrams per doc (matches corpus.word_ngrams_col at n=3)
_GRAMS_CTE = f"""
WITH toks AS (
    SELECT doc_id, source, {_TOKENS} AS tk FROM documents
),
grams AS (
    SELECT doc_id, source,
           CASE WHEN len(tk) >= 3 THEN
               list_transform(range(1, len(tk) - 1),
                              i -> array_to_string(tk[i:i+2], ' '))
           ELSE [] END AS gs
    FROM toks
)
"""
_STOP_EN = "('the','and','of','to','a','in','is','it','that','for')"
_STOP_DE = "('der','die','das','und','ist','ein','zu','mit','von','nicht')"
_STOP_FR = "('le','la','les','et','est','un','une','de','que','pour')"

_LSH_REACH_PREFIX = (
    _SIGS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + """, banded_all AS (
            SELECT doc_id, 0 AS band, concat_ws('_', m0, m1) AS sig FROM sigs
            UNION ALL
            SELECT doc_id, 1, concat_ws('_', m2, m3) FROM sigs
            UNION ALL
            SELECT doc_id, 2, concat_ws('_', m4, m5) FROM sigs
            UNION ALL
            SELECT doc_id, 3, concat_ws('_', m6, m7) FROM sigs
        ),
        banded AS MATERIALIZED (
            SELECT * FROM banded_all
            QUALIFY COUNT(*) OVER (PARTITION BY band, sig) <= 64
        ),
        pairs AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
        ),
        edges AS MATERIALIZED (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, seen) AS (
            SELECT u, u FROM edges
            UNION
            SELECT r.node, e.v
            FROM reach r JOIN edges e ON e.u = r.seen
        )"""
)

_LSH_COMPONENTS_SQL = (
    _LSH_REACH_PREFIX
    + """
        SELECT node AS doc_id, MIN(seen) AS keep_doc_id
        FROM reach
        GROUP BY node HAVING MIN(seen) <> node
        ORDER BY doc_id"""
)

_KEEP_BEST_SQL = (
    _LSH_REACH_PREFIX
    + f""",
        comp AS (
            SELECT node, MIN(seen) AS group_id FROM reach GROUP BY node
        ),
        q AS (
            SELECT doc_id,
                   ROUND(0.5 * LEAST(CAST(len(tk) AS BIGINT) / 100.0, 1.0)
                         + 0.5 * LEAST(CASE WHEN len(tk) > 0 THEN
                               CAST(len(list_filter(
                                   tk, x -> lower(x) IN {_STOP_EN}))
                                   AS DOUBLE) / len(tk) ELSE 0 END * 5.0,
                               1.0)
                         - 0.25 * LEAST(CASE WHEN length(text) > 0 THEN
                               CAST(length(regexp_replace(
                                   text, '[^,.!?;:]', '', 'g'))
                                   AS DOUBLE) / length(text) ELSE 0 END
                               * 10.0, 1.0), 6) AS quality
            FROM (SELECT doc_id, text, {_TOKENS} AS tk FROM documents)
        )
        SELECT group_id, n_docs, best_doc_id, best_quality FROM (
            SELECT c.group_id,
                   COUNT(*) OVER (PARTITION BY c.group_id) AS n_docs,
                   c.node AS best_doc_id,
                   q.quality AS best_quality,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.group_id
                       ORDER BY q.quality DESC, c.node ASC) AS rk
            FROM comp c JOIN q ON q.doc_id = c.node
        ) WHERE rk = 1 ORDER BY group_id"""
)

# Shared CTE for the ANN oracles: the int8 code vectors (identical to
# the green emb_int8_quantize projection) that the four ANN queries
# search over.  Every downstream bucket/cell/ADC value is pure integer
# arithmetic on these codes + the pseudo-geometry formulas
# (similarity.pseudo_planes/centroids/codebooks), so DuckDB recomputes
# the whole index + search symbolically.
_ANN_CODES_CTE = """
WITH v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
    FROM embeddings
),
s AS (
    SELECT vec_id, vd,
           list_max(list_transform(vd, x -> abs(x))) AS maxabs
    FROM v
),
q AS (
    SELECT vec_id,
           list_transform(vd, x -> CASE WHEN maxabs = 0 THEN 0
               ELSE CAST(greatest(-127, least(127,
                    round(x * 127 / maxabs))) AS BIGINT) END) AS codes
    FROM s
)
"""


def _plane_bucket_expr(n_planes: int) -> str:
    """The symbolic sign-of-projection bucket id over `codes` with
    `similarity.pseudo_planes(n_planes, 64)` — ONE source of truth for
    every LSH oracle (plane formula must stay bit-identical to
    `pseudo_planes`: ((p·31 + j·17 + 7) mod 97) − 48)."""
    return (
        f"CAST(list_sum(list_transform(range({n_planes}), p ->\n"
        "                       CASE WHEN list_sum(list_transform("
        "range(64), j ->\n"
        "                           codes[CAST(j AS INT) + 1]\n"
        "                           * ((p * 31 + j * 17 + 7) % 97 - 48)"
        ")) > 0\n"
        "                       THEN (1 << CAST(p AS INT)) ELSE 0 END))\n"
        "                   AS BIGINT)"
    )


def _probe_list_expr(n_planes: int) -> str:
    """Multiprobe bucket list: the bucket plus its n_planes Hamming-1
    neighbours — mirrors `lsh_bucketed_topk`'s probe expansion."""
    return (
        f"UNNEST(list_prepend(bucket, list_transform(range({n_planes}),\n"
        "                       i -> xor(bucket,\n"
        "                                CAST(1 << CAST(i AS INT) "
        "AS BIGINT)))))"
    )


def _unigram_fit_round_sql(n: int) -> str:
    """One EM round of the unigram-fit oracle: integer-quantized costs
    from vocab{n}, a last-3-window recursive-CTE Viterbi fold carrying
    the winning PATH (dp state = (v, path) at i, i-1, i-2; strict->
    smallest-k tie-break — the same rule as the Spark fold in
    pipeline/unigram._viterbi_dp_expr), then Viterbi piece counts."""
    return f"""
cost{n} AS MATERIALIZED (
    SELECT v.p,
           CAST(length(printf('%b',
               ((t.t_sum + t.v_n + 1) * 64) // (v.c + 1))) - 1
                AS BIGINT) AS cost
    FROM vocab{n} v,
         (SELECT CAST(SUM(c) AS BIGINT) AS t_sum,
                 CAST(COUNT(*) AS BIGINT) AS v_n FROM vocab{n}) t
),
dp{n} AS (
    SELECT w, f, 0 AS i,
           CAST(0 AS BIGINT) AS va, CAST([] AS VARCHAR[]) AS pa,
           CAST(NULL AS BIGINT) AS vb, CAST(NULL AS VARCHAR[]) AS pb,
           CAST(NULL AS BIGINT) AS vc, CAST(NULL AS VARCHAR[]) AS pc
    FROM wf
    UNION ALL
    SELECT w, f, i,
           CASE WHEN ok3 AND v3 >
                     (CASE WHEN ok2 AND v2 > v1 THEN v2 ELSE v1 END)
                THEN v3
                WHEN ok2 AND v2 > v1 THEN v2
                ELSE v1 END AS va,
           CASE WHEN ok3 AND v3 >
                     (CASE WHEN ok2 AND v2 > v1 THEN v2 ELSE v1 END)
                THEN p3
                WHEN ok2 AND v2 > v1 THEN p2
                ELSE p1 END AS pa,
           pva AS vb, ppa AS pb, pvb AS vc, ppb AS pc
    FROM (
        SELECT d.w, d.f, d.i + 1 AS i,
               d.va - (64 * k1.cost + 1) AS v1,
               list_append(d.pa, substr(d.w, d.i + 1, 1)) AS p1,
               (d.i + 1 >= 2 AND k2.cost IS NOT NULL) AS ok2,
               d.vb - (64 * k2.cost + 1) AS v2,
               list_append(d.pb, substr(d.w, d.i, 2)) AS p2,
               (d.i + 1 >= 3 AND k3.cost IS NOT NULL) AS ok3,
               d.vc - (64 * k3.cost + 1) AS v3,
               list_append(d.pc, substr(d.w, d.i - 1, 3)) AS p3,
               d.va AS pva, d.pa AS ppa, d.vb AS pvb, d.pb AS ppb
        FROM dp{n} d
        LEFT JOIN cost{n} k1 ON k1.p = substr(d.w, d.i + 1, 1)
        LEFT JOIN cost{n} k2
               ON d.i + 1 >= 2 AND k2.p = substr(d.w, d.i, 2)
        LEFT JOIN cost{n} k3
               ON d.i + 1 >= 3 AND k3.p = substr(d.w, d.i - 1, 3)
        WHERE d.i < length(d.w)
    )
),
seg{n} AS MATERIALIZED (
    SELECT w, f, va AS v, pa AS path FROM dp{n} WHERE i = length(w)
),
counts{n} AS MATERIALIZED (
    SELECT u.p AS p, CAST(SUM(f) AS BIGINT) AS c
    FROM seg{n}, unnest(path) AS u(p) GROUP BY u.p
),
out{n} AS (
    SELECT CAST({n} AS BIGINT) AS round, p AS piece, c AS cnt
    FROM counts{n}
    UNION ALL
    SELECT {n}, '<obj>', CAST(SUM(f * v) AS BIGINT) FROM seg{n}
    UNION ALL
    SELECT {n}, '<tok>', CAST(SUM(f * len(path)) AS BIGINT) FROM seg{n}
    UNION ALL
    SELECT {n}, '<vocab>',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab{n})
)"""


def _unigram_fit_oracle() -> str:
    """Replay of pipeline/unigram.unigram_fit_em (rounds=2,
    max_multi=96, min_seed=2): seed vocab from frequency-weighted
    substring counts, then two hard-EM rounds, each a table-driven
    Viterbi recursive CTE — every quantity exact BIGINT (the cost is a
    binary-digit-count log2, no float anywhere)."""
    return (
        """WITH RECURSIVE
wf AS MATERIALIZED (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS f
    FROM (
        SELECT lower(tk) AS w
        FROM documents,
             unnest(list_filter(string_split(text, ' '),
                                t -> t <> '')) AS u(tk)
    )
    WHERE regexp_matches(w, '^[a-z]{1,12}$')
    GROUP BY w
),
cand AS MATERIALIZED (
    SELECT w, f, i.i AS i, k.k AS k,
           substr(w, CAST(i.i - k.k + 1 AS INT), CAST(k.k AS INT)) AS p
    FROM wf, range(1, 13) i(i), range(1, 4) k(k)
    WHERE i.i <= length(w) AND k.k <= i.i
),
c0 AS MATERIALIZED (
    SELECT p, CAST(SUM(f) AS BIGINT) AS c FROM cand GROUP BY p
),
vocab1 AS MATERIALIZED (
    SELECT p, c FROM c0 WHERE length(p) = 1
    UNION ALL
    SELECT p, c FROM (
        SELECT p, c FROM c0 WHERE length(p) > 1 AND c >= 2
        ORDER BY c DESC, p LIMIT 96
    )
),"""
        + _unigram_fit_round_sql(1)
        + """,
vocab2 AS MATERIALIZED (
    SELECT v.p, CAST(COALESCE(k.c, 0) AS BIGINT) AS c
    FROM vocab1 v LEFT JOIN counts1 k USING (p)
    WHERE length(v.p) = 1
    UNION ALL
    SELECT v.p, k.c FROM vocab1 v JOIN counts1 k USING (p)
    WHERE length(v.p) > 1
),"""
        + _unigram_fit_round_sql(2)
        + """
SELECT round, piece, cnt FROM out1
UNION ALL
SELECT round, piece, cnt FROM out2
ORDER BY round, piece
"""
    )


def _unigram_oracle() -> str:
    """Recursive-CTE replay of pipeline/unigram.viterbi_combined: the
    recursion carries the last 4 dp values (d0 = dp[i] … d3 = dp[i-3]),
    each step appends dp[i+1] = max over piece lengths k = 1..4 of
    dp[i+1-k] + 64·weight(piece) − 1.  All integer arithmetic."""
    from spark_tensors_spark.pipeline.unigram import SENTINEL

    sent = f"CAST({SENTINEL} AS BIGINT)"
    # piece of length k ends at position i+1: chars at i+2-k .. i+1
    cl = "ascii(substr(word, i + 1, 1))"
    cands = []
    for k in range(1, 5):
        c1 = f"ascii(substr(word, i + {2 - k}, 1))"
        c2 = f"ascii(substr(word, i + {3 - k}, 1))"
        if k == 1:
            cands.append(f"d0 + (1 + {c1} % 5) * 64 - 1")
        else:
            w = f"(3 * {k} + ({c1} * 7 + {cl}) % 11)"
            vocab = f"({c1} * 5 + {c2} * 3 + {cl} * 2 + {k}) % 3 = 0"
            cands.append(
                f"CASE WHEN i >= {k - 1} AND {vocab}"
                f" THEN d{k - 1} + {w} * 64 - 1 ELSE {sent} END"
            )
    best = "GREATEST(" + ", ".join(cands) + ")"
    return f"""
        WITH RECURSIVE words AS (
            SELECT DISTINCT term AS word
            FROM (SELECT UNNEST(list_filter(
                      string_split(COALESCE(text, ''), ' '),
                      t -> t <> '')) AS term
                  FROM documents)
            WHERE regexp_matches(term, '^[a-z]{{2,16}}$')
        ),
        r AS (
            SELECT word, 0 AS i, CAST(0 AS BIGINT) AS d0,
                   {sent} AS d1, {sent} AS d2, {sent} AS d3
            FROM words
            UNION ALL
            SELECT word, i + 1, {best}, d0, d1, d2
            FROM r WHERE i < len(word)
        ),
        fin AS (
            SELECT word, d0 AS c, 64 - d0 % 64 AS np
            FROM r WHERE i = len(word)
        )
        SELECT word, CAST((c + np) / 64 AS BIGINT) AS score,
               CAST(np AS BIGINT) AS n_pieces
        FROM fin
        ORDER BY score DESC, word LIMIT 25
    """


ORACLES = {
    "doc_pad_sequences": f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok,
                   unnest(range(1, len(list_filter(string_split(text, ' '),
                                                   t -> t <> '')) + 1)) AS pos
            FROM documents
        ),
        vocab AS (
            SELECT tok,
                   CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tok_id
            FROM (SELECT DISTINCT tok FROM toks)
        ),
        seqs AS (
            SELECT t.doc_id,
                   list(v.tok_id ORDER BY t.pos) AS ids,
                   CAST(count(*) AS BIGINT) AS orig_len
            FROM toks t JOIN vocab v USING (tok)
            GROUP BY t.doc_id
        )
        -- list_resize segfaults on non-flat vectors in DuckDB 1.0.0;
        -- pad by concat with a generated fill list instead.  Scalar
        -- output contract: unnest the padded list positionally (two
        -- unnests in one SELECT zip) so no array column is compared.
        , pad AS (
            SELECT doc_id, orig_len,
                   list_concat(
                       ids[1:{PAD_MAXLEN}],
                       list_transform(
                           range(greatest(0, {PAD_MAXLEN} - orig_len)),
                           x -> CAST(0 AS BIGINT))) AS padded,
                   CAST(greatest(0, {PAD_MAXLEN} - orig_len) AS BIGINT)
                       AS n_pad
            FROM seqs
        )
        SELECT doc_id, orig_len,
               CAST(unnest(range({PAD_MAXLEN})) AS BIGINT) AS pos,
               unnest(padded) AS id_at_pos,
               n_pad
        FROM pad
        ORDER BY doc_id, pos
    """,
    "doc_source_hash_stats": """
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_distinct
        FROM documents GROUP BY source ORDER BY source
    """,
    "doc_exact_dup_groups": """
        SELECT md5(text) AS content_hash, COUNT(*) AS cnt,
               MIN(doc_id) AS keep_doc_id,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
        FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
        ORDER BY content_hash
    """,
    "doc_minhash_signatures": _SIGS_CTE
    + "SELECT * FROM sigs ORDER BY doc_id",
    "doc_lsh_pairs": _SIGS_CTE
    + """, banded_all AS (
            SELECT doc_id, 0 AS band, concat_ws('_', m0, m1) AS sig FROM sigs
            UNION ALL
            SELECT doc_id, 1, concat_ws('_', m2, m3) FROM sigs
            UNION ALL
            SELECT doc_id, 2, concat_ws('_', m4, m5) FROM sigs
            UNION ALL
            SELECT doc_id, 3, concat_ws('_', m6, m7) FROM sigs
        ),
        banded AS (
            SELECT * FROM banded_all
            QUALIFY COUNT(*) OVER (PARTITION BY band, sig) <= 64
        )
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
        ORDER BY doc_a, doc_b""",
    "doc_lsh_dup_groups": _SIGS_CTE
    + """, banded AS (
            SELECT doc_id, 0 AS band, concat_ws('_', m0, m1) AS sig FROM sigs
            UNION ALL
            SELECT doc_id, 1, concat_ws('_', m2, m3) FROM sigs
            UNION ALL
            SELECT doc_id, 2, concat_ws('_', m4, m5) FROM sigs
            UNION ALL
            SELECT doc_id, 3, concat_ws('_', m6, m7) FROM sigs
        ),
        linked AS (
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY band, sig) AS keep_doc_id
            FROM banded
        )
        SELECT doc_id, MIN(keep_doc_id) AS keep_doc_id
        FROM linked WHERE doc_id > keep_doc_id
        GROUP BY doc_id ORDER BY doc_id""",
    "doc_lsh_components": _LSH_COMPONENTS_SQL,
    "doc_lsh_components_dist": _LSH_COMPONENTS_SQL,
    "doc_dedup_keep_best": _KEEP_BEST_SQL,
    "doc_pii_scrub": r"""
        WITH a AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN
                          ' reach user' || doc_id
                          || '@mail-svc.example.com now' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN
                          ' src 10.' || (doc_id % 200) || '.0.'
                          || (doc_id % 250) ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN
                          ' call +1-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS aug
            FROM documents
        ),
        s AS (
            SELECT source, aug,
                   len(regexp_extract_all(aug,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS ce,
                   len(regexp_extract_all(aug,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS ci,
                   len(regexp_extract_all(aug,
                       '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS cp,
                   regexp_replace(regexp_replace(regexp_replace(aug,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<PII>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<PII>', 'g'),
                       '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PII>', 'g')
                       AS scrubbed
            FROM a
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(ce) AS BIGINT) AS n_emails,
               CAST(SUM(ci) AS BIGINT) AS n_ips,
               CAST(SUM(cp) AS BIGINT) AS n_phones,
               CAST(SUM(length(aug) - length(scrubbed)) AS BIGINT)
                   AS redacted_chars,
               CAST(SUM(CAST(('0x' || substr(md5(scrubbed), 1, 8))
                             AS BIGINT)) AS BIGINT) AS scrub_check
        FROM s GROUP BY source ORDER BY source
    """,
    "doc_mixture_sample": _mixture_sample_oracle(),
    "doc_temperature_mixture": _TEMP_MIX_SQL,
    "doc_shard_export": ORACLE_DOC_SHARD_EXPORT,
    "doc_dup_spans": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tk FROM documents
        ),
        grams AS (
            SELECT doc_id, UNNEST(
                CASE WHEN len(tk) >= 8 THEN
                    list_transform(range(1, len(tk) - 6),
                                   i -> array_to_string(tk[i:i+7], ' '))
                ELSE [] END) AS gram
            FROM toks
        )
        SELECT gram, COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occ
        FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) > 1
        ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 25
    """,
    "doc_max_dup_spans": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tk FROM documents
        ),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + 7],
                                   ' ') AS gram
            FROM toks, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS u(i)
            WHERE len(tk) >= 8
        ),
        dup AS MATERIALIZED (
            SELECT gram FROM grams
            GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
        ),
        flagged AS MATERIALIZED (
            SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
        ),
        isl AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS isle
            FROM flagged
        ),
        spans AS MATERIALIZED (
            SELECT doc_id, MIN(pos) AS start_pos,
                   MAX(pos) - MIN(pos) + 8 AS n_tokens,
                   COUNT(*) AS n_grams
            FROM isl GROUP BY doc_id, isle
        )
        SELECT doc_id, CAST(start_pos AS BIGINT) AS start_pos,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_grams AS BIGINT) AS n_grams,
               t.n_spans_total
        FROM spans CROSS JOIN (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_spans_total FROM spans
        ) t
        ORDER BY n_tokens DESC, doc_id, start_pos LIMIT 25
    """,
    "emb_hard_negatives": """
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                   CAST(c.label AS BIGINT) AS nn_label,
                   ROUND(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
              AND q.label <> c.label
        ),
        ranked AS (
            SELECT query_id, nn_id, nn_label, sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, nn_id)
                       AS BIGINT) AS rk
            FROM scored
        )
        SELECT query_id, nn_id, nn_label, sim, rk
        FROM ranked WHERE rk <= 3
        ORDER BY query_id, rk
    """,
    "emb_gram_int8": """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, vd,
                   list_max(list_transform(vd, x -> abs(x))) AS maxabs
            FROM v
        ),
        q AS (
            SELECT vec_id,
                   list_transform(vd, x -> CASE WHEN maxabs = 0 THEN 0
                       ELSE CAST(greatest(-127, least(127,
                            round(x * 127 / maxabs))) AS BIGINT) END)
                       AS codes
            FROM s
        ),
        pos AS (SELECT CAST(UNNEST(range(64)) AS INT) AS p),
        ij AS (
            SELECT a.p AS i, b.p AS j FROM pos a JOIN pos b ON a.p <= b.p
        )
        SELECT ij.i, ij.j,
               CAST(SUM(codes[ij.i + 1] * codes[ij.j + 1]) AS BIGINT)
                   AS gram
        FROM q CROSS JOIN ij
        GROUP BY ij.i, ij.j ORDER BY i, j
    """,
    "emb_similarity_zoo": """
        WITH pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(a.embedding AS DOUBLE[]) AS va,
                   CAST(b.embedding AS DOUBLE[]) AS vb
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        ),
        m AS (
            SELECT id_a, id_b,
                   list_sum(list_transform(range(1, len(va) + 1),
                       i -> va[CAST(i AS INT)] * vb[CAST(i AS INT)])) AS dot,
                   list_sum(list_transform(va, x -> x * x)) AS sa,
                   list_sum(list_transform(vb, x -> x * x)) AS sb,
                   sqrt(list_sum(list_transform(range(1, len(va) + 1),
                       i -> (va[CAST(i AS INT)] - vb[CAST(i AS INT)])
                          * (va[CAST(i AS INT)] - vb[CAST(i AS INT)])))) AS l2,
                   list_sum(list_transform(range(1, len(va) + 1),
                       i -> abs(va[CAST(i AS INT)] - vb[CAST(i AS INT)]))) AS l1d
            FROM pairs
        )
        SELECT id_a, id_b,
               ROUND(dot / sqrt(sa * sb), 6) AS cos,
               ROUND(exp(-0.01 * l2 * l2), 6) AS rbf,
               ROUND(-l1d, 6) AS l1,
               ROUND(1.0 / (1.0 + l2), 6) AS euclid,
               ROUND((0.1 * dot + 1.0) * (0.1 * dot + 1.0), 6) AS poly2
        FROM m ORDER BY id_a
    """,
    "doc_jaccard_join": """
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       t -> t <> '')) AS toks
            FROM documents WHERE doc_id % 11 = 0
        ),
        t2 AS (
            SELECT doc_id, toks, len(toks) AS n
            FROM toks WHERE len(toks) > 0
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.toks, b.toks)) AS n_common,
               a.n + b.n - len(list_intersect(a.toks, b.toks)) AS n_union
        FROM t2 a JOIN t2 b ON a.doc_id < b.doc_id
        WHERE 10 * len(list_intersect(a.toks, b.toks))
              >= 9 * (a.n + b.n - len(list_intersect(a.toks, b.toks)))
        ORDER BY doc_a, doc_b
    """,
    "doc_jaccard_topk": """
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       t -> t <> '')) AS toks
            FROM documents WHERE doc_id % 5 = 0
        ),
        t2 AS (
            SELECT doc_id, toks, len(toks) AS n
            FROM toks WHERE len(toks) > 0
        ),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.toks, b.toks)) AS c,
                   a.n + b.n - len(list_intersect(a.toks, b.toks)) AS u
            FROM t2 a JOIN t2 b ON a.doc_id < b.doc_id
            WHERE 100 * len(list_intersect(a.toks, b.toks))
                  >= 97 * (a.n + b.n
                           - len(list_intersect(a.toks, b.toks)))
        ),
        sym AS (
            SELECT doc_a AS doc_id, doc_b AS nbr, c, u FROM pairs
            UNION ALL
            SELECT doc_b AS doc_id, doc_a AS nbr, c, u FROM pairs
        ),
        rk_t AS (
            SELECT doc_id, nbr, c, u,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY CAST(c AS DOUBLE) / u DESC, nbr ASC
                   ) AS rk
            FROM sym
        )
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, nbr,
               CAST(c AS BIGINT) AS n_common,
               CAST(u AS BIGINT) AS n_union
        FROM rk_t WHERE rk <= 3
        ORDER BY doc_id, rk
    """,
    "doc_winnow_fingerprints": """
        WITH codes_t AS (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                       i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes
            FROM documents
        ),
        h_t AS (
            SELECT doc_id,
                   list_transform(range(1, greatest(len(codes) - 4, 1) + 1),
                       i -> (codes[CAST(i AS INT)] * 457315
                           + codes[CAST(i AS INT) + 1] * 974545
                           + codes[CAST(i AS INT) + 2] * 66049
                           + codes[CAST(i AS INT) + 3] * 257
                           + codes[CAST(i AS INT) + 4]) % 1000003) AS h
            FROM codes_t
        ),
        f_t AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(h) - 3, 1) + 1),
                       w -> list_min(list_slice(h, CAST(w AS INT),
                                                CAST(w AS INT) + 3)))) AS fps
            FROM h_t
        )
        SELECT doc_id,
               len(fps) AS n_fp,
               list_min(fps) AS min_fp,
               list_max(fps) AS max_fp,
               CAST(list_sum(fps) AS BIGINT) AS fp_sum
        FROM f_t ORDER BY doc_id
    """,
    "doc_trigram_jaccard_adjacent": f"""
        WITH sh_t AS (
            SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
                     THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                          / len(list_distinct(list_concat(a.sh, b.sh)))
                     ELSE 0 END, 6) AS jaccard
        FROM sh_t a JOIN sh_t b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a
    """,
    "doc_text_stats": f"""
        WITH t AS (
            SELECT doc_id, text, {_TOKENS} AS toks,
                   CAST(length(regexp_replace(text, '[^,.!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) AS praw
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                       AS BIGINT) AS n_bpe_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(list_sum(list_transform(toks, x -> length(x)))
                            AS DOUBLE) / len(toks) ELSE 0 END
                       AS avg_token_len_raw,
                   praw,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_EN}))
                            AS DOUBLE) / len(toks) ELSE 0 END AS sraw,
                   CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_EN}))
                        AS DOUBLE) AS en_s,
                   CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_DE}))
                        AS DOUBLE) AS de_s,
                   CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_FR}))
                        AS DOUBLE) AS fr_s,
                   CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                       AS fingerprint
            FROM t
        )
        SELECT doc_id, n_tokens, n_bpe_tokens, n_chars,
               ROUND(avg_token_len_raw, 6) AS avg_token_len,
               ROUND(praw, 6) AS punct_ratio,
               ROUND(sraw, 6) AS stopword_ratio,
               ROUND(0.5 * LEAST(n_tokens / 100.0, 1.0)
                     + 0.5 * LEAST(sraw * 5.0, 1.0)
                     - 0.25 * LEAST(praw * 10.0, 1.0), 6) AS quality,
               CASE WHEN fr_s > GREATEST(de_s, en_s) THEN 'fr'
                    WHEN en_s > de_s THEN 'en'
                    ELSE 'de' END AS lang_guess,
               fingerprint
        FROM s ORDER BY doc_id
    """,
    "emb_cosine_topk": """
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                   ROUND(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, nn_id, sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, nn_id)
                       AS BIGINT) AS rk
            FROM scored
        )
        SELECT query_id, nn_id, sim, rk FROM ranked WHERE rk <= 5
        ORDER BY query_id, rk
    """,
    "emb_l2_topk": """
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                   ROUND(list_distance(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) AS dist
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, nn_id, dist,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY dist, nn_id)
                       AS BIGINT) AS rk
            FROM scored
        )
        SELECT query_id, nn_id, dist, rk FROM ranked WHERE rk <= 3
        ORDER BY query_id, rk
    """,
    "emb_label_centroids": """
        SELECT label, CAST(pos AS INT) AS pos,
               ROUND(CAST(SUM(CAST(CAST(embedding[CAST(pos AS INT) + 1]
                                        AS DOUBLE) AS DECIMAL(18,12)))
                          AS DOUBLE) / COUNT(*), 6) AS v
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(range(64)) AS pos) p
        GROUP BY label, pos ORDER BY label, pos
    """,
    "doc_stratified_split": """
        WITH ranked AS (
            SELECT source, doc_id,
                   (ROW_NUMBER() OVER (
                        PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR) || '_42'),
                                 doc_id) - 1)
                   / CAST(COUNT(*) OVER (PARTITION BY source) AS DOUBLE)
                       AS frac
            FROM documents
        )
        SELECT source,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'valid'
                    ELSE 'test' END AS split,
               COUNT(*) AS c, MIN(doc_id) AS min_id
        FROM ranked
        GROUP BY 1, 2 ORDER BY source, split
    """,
    "emb_kmeans_step": _ANN_CODES_CTE + """,
dists AS (
    SELECT vec_id, codes, k,
           list_sum(list_transform(range(64), j ->
               (codes[CAST(j AS INT) + 1]
                - ((k * 37 + j * 13 + 11) % 161 - 80))
               * (codes[CAST(j AS INT) + 1]
                  - ((k * 37 + j * 13 + 11) % 161 - 80)))) AS d2
    FROM q CROSS JOIN range(8) t(k)
),
assigned AS (
    SELECT vec_id, codes, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
    FROM dists QUALIFY rn = 1
),
ex AS (
    SELECT a.k AS cluster_id, j AS dim,
           a.codes[CAST(j AS INT) + 1] AS code
    FROM assigned a CROSS JOIN range(64) t(j)
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(code) AS BIGINT) AS sum_code,
       CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean_code
FROM ex
GROUP BY cluster_id, dim
ORDER BY cluster_id, dim
""",
    # two Lloyd rounds, centroids re-quantized floor(mean+0.5) between
    # rounds; q/m1/carr MATERIALIZED (r6 CTE re-expansion gotcha);
    # empty clusters carry the pseudo-centroid forward (COALESCE)
    "emb_kmeans_iters": """
WITH v AS MATERIALIZED (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
    FROM embeddings
),
s AS (
    SELECT vec_id, vd,
           list_max(list_transform(vd, x -> abs(x))) AS maxabs
    FROM v
),
q AS MATERIALIZED (
    SELECT vec_id,
           list_transform(vd, x -> CASE WHEN maxabs = 0 THEN 0
               ELSE CAST(greatest(-127, least(127,
                    round(x * 127 / maxabs))) AS BIGINT) END) AS codes
    FROM s
),
d1 AS (
    SELECT vec_id, codes, CAST(cc.k AS BIGINT) AS k,
           list_sum(list_transform(range(64), j ->
               (codes[CAST(j AS INT) + 1]
                - ((cc.k * 37 + j * 13 + 11) % 161 - 80))
               * (codes[CAST(j AS INT) + 1]
                  - ((cc.k * 37 + j * 13 + 11) % 161 - 80)))) AS d2
    FROM q CROSS JOIN (SELECT UNNEST(range(8)) AS k) cc
),
a1 AS (
    SELECT vec_id, codes, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
    FROM d1 QUALIFY rn = 1
),
m1 AS MATERIALIZED (
    SELECT k AS cluster_id, j AS dim,
           COUNT(*) AS n, SUM(code) AS s
    FROM (SELECT a.k, t.j,
                 a.codes[CAST(t.j AS INT) + 1] AS code
          FROM a1 a CROSS JOIN range(64) t(j))
    GROUP BY 1, 2
),
c2 AS (
    SELECT g.k, g.j,
           COALESCE(
               CAST(floor(CAST(m.s AS DOUBLE) / m.n + 0.5) AS BIGINT),
               (g.k * 37 + g.j * 13 + 11) % 161 - 80) AS cent
    FROM (SELECT kk.k, jj.j
          FROM range(8) kk(k) CROSS JOIN range(64) jj(j)) g
    LEFT JOIN m1 m ON m.cluster_id = g.k AND m.dim = g.j
),
carr AS MATERIALIZED (
    SELECT k, list(cent ORDER BY j) AS cent FROM c2 GROUP BY k
),
d2r AS (
    SELECT q.vec_id, q.codes, carr.k,
           list_sum(list_transform(range(64), j ->
               (q.codes[CAST(j AS INT) + 1]
                - carr.cent[CAST(j AS INT) + 1])
               * (q.codes[CAST(j AS INT) + 1]
                  - carr.cent[CAST(j AS INT) + 1]))) AS d2
    FROM q CROSS JOIN carr
),
a2 AS (
    SELECT vec_id, codes, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
    FROM d2r QUALIFY rn = 1
),
ex AS (
    SELECT a.k AS cluster_id, t.j AS dim,
           a.codes[CAST(t.j AS INT) + 1] AS code
    FROM a2 a CROSS JOIN range(64) t(j)
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(code) AS BIGINT) AS sum_code,
       CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean_code
FROM ex
GROUP BY cluster_id, dim
ORDER BY cluster_id, dim
""",
    "emb_int8_quantize": """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, vd,
                   list_max(list_transform(vd, x -> abs(x))) AS maxabs
            FROM v
        ),
        q AS (
            SELECT vec_id, maxabs,
                   list_transform(vd, x -> CASE WHEN maxabs = 0 THEN 0
                       ELSE CAST(greatest(-127, least(127,
                            round(x * 127 / maxabs))) AS BIGINT) END)
                       AS codes
            FROM s
        )
        SELECT vec_id,
               ROUND(maxabs / 127, 6) AS scale,
               CAST(COALESCE(list_sum(codes), 0) AS BIGINT) AS qsum,
               CAST(COALESCE(list_sum(list_transform(codes, c -> c * c)),
                             0) AS BIGINT) AS qnorm_sq,
               CAST(list_min(codes) AS BIGINT) AS qmin,
               CAST(list_max(codes) AS BIGINT) AS qmax
        FROM q ORDER BY vec_id
    """,
    "doc_bpe_pair_counts": f"""
        WITH words AS (
            SELECT UNNEST({_TOKENS}) AS w FROM documents
        ),
        wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
        pairs AS (
            SELECT substr(w, CAST(i.g AS INT), 1) AS a,
                   substr(w, CAST(i.g AS INT) + 1, 1) AS b, c
            FROM wc, UNNEST(range(1, length(w))) AS i(g)
        )
        SELECT a, b, CAST(SUM(c) AS BIGINT) AS cnt
        FROM pairs GROUP BY a, b
        ORDER BY cnt DESC, a, b LIMIT 20
    """,
    "doc_chunk_windows": f"""
        WITH t AS (
            SELECT doc_id, {_TOKENS} AS toks,
                   CAST(len({_TOKENS}) AS BIGINT) AS n
            FROM documents WHERE doc_id % 13 = 0
        ),
        ks AS (
            SELECT doc_id, toks, n, k.g AS k
            FROM t, UNNEST(range(
                CAST((greatest(n - 64, 0) + 47) // 48 AS BIGINT) + 1
            )) AS k(g)
        )
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_no,
               CAST(k * 48 AS BIGINT) AS start_tok,
               CAST(len(toks[k*48 + 1 : k*48 + 64]) AS BIGINT) AS n_tokens,
               CAST(COALESCE(list_sum(list_transform(
                   toks[k*48 + 1 : k*48 + 64], x -> length(x)
               )), 0) AS BIGINT) AS len_sum
        FROM ks ORDER BY doc_id, chunk_no
    """,
    "doc_weighted_sample": f"""
        WITH t AS (
            SELECT source, doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        keyed AS (
            SELECT source, doc_id, n_tokens,
                   -LN((CAST(CAST(('0x' || substr(md5(
                            CAST(doc_id AS VARCHAR) || '_ws42'), 1, 15))
                            AS BIGINT) AS DOUBLE) + 0.5)
                       / 1152921504606846976.0)
                   / CAST(n_tokens AS DOUBLE) AS es_key
            FROM t WHERE n_tokens > 0
        ),
        ranked AS (
            SELECT source, doc_id, n_tokens,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY es_key, doc_id)
                       AS BIGINT) AS sample_rank
            FROM keyed
        )
        SELECT source, doc_id, n_tokens, sample_rank
        FROM ranked WHERE sample_rank <= 5
        ORDER BY source, sample_rank
    """,
    "doc_pack_sequences": f"""
        WITH t AS (
            SELECT source, doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT source, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || '_42'),
                                doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS start
            FROM t
        )
        SELECT source, CAST(FLOOR(start / 512.0) AS BIGINT) AS bin_id,
               COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tok_sum
        FROM c
        GROUP BY 1, 2 ORDER BY source, bin_id
    """,
    "doc_quality_clf_fit": """
        WITH train AS (
            SELECT doc_id, lower(text) AS lt,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents WHERE doc_id % 5 <> 0
        ),
        tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lt, '\\s+'),
                                      t -> t <> '')) AS tok
            FROM train
        ),
        feats AS MATERIALIZED (
            SELECT doc_id, feat, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                             % 64 AS feat
                  FROM tok)
            GROUP BY doc_id, feat
            UNION ALL
            SELECT doc_id, CAST(64 AS BIGINT), CAST(1 AS BIGINT)
            FROM train
        ),
        lab AS MATERIALIZED (SELECT doc_id, y FROM train),
        -- step 1: w0 = 0 so p = 1/2 for every doc
        g1 AS MATERIALIZED (
            SELECT feat, SUM((0.5 - y) * cnt) AS grad
            FROM feats JOIN lab USING (doc_id) GROUP BY feat
        ),
        w1 AS MATERIALIZED (SELECT feat, -grad / 1024 AS w FROM g1),
        z2 AS MATERIALIZED (
            SELECT f.doc_id, SUM(f.cnt * w.w) AS z
            FROM feats f JOIN w1 w USING (feat) GROUP BY f.doc_id
        ),
        p2 AS MATERIALIZED (
            SELECT doc_id, least(greatest(z / 4 + 0.5, 0), 1) AS p
            FROM z2
        ),
        g2 AS MATERIALIZED (
            SELECT feat, SUM((p2.p - lab.y) * cnt) AS grad
            FROM feats JOIN p2 USING (doc_id) JOIN lab USING (doc_id)
            GROUP BY feat
        ),
        w2 AS MATERIALIZED (
            SELECT w1.feat, w1.w - g2.grad / 1024 AS w
            FROM w1 JOIN g2 ON w1.feat = g2.feat
        )
        SELECT 'W' AS kind, CAST(1 AS BIGINT) AS step, g1.feat AS id,
               g1.grad AS v1, w1.w AS v2, CAST(0 AS BIGINT) AS n
        FROM g1 JOIN w1 ON g1.feat = w1.feat
        UNION ALL
        SELECT 'W', CAST(2 AS BIGINT), g2.feat, g2.grad, w2.w,
               CAST(0 AS BIGINT)
        FROM g2 JOIN w2 ON g2.feat = w2.feat
        UNION ALL
        SELECT 'L', CAST(1 AS BIGINT), CAST(-1 AS BIGINT),
               SUM(0.5), SUM((0.5 - y) * (0.5 - y)),
               CAST(COUNT(*) AS BIGINT)
        FROM lab
        UNION ALL
        SELECT 'L', CAST(2 AS BIGINT), CAST(-1 AS BIGINT),
               SUM(p), SUM((p - y) * (p - y)),
               CAST(COUNT(*) AS BIGINT)
        FROM p2 JOIN lab USING (doc_id)
        ORDER BY kind, step, id
    """,
    "doc_quality_histogram": f"""
        WITH t AS (
            SELECT text, {_TOKENS} AS toks,
                   CASE WHEN length(text) > 0 THEN
                       CAST(length(regexp_replace(text, '[^,.!?;:]', '', 'g'))
                            AS DOUBLE) / length(text) ELSE 0 END AS praw
            FROM documents
        ),
        s AS (
            SELECT CAST(len(toks) AS BIGINT) AS n_tokens, praw,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_EN}))
                            AS DOUBLE) / len(toks) ELSE 0 END AS sraw
            FROM t
        ),
        q AS (
            SELECT ROUND(0.5 * LEAST(n_tokens / 100.0, 1.0)
                         + 0.5 * LEAST(sraw * 5.0, 1.0)
                         - 0.25 * LEAST(praw * 10.0, 1.0), 6) AS quality
            FROM s
        )
        SELECT CAST(FLOOR(quality * 20) AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(quality) AS min_q,
               MAX(quality) AS max_q
        FROM q
        GROUP BY 1 ORDER BY band
    """,
    "doc_quality_filter": f"""
        WITH t AS (
            SELECT source, text, {_TOKENS} AS toks,
                   CASE WHEN length(text) > 0 THEN
                       CAST(length(regexp_replace(text, '[^,.!?;:]', '', 'g'))
                            AS DOUBLE) / length(text) ELSE 0 END AS praw
            FROM documents
        ),
        s AS (
            SELECT source,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   praw,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(len(list_filter(toks, x -> lower(x) IN {_STOP_EN}))
                            AS DOUBLE) / len(toks) ELSE 0 END AS sraw
            FROM t
        ),
        q AS (
            SELECT source, n_tokens, ROUND(praw, 6) AS punct_ratio,
                   ROUND(0.5 * LEAST(n_tokens / 100.0, 1.0)
                         + 0.5 * LEAST(sraw * 5.0, 1.0)
                         - 0.25 * LEAST(praw * 10.0, 1.0), 6) AS quality
            FROM s
        )
        SELECT source,
               (n_tokens >= 5 AND punct_ratio <= 0.2 AND quality >= 0.2)
                   AS keep,
               COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,12))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_quality
        FROM q
        GROUP BY 1, 2 ORDER BY source, keep
    """,
    "doc_decontaminate": _GRAMS_CTE
    + """, bench AS (
            SELECT DISTINCT UNNEST(gs) AS g FROM grams WHERE doc_id % 97 = 0
        ),
        hits AS (
            SELECT DISTINCT c.doc_id
            FROM (SELECT doc_id, UNNEST(gs) AS g FROM grams
                  WHERE doc_id % 97 <> 0) c
            JOIN bench USING (g)
        )
        SELECT d.source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 97 <> 0
        GROUP BY d.source ORDER BY d.source""",
    "doc_decontaminate_ratio": _GRAMS_CTE
    + """, bench AS MATERIALIZED (
            SELECT DISTINCT UNNEST(gs) AS g FROM grams WHERE doc_id % 97 = 0
        ),
        base AS MATERIALIZED (
            SELECT doc_id, source,
                   CAST(len(list_distinct(gs)) AS BIGINT) AS n_grams
            FROM grams WHERE doc_id % 97 <> 0
        ),
        hits AS (
            SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
            FROM (SELECT doc_id, UNNEST(list_distinct(gs)) AS g
                  FROM grams WHERE doc_id % 97 <> 0) c
            JOIN bench USING (g)
            GROUP BY c.doc_id
        ),
        per_doc AS (
            SELECT b.source, b.n_grams,
                   COALESCE(h.n_hit, 0) AS n_hit,
                   CASE WHEN b.n_grams > 0
                        THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
                             / b.n_grams
                        ELSE 0.0 END AS ratio
            FROM base b LEFT JOIN hits h USING (doc_id)
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_grams) AS BIGINT) AS n_grams_sum,
               CAST(SUM(n_hit) AS BIGINT) AS n_hit_sum,
               CAST(SUM(CASE WHEN ratio > 0.2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contam_20,
               CAST(SUM(CASE WHEN ratio > 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contam_50
        FROM per_doc GROUP BY source ORDER BY source""",
    # the four stage oracles above, composed in pipeline order: dedup
    # (md5 window) → quality (rounded 6-dp gate) → decontaminate
    # (3-gram anti-join vs the %97 benchmark) → pack (512-token bins)
    "doc_pipeline_e2e": f"""
        WITH base AS (
            SELECT doc_id, source, text FROM documents
            WHERE doc_id % 97 <> 0
        ),
        dd AS (
            SELECT doc_id, source, text FROM base
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY md5(text) ORDER BY doc_id) = 1
        ),
        t AS (
            SELECT doc_id, source, {_TOKENS} AS toks,
                   CASE WHEN length(text) > 0 THEN
                       CAST(length(regexp_replace(text, '[^,.!?;:]', '',
                                                  'g'))
                            AS DOUBLE) / length(text) ELSE 0 END AS praw
            FROM dd
        ),
        s AS (
            SELECT doc_id, source, toks,
                   CAST(len(toks) AS BIGINT) AS n_tokens, praw,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(len(list_filter(toks,
                                x -> lower(x) IN {_STOP_EN}))
                            AS DOUBLE) / len(toks) ELSE 0 END AS sraw
            FROM t
        ),
        q AS (
            SELECT doc_id, source, toks, n_tokens FROM s
            WHERE n_tokens >= 5 AND ROUND(praw, 6) <= 0.2
              AND ROUND(0.5 * LEAST(n_tokens / 100.0, 1.0)
                        + 0.5 * LEAST(sraw * 5.0, 1.0)
                        - 0.25 * LEAST(praw * 10.0, 1.0), 6) >= 0.2
        ),
        bgrams AS (
            SELECT DISTINCT UNNEST(
                CASE WHEN len(tk) >= 3 THEN
                    list_transform(range(1, len(tk) - 1),
                                   i -> array_to_string(tk[i:i+2], ' '))
                ELSE [] END) AS g
            FROM (SELECT {_TOKENS} AS tk FROM documents
                  WHERE doc_id % 97 = 0)
        ),
        hits AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_id, UNNEST(
                    CASE WHEN len(toks) >= 3 THEN
                        list_transform(range(1, len(toks) - 1),
                                       i -> array_to_string(toks[i:i+2],
                                                            ' '))
                    ELSE [] END) AS g
                FROM q) c
            JOIN bgrams USING (g)
        ),
        kept AS (
            SELECT q.source, q.doc_id, q.n_tokens
            FROM q LEFT JOIN hits h USING (doc_id)
            WHERE h.doc_id IS NULL
        ),
        packed AS (
            SELECT source, doc_id, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || '_42'),
                                doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS start
            FROM kept
        )
        SELECT source, CAST(FLOOR(start / 512.0) AS BIGINT) AS bin_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
               MIN(doc_id) AS min_doc_id
        FROM packed
        GROUP BY 1, 2 ORDER BY source, bin_id
    """,
    "doc_tfidf_top_terms": _GRAMS_CTE
    + """, tok AS (SELECT source, doc_id, UNNEST(tk) AS term FROM toks),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        dft AS (
            SELECT term, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
        ),
        tf_t AS (
            SELECT source, term, COUNT(*) AS tf
            FROM tok GROUP BY source, term
        ),
        scored AS (
            SELECT source, term, tf, df,
                   ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
            FROM tf_t JOIN dft USING (term) CROSS JOIN nd
        )
        SELECT source, rk, term, tf, df, tfidf FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY tfidf DESC, term ASC) AS rk
            FROM scored
        ) WHERE rk <= 10 ORDER BY source, rk""",
    "doc_repetition_stats": _GRAMS_CTE
    + """, d AS (
            SELECT source,
                   CASE WHEN len(gs) > 0 THEN
                       ROUND(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
                             / len(gs), 6)
                   ELSE 0.0 END AS dup
            FROM grams
        )
        SELECT source,
               ROUND(CAST(SUM(CAST(dup AS DECIMAL(18,12))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_dup_frac,
               ROUND(MAX(dup), 6) AS max_dup_frac,
               CAST(SUM(CASE WHEN dup > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_repetitive
        FROM d GROUP BY source ORDER BY source""",
    "doc_ngram_topk": _GRAMS_CTE
    + """ SELECT gram, c FROM (
            SELECT gram, COUNT(*) AS c
            FROM (SELECT UNNEST(gs) AS gram FROM grams)
            GROUP BY gram
        ) ORDER BY c DESC, gram ASC LIMIT 20""",
    "emb_near_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 300 AND b.vec_id < 300
          AND ROUND(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 6) > 0.35
        ORDER BY id_a, id_b
    """,
    "doc_minhash_jaccard_est": _SIGS_CTE + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST("""
    + " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(8)
    )
    + """ AS BIGINT) AS n_match,
               CAST("""
    + " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(8)
    )
    + """ AS DOUBLE) / 8 AS mh_jaccard_est
        FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a
    """,
    # BM25: identical expression tree and double literals on both
    # engines; per-term contributions DECIMAL(18,12)-snapped pre-sum
    "doc_bm25_topk": f"""
        WITH tok AS (
            SELECT doc_id, UNNEST({_TOKENS}) AS term FROM documents
        ),
        tokq AS (
            SELECT doc_id, term FROM tok
            WHERE term IN ('hash', 'join', 'scan')
        ),
        dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
        stats AS (SELECT COUNT(*) AS n_docs FROM documents),
        sums AS (SELECT SUM(dl) AS sum_dl FROM dl),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tokq GROUP BY doc_id, term
        ),
        dft AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM tokq GROUP BY term
        ),
        scored AS (
            SELECT t.doc_id,
                   CAST(
                       ln((s.n_docs - d.df + CAST(0.5 AS DOUBLE))
                          / (d.df + CAST(0.5 AS DOUBLE))
                          + CAST(1 AS DOUBLE))
                       * (t.tf * CAST(2.2 AS DOUBLE))
                       / (t.tf + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + (CAST(0.75 AS DOUBLE) * l.dl)
                               / (m.sum_dl / s.n_docs)))
                   AS DECIMAL(18,12)) AS contrib
            FROM tf t
            JOIN dl l USING (doc_id)
            JOIN dft d ON d.term = t.term
            CROSS JOIN stats s CROSS JOIN sums m
        )
        SELECT doc_id, COUNT(*) AS n_terms,
               ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    # unigram-LM Viterbi decode: last-4-window recursive CTE replays
    # the Spark side's zero-seeded dp fold — all integer arithmetic
    "doc_unigram_encode_stats": _unigram_oracle(),
    # unigram-LM hard-EM FIT: two table-driven Viterbi rounds, all
    # integer arithmetic (binary-digit-count log2 costs)
    "doc_unigram_fit": _unigram_fit_oracle(),
    # unigram add-one LM fit (train slice) + per-token ln scoring,
    # DECIMAL(18,12)-snapped contributions (bm25 doctrine)
    "doc_lm_perplexity": f"""
        WITH d AS (
            SELECT doc_id,
                   {_TOKENS.replace("text", "COALESCE(text, '')")} AS tk
            FROM documents
        ),
        cnt AS MATERIALIZED (
            SELECT term, COUNT(*) AS c
            FROM (SELECT UNNEST(tk) AS term FROM d WHERE doc_id % 10 = 0)
            GROUP BY term
        ),
        stats AS MATERIALIZED (
            SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t_total,
                   COUNT(*) AS v
            FROM cnt
        ),
        ev AS (
            SELECT doc_id, UNNEST(tk) AS term
            FROM d WHERE doc_id % 10 <> 0
        ),
        scored AS (
            SELECT e.doc_id,
                   CAST(ln(COALESCE(c.c, 0) + CAST(1 AS DOUBLE))
                        - ln(CAST(s.t_total + s.v + 1 AS DOUBLE))
                   AS DECIMAL(18,12)) AS lp
            FROM ev e
            LEFT JOIN cnt c ON c.term = e.term
            CROSS JOIN stats s
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(CAST(-SUM(lp) AS DOUBLE) / COUNT(*), 6) AS log_ppl
        FROM scored GROUP BY doc_id
        ORDER BY log_ppl DESC, doc_id LIMIT 20
    """,
    # reciprocal-rank fusion of two exact-integer rankers; per-term
    # 1/(k+rank) DECIMAL(18,12)-snapped (double division both engines)
    "doc_rrf_fusion": f"""
        WITH tq AS MATERIALIZED (
            SELECT doc_id, term
            FROM (SELECT doc_id, UNNEST({_TOKENS}) AS term
                  FROM documents)
            WHERE term IN ('hash', 'join', 'scan')
        ),
        r1 AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS rank
            FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf
                  FROM tq GROUP BY doc_id)
            QUALIFY rank <= 100
        ),
        r2 AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER
                       (ORDER BY cov DESC, n_tok ASC, doc_id) AS rank
            FROM (
                SELECT q.doc_id,
                       CAST(COUNT(DISTINCT q.term) AS BIGINT) AS cov,
                       MIN(d.n_tok) AS n_tok
                FROM tq q
                JOIN (SELECT doc_id,
                             CAST(len({_TOKENS}) AS BIGINT) AS n_tok
                      FROM documents) d USING (doc_id)
                GROUP BY q.doc_id
            )
            QUALIFY rank <= 100
        ),
        fused AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lists,
                   CAST(MIN(rank) AS BIGINT) AS best_rank,
                   ROUND(CAST(SUM(CAST(CAST(1 AS DOUBLE) / (60 + rank)
                                       AS DECIMAL(18,12))) AS DOUBLE),
                         6) AS rrf_score
            FROM (SELECT doc_id, rank FROM r1
                  UNION ALL
                  SELECT doc_id, rank FROM r2)
            GROUP BY doc_id
        )
        SELECT doc_id, n_lists, best_rank, rrf_score
        FROM fused
        ORDER BY rrf_score DESC, doc_id
        LIMIT 25
    """,
    # DSIR importance weights: hashed uni+bigram bag-of-words models,
    # per-bucket ln terms DECIMAL(18,12)-snapped, exact decimal sums
    "doc_dsir_weights": """
        WITH toks AS MATERIALIZED (
            SELECT doc_id, (doc_id % 7 = 0) AS is_t,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               t -> t <> '') AS tk
            FROM documents
        ),
        feats AS MATERIALIZED (
            SELECT doc_id, is_t,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)
                       % 1024 AS b
            FROM toks,
                 unnest(list_concat(tk,
                     list_transform(range(1, len(tk)),
                                    i -> tk[i] || ' ' || tk[i + 1])
                 )) AS u(g)
        ),
        q AS MATERIALIZED (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS q_c
            FROM feats WHERE NOT is_t GROUP BY b
        ),
        p AS MATERIALIZED (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS p_c
            FROM feats WHERE is_t GROUP BY b
        ),
        tot AS (
            SELECT (SELECT CAST(SUM(q_c) AS BIGINT) FROM q) AS q_tot,
                   (SELECT CAST(SUM(p_c) AS BIGINT) FROM p) AS p_tot
        ),
        lr AS MATERIALIZED (
            SELECT q.b,
                   CAST(ln((COALESCE(p.p_c, 0) + 1)
                           / CAST(t.p_tot + 1024 AS DOUBLE))
                        AS DECIMAL(18,12))
                 - CAST(ln((q.q_c + 1)
                           / CAST(t.q_tot + 1024 AS DOUBLE))
                        AS DECIMAL(18,12)) AS lr
            FROM q LEFT JOIN p USING (b), tot t
        ),
        w AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
                   ROUND(CAST(SUM(lr.lr) AS DOUBLE), 6) AS log_w
            FROM feats JOIN lr USING (b)
            WHERE NOT is_t GROUP BY doc_id
        )
        SELECT w.doc_id, d.source, w.n_feat, w.log_w
        FROM w JOIN documents d USING (doc_id)
        ORDER BY w.doc_id
    """,
    # PCA moment pass on int8 codes: count / per-dim sums / Gram upper
    # triangle — all exact BIGINTs
    "emb_pca_topvar": _ANN_CODES_CTE + """,
        pos AS (SELECT CAST(UNNEST(range(64)) AS INT) AS p),
        stats AS MATERIALIZED (
            SELECT CAST(pos.p AS BIGINT) AS dim,
                   CAST(SUM(codes[pos.p + 1]) AS BIGINT) AS s,
                   CAST(SUM(codes[pos.p + 1] * codes[pos.p + 1]) AS BIGINT)
                       AS gii,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM q CROSS JOIN pos GROUP BY pos.p
        )
        SELECT dim,
               n * gii - s * s AS var_num,
               CAST(n * gii - s * s AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE) AS variance
        FROM stats
        ORDER BY var_num DESC, dim
        LIMIT 8
    """,
    "doc_compression_stats": f"""
        WITH t AS (
            SELECT source,
                   CAST(length(text) - {COMP_W - 1} AS BIGINT) AS n_sh,
                   CAST(len(list_distinct(list_transform(
                       range(1, length(text) - {COMP_W - 2}),
                       p -> substr(text, CAST(p AS INT), {COMP_W})
                   ))) AS BIGINT) AS n_dist
            FROM documents WHERE length(text) >= {COMP_W}
        ),
        r AS (
            SELECT source,
                   CAST(n_dist AS DOUBLE) / CAST(n_sh AS DOUBLE) AS ratio
            FROM t
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,12))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_ratio,
               MIN(ratio) AS min_ratio,
               MAX(ratio) AS max_ratio,
               CAST(SUM(CASE WHEN ratio < CAST(0.3 AS DOUBLE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        FROM r GROUP BY source ORDER BY source
    """,
    "emb_pca_moments": _ANN_CODES_CTE + """,
        pos AS (SELECT CAST(UNNEST(range(64)) AS INT) AS p),
        ij AS (
            SELECT a.p AS i, b.p AS j FROM pos a JOIN pos b ON a.p <= b.p
        ),
        n_t AS (
            SELECT 'n' AS stat, CAST(-1 AS INT) AS i, CAST(-1 AS INT) AS j,
                   CAST(COUNT(*) AS BIGINT) AS val
            FROM q
        ),
        sum_t AS (
            SELECT 'sum' AS stat, pos.p AS i, CAST(-1 AS INT) AS j,
                   CAST(SUM(codes[pos.p + 1]) AS BIGINT) AS val
            FROM q CROSS JOIN pos GROUP BY pos.p
        ),
        gram_t AS (
            SELECT 'gram' AS stat, ij.i, ij.j,
                   CAST(SUM(codes[ij.i + 1] * codes[ij.j + 1]) AS BIGINT)
                       AS val
            FROM q CROSS JOIN ij GROUP BY ij.i, ij.j
        )
        SELECT stat, i, j, val FROM n_t
        UNION ALL SELECT stat, i, j, val FROM sum_t
        UNION ALL SELECT stat, i, j, val FROM gram_t
        ORDER BY stat, i, j
    """,
    # multiprobe LSH on int8 codes, integer hyperplanes
    # plane(p,j) = ((p·31 + j·17 + 7) % 97) − 48  (pseudo_planes(6, 64))
    "emb_ann_lsh_topk": _ANN_CODES_CTE + f""",
        b AS (
            SELECT vec_id, codes,
                   {_plane_bucket_expr(6)} AS bucket
            FROM q
        ),
        pr AS (
            SELECT vec_id AS query_id, codes AS qcodes,
                   {_probe_list_expr(6)}
                       AS pb
            FROM b
        ),
        pairs AS (
            SELECT pr.query_id, c.vec_id AS nn_id,
                   CAST(list_sum(list_transform(range(64), j ->
                       pr.qcodes[CAST(j AS INT) + 1]
                       * c.codes[CAST(j AS INT) + 1])) AS BIGINT) AS dot
            FROM pr JOIN b c
              ON c.bucket = pr.pb AND c.vec_id <> pr.query_id
        ),
        ranked AS (
            SELECT query_id, nn_id, dot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dot DESC, nn_id) AS rk
            FROM pairs
        )
        SELECT query_id, nn_id, dot, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
    # IVF on int8 codes, integer centroids
    # cent(c,j) = ((c·37 + j·13 + 11) % 161) − 80  (pseudo_centroids(16, 64))
    "emb_ann_ivf_topk": _ANN_CODES_CTE + """,
        celld AS (
            SELECT vec_id, codes, CAST(cc.c AS BIGINT) AS cell,
                   CAST(list_sum(list_transform(range(64), j ->
                       (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))
                     * (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))))
                   AS BIGINT) AS d2
            FROM q CROSS JOIN (SELECT UNNEST(range(16)) AS c) cc
        ),
        assigned AS (
            SELECT vec_id, codes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld) WHERE rnk = 1
        ),
        probed AS (
            SELECT vec_id AS query_id, codes AS qcodes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld) WHERE rnk <= 2
        ),
        pairs AS (
            SELECT p.query_id, a.vec_id AS nn_id,
                   ROUND(SQRT(CAST(list_sum(list_transform(range(64), j ->
                       (p.qcodes[CAST(j AS INT) + 1]
                        - a.codes[CAST(j AS INT) + 1])
                     * (p.qcodes[CAST(j AS INT) + 1]
                        - a.codes[CAST(j AS INT) + 1])))
                   AS DOUBLE)), 6) AS dist
            FROM probed p JOIN assigned a
              ON a.cell = p.cell AND a.vec_id <> p.query_id
        ),
        ranked AS (
            SELECT query_id, nn_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dist, nn_id) AS rk
            FROM pairs
        )
        SELECT query_id, nn_id, dist, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
    # SemDeDup: 16-pseudo-centroid assignment (exact integer L2²) then
    # within-cluster cosine on exact-integer dots, compare UNROUNDED
    "emb_semantic_dedup": _ANN_CODES_CTE + """,
        kk AS (
            -- data-derived K = clamp(ceil(n/512), 16, 4096), replaying
            -- the Spark side's corpus-scaled cluster count
            SELECT UNNEST(range(greatest(16, least(4096,
                CAST(ceil(count(*) / 512.0) AS BIGINT))))) AS k
            FROM q
        ),
        celld AS (
            SELECT vec_id, codes, CAST(cc.k AS BIGINT) AS k,
                   list_sum(list_transform(range(64), j ->
                       (codes[CAST(j AS INT) + 1]
                        - ((cc.k * 37 + j * 13 + 11) % 161 - 80))
                       * (codes[CAST(j AS INT) + 1]
                          - ((cc.k * 37 + j * 13 + 11) % 161 - 80))))
                       AS d2
            FROM q CROSS JOIN kk cc
        ),
        a AS (
            SELECT vec_id, codes, k AS cluster_id,
                   CAST(list_sum(list_transform(codes, x -> x * x))
                        AS BIGINT) AS n2
            FROM (SELECT vec_id, codes, k,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY d2, k) AS rn
                  FROM celld) WHERE rn = 1
        ),
        pairs AS (
            SELECT l.cluster_id, l.vec_id AS id_a, r.vec_id AS id_b,
                   CAST(list_sum(list_transform(range(64), j ->
                       l.codes[CAST(j AS INT) + 1]
                       * r.codes[CAST(j AS INT) + 1])) AS DOUBLE)
                   / SQRT(CAST(l.n2 * r.n2 AS DOUBLE)) AS cos
            FROM a l JOIN a r
              ON l.cluster_id = r.cluster_id AND l.vec_id < r.vec_id
        )
        SELECT cluster_id, id_b AS removed_id,
               MIN(id_a) AS kept_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM pairs WHERE cos >= 0.35
        GROUP BY cluster_id, id_b
        ORDER BY cluster_id, removed_id
    """,
    "doc_skipgrams": DOC_SKIPGRAMS_SQL,
    # bucketed near-dup on int8 codes + pseudo_planes(8, 64): bucket
    # bits and the three dot products are exact integers; the cosine is
    # shipped UNROUNDED (identical expression tree dot/sqrt(na2*nb2) on
    # exact-integer inputs → bit-identical doubles; the driver's
    # normalize rounds both sides identically)
    # Matryoshka cascade: 16-dim prefix dot -> top-64 -> exact 64-dim
    # cosine re-rank -> top-10; all integer dots, unrounded cosine
    "emb_matryoshka_topk": _ANN_CODES_CTE + """,
        qry AS (
            SELECT vec_id AS query_id, codes AS qcodes
            FROM q WHERE vec_id % 500 = 0
        ),
        coarse AS (
            SELECT qry.query_id, q.vec_id,
                   CAST(list_sum(list_transform(range(16), j ->
                       q.codes[CAST(j AS INT) + 1]
                       * qry.qcodes[CAST(j AS INT) + 1])) AS BIGINT)
                       AS coarse_dot
            FROM q CROSS JOIN qry
            WHERE q.vec_id <> qry.query_id
        ),
        survivors AS (
            SELECT query_id, vec_id, coarse_dot
            FROM coarse
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY coarse_dot DESC, vec_id) <= 64
        ),
        rer AS (
            SELECT s.query_id, s.vec_id, s.coarse_dot,
                   CAST(list_sum(list_transform(range(64), j ->
                       c.codes[CAST(j AS INT) + 1]
                       * qq.qcodes[CAST(j AS INT) + 1])) AS DOUBLE)
                   / SQRT(
                       CAST(list_sum(list_transform(range(64), j ->
                           c.codes[CAST(j AS INT) + 1]
                           * c.codes[CAST(j AS INT) + 1])) AS DOUBLE)
                     * CAST(list_sum(list_transform(range(64), j ->
                           qq.qcodes[CAST(j AS INT) + 1]
                           * qq.qcodes[CAST(j AS INT) + 1])) AS DOUBLE)
                   ) AS cos
            FROM survivors s
            JOIN q c ON c.vec_id = s.vec_id
            JOIN qry qq ON qq.query_id = s.query_id
        )
        SELECT query_id, rk, vec_id, coarse_dot, cos
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
            FROM rer
        )
        WHERE rk <= 10
        ORDER BY query_id, rk
    """,
    "emb_near_dup_bucketed": _ANN_CODES_CTE + f""",
        b12 AS (
            SELECT vec_id, codes,
                   {_plane_bucket_expr(12)} AS bucket12,
                   CAST(list_sum(list_transform(range(64), j ->
                       codes[CAST(j AS INT) + 1]
                       * codes[CAST(j AS INT) + 1])) AS BIGINT) AS n2
            FROM q
        ),
        bm AS (
            SELECT vec_id, codes, n2,
                   bucket12 % 256 AS bucket,
                   bucket12 // 256 AS sub
            FROM b12
        ),
        sz AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bsz
            FROM bm GROUP BY bucket
        ),
        b AS (
            -- giant-bucket guard: the sub-planes key engages only
            -- past the 128 cap (a no-op at every driver scale)
            SELECT bm.vec_id, bm.codes, bm.n2, bm.bucket,
                   CASE WHEN sz.bsz > 128 THEN bm.sub ELSE 0 END AS sb
            FROM bm JOIN sz USING (bucket)
        ),
        pairs AS (
            SELECT l.vec_id AS id_a, r.vec_id AS id_b,
                   CAST(list_sum(list_transform(range(64), j ->
                       l.codes[CAST(j AS INT) + 1]
                       * r.codes[CAST(j AS INT) + 1])) AS DOUBLE)
                   / SQRT(CAST(l.n2 * r.n2 AS DOUBLE)) AS cos
            FROM b l JOIN b r
              ON l.bucket = r.bucket AND l.sb = r.sb
             AND l.vec_id < r.vec_id
        )
        SELECT id_a, id_b, cos FROM pairs
        WHERE cos > CAST(-1.0 AS DOUBLE)
        ORDER BY cos DESC, id_a, id_b LIMIT 50
    """,
    # SimHash candidates on the polynomial pseudo-token hash: the
    # 64-bit majority vote is integer-exact (hash < 2^55 so bits >= 55
    # are provably 0 — range(55) reproduces the full signature), then
    # the same 4x16-bit banding + <=64 bucket cap as the Spark plan
    "doc_simhash_candidates": """
        WITH th AS (
            SELECT doc_id,
                   list_transform(
                     list_filter(string_split(text, ' '), t -> t <> ''),
                     t -> list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                              [CAST(ascii(substr(t, CAST(i AS INT), 1))
                                    AS BIGINT)
                               FOR i IN range(1, length(t) + 1)]),
                            (a, c) -> (a * 131 + c)
                                      % 36028797018963913)) AS th
            FROM documents
        ),
        sig AS (
            SELECT doc_id,
                   CAST(coalesce(list_sum(list_transform(range(55), b ->
                       CASE WHEN coalesce(list_sum(list_transform(th,
                              h -> CASE WHEN (h >> CAST(b AS INT)) & 1 = 1
                                        THEN 1 ELSE -1 END)), 0) > 0
                            THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                            ELSE 0 END)), 0) AS BIGINT) AS simhash
            FROM th
        ),
        banded_all AS (
            SELECT doc_id, CAST(bb.band AS BIGINT) AS band,
                   (simhash >> CAST(16 * bb.band AS INT)) & 65535 AS sig
            FROM sig CROSS JOIN (SELECT UNNEST(range(4)) AS band) bb
        ),
        banded AS (
            SELECT * FROM banded_all
            QUALIFY COUNT(*) OVER (PARTITION BY band, sig) <= 64
        )
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
        ORDER BY doc_a, doc_b
    """,
    # MMR diversification: replay the LSH top-10 (int8 codes, 6 pseudo
    # planes, dot metric, queries vec_id % 5 = 0), then unroll the n=5
    # greedy selection — score = 0.7·sim − (1−0.7)·max-dot-to-selected
    # over exact integers, ties by nn_id
    "emb_mmr_rerank": None,  # assembled below (unrolled steps)
    # IVF recall@5 vs exact brute force, both symbolic (queries
    # vec_id % 25 = 0)
    "emb_ann_ivf_recall": _ANN_CODES_CTE + """,
        celld AS (
            SELECT vec_id, codes, CAST(cc.c AS BIGINT) AS cell,
                   CAST(list_sum(list_transform(range(64), j ->
                       (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))
                     * (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))))
                   AS BIGINT) AS d2
            FROM q CROSS JOIN (SELECT UNNEST(range(16)) AS c) cc
        ),
        assigned AS (
            SELECT vec_id, codes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld) WHERE rnk = 1
        ),
        probed AS (
            SELECT vec_id AS query_id, codes AS qcodes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld WHERE vec_id % 25 = 0) WHERE rnk <= 2
        ),
        apairs AS (
            SELECT p.query_id, a.vec_id AS nn_id,
                   ROUND(SQRT(CAST(list_sum(list_transform(range(64), j ->
                       (p.qcodes[CAST(j AS INT) + 1]
                        - a.codes[CAST(j AS INT) + 1])
                     * (p.qcodes[CAST(j AS INT) + 1]
                        - a.codes[CAST(j AS INT) + 1])))
                   AS DOUBLE)), 6) AS dist
            FROM probed p JOIN assigned a
              ON a.cell = p.cell AND a.vec_id <> p.query_id
        ),
        approx AS (
            SELECT query_id, nn_id FROM (
                SELECT query_id, nn_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY dist, nn_id) AS rk
                FROM apairs) WHERE rk <= 5
        ),
        epairs AS (
            SELECT q1.vec_id AS query_id, c.vec_id AS nn_id,
                   ROUND(SQRT(CAST(list_sum(list_transform(range(64), j ->
                       (q1.codes[CAST(j AS INT) + 1]
                        - c.codes[CAST(j AS INT) + 1])
                     * (q1.codes[CAST(j AS INT) + 1]
                        - c.codes[CAST(j AS INT) + 1])))
                   AS DOUBLE)), 6) AS dist
            FROM q q1 JOIN q c ON c.vec_id <> q1.vec_id
            WHERE q1.vec_id % 25 = 0
        ),
        exact AS (
            SELECT query_id, nn_id FROM (
                SELECT query_id, nn_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY dist, nn_id) AS rk
                FROM epairs) WHERE rk <= 5
        ),
        matched AS (
            SELECT a.query_id, COUNT(*) AS n_match
            FROM approx a JOIN exact e
              ON e.query_id = a.query_id AND e.nn_id = a.nn_id
            GROUP BY a.query_id
        )
        SELECT qq.vec_id AS query_id,
               CAST(COALESCE(m.n_match, 0) AS BIGINT) AS n_match,
               COALESCE(m.n_match, 0) / CAST(5 AS DOUBLE) AS recall_at_5
        FROM (SELECT vec_id FROM q WHERE vec_id % 25 = 0) qq
        LEFT JOIN matched m ON m.query_id = qq.vec_id
        ORDER BY query_id
    """,
    # PQ-ADC on int8 codes, integer codebooks
    # cb(s,c,j) = ((s·59 + c·31 + j·17 + 3) % 161) − 80
    # (pseudo_codebooks(8, 16, 8)); queries = vec_id % 50 = 0
    "emb_pq_topk": _ANN_CODES_CTE + """,
        sc AS (
            SELECT CAST(ss.s AS BIGINT) AS s, CAST(cc.c AS BIGINT) AS c
            FROM (SELECT UNNEST(range(8)) AS s) ss,
                 (SELECT UNNEST(range(16)) AS c) cc
        ),
        scd AS (
            SELECT vec_id, s, c,
                   CAST(list_sum(list_transform(range(8), j ->
                       (codes[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 161 - 80))
                     * (codes[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 161 - 80))))
                   AS BIGINT) AS sd
            FROM q CROSS JOIN sc
        ),
        enc AS (
            SELECT vec_id, s, c AS code FROM (
                SELECT vec_id, s, c,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                          ORDER BY sd, c) AS rnk
                FROM scd) WHERE rnk = 1
        ),
        adc AS (
            SELECT t.vec_id AS query_id, e.vec_id AS nn_id,
                   CAST(SUM(t.sd) AS BIGINT) AS d2
            FROM enc e JOIN scd t ON t.s = e.s AND t.c = e.code
            WHERE t.vec_id % 50 = 0 AND e.vec_id <> t.vec_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, nn_id,
                   ROUND(SQRT(CAST(d2 AS DOUBLE)), 6) AS adc_dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ROUND(SQRT(CAST(d2 AS DOUBLE)), 6),
                                               nn_id) AS rk
            FROM adc
        )
        SELECT query_id, nn_id, adc_dist, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
    # IVF-PQ (IVFADC) on int8 codes: integer coarse centroids
    # cent(c,j) = ((c·37 + j·13 + 11) % 161) − 80  (pseudo_centroids(8, 64)),
    # residual PQ codebooks cb(s,c,j) = ((s·59 + c·31 + j·17 + 3) % 201) − 100
    # (pseudo_codebooks(8, 16, 8, mod=201, shift=100)); queries vec_id % 50 = 0
    "emb_ann_ivfpq_topk": _ANN_CODES_CTE + """,
        celld AS (
            SELECT vec_id, codes, CAST(cc.c AS BIGINT) AS cell,
                   CAST(list_sum(list_transform(range(64), j ->
                       (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))
                     * (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))))
                   AS BIGINT) AS d2
            FROM q CROSS JOIN (SELECT UNNEST(range(8)) AS c) cc
        ),
        assigned AS (
            SELECT vec_id, codes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld) WHERE rnk = 1
        ),
        res AS (
            SELECT vec_id, cell,
                   list_transform(range(64), j ->
                       codes[CAST(j AS INT) + 1]
                       - ((cell * 37 + j * 13 + 11) % 161 - 80)) AS r
            FROM assigned
        ),
        sc AS (
            SELECT CAST(ss.s AS BIGINT) AS s, CAST(cc.c AS BIGINT) AS c
            FROM (SELECT UNNEST(range(8)) AS s) ss,
                 (SELECT UNNEST(range(16)) AS c) cc
        ),
        rscd AS (
            SELECT vec_id, s, c,
                   CAST(list_sum(list_transform(range(8), j ->
                       (r[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 201 - 100))
                     * (r[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 201 - 100))))
                   AS BIGINT) AS sd
            FROM res CROSS JOIN sc
        ),
        enc AS (
            SELECT vec_id, s, c AS code FROM (
                SELECT vec_id, s, c,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                          ORDER BY sd, c) AS rnk
                FROM rscd) WHERE rnk = 1
        ),
        probed AS (
            SELECT vec_id AS query_id, codes AS qcodes, cell FROM (
                SELECT vec_id, codes, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld WHERE vec_id % 50 = 0) WHERE rnk <= 3
        ),
        qres AS (
            SELECT query_id, cell,
                   list_transform(range(64), j ->
                       qcodes[CAST(j AS INT) + 1]
                       - ((cell * 37 + j * 13 + 11) % 161 - 80)) AS qr
            FROM probed
        ),
        qsd AS (
            SELECT query_id, cell, s, c,
                   CAST(list_sum(list_transform(range(8), j ->
                       (qr[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 201 - 100))
                     * (qr[CAST(s * 8 + j AS INT) + 1]
                        - ((s * 59 + c * 31 + j * 17 + 3) % 201 - 100))))
                   AS BIGINT) AS sd
            FROM qres CROSS JOIN sc
        ),
        adc AS (
            SELECT t.query_id, e.vec_id AS nn_id,
                   CAST(SUM(t.sd) AS BIGINT) AS d2
            FROM enc e
            JOIN assigned a ON a.vec_id = e.vec_id
            JOIN qsd t ON t.cell = a.cell AND t.s = e.s AND t.c = e.code
            WHERE e.vec_id <> t.query_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, nn_id,
                   ROUND(SQRT(CAST(d2 AS DOUBLE)), 6) AS adc_dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ROUND(SQRT(CAST(d2 AS DOUBLE)), 6),
                                               nn_id) AS rk
            FROM adc
        )
        SELECT query_id, nn_id, adc_dist, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
}


def _mmr_oracle() -> str:
    """Unrolled greedy MMR (n=5) over the symbolic LSH top-10: step s
    picks, per query, the remaining candidate maximizing
    λ·sim − (1−λ)·max(dot to selected) with an nn_id tie-break — the
    exact numpy lexsort in `similarity.mmr_rerank` (integer sims/dots,
    bit-identical score doubles)."""
    lam = repr(0.7)
    one_minus = repr(1.0 - 0.7)
    dot64 = (
        "CAST(list_sum(list_transform(range(64), j -> "
        "qx.codes[CAST(j AS INT) + 1] * qy.codes[CAST(j AS INT) + 1]"
        ")) AS DOUBLE)"
    )
    steps = []
    for s in range(2, 6):
        p = s - 1
        steps.append(f""",
        sel{s} AS (
            SELECT query_id, nn_id FROM (
                SELECT c.query_id, c.nn_id,
                       ROW_NUMBER() OVER (PARTITION BY c.query_id
                           ORDER BY (CAST({lam} AS DOUBLE) * c.sim
                                     - CAST({one_minus} AS DOUBLE)
                                       * red.r) DESC,
                                    c.nn_id) AS rn
                FROM cand c
                JOIN (SELECT d.query_id, d.x AS nn_id, MAX(d.dp) AS r
                      FROM dpair d
                      JOIN selected{p} sl
                        ON sl.query_id = d.query_id AND sl.nn_id = d.y
                      GROUP BY d.query_id, d.x) red
                  ON red.query_id = c.query_id AND red.nn_id = c.nn_id
                WHERE NOT EXISTS (
                    SELECT 1 FROM selected{p} s2
                    WHERE s2.query_id = c.query_id
                      AND s2.nn_id = c.nn_id)
            ) WHERE rn = 1
        ),
        selected{s} AS (
            SELECT * FROM selected{p}
            UNION ALL SELECT * FROM sel{s}
        )""")
    return _ANN_CODES_CTE + f""",
        b AS (
            SELECT vec_id, codes,
                   {_plane_bucket_expr(6)} AS bucket
            FROM q
        ),
        pr AS (
            SELECT vec_id AS query_id, codes AS qcodes,
                   {_probe_list_expr(6)}
                       AS pb
            FROM b WHERE vec_id % 5 = 0
        ),
        lpairs AS (
            SELECT pr.query_id, c.vec_id AS nn_id,
                   CAST(list_sum(list_transform(range(64), j ->
                       pr.qcodes[CAST(j AS INT) + 1]
                       * c.codes[CAST(j AS INT) + 1])) AS BIGINT) AS dot
            FROM pr JOIN b c
              ON c.bucket = pr.pb AND c.vec_id <> pr.query_id
        ),
        cand AS (
            SELECT query_id, nn_id, CAST(dot AS DOUBLE) AS sim FROM (
                SELECT query_id, nn_id, dot,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY dot DESC, nn_id) AS rk
                FROM lpairs) WHERE rk <= 10
        ),
        dpair AS (
            SELECT c1.query_id, c1.nn_id AS x, c2.nn_id AS y,
                   """ + dot64 + """ AS dp
            FROM cand c1
            JOIN cand c2 ON c1.query_id = c2.query_id
            JOIN q qx ON qx.vec_id = c1.nn_id
            JOIN q qy ON qy.vec_id = c2.nn_id
        ),
        sel1 AS (
            SELECT query_id, nn_id FROM (
                SELECT query_id, nn_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, nn_id) AS rn
                FROM cand) WHERE rn = 1
        ),
        selected1 AS (SELECT * FROM sel1)""" + "".join(steps) + """
        SELECT query_id, nn_id, CAST(s AS BIGINT) AS mmr_rank FROM (
            SELECT query_id, nn_id, 1 AS s FROM sel1
            UNION ALL SELECT query_id, nn_id, 2 FROM sel2
            UNION ALL SELECT query_id, nn_id, 3 FROM sel3
            UNION ALL SELECT query_id, nn_id, 4 FROM sel4
            UNION ALL SELECT query_id, nn_id, 5 FROM sel5
        ) ORDER BY query_id, mmr_rank
    """


ORACLES["emb_mmr_rerank"] = _mmr_oracle()


# the whitening invariant: cov(whitened) == I at 4 dp (see
# emb_whiten_moments docstring for why a constant table is the honest
# oracle here)
ORACLES["emb_whiten_moments"] = """
WITH ranks AS (SELECT unnest(range(8)) AS a)
SELECT r1.a AS a, r2.a AS b,
       CASE WHEN r1.a = r2.a THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS cov
FROM ranks r1 JOIN ranks r2 ON r2.a >= r1.a
ORDER BY a, b
"""


def _bpe_encode_stats_oracle(n_merges: int = 8) -> str:
    """FULL symbolic replay of the BPE fit + apply: each round is one
    pair-count aggregate + a 1-row argmax + a string `replace` on the
    '|s1||s2|'-wrapped symbol representation — `replace`'s leftmost
    non-overlapping scan (continuing AFTER each replacement, never
    rescanning output) is EXACTLY `merge_pair`'s greedy left-to-right
    fold.  PRECONDITION: the wrapped form cannot match across symbol
    boundaries only because '|' never occurs in the corpus text — that
    is a property of the FIXTURES (tokens may contain any non-space
    char in general), verified for all three scales by
    tests/test_bpe.py::test_fixture_corpus_is_pipe_free; a corpus
    containing '|' would silently diverge.  A round whose pair table
    is empty leaves the representation unchanged (the CASE/EXISTS
    guard), matching fit_bpe's early stop.  MATERIALIZED CTEs stop the
    round-chain from inlining exponentially."""
    rounds = []
    for k in range(1, n_merges + 1):
        p = k - 1
        rounds.append(f""",
pc{k} AS MATERIALIZED (
    SELECT (pr).a AS a, (pr).b AS b, SUM(c) AS cnt FROM (
        SELECT c, UNNEST([{{'a': syms[CAST(i AS INT)],
                            'b': syms[CAST(i AS INT) + 1]}}
                          FOR i IN range(1, len(syms))]) AS pr
        FROM (SELECT c, string_split(substr(r, 2, length(r) - 2), '||')
                     AS syms
              FROM w{p})) GROUP BY 1, 2
),
m{k} AS MATERIALIZED (SELECT a, b FROM pc{k} ORDER BY cnt DESC, a, b LIMIT 1),
w{k} AS MATERIALIZED (
    SELECT w, c,
           CASE WHEN EXISTS (SELECT 1 FROM m{k})
                THEN replace(r,
                             '|' || (SELECT a FROM m{k}) || '||'
                                 || (SELECT b FROM m{k}) || '|',
                             '|' || (SELECT a FROM m{k})
                                 || (SELECT b FROM m{k}) || '|')
                ELSE r END AS r
    FROM w{p}
)""")
    return ("""
WITH words AS MATERIALIZED (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT UNNEST(list_filter(string_split(text, ' '), t -> t <> ''))
               AS w
        FROM documents) GROUP BY w
),
w0 AS MATERIALIZED (
    SELECT w, c,
           '|' || array_to_string([substr(w, CAST(i AS INT), 1)
                                   FOR i IN range(1, length(w) + 1)],
                                  '||') || '|' AS r
    FROM words
)""" + "".join(rounds) + f"""
SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(c) AS BIGINT) AS n_occurrences
FROM (SELECT c,
             CAST(len(string_split(substr(r, 2, length(r) - 2), '||'))
                  AS BIGINT) AS n_tokens
      FROM w{n_merges})
GROUP BY n_tokens ORDER BY n_tokens
""")


ORACLES["doc_bpe_encode_stats"] = _bpe_encode_stats_oracle()
