"""Deduplication operators (north-star M4): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding near-dup.

Scale design: every variant reduces the O(N²) pair space *before* any
pairwise work —
  - exact: one hash-groupBy (map-side partial agg);
  - MinHash/LSH: shingle→signature scan-side, band→bucket self-join so
    only same-bucket pairs are compared (the classic sub-quadratic path);
  - SimHash: 64-bit signatures + band buckets on 16-bit chunks;
  - embedding near-dup: LSH-bucketed candidates then exact cosine.

MinHash integer math is engine-portable (no engine-specific hash
functions): shingle code = ascii trigram packed into 24 bits, then
universal hashing ``(a·x + b) mod p`` — the DuckDB oracle computes the
identical formula (see queries/pipeline_queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 − 1

# fixed universal-hash parameters (odd multipliers, distinct offsets)
MINHASH_PARAMS: list[tuple[int, int]] = [
    (13, 7), (31, 3), (73, 11), (151, 17),
    (283, 29), (541, 43), (1109, 59), (2213, 71),
]


def shingle_codes_col(text: Column | str = "text", k: int = 3) -> Column:
    """Distinct k-gram character shingles packed as integers:
    ``Σ ascii(cᵢ)·256^(k−1−i)`` — pure SQL, portable across engines.

    Char codes are materialized once into an array so each shingle is k
    O(1) array lookups; the naive ``substr(text, i, 1)`` per position is
    an O(len) byte scan in UTF8String → O(len²) per document (measured
    4× slower at 300-char docs, far worse on long ones)."""
    name = text if isinstance(text, str) else None
    assert name is not None, "shingle_codes_col needs a column name"
    # BIGINT arithmetic: downstream universal hashing multiplies by
    # constants that overflow int32 (silently in Spark, loudly in DuckDB)
    terms = " + ".join(
        f"codes[CAST(i AS INT) + {j - 1}] * {256 ** (k - 1 - j)}"
        for j in range(k)
    )
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({name}) - {k - 1}, 1)), "
        f"i -> {terms}))"
    )


def _with_char_codes(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the per-char ascii-code array `codes` used by
    :func:`shingle_codes_col` (single O(len) pass per document)."""
    return df.withColumn(
        "codes",
        F.transform(
            F.split(F.col(text_col), ""),
            lambda c: F.ascii(c).cast("long"),
        ),
    )


def minhash_signature_cols(
    shingles: Column, n_hashes: int = 8
) -> list[Column]:
    """MinHash values m₀..m₇: min over shingles of (a·x + b) mod p."""
    assert n_hashes <= len(MINHASH_PARAMS)

    def _uhash(a: int, b: int):
        # single-arg closure: Spark infers higher-order-function arity
        # from the Python signature (defaulted extras would break it)
        def f(x):
            return (F.lit(a).cast("long") * x + F.lit(b)) % MERSENNE_P

        return f

    return [
        F.array_min(F.transform(shingles, _uhash(a, b)))
        .cast("long")
        .alias(f"m{j}")
        for j, (a, b) in enumerate(MINHASH_PARAMS[:n_hashes])
    ]


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n_hashes: int = 8
) -> DataFrame:
    """Arrow-vectorized signature build: codepoints → sliding-window
    shingle codes → 8 universal hashes, all numpy (one batch pass, no
    shuffle).  Pure integer arithmetic — bit-identical to the SQL
    column form (`minhash_signature_cols`, kept for composition) and to
    the DuckDB oracle.

    r14: the whole BATCH is one numpy pass — texts are concatenated
    into a single codepoint array (one ``str.encode`` per batch), every
    document's shingle positions are materialized with a repeat/arange
    index (no per-row loop, no per-row ``np.unique`` — the min over all
    positions equals the min over distinct shingles), and the per-doc
    minimum is one ``np.minimum.reduceat`` segment-min per hash.
    Measured ~5× over the per-row-numpy form this replaces (which was
    itself ~4× over the interpreted higher-order-function evaluation)
    at 300-char docs."""
    assert n_hashes <= len(MINHASH_PARAMS)
    a_vec = np.array([a for a, _ in MINHASH_PARAMS[:n_hashes]], dtype=np.int64)
    b_vec = np.array([b for _, b in MINHASH_PARAMS[:n_hashes]], dtype=np.int64)

    def batch(it):
        for pdf in it:
            n_docs = len(pdf)
            if not n_docs:
                continue
            texts = pdf[text_col].astype(str).tolist()
            # utf-32 view = vectorized codepoints ≡ SQL ascii(); one
            # encode for the whole batch (len(str) == codepoint count)
            try:
                cp = np.frombuffer(
                    "".join(texts).encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
            except UnicodeEncodeError:
                # ADVICE r14: the batch encode loses the offending row;
                # re-scan per row so the error names the document
                for did, t in zip(pdf["doc_id"], texts):
                    try:
                        t.encode("utf-32-le")
                    except UnicodeEncodeError as ex:
                        raise UnicodeEncodeError(
                            ex.encoding, ex.object, ex.start, ex.end,
                            f"doc_id={did}: {ex.reason}",
                        ) from None
                raise  # only reachable if the join itself was at fault
            lens = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=n_docs
            )
            offs = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            out = np.empty((n_docs, n_hashes), dtype=np.int64)

            long_mask = lens >= 3
            counts = (lens - 2)[long_mask]
            if counts.size:
                starts = offs[:-1][long_mask]
                seg_off = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=seg_off[1:])
                pos = np.repeat(starts - seg_off, counts)
                pos += np.arange(int(counts.sum()), dtype=np.int64)
                # shingle codes and hashes built in-place (the arrays
                # here are batch-total-chars long — fresh temporaries
                # per op would dominate the kernel)
                sh = cp[pos]
                sh *= 65536
                pos += 1
                tmp = cp[pos]
                tmp *= 256
                sh += tmp
                pos += 1
                sh += cp[pos]
                h = np.empty_like(sh)
                for j in range(n_hashes):
                    np.multiply(sh, a_vec[j], out=h)
                    h += b_vec[j]
                    h %= MERSENNE_P
                    out[long_mask, j] = np.minimum.reduceat(h, seg_off)
            for idx in np.nonzero(~long_mask)[0]:
                # <3-char docs: zero-padded single shingle (OOB substr
                # → ascii('') = 0), same semantics as the SQL form
                p3 = np.zeros(3, dtype=np.int64)
                c = cp[offs[idx]:offs[idx + 1]]
                p3[: len(c)] = c
                sh1 = p3[0] * 65536 + p3[1] * 256 + p3[2]
                out[idx] = (a_vec * sh1 + b_vec) % MERSENNE_P
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{f"m{j}": out[:, j] for j in range(n_hashes)},
                }
            )

    schema = "doc_id long, " + ", ".join(
        f"m{j} long" for j in range(n_hashes)
    )
    return df.select("doc_id", text_col).mapInPandas(batch, schema)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Band the signature (`bands` bands × `rows_per_band` hashes) and
    self-join per band bucket → candidate near-dup pairs (a < b).

    The self-join key is (band index, band value): only same-bucket rows
    meet, so the shuffle is proportional to bucket sizes, never N².

    ``max_bucket_size`` is the standard LSH anti-skew guard: a bucket
    holding a large fraction of the corpus (near-universal shingle
    patterns) contributes O(bucket²) pairs with almost no dedup signal —
    at 100 TB a single degenerate bucket would dominate the job.  Such
    buckets are dropped here; whole-bucket dedup decisions for them come
    from :func:`lsh_duplicate_groups`, which is linear in bucket size.
    """
    band_vals = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"m{i * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("sig"),
            )
            for i in range(bands)
        ]
    )
    banded = signatures.select(
        "doc_id", F.explode(band_vals).alias("bv")
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.sig").alias("sig"))
    # No internal persist: banding is cheap codegen over `signatures`
    # (callers persist the signature table — the expensive part); an
    # internal persist here is never released and leaks cached blocks
    # across calls in a long-lived session.
    if max_bucket_size is not None:
        # Broadcast the OVERSIZED buckets and anti-join: oversized
        # buckets are few by definition (each holds > max_bucket_size
        # docs, so there are < N/max_bucket_size of them), while the
        # small-bucket list is O(N) rows at scale — most docs land in
        # singleton buckets, so broadcasting the small side would OOM
        # at 100 TB.
        oversized = (
            banded.groupBy("band", "sig")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .drop("count")
        )
        banded = banded.join(
            F.broadcast(oversized), ["band", "sig"], "left_anti"
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def lsh_duplicate_groups(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Whole-bucket dedup decision, linear in bucket size: every doc in
    a band bucket links to the bucket's min doc_id; a doc in several
    buckets keeps its smallest keeper.  This is how LSH dedup scales
    past degenerate buckets — no pairwise expansion at all.

    Returns (doc_id, keep_doc_id) for docs that would be dropped
    (doc_id > keeper in some bucket).
    """
    band_vals = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"m{i * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("sig"),
            )
            for i in range(bands)
        ]
    )
    banded = signatures.select(
        "doc_id", F.explode(band_vals).alias("bv")
    ).select("doc_id", "bv.band", "bv.sig")
    keepers = banded.groupBy("band", "sig").agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    return (
        banded.join(keepers, ["band", "sig"])
        .filter(F.col("doc_id") > F.col("keep_doc_id"))
        .groupBy("doc_id")
        .agg(F.min("keep_doc_id").alias("keep_doc_id"))
    )


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact dedup via content hash group-by; returns groups with >1 doc
    (hash-groupBy gets map-side partial aggregation for free)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("cnt") > 1)
    )


def jaccard_col(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over array columns (arrays must be distinct)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(0.0)


# Polynomial rolling hash over character codes, h' = (131·h + code) mod
# (a prime < 2^55): every intermediate stays < 2^62 (no BIGINT overflow
# in either engine), every signature bit ≥ 55 is provably 0, and a SQL
# oracle recomputes it symbolically (list_reduce over
# ascii(substr(...)) codes) — the SimHash analogue of the ANN
# pseudo-geometry formulas (similarity.pseudo_planes).
PSEUDO_TOKEN_HASH_SQL = (
    "aggregate(split(t, ''), CAST(0 AS BIGINT), "
    "(acc, c) -> (acc * 131 + ascii(c)) % 36028797018963913)"
)


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash_sql: str = "xxhash64(t)",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Token hashing runs JVM-side (an SQL expression over the token `t`
    inside a higher-order `transform` — codegen, no Python string
    handling); only the bit-voting touches Python, fully vectorized
    over the Arrow batch.  A per-token Python FNV loop was ~10× slower
    at 300-char docs.

    ``token_hash_sql`` swaps the token hash (default `xxhash64`).  The
    declared query uses :data:`PSEUDO_TOKEN_HASH_SQL` — a polynomial
    rolling hash over character codes, integer-exact in any engine —
    so the UNCHANGED bit-vote + banding machinery below becomes
    DuckDB-oracleable (the r5 ANN pseudo-geometry doctrine); the
    xxhash64 production path keeps its exact digest pin in
    tests/test_trained_ann_goldens.py.

    Returns (doc_id, simhash long).  Near-dup candidates are rows whose
    signatures agree on any 16-bit chunk (see :func:`simhash_candidates`).
    """
    hashed = df.select(
        id_col,
        F.expr(
            f"transform(filter(split({text_col}, ' '), t -> t <> ''), "
            f"t -> {token_hash_sql})"
        ).alias("th"),
    )

    def batch(it):
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in it:
            sigs = np.zeros(len(pdf), dtype=np.uint64)
            for row_i, th in enumerate(pdf["th"]):
                if th is None or len(th) == 0:
                    continue
                hashes = np.asarray(th, dtype=np.int64).view(np.uint64)
                bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(
                    np.int64
                )
                acc = (2 * bits - 1).sum(axis=0)
                sigs[row_i] = np.bitwise_or.reduce(
                    (np.uint64(1) << shifts)[acc > 0], initial=np.uint64(0)
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": sigs.astype(np.int64)}
            )

    return hashed.mapInPandas(batch, f"{id_col} long, simhash long")


def simhash_candidates(
    sim: DataFrame, max_bucket_size: int | None = 64
) -> DataFrame:
    """Self-join on any equal 16-bit chunk of the simhash (4 bands);
    same anti-skew bucket cap as :func:`lsh_candidate_pairs`."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("sig"),
            )
            for i in range(4)
        ]
    )
    banded = sim.select("doc_id", F.explode(chunks).alias("bv")).select(
        "doc_id", "bv.band", "bv.sig"
    )
    if max_bucket_size is not None:
        # same inverted-broadcast guard as lsh_candidate_pairs: the
        # oversized-bucket list is the bounded side (here additionally
        # bounded by the 4×2¹⁶ band space), the small-bucket list is not
        oversized = (
            banded.groupBy("band", "sig")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .drop("count")
        )
        banded = banded.join(
            F.broadcast(oversized), ["band", "sig"], "left_anti"
        )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def embedding_near_dups_bucketed(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes=None,
    round_decimals: int | None = 6,
    max_bucket: int | None = None,
    sub_planes: int = 4,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane LSH buckets
    → exact cosine only within a bucket (candidate space Σ bucket², not
    N²).  Recall < 1 by construction (multiprobe raises it — see
    ``similarity.lsh_bucketed_topk``); exact duplicates always share a
    bucket, so true dups are never missed.

    ``planes`` fixes the hyperplanes (e.g. the integer
    ``similarity.pseudo_planes`` on int8 codes — every bucket bit and
    dot product becomes integer-exact, which is how the declared query
    is DuckDB-oracled).  ``round_decimals=None`` ships the cosine
    UNROUNDED: when both engines compute the identical expression tree
    ``dot / sqrt(dot_aa · dot_bb)`` on exact-integer inputs the doubles
    are bit-identical, and the round-trip through ROUND() is the only
    step that can diverge (dyadic-tie doctrine, ROUND_NOTES r5).

    GIANT-BUCKET GUARD (the semantic_dedup pattern, added when the r13
    sf1.0 decade measured this function superlinear — clustered
    embeddings make a few buckets grow Θ(N) and the in-bucket join
    Θ(N²)): pass ``max_bucket`` and any bucket larger than it is
    sub-bucketed by ``sub_planes`` FURTHER hyperplanes of the same
    family (the join key grows those extra sign bits), dropping the
    worst per-key fan-in by ~2^sub_planes.  Guarded pairs ⊆ unguarded
    pairs (property-tested); buckets at or under the cap are untouched,
    so the guard is a no-op until the data actually skews.
    """
    from spark_tensors_spark.functions.columns import cosine_col
    from spark_tensors_spark.pipeline.similarity import lsh_buckets

    if max_bucket is None:
        b = lsh_buckets(
            emb, n_planes=n_planes, seed=seed, id_col=id_col,
            vec_col=vec_col, planes=planes,
        ).withColumn("_sb", F.lit(0).cast("long"))
    else:
        # ONE projection pass at n_planes + sub_planes: the MAIN bucket
        # is the low n_planes bits (plane p → bit p), the sub-bucket
        # key the high sub_planes bits — engaged only past the cap
        total = n_planes + sub_planes
        if planes is not None and planes.shape[0] < total:
            raise ValueError(
                f"max_bucket guard needs {total} planes, got "
                f"{planes.shape[0]}"
            )
        ext = lsh_buckets(
            emb, n_planes=total, seed=seed, id_col=id_col,
            vec_col=vec_col,
            planes=None if planes is None else planes[:total],
        ).select(
            id_col,
            (F.col("bucket") % (2**n_planes)).alias("bucket"),
            F.expr(f"bucket div {2**n_planes}").alias("_sub"),
        )
        sizes = ext.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        b = ext.join(F.broadcast(sizes), "bucket").select(
            id_col,
            "bucket",
            F.when(F.col("_bsz") > max_bucket, F.col("_sub"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_sb"),
        )
    with_b = emb.join(b, id_col)
    # In-bucket scoring is ONE numpy matmul per (bucket, _sb) group
    # (the lsh_bucketed_topk pattern) — the per-pair higher-order-
    # function cosine is interpreted expression evaluation per element
    # and measured ~10× slower on million-pair buckets.  Bit-parity
    # with the SQL expression dot/√(na²·nb²): integer dots are exact
    # in float64 (≤2⁵³), na²·nb² ≤ ~1e12 is exact, and np.sqrt /
    # division are the same correctly-rounded IEEE ops, so the emitted
    # UNROUNDED doubles are identical; the optional round + threshold
    # filter stay Spark-side (F.round is HALF_UP, np.round is not).
    import pandas as pd

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        m = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        dots = m @ m.T
        n2 = (m * m).sum(axis=1)
        ia, ib = np.triu_indices(len(ids), 1)
        cos = dots[ia, ib] / np.sqrt(n2[ia] * n2[ib])
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cos": cos}
        )

    pairs = (
        with_b.select(
            "bucket",
            "_sb",
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
        )
        .groupBy("bucket", "_sb")
        .applyInPandas(_bucket_pairs, "id_a long, id_b long, cos double")
    )
    cos = F.col("cos")
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    return (
        pairs.select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") > threshold)
        .distinct()
    )


def semantic_dedup(
    codes_df: DataFrame,
    centroids,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    max_cluster: int | None = None,
    sub_planes: int = 4,
    seed: int = 7,
    planes=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    k-means cluster assignment, then near-duplicate detection ONLY
    within a cluster — the cluster partition turns the N² dedup into
    Σ cluster², and at production K (∝ √N or larger) clusters stay
    small as the corpus grows.

    A vector is REMOVED when a smaller-id vector in the same cluster
    has cosine ≥ ``threshold`` (the deterministic pairwise variant of
    SemDeDup's greedy keep-one rule: the minimum id of every dup group
    always survives; unlike the greedy sequential rule this needs no
    per-cluster ordering pass, just the self-join).  Returns one row
    per removed vector: (cluster_id, removed_id, kept_id = smallest
    qualifying smaller-id neighbour, n_dups = how many such
    neighbours).

    With integer ``codes`` (int8 quantization) and integer
    ``centroids`` the assignment is exact (``similarity.kmeans_assign``
    scan-side codegen) and the cosine ``dot/sqrt(na²·nb²)`` is computed
    on exact-integer dot products — bit-identical cross-engine
    UNROUNDED, so the declared query is fully value-oracled.

    Scale shape: one scan for assignment (no shuffle), one
    cluster-keyed self-join (shuffle on cluster_id), one aggregate
    over the qualifying pairs.  The self-join's skew case — ONE GIANT
    CLUSTER — is guarded in code, not just prescribed: pass
    ``max_cluster`` and any cluster larger than it is LSH-sub-bucketed
    (``sub_planes`` hyperplanes over the same codes), so its join key
    becomes (cluster, bucket) and the worst per-key fan-in drops by
    ~2^sub_planes.  Like every LSH family member this trades recall
    inside oversized clusters (guarded pairs ⊆ unguarded pairs — the
    property test pins it); raising K remains the SemDeDup-prescribed
    first mitigation, the guard is the backstop when the data refuses
    to cluster evenly.
    """
    from spark_tensors_spark.functions.columns import cosine_col
    from spark_tensors_spark.pipeline.similarity import (
        kmeans_assign,
        lsh_buckets,
    )

    if max_cluster is not None and max_cluster < 1:
        raise ValueError(f"max_cluster must be >= 1, got {max_cluster}")
    assigned = kmeans_assign(
        codes_df.select(id_col, codes_col), centroids,
        codes_col=codes_col,
    )
    if max_cluster is None:
        assigned = assigned.withColumn("_sb", F.lit(0).cast("long"))
    else:
        sizes = assigned.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("_csz")
        )
        # K rows — broadcast, no extra shuffle of the corpus side
        assigned = assigned.join(F.broadcast(sizes), "cluster_id")
        small = assigned.filter(F.col("_csz") <= max_cluster).withColumn(
            "_sb", F.lit(0).cast("long")
        )
        big = assigned.filter(F.col("_csz") > max_cluster)
        if planes is None:
            # the vector dim is already known from the centroids —
            # build the hyperplanes HERE so lsh_buckets never runs its
            # dim-probe .first(), which would execute the whole
            # assignment + size-count pipeline as an extra eager job
            import numpy as np

            from spark_tensors_spark.pipeline.similarity import (
                _hash_uniform,
            )

            dim = int(np.asarray(centroids).shape[1])
            planes = _hash_uniform(seed, np.arange(sub_planes), dim) * 2 - 1
        sub = lsh_buckets(
            big.select(id_col, codes_col),
            n_planes=sub_planes,
            seed=seed,
            id_col=id_col,
            vec_col=codes_col,
            planes=planes,
        ).select(
            F.col(id_col), (F.col("bucket") + 1).alias("_sb")
        )  # +1 keeps oversized-cluster buckets disjoint from small's 0
        assigned = small.drop("_csz").unionByName(
            big.join(sub, id_col).drop("_csz")
        )
    left = assigned.select(
        F.col("cluster_id"),
        F.col("_sb"),
        F.col(id_col).alias("id_a"),
        F.col(codes_col).alias("va"),
    )
    right = assigned.select(
        F.col("cluster_id"),
        F.col("_sb"),
        F.col(id_col).alias("id_b"),
        F.col(codes_col).alias("vb"),
    )
    pairs = (
        left.join(right, ["cluster_id", "_sb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_col("va", "vb") >= F.lit(float(threshold)))
    )
    return (
        pairs.groupBy("cluster_id", F.col("id_b").alias("removed_id"))
        .agg(
            F.min("id_a").alias("kept_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs above `threshold`.

    Brute-force form (oracle baseline); the sub-quadratic variant is
    :func:`embedding_near_dups_bucketed`.
    """
    from spark_tensors_spark.functions.columns import cosine_col

    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col("va", "vb"), 6).alias("cos"),
        )
        .filter(F.col("cos") > threshold)
    )


def jaccard_similarity_join(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_bucket: int | None = 1024,
) -> DataFrame:
    """EXACT set-similarity self-join: all pairs with token-Jaccard
    ≥ threshold_num/threshold_den — the prefix-filtering design of
    Vernica/Carey/Li (SIGMOD 2010 MapReduce set-similarity join), the
    exact-threshold complement to MinHash-LSH (no false negatives).

    Scale shape:
      1. tokens ranked globally by ascending frequency (one agg + one
         join — rare tokens first);
      2. each doc emits only its PREFIX (the first
         ``n − ceil(t·n) + 1`` rarest tokens): two docs can pass the
         threshold only if their prefixes share a token, so the
         candidate join runs on the exploded prefix — |candidates| ≪ n²
         because prefixes are rare-token-heavy;
      3. an equi-join on (prefix token) proposes pairs; exact
         verification joins the full token arrays back and tests the
         INTEGER predicate den·|A∩B| ≥ num·(|A|+|B|−|A∩B|) — no float
         threshold, so the decision is engine-exact.

    Hot prefix tokens (stopword-like) are capped at
    ``max_token_bucket`` docs (defensive — the frequency ordering
    already pushes frequent tokens out of prefixes); dropped buckets
    only lose candidates whose every shared prefix token is that hot,
    mirroring the LSH bucket cap.

    Returns (doc_a, doc_b, n_common, n_union) — all integers.
    """
    toks = _jaccard_tokenize(docs, text_col=text_col, id_col=id_col)
    return _jaccard_pairs_from_toks(
        toks,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        max_token_bucket=max_token_bucket,
    )


def _jaccard_tokenize(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, toks) with the distinct lowercase whitespace tokens;
    empty-token docs dropped (Jaccard undefined)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("toks"),
    ).filter(F.size("toks") > 0)


def _jaccard_pairs_from_toks(
    toks: DataFrame,
    threshold_num: int,
    threshold_den: int,
    max_token_bucket: int | None,
    distinct_sets: bool = False,
) -> DataFrame:
    """Prefix+length-filtered verified pair join on a pre-tokenized
    (doc_id, toks) frame — the body of :func:`jaccard_similarity_join`,
    split out so :func:`jaccard_topk` can run it on group
    REPRESENTATIVES instead of raw docs.

    ``distinct_sets=True`` (the grouped callers: every input row is a
    UNIQUE token set) turns on the exact distinctness bound: distinct
    sets force u ≥ c+1, so den·c ≥ num·u implies
    c ≥ C = ceil(num/(den−num)) — hence min(|A|,|B|) ≥ C and
    |A|+|B| ≥ 2C+1 are NECESSARY for any qualifying pair and filtering
    on them drops no true pair.  At high thresholds this collapses the
    candidate set outright: at τ=97/100, C=33, and any corpus whose
    docs carry <33 distinct tokens has NO qualifying non-identical
    pair — the r14 sf1.0 measurement (~1.3M length-filtered candidate
    rep pairs, 0 qualifying) paid ~14×/decade of pure verification
    waste this filter removes (guide §2.3: don't shuffle/verify what
    you throw away)."""
    exploded = toks.select("doc_id", F.explode("toks").alias("tok"))
    # Rarity order WITHOUT a dense global rank: the sort key is the
    # struct (count, tok) itself — a total deterministic order (ties by
    # token text), and no single-partition row_number over the whole
    # vocabulary (at 100 TB the vocab is billions of tokens; a global
    # window there is the exact cliff assign_ids avoids).
    tok_count = exploded.groupBy("tok").count()
    ranked = (
        exploded.join(tok_count, "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("count", "tok"))
            ).alias("ranks")
        )
        .select(
            "doc_id",
            # prefix ordering needs the (count, tok) structs; exact
            # verification only needs the plain token set — intersecting
            # string arrays is ~2× cheaper than struct arrays
            "ranks",
            F.transform("ranks", lambda r: r["tok"]).alias("toks"),
            F.size("ranks").alias("n_tok"),
        )
    )
    # prefix length: n − ceil(t·n) + 1, computed in integers:
    # ceil(num·n/den) = floor((num·n + den − 1)/den)
    prefix_len = (
        F.col("n_tok")
        - F.floor(
            (F.lit(threshold_num) * F.col("n_tok") + threshold_den - 1)
            / threshold_den
        )
        + 1
    ).cast("int")
    # two prefixes share a struct iff they share the token (count is a
    # function of the token), so the candidate join keys on tok alone;
    # n_tok rides along for the LENGTH FILTER below
    prefix = ranked.select(
        "doc_id",
        "n_tok",
        F.explode(F.slice("ranks", 1, prefix_len)).alias("pref"),
    ).select("doc_id", "n_tok", F.col("pref.tok").alias("tok"))
    if max_token_bucket is not None:
        hot = (
            prefix.groupBy("tok")
            .count()
            .filter(F.col("count") > max_token_bucket)
            .select("tok")
        )
        prefix = prefix.join(F.broadcast(hot), "tok", "left_anti")
    cand = (
        prefix.alias("l")
        .join(prefix.alias("r"), "tok")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        # LENGTH FILTER (Vernica §3.1 / ppjoin): J(A,B) ≥ num/den
        # forces den·min(|A|,|B|) ≥ num·max(|A|,|B|) — a necessary
        # condition, so dropping the failures is exact.  On templated
        # corpora (many docs sharing even rare prefix tokens) this is
        # the difference between |bucket|² candidates and only the
        # size-compatible slice — the r13 sf1.0 decade measured the
        # unfiltered form superlinear (29× for 10× data) and this cut
        # restored the near-linear curve.
        .filter(
            F.lit(threshold_den)
            * F.least(F.col("l.n_tok"), F.col("r.n_tok"))
            >= F.lit(threshold_num)
            * F.greatest(F.col("l.n_tok"), F.col("r.n_tok"))
        )
    )
    if distinct_sets:
        # exact distinctness bound (docstring): u ≥ c+1 ⟹ c ≥ C, so
        # min size ≥ C and size sum ≥ 2C+1 are necessary conditions;
        # τ ≥ 1 admits no qualifying distinct pair at all
        if threshold_num >= threshold_den:
            cand = cand.filter(F.lit(False))
        else:
            c_min = -(-threshold_num // (threshold_den - threshold_num))
            cand = cand.filter(
                (F.least(F.col("l.n_tok"), F.col("r.n_tok")) >= c_min)
                & (F.col("l.n_tok") + F.col("r.n_tok") >= 2 * c_min + 1)
            )
    cand = (
        cand.select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ta = ranked.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ra"),
                       F.col("n_tok").alias("na"))
    tb = ranked.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("rb"),
                       F.col("n_tok").alias("nb"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ra", "rb")).alias("n_common"),
            (F.col("na") + F.col("nb")).alias("_nsum"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("_nsum") - F.col("n_common")).alias("n_union"),
        )
        .filter(
            F.lit(threshold_den) * F.col("n_common")
            >= F.lit(threshold_num) * F.col("n_union")
        )
    )
    return verified


def _identical_set_members(toks: DataFrame):
    """Group docs by their EXACT token set (sorted array key — no hash,
    no collisions).  Returns (mem, reps): mem = (doc_id, toks, skey,
    gid, irk, n_tok) with gid = the group's smallest doc_id and irk =
    the doc's id-rank within its group; reps = one (doc_id=gid, toks)
    row per distinct set.  J(x,y)=1 ⟺ equal sets, so cross-group
    jaccard is a function of the groups alone — the compression that
    makes templated-corpus set joins sub-quadratic."""
    from pyspark.sql.window import Window

    skey = toks.select(
        "doc_id", "toks", F.array_sort("toks").alias("skey")
    )
    wg = Window.partitionBy("skey")
    wgo = wg.orderBy("doc_id")
    # materialized once: the grouped join consumes this frame from five
    # places (both sides of the in-group self-join, both member
    # expansions, and reps feeding the prefix-filter join); without a
    # barrier each consumer re-runs tokenize + the skey window shuffle
    mem = (
        skey.withColumn("gid", F.min("doc_id").over(wg))
        .withColumn("irk", F.row_number().over(wgo))
        .withColumn("n_tok", F.size("toks"))
        .localCheckpoint()
    )
    reps = mem.filter(F.col("doc_id") == F.col("gid")).select(
        F.col("gid").alias("doc_id"), "toks"
    )
    return mem, reps


def jaccard_similarity_join_grouped(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_bucket: int | None = 1024,
) -> DataFrame:
    """:func:`jaccard_similarity_join` with the identical-set grouping
    core of :func:`jaccard_topk`, SAME all-pairs output: in-group
    pairs (identical sets, J=1 ≥ any τ ≤ 1) are emitted directly with
    n_common = n_union = n_tok — no per-pair array intersect at all —
    and cross-group pairs verify ONCE per (repA, repB) then expand to
    |A|·|B| member pairs carrying the group-level (c, u).  On
    templated corpora where duplicate groups grow with n this removes
    the Σg² intersect term entirely; the remaining per-pair work is
    pure output materialization, which any algorithm must pay.

    Returns (doc_a, doc_b, n_common, n_union), doc_a < doc_b —
    bit-identical to the ungrouped join (property-tested).
    """
    mem, reps = _identical_set_members(
        _jaccard_tokenize(docs, text_col=text_col, id_col=id_col)
    )
    members = mem.select("doc_id", "gid", "n_tok")
    # (a) in-group: every ordered pair within a group, J = 1 exactly
    in_group = (
        members.select(
            "gid", F.col("doc_id").alias("doc_a"),
            F.col("n_tok").alias("n_common"),
        )
        .join(
            members.select("gid", F.col("doc_id").alias("doc_b")),
            "gid",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "n_common",
            F.col("n_common").alias("n_union"),
        )
    )
    # (b) cross-group: group-level verified pairs expanded to members
    # (reps are distinct sets by construction → distinctness bound on)
    cross = _jaccard_pairs_from_toks(
        reps,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        max_token_bucket=max_token_bucket,
        distinct_sets=True,
    )
    cross_pairs = (
        cross.select(
            F.col("doc_a").alias("ga"),
            F.col("doc_b").alias("gb"),
            "n_common",
            "n_union",
        )
        .join(
            members.select(
                F.col("gid").alias("ga"), F.col("doc_id").alias("ma")
            ),
            "ga",
        )
        .join(
            members.select(
                F.col("gid").alias("gb"), F.col("doc_id").alias("mb")
            ),
            "gb",
        )
        .select(
            F.least("ma", "mb").alias("doc_a"),
            F.greatest("ma", "mb").alias("doc_b"),
            "n_common",
            "n_union",
        )
    )
    return in_group.unionByName(cross_pairs)


def jaccard_topk(
    docs: DataFrame,
    k: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_bucket: int | None = 1024,
) -> DataFrame:
    """Bounded-output set-similarity join: each doc's ``k`` most
    Jaccard-similar neighbors among pairs clearing
    ``threshold_num/threshold_den`` — the per-doc-top-k variant of
    :func:`jaccard_similarity_join` (VERDICT r13: on templated corpora
    the all-pairs answer is itself ~quadratic; a top-k contract keeps
    the OUTPUT linear in n while sharing the prefix + length-filter
    candidate machinery, so the scan-side shape is unchanged).

    Ranking is per-doc ``row_number`` over (jaccard DESC, neighbor id
    ASC): jaccard is the single IEEE division n_common/n_union of two
    exact integers — bit-identical across engines — and the id
    tie-break makes the order total, so the top-k rows are
    deterministic and oracle-hashable.

    IDENTICAL-SET GROUPING (the sub-quadratic core): templated corpora
    concentrate the high-τ pair mass in groups of docs with IDENTICAL
    token sets (at sf1.0/τ=0.97 ALL 118k qualifying pairs were
    identical-set pairs, max group 451 — Σg² dominates any naive
    verify).  Docs are grouped by their sorted token array (exact key,
    no hash collisions); the prefix+length-filtered verify runs on ONE
    representative per group (J(x,y)=1 ⟺ equal sets, so cross-group
    jaccard is a function of the groups alone); candidates per doc are
    then only (a) the k+1 smallest-id members of its own group (J=1
    beats every cross-group J<1, ties by id) and (b) the k smallest-id
    members of each verified similar group.  Every true top-k row is
    among these by the ranking order, so the result is EXACTLY the
    brute-force answer while pairwise work drops from Σg² to m-rep
    pairs + O(k·n) expansion.

    Returns (doc_id, rk, nbr, n_common, n_union), rk = 1..k, ordered
    within each doc by similarity.
    """
    from pyspark.sql.window import Window

    mem, reps = _identical_set_members(
        _jaccard_tokenize(docs, text_col=text_col, id_col=id_col)
    )
    # reps are distinct sets by construction → distinctness bound on
    cross = _jaccard_pairs_from_toks(
        reps,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        max_token_bucket=max_token_bucket,
        distinct_sets=True,
    )
    members = mem.select("doc_id", "gid", "irk", "n_tok")
    # (a) in-group: J = 1 exactly; k+1 heads cover "k smallest ids
    # excluding self" for every member
    heads_in = members.filter(F.col("irk") <= k + 1).select(
        "gid", F.col("doc_id").alias("nbr")
    )
    cand_in = (
        members.select("doc_id", "gid", "n_tok")
        .join(heads_in, "gid")
        .filter(F.col("doc_id") != F.col("nbr"))
        .select(
            "doc_id",
            "nbr",
            F.col("n_tok").alias("n_common"),
            F.col("n_tok").alias("n_union"),
        )
    )
    # (b) cross-group: group-level verified pairs expanded to the k
    # smallest-id members on each side (only those can rank)
    sym_g = cross.select(
        F.col("doc_a").alias("gid"),
        F.col("doc_b").alias("ogid"),
        "n_common",
        "n_union",
    ).unionByName(
        cross.select(
            F.col("doc_b").alias("gid"),
            F.col("doc_a").alias("ogid"),
            "n_common",
            "n_union",
        )
    )
    heads_k = members.filter(F.col("irk") <= k).select(
        F.col("gid").alias("ogid"), F.col("doc_id").alias("nbr")
    )
    cand_cross = (
        members.select("doc_id", "gid")
        .join(sym_g, "gid")
        .join(heads_k, "ogid")
        .select("doc_id", "nbr", "n_common", "n_union")
    )
    sym = cand_in.unionByName(cand_cross)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("n_common").cast("double") / F.col("n_union")),
        F.asc("nbr"),
    )
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "rk", "nbr", "n_common", "n_union")
    )
