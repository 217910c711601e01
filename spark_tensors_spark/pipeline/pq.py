"""Product quantization (PQ) for embedding compression + ADC search
(north-star M4): split each d-dim vector into ``m`` subvectors, k-means
each subspace to ``n_codes`` centroids, store each vector as ``m``
byte-sized codes (d×4 bytes → m bytes: 32× compression at d=64, m=8).

Distributed shape (Jégou et al., "Product Quantization for Nearest
Neighbor Search" — the IVF-ADC paper; codebook training mirrors
:func:`spark_tensors_spark.pipeline.similarity.ivf_index`):

- **Train**: seeds are the ``n_codes`` hash-smallest vectors sliced per
  subspace (deterministic, no RNG state on executors).  Each Lloyd
  iteration = one Arrow pass assigning all m subspaces at once
  (per-partition argmin against the (m, n_codes, dsub) codebook tensor)
  + ONE (subspace, code, dim) grouped-sum shuffle for the update — the
  codebook is O(m · n_codes · dsub) = O(d · n_codes), driver-scale at
  any corpus size.
- **Encode**: one Arrow pass → (id, array<codes>).  This is the 100 TB
  artifact: the codes table is ~m bytes/vector.
- **ADC top-k**: each query precomputes its (m, n_codes) distance table;
  scanning the codes table is a numpy gather+sum per partition with
  per-partition top-k truncation — same never-shuffle-the-score-matrix
  shape as similarity.cosine_topk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.pipeline.similarity import (
    _collect_queries_guarded,
)


def _subspace_views(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) → (m, n, dsub) without copying when d % m == 0."""
    n, d = mat.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return mat.reshape(n, m, dsub).transpose(1, 0, 2)


def _assign_codes(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) × (m, n_codes, dsub) → (n, m) argmin-L2 codes."""
    subs = _subspace_views(mat, codebooks.shape[0])  # (m, n, dsub)
    codes = np.empty((mat.shape[0], codebooks.shape[0]), dtype=np.int64)
    for j in range(codebooks.shape[0]):
        x, c = subs[j], codebooks[j]
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_train(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks; returns ndarray (m, n_codes, dsub)."""
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_codes)
        .collect()
    )
    seed_m = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seeds]
    )
    dim = seed_m.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    codebooks = np.ascontiguousarray(_subspace_views(seed_m, m))

    pts = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    for _ in range(lloyd_iters):
        cb = codebooks  # bind current iteration's codebooks

        def assign_explode(it, cb=cb):
            # emit (subspace, code, dim_in_sub, partial sum, count) —
            # pre-aggregated per Arrow batch so the shuffle carries
            # O(m · n_codes · dsub) rows per batch, not per vector
            for pdf in it:
                if pdf.empty:
                    continue
                mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                codes = _assign_codes(mat, cb)
                subs = _subspace_views(mat, cb.shape[0])
                rows = []
                for j in range(cb.shape[0]):
                    for code in np.unique(codes[:, j]):
                        sel = subs[j][codes[:, j] == code]
                        s = sel.sum(axis=0)
                        for i in range(cb.shape[2]):
                            rows.append(
                                (j, int(code), i, float(s[i]), len(sel))
                            )
                yield pd.DataFrame(
                    rows,
                    columns=["subspace", "code", "i", "s", "n"],
                )

        agg = (
            pts.mapInPandas(
                assign_explode,
                "subspace long, code long, i long, s double, n long",
            )
            .groupBy("subspace", "code", "i")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_cb = codebooks.copy()
        sums = np.zeros_like(codebooks)
        counts = np.zeros((m, n_codes), dtype=np.int64)
        for r in agg:
            sums[r["subspace"], r["code"], r["i"]] = r["s"]
            counts[r["subspace"], r["code"]] = r["n"]
        nonempty = counts > 0
        for j in range(m):
            for c in range(n_codes):
                if nonempty[j, c]:
                    new_cb[j, c] = sums[j, c] / counts[j, c]
        codebooks = new_cb
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame(id, codes array<long>) — the compressed corpus."""

    def encode(it):
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = _assign_codes(mat, codebooks)
            yield pd.DataFrame(
                {"_id": pdf["_id"], "codes": list(codes)}
            )

    return (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(encode, "_id long, codes array<long>")
        .select(F.col("_id").alias(id_col), "codes")
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): exact query
    subvectors against quantized corpus codes.  Per partition: one
    numpy gather+sum over the codes matrix, per-partition top-k
    truncation, global rank finalization — identical scale shape to the
    exact path, but the scan reads m codes/vector instead of d floats."""
    qrows = _collect_queries_guarded(queries, query_id_col, query_vec_col)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    m, n_codes, dsub = codebooks.shape
    # distance tables: (nq, m, n_codes) — ‖q_sub − codeword‖² per cell
    qs = _subspace_views(qm, m)  # (m, nq, dsub)
    tables = np.stack(
        [
            (qs[j][:, None, :] - codebooks[j][None, :, :]) ** 2
            for j in range(m)
        ],
        axis=1,
    ).sum(axis=3)  # (nq, m, n_codes)

    codes_df = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)

    def partition_topk(it):
        for pdf in it:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy())  # (nc, m)
            out_q, out_n, out_d = [], [], []
            for qi in range(len(q_ids)):
                # gather: Σ_j table[qi, j, codes[:, j]]
                d2 = tables[qi][np.arange(m)[:, None], codes.T].sum(axis=0)
                d2 = np.round(np.sqrt(np.maximum(d2, 0.0)), 6)
                mask = c_ids != q_ids[qi]
                ids_m, row_m = c_ids[mask], d2[mask]
                order = np.lexsort((ids_m, row_m))[:k]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(ids_m[order].tolist())
                out_d.extend(row_m[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "nn_id": out_n, "adc_dist": out_d}
            )

    scored = codes_df.mapInPandas(
        partition_topk, "query_id long, nn_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("nn_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. §IV): coarse-quantize the corpus
    into ``n_cells`` inverted lists, PQ-encode the RESIDUAL
    ``v − centroid(cell)``, and answer queries by scanning only the
    ``nprobe`` nearest lists with asymmetric distances computed from
    the query's per-cell residual.  The production-scale composition of
    the two machines this module and `similarity.ivf_index` already
    gate separately: the scan touches nprobe/n_cells of the corpus AND
    reads m bytes per vector instead of d floats.

    Scale shape: centroids (n_cells×d) and codebooks (m·n_codes·dsub)
    ride in task closures; the per-cell candidate work is an
    applyInPandas gather+sum keyed by cell — query×corpus never
    shuffles.  Output: (query_id, nn_id, adc_dist, rk≤k).
    """
    from spark_tensors_spark.pipeline.similarity import ivf_index

    # ivf_index is used for centroid TRAINING only — its assignment
    # frame is lazy and never materialized here.  Assignment is a pure
    # function of (vector, centroids), so assigning and residualizing
    # fuse into ONE corpus pass; the join-back an assignment table
    # would need (a full-data shuffle, recomputed per consumer when
    # unpersisted — measured 2× wall on this query) never happens.
    # Fixed ``centroids``/``codebooks`` skip both training loops (the
    # integer pseudo-geometry makes the whole IVFADC pipeline
    # oracle-exact).
    if centroids is None:
        _, centroids = ivf_index(
            emb,
            n_cells=n_cells,
            seed=seed,
            lloyd_iters=lloyd_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
    c_sq0 = (centroids * centroids).sum(axis=1)

    def assign_residualize(it):
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ centroids.T)
                + c_sq0[None, :]
            )
            cell = d2.argmin(axis=1)
            res = mat - centroids[cell]
            yield pd.DataFrame(
                {"_id": pdf["_id"], "cell": cell, "res": list(res)}
            )

    residuals = (
        emb.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .mapInPandas(
            assign_residualize, "_id long, cell long, res array<double>"
        )
        .persist()
    )
    if codebooks is None:
        codebooks = pq_train(
            residuals,
            m=m,
            n_codes=n_codes,
            lloyd_iters=lloyd_iters,
            seed=seed,
            id_col="_id",
            vec_col="res",
        )

    def encode_keep_cell(it):
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf["res"].to_numpy()).astype(np.float64)
            codes = _assign_codes(mat, codebooks)
            yield pd.DataFrame(
                {
                    "vid": pdf["_id"],
                    "cell": pdf["cell"],
                    "codes": list(codes),
                }
            )

    corpus = residuals.mapInPandas(
        encode_keep_cell, "vid long, cell long, codes array<long>"
    )

    # query → nprobe nearest cells by L2 to the centroid (the IVF
    # assignment metric), query vector rides along for in-cell ADC
    c_sq = (centroids * centroids).sum(axis=1)

    def probe(it):
        for pdf in it:
            if pdf.empty:
                continue
            qm = np.stack(pdf["_qv"].to_numpy()).astype(np.float64)
            d2 = (
                (qm * qm).sum(axis=1)[:, None]
                - 2.0 * (qm @ centroids.T)
                + c_sq[None, :]
            )
            # stable: equal centroid distances probe the lower cell id
            # first on any engine
            top = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["_qid"].to_numpy(), nprobe),
                    "cell": top.reshape(-1),
                    "qv": [
                        v
                        for v in pdf["_qv"].to_numpy()
                        for _ in range(nprobe)
                    ],
                }
            )

    q_probe = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(query_vec_col).alias("_qv")
    ).mapInPandas(probe, "qid long, cell long, qv array<double>")

    both = corpus.select(
        "cell",
        F.lit(False).alias("is_q"),
        F.col("vid"),
        F.col("codes"),
        F.lit(None).cast("array<double>").alias("qv"),
    ).unionByName(
        q_probe.select(
            "cell",
            F.lit(True).alias("is_q"),
            F.col("qid").alias("vid"),
            F.lit(None).cast("array<long>").alias("codes"),
            "qv",
        )
    )

    n_sub = m

    def cell_adc(pdf: pd.DataFrame) -> pd.DataFrame:
        qm = pdf[pdf["is_q"]]
        cm = pdf[~pdf["is_q"]]
        if qm.empty or cm.empty:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "nn_id": pd.Series(dtype="int64"),
                    "adc_dist": pd.Series(dtype="float64"),
                }
            )
        cell = int(pdf["cell"].iloc[0])
        codes = np.stack(cm["codes"].to_numpy())  # (nc, m)
        c_ids = cm["vid"].to_numpy()
        qv = np.stack(qm["qv"].to_numpy()).astype(np.float64)
        qres = qv - centroids[cell]
        qs = _subspace_views(qres, n_sub)  # (m, nq, dsub)
        tables = np.stack(
            [
                ((qs[j][:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                for j in range(n_sub)
            ],
            axis=1,
        )  # (nq, m, n_codes)
        q_ids = qm["vid"].to_numpy()
        out_q, out_n, out_d = [], [], []
        for qi in range(len(q_ids)):
            d2 = tables[qi][np.arange(n_sub)[:, None], codes.T].sum(axis=0)
            d2 = np.round(np.sqrt(np.maximum(d2, 0.0)), 6)
            mask = c_ids != q_ids[qi]
            ids_m, row_m = c_ids[mask], d2[mask]
            order = np.lexsort((ids_m, row_m))[:k]
            out_q.extend([q_ids[qi]] * len(order))
            out_n.extend(ids_m[order].tolist())
            out_d.extend(row_m[order].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "nn_id": out_n, "adc_dist": out_d}
        )

    scored = (
        both.groupBy("cell")
        .applyInPandas(cell_adc, "query_id long, nn_id long, adc_dist double")
        .dropDuplicates(["query_id", "nn_id"])
    )
    residuals.unpersist()
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("nn_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def quantization_error(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error over the corpus (one Arrow
    pass emitting per-batch partials, one tiny agg)."""

    def err(it):
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = _assign_codes(mat, codebooks)
            m = codebooks.shape[0]
            recon = np.concatenate(
                [codebooks[j][codes[:, j]] for j in range(m)], axis=1
            )
            se = ((mat - recon) ** 2).sum()
            yield pd.DataFrame({"se": [se], "n": [len(mat)]})

    tot = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(err, "se double, n long")
        .agg(F.sum("se").alias("se"), F.sum("n").alias("n"))
        .first()
    )
    return float(tot["se"] / max(tot["n"], 1))
