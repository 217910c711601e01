"""Dictionary encoding: URI → dense integer id (SURVEY §2 J1–J3, Q14/Q15).

Reference: `RDFDatasetReader.scala:28-33` uses `zipWithUniqueId`, whose ids
depend on partitioning — two runs over the same file can disagree
(SURVEY §1.4).  This engine assigns **deterministic** ids equivalent to
``row_number() over (order by uri) - 1``.

Scale design: a naive global-ORDER-BY window is a single-partition sort —
the one known cliff at 100 TB (SURVEY §7.3).  ``assign_ids`` instead
computes the same ids with bounded parallelism:

1. deterministic ~1% sample of distinct URIs (``crc32(uri) % mod == 0``
   — a pure function of the value, unlike ``repartitionByRange``'s
   reservoir sampling, which draws different boundaries per job and
   would desynchronize the two passes);
2. driver sorts the sample and picks P-1 range boundaries; each row's
   bucket is ``Σ (uri >= boundary_i)`` — a flat codegen-friendly sum;
3. per-bucket counts → cumulative offsets (P scalars on the driver);
4. ``row_number() over (partition by bucket order by uri)`` + offset —
   a *partitioned* window, fully parallel.

Result is bit-identical to the global window at any bucket count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BUCKETS = 32

# Ceiling on the driver-side boundary sample collected by assign_ids.
MAX_BOUNDARY_SAMPLE = 100_000

# Per-bucket id capacity in bucketed mode: id = bucket·2^40 + local
# rank.  2^40 ≈ 1.1e12 values per bucket; with ≤ 2^22 buckets ids stay
# inside a signed 63-bit long.
ID_BUCKET_BITS = 40


def assign_ids(
    uris: DataFrame,
    uri_col: str = "uri",
    num_partitions: int | None = None,
    sample_mod: int = 101,
    mode: str = "range",
) -> DataFrame:
    """Distinct values of ``uri_col`` → DataFrame(uri, id), one unique
    deterministic id per value.

    ``mode="range"`` (default): dense ids 0..N-1 ordered by uri, equal
    to ``row_number() over (order by uri) - 1`` but computed without a
    global single-partition sort (range-bucketed windows over a
    driver-sampled boundary set — see module docstring).

    ``mode="bucketed"``: the SURVEY §7.3 100 TB path — two-level
    hash-bucketed ids ``xxhash(uri) mod P · 2^40 + rank-within-bucket``.
    No driver collect AT ALL (no boundary sample, no count pass): one
    shuffle on the hash bucket, one partitioned window.  Ids are sparse
    and not order-preserving, but bijective and STABLE (a pure function
    of the value set), which is all encode/decode round-trips require.
    """
    if mode == "bucketed":
        return _assign_ids_bucketed(uris, uri_col, num_partitions)
    if mode != "range":
        raise ValueError(f"unknown mode {mode!r}")
    p = num_partitions or DEFAULT_BUCKETS
    # persisted: the distinct set feeds three actions (boundary-sample
    # probe, bucket counts, final id assignment) — without it the
    # upstream union+distinct shuffle runs each time
    distinct = uris.select(F.col(uri_col).alias("uri")).distinct().persist()

    # Boundary sample with a HARD driver bound and no separate count
    # job (r4: the count existed only to pre-size the modulus and cost
    # one full pass per dictionary): probe at the base rate under
    # limit(MAX+1); on overflow escalate the modulus geometrically and
    # re-probe.  Dictionaries under ~mod·MAX ≈ 10M distinct URIs never
    # escalate; 1B URIs escalate twice.  Deterministic: limit() can
    # only truncate DISCARDED overflow probes, and the final
    # (mod, sample) is a pure function of the values.
    mod = sample_mod
    while True:
        rows = (
            distinct.filter(
                F.crc32(F.col("uri").cast("binary")) % mod == 0
            )
            .limit(MAX_BOUNDARY_SAMPLE + 1)
            .collect()
        )
        if len(rows) <= MAX_BOUNDARY_SAMPLE:
            break
        mod *= 16
    sample = sorted(r["uri"] for r in rows)
    boundaries: list[str] = []
    if len(sample) >= p:
        step = len(sample) / p
        boundaries = sorted({sample[int(i * step)] for i in range(1, p)})

    if boundaries:
        bucket = reduce(
            lambda acc, b: acc + (F.col("uri") >= F.lit(b)).cast("int"),
            boundaries,
            F.lit(0),
        )
    else:
        bucket = F.lit(0)  # tiny dictionary: one bucket == global window
    bucketed = distinct.withColumn("_b", bucket)

    counts = bucketed.groupBy("_b").count().orderBy("_b").collect()
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_b"]] = acc
        acc += row["count"]
    offset_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    w = Window.partitionBy("_b").orderBy("uri")
    return bucketed.select(
        "uri",
        (
            F.row_number().over(w)
            + F.element_at(offset_col, F.col("_b"))
            - 1
        ).cast("long").alias("id"),
    )


def _assign_ids_bucketed(
    uris: DataFrame,
    uri_col: str = "uri",
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-level hash-bucketed ids (see :func:`assign_ids`
    ``mode="bucketed"``).  Fully distributed: bucket = pmod(xxhash64
    (uri), P) is a scan-side projection, the rank is a window
    partitioned by bucket — no driver state, no sample, no count.  At
    1000 executors every stage is embarrassingly parallel and the skew
    bound is the largest hash bucket (≈ N/P by uniformity), not the
    largest key."""
    p = num_partitions or DEFAULT_BUCKETS
    if p > (1 << 22):
        raise ValueError(f"too many buckets for 63-bit ids: {p}")
    distinct = uris.select(F.col(uri_col).alias("uri")).distinct()
    w = Window.partitionBy("_b").orderBy("uri")
    return (
        distinct.withColumn(
            "_b", F.pmod(F.xxhash64(F.col("uri")), F.lit(p)).cast("long")
        )
        .select(
            "uri",
            (
                F.col("_b") * F.lit(1 << ID_BUCKET_BITS)
                + F.row_number().over(w)
                - 1
            ).cast("long").alias("id"),
        )
    )


def build_dictionaries(
    triples: DataFrame,
    num_partitions: int | None = None,
    mode: str = "range",
) -> tuple[DataFrame, DataFrame]:
    """(entity_dict, relation_dict) from DataFrame(s, p, o).

    Entities = distinct subjects ∪ objects (`RDFDatasetReader.scala:30-33`);
    relations get their own id space 0..R-1 (the FB15k pickles share one
    number line — we standardize on separate spaces, FIXTURES.md A2).
    """
    entities = triples.select(F.col("s").alias("uri")).union(
        triples.select(F.col("o").alias("uri"))
    )
    relations = triples.select(F.col("p").alias("uri"))
    # each assign_ids runs two sequential driver actions (boundary
    # sample, bucket counts); submitting both builds from separate
    # driver threads lets the scheduler overlap their jobs — Spark job
    # submission is thread-safe, and the builds share no state
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_e = ex.submit(
            assign_ids, entities, num_partitions=num_partitions, mode=mode
        )
        fut_r = ex.submit(
            assign_ids, relations, num_partitions=num_partitions, mode=mode
        )
        return fut_e.result(), fut_r.result()


def encode_triples(
    triples: DataFrame,
    entity_dict: DataFrame,
    relation_dict: DataFrame,
    broadcast_relations: bool = True,
) -> DataFrame:
    """(s,p,o) strings → (s_id, p_id, o_id) via three equi joins —
    the J1–J3 pipeline (`RDFDatasetReader.scala:40-68`, `rdfio.py:60-70`).

    The relation dictionary is broadcast (reference FB15k has 1,345
    relations vs 14,951 entities; real KGs keep this ratio) so only the
    two entity joins shuffle.  AQE handles skewed subjects.
    """
    ent_s = entity_dict.select(
        F.col("uri").alias("_su"), F.col("id").alias("s_id")
    )
    ent_o = entity_dict.select(
        F.col("uri").alias("_ou"), F.col("id").alias("o_id")
    )
    rel = relation_dict.select(
        F.col("uri").alias("_pu"), F.col("id").alias("p_id")
    )
    if broadcast_relations:
        rel = F.broadcast(rel)
    return (
        triples.join(ent_s, triples.s == ent_s._su)
        .join(ent_o, triples.o == ent_o._ou)
        .join(rel, triples.p == rel._pu)
        .select("s_id", "p_id", "o_id")
    )


def decode_triples(
    encoded: DataFrame, entity_dict: DataFrame, relation_dict: DataFrame
) -> DataFrame:
    """Inverse of :func:`encode_triples` — (s_id,p_id,o_id) → (s,p,o)."""
    ent_s = entity_dict.select(
        F.col("id").alias("_sid"), F.col("uri").alias("s")
    )
    ent_o = entity_dict.select(
        F.col("id").alias("_oid"), F.col("uri").alias("o")
    )
    rel = F.broadcast(
        relation_dict.select(F.col("id").alias("_pid"), F.col("uri").alias("p"))
    )
    return (
        encoded.join(ent_s, encoded.s_id == ent_s._sid)
        .join(ent_o, encoded.o_id == ent_o._oid)
        .join(rel, encoded.p_id == rel._pid)
        .select("s", "p", "o")
    )
