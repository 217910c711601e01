"""Connected components over a candidate-pair edge list — the
transitive-closure dedup decision (a ≈ b, b ≈ c ⇒ one group), which the
single-hop keeper rule of `lsh_duplicate_groups` approximates.

Size-adaptive, like every production CC (GraphFrames does the same):

- **Small graphs** (≤ ``driver_threshold`` edges, default 2M ≈ tens of
  MB): collect the edge list and run union-find with path compression
  on the driver — exact, deterministic, and free of the per-round Spark
  job overhead that dominates when the candidate graph is tiny relative
  to the corpus (the common case: dup pairs ≪ docs).
- **Large graphs**: distributed iterative minimum-label propagation.
  Each node starts labeled with itself; every round each node takes the
  min label among itself and its neighbors, then pointer-jumps
  (comp := comp(comp)), which halves remaining chain length —
  O(log diameter) rounds, so even pathological path graphs converge in
  ~log2(n) joins.  Near-duplicate graphs are unions of near-cliques and
  finish in 2–3 rounds.  Per round: two joins + one aggregate (shuffles
  keyed on node/label id), label frame localCheckpointed so plans stay
  O(1) deep.  Convergence detection rides on Σcomp (monotone
  non-increasing), one cheap agg per round instead of a join+count.

Two distributed methods share that shape:

- ``minlabel`` — min-label propagation + pointer jumping,
  O(log diameter) rounds (the original path; still the gated
  implementation behind doc_lsh_components_dist).
- ``twostar`` — the large-star/small-star alternation of Kiveris et
  al., "Connected Components in MapReduce and Beyond" (SoCC 2014):
  O(log log n) expected rounds, and each round is ONE groupBy-min +
  one join per star operation over an edge set that only SHRINKS
  toward the final star forest — the better 100 TB story for
  pathological diameters (gated behind graph_wcc).

Convergence detection for twostar is provable from two invariants
(both operations emit, per input edge, an edge whose endpoint sum is
≤ the input edge's, and every edge's endpoint sum is ≥ 1 for
non-negative ids): the (count, Σ(child+parent)) signature is
monotonically non-increasing and stays fixed across a round iff the
edge set did not change — one cheap aggregate per round, the same
trick as minlabel's Σcomp.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(pairs: list[tuple]) -> dict:
    """Driver-side union-find with path compression; root of every
    component is its minimum node id (smaller root wins each union)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _cc_partitions(edges: DataFrame, n_edges: int) -> int:
    """~12.5k edges/partition, capped at the cluster default — a tiny
    graph on defaultParallelism partitions pays ~32 near-empty tasks
    per stage per round in pure scheduling overhead; at scale the cap
    keeps full parallelism.  r14: sized down from 50k by in-process
    A/B (min-of-3, graph_wcc 8.66→7.38 s at 12.5k, WORSE again at 4k —
    the per-edge round work is a distinct+join, heavier than bytes
    suggest, the guide §2.5 bytes-misrepresent-compute case)."""
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    return max(2, min(parallelism, n_edges // 12_500 + 1))


def two_star_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 64,
) -> DataFrame:
    """DataFrame(node, comp) via large-star/small-star alternation
    (Kiveris et al., SoCC 2014) — O(log log n) expected rounds on
    non-negative NUMERIC node ids.

    Each round:
      large-star — every node connects its strictly-larger neighbours
      to the minimum of its closed neighbourhood:
      E ← { (v, m(u)) : (u,v) ∈ E_sym, v > u },  m(u) = min(Γ(u) ∪ u)
      small-star — every node re-points its ≤-neighbours (and itself)
      at that minimum:
      E ← { (v, m(u)) : v ∈ N(u) ∪ {u} \\ {m(u)} }, N(u) = smaller nbrs
    Both keep edges oriented child > parent and preserve connectivity
    (the paper's Lemmas 1-2); the fixed point is a star per component
    rooted at its minimum id.  Stops when the (count, Σ(child+parent))
    signature survives a full round unchanged (provably ⇔ the edge set
    is unchanged — see the module docstring) or at ``max_rounds``.
    """
    e0 = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("c"),
            F.least(F.col(src), F.col(dst)).alias("p"),
        )
        .filter(F.col("c") != F.col("p"))
        .distinct()
        .persist()
    )
    n_edges = e0.count()
    n_parts = _cc_partitions(edges, n_edges)
    # lazy checkpoint: the signature aggregate below is the round's one
    # eager action and materializes the checkpoint as a side effect —
    # one job per round instead of two (eager checkpoint + agg), the
    # same KB-sized-rounds arithmetic as the r14 lazy-persist change
    E = e0.repartition(n_parts, "c").localCheckpoint(eager=False)
    # Σ(c+p) as DECIMAL(38,0): at the 1e12-edge scale this module
    # targets, an int64 sum can overflow (silent wrap would void the
    # monotone-signature termination proof; ANSI mode would throw) —
    # 38 digits cover 1e12 edges of 2⁶³-sized ids with room to spare
    _sigsum = F.sum(
        F.col("c").cast("decimal(38,0)") + F.col("p").cast("decimal(38,0)")
    )
    sig = tuple(
        E.agg(F.count(F.lit(1)), _sigsum).first()
    )
    e0.unpersist()  # E's checkpoint (materialized by the agg) owns the data now
    for _ in range(max_rounds):
        sym = E.unionByName(
            E.select(F.col("p").alias("c"), F.col("c").alias("p"))
        )
        mtab = (
            sym.groupBy("c")
            .agg(F.min("p").alias("mn"))
            .select("c", F.least("mn", F.col("c")).alias("m"))
        )
        # both the small-star join and (twice) the m2 aggregate read
        # these frames; without a barrier each reference re-runs the
        # large-star join+distinct — ~3 computations per round.  LAZY
        # persist (not localCheckpoint): the round's single eager
        # action (E's checkpoint below) populates the cache on first
        # use and the other readers hit it — same dedup, but without
        # paying 2 extra eager jobs per round, which dominated the
        # per-round wall at bench scale (each round's data is KB-MB;
        # the job round-trip is the cost).  E's own localCheckpoint
        # still truncates lineage every round.
        large = (
            sym.join(mtab, "c")
            .filter(F.col("p") > F.col("c"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .distinct()
            .persist()
        )
        m2 = large.groupBy("c").agg(F.min("p").alias("m")).persist()
        small = (
            large.join(m2, "c")
            .filter(F.col("p") != F.col("m"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .unionByName(m2.select("c", F.col("m").alias("p")))
            .distinct()
        )
        E = small.localCheckpoint(eager=False)  # materialized by the agg
        new_sig = tuple(
            E.agg(F.count(F.lit(1)), _sigsum).first()
        )
        large.unpersist()
        m2.unpersist()
        if new_sig == sig:
            break
        sig = new_sig
    roots = (
        E.select(F.col("p").alias("node"))
        .distinct()
        .join(E.select(F.col("c").alias("node")), "node", "left_anti")
    )
    return E.select(F.col("c").alias("node"), F.col("p").alias("comp")).unionByName(
        roots.select("node", F.col("node").alias("comp"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 25,
    driver_threshold: int = 2_000_000,
    method: str = "minlabel",
) -> DataFrame:
    """DataFrame(node, component) — component = min node id reachable.

    ``edges`` is an undirected pair list (each pair once is enough).
    Isolated nodes don't appear (no edges → no dedup decision needed).
    Set ``driver_threshold=0`` to force the distributed path;
    ``method`` picks the distributed algorithm (``minlabel`` pointer
    jumping, or the ``twostar`` Kiveris alternation).
    """
    if method not in ("minlabel", "twostar"):
        raise ValueError(f"unknown CC method {method!r}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .persist()
    )
    n_edges = e.count()

    if n_edges <= driver_threshold:
        comp = _union_find_components(
            [(r.u, r.v) for r in e.collect()]
        )
        schema = e.select(
            F.col("u").alias("node"), F.col("u").alias("comp")
        ).schema
        # go through pandas so Arrow turns this into a JVM
        # LocalTableScan — a plain Python list becomes a pickled RDD
        # that spins up Python workers on EVERY downstream action
        # (measured 5-7 s per action vs ~0.1 s for the local relation)
        out = e.sparkSession.createDataFrame(
            pd.DataFrame(sorted(comp.items()), columns=["node", "comp"]),
            schema,
        )
        e.unpersist()
        return out

    if method == "twostar":
        out = two_star_components(e, "u", "v", max_rounds=max_rounds)
        e.unpersist()
        return out

    # symmetrize once; both directions feed every propagation round.
    n_parts = _cc_partitions(edges, n_edges)
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .repartition(n_parts, "u")
        .persist()
    )

    # lazy checkpoint: the Σcomp aggregate below materializes it — one
    # job per round instead of two (see two_star_components)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )
    # per-node comp is monotone non-increasing, so Σcomp strictly
    # decreases until convergence — one agg on the checkpointed frame
    # replaces a join+count changed-row job per round
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    for _ in range(max_rounds):
        # neighbor labels: for each edge (u, v), v hears u's label
        incoming = (
            sym.join(
                labels.select(
                    F.col("node").alias("u"), F.col("comp").alias("nc")
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("nc").alias("min_nbr"))
        )
        # both sides of the pointer-jump self-join read this frame, and
        # without a barrier each side re-runs the neighbor join+min
        # aggregation (the round's big shuffle).  Lazy persist, not an
        # eager localCheckpoint: new_labels' checkpoint below is the
        # round's one eager action and populates the cache on first
        # use — same dedup, one fewer job round-trip per round.
        stepped = labels.join(incoming, "node", "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce("min_nbr", F.col("comp"))
            ).alias("comp"),
        ).persist()
        # pointer-jump: comp := comp(comp). Labels are always node ids,
        # so the self-join resolves; chain lengths halve per round,
        # giving O(log diameter) convergence on path graphs.
        new_labels = (
            stepped.alias("l")
            .join(
                stepped.select(
                    F.col("node").alias("comp"),
                    F.col("comp").alias("jump"),
                ),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("jump", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)  # materialized by the Σcomp agg
        )
        labels = new_labels
        new_sum = labels.agg(F.sum("comp")).first()[0]
        stepped.unpersist()
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    e.unpersist()
    return labels.select("node", "comp")


def duplicate_components(
    candidate_pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Dedup groups from candidate pairs: (doc_id, keep_doc_id) for every
    doc whose transitive group keeper (min id) differs from itself."""
    cc = connected_components(
        candidate_pairs, id_a, id_b, driver_threshold=driver_threshold
    )
    return (
        cc.filter(F.col("node") != F.col("comp"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("keep_doc_id"),
        )
    )
