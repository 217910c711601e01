

def test_bfs_depths_hand_graph(spark):
    """Multi-source BFS on a hand graph: depths, the unreached
    sentinel, and seed-set minimum semantics."""
    from spark_tensors_spark.operators.graph import bfs_depths

    # 0->1->2->3, 5->1, isolated pair 8->9; seeds {0, 5}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 1), (8, 9)], "s long, d long"
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    got = {r.node: r.depth
           for r in bfs_depths(edges, seeds, max_depth=6).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 2: 2, 3: 3, 8: -1, 9: -1}
    # max_depth truncation: depth-3 node unreached at max_depth=2
    got2 = {r.node: r.depth
            for r in bfs_depths(edges, seeds, max_depth=2).collect()}
    assert got2[3] == -1 and got2[2] == 2
    # an ISOLATED seed (appears in no edge) still reports depth 0 —
    # r6 ADVICE: the old node universe was built from edges only, so
    # such a seed silently vanished from the output
    seeds3 = spark.createDataFrame([(0,), (42,)], "node long")
    got3 = {r.node: r.depth
            for r in bfs_depths(edges, seeds3, max_depth=3).collect()}
    assert got3[42] == 0 and got3[0] == 0 and got3[1] == 1


def test_sssp_hand_graph(spark):
    """Weighted Bellman-Ford on a hand graph: cheapest path beats
    fewest hops, parallel edges collapse to min weight, bounded rounds
    truncate, isolated seeds report 0, unreached report -1."""
    from spark_tensors_spark.operators.graph import sssp_distances

    # 0->1 (w=10), 0->2 (w=1), 2->1 (w=1): cheapest 0->1 is 2 via node 2
    # parallel edge 0->2 (w=5) must lose to the w=1 copy
    # 8->9 unreachable from the seed
    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 1), (0, 2, 5), (8, 9, 1)],
        "s long, d long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist
           for r in sssp_distances(edges, seeds, max_rounds=6).collect()}
    assert got == {0: 0, 2: 1, 1: 2, 8: -1, 9: -1}
    # with one relax round the 2-hop path hasn't propagated: 0->1 is 10
    got1 = {r.node: r.dist
            for r in sssp_distances(edges, seeds, max_rounds=1).collect()}
    assert got1[1] == 10 and got1[2] == 1
    # isolated seed -> 0
    seeds2 = spark.createDataFrame([(0,), (42,)], "node long")
    got2 = {r.node: r.dist
            for r in sssp_distances(edges, seeds2, max_rounds=3).collect()}
    assert got2[42] == 0


def test_sssp_agrees_with_bfs_on_unit_weights(spark):
    """With all weights 1, SSSP distance == BFS depth on a random DAG."""
    import random

    from spark_tensors_spark.operators.graph import bfs_depths, sssp_distances

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    e2 = spark.createDataFrame(edges, "s long, d long")
    ew = spark.createDataFrame([(s, d, 1) for s, d in edges],
                               "s long, d long, w long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    bfs = {r.node: r.depth for r in bfs_depths(e2, seeds, max_depth=5).collect()}
    ss = {r.node: r.dist
          for r in sssp_distances(ew, seeds, max_rounds=5).collect()}
    assert bfs == ss


def test_hits_hand_case(spark):
    """Star graph: hub center pointing at 3 leaves, plus one leaf→leaf
    edge.  Hand-computed two unnormalized iterations:
    edges: c→x, c→y, c→z, x→y.
    h0=1 all. a1 = indeg: x=1, y=2, z=1, c=0.
    h1: c = a1(x)+a1(y)+a1(z) = 4; x = a1(y) = 2; y=0; z=0.
    a2: x = h1(c) = 4; y = h1(c)+h1(x) = 6; z = h1(c) = 4; c = 0.
    h2: c = 4+6+4 = 14; x = a2(y) = 6; y=0; z=0.
    """
    from spark_tensors_spark.operators.graph import hits_scores

    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("c", "x"), ("c", "y"), ("c", "z"), ("x", "y")],
            columns=["s", "d"],
        )
    )
    got = {
        r.node: (r.authority, r.hub)
        for r in hits_scores(edges, "s", "d", iterations=2).collect()
    }
    assert got == {
        "c": (0, 14),
        "x": (4, 6),
        "y": (6, 0),
        "z": (4, 0),
    }
