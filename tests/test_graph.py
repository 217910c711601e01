

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
