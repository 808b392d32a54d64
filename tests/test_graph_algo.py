"""Graph analytics operators (operators/graph_algo.py)."""

import pytest

from dbcut_spark.operators.graph_algo import (
    cooccurrence_edges,
    pagerank,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "a long, b long, w long"
    )


def test_triangles_known_graph(spark):
    # K4 on {1,2,3,4} has 4 triangles; node 5-6 pendant edge has none
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6)]
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_edges(spark, k4)).collect()
    }
    # each K4 vertex sits in C(3,2)=3 triangles
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_star_hub_has_none(spark):
    # a pure star: hub 0 to 50 leaves — zero triangles, and the
    # orientation points every edge AT the hub (leaves have degree 1)
    star = [(0, i) for i in range(1, 51)]
    assert triangle_counts(_edges(spark, star)).count() == 0


def test_triangles_wheel(spark):
    # wheel: hub 0 + cycle 1-2-3-4-5-1 → 5 triangles, hub in all 5,
    # each rim node in 2 (its two adjacent cycle edges)
    rim = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    spokes = [(0, i) for i in range(1, 6)]
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_edges(spark, rim + spokes)).collect()
    }
    assert got[0] == 5
    assert all(got[i] == 2 for i in range(1, 6))


def test_cooccurrence_edges_and_guards(spark):
    rows = [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 1), ("g2", 2),
            ("g2", 2)]  # duplicate item in a group counts once
    df = spark.createDataFrame(rows, "g string, i long")
    got = {
        (r.a, r.b): r.w
        for r in cooccurrence_edges(df, "g", "i").collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # min_support drops the singleton edges
    got2 = {
        (r.a, r.b)
        for r in cooccurrence_edges(df, "g", "i", min_support=2).collect()
    }
    assert got2 == {(1, 2)}
    # hub guard: a group wider than max_group_size contributes nothing
    wide = spark.createDataFrame(
        [("big", i) for i in range(10)] + [("ok", 1), ("ok", 2)],
        "g string, i long",
    )
    got3 = {
        (r.a, r.b)
        for r in cooccurrence_edges(
            wide, "g", "i", max_group_size=5
        ).collect()
    }
    assert got3 == {(1, 2)}


def test_pagerank_uniform_cycle(spark):
    # a directed cycle is perfectly uniform: every node keeps 1/N
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1)], "src long, dst long, w long"
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    got = {r.node: r.pr for r in pagerank(edges, verts, n_iter=5).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-9)


def test_pagerank_sink_attracts_mass(spark):
    # 1->3, 2->3: node 3 ends with more rank than its feeders
    edges = spark.createDataFrame(
        [(1, 3, 1), (2, 3, 1)], "src long, dst long, w long"
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    got = {r.node: r.pr for r in pagerank(edges, verts, n_iter=3).collect()}
    assert got[3] > got[1] == got[2]
    # feeders hold exactly the teleport share (no in-edges)
    assert got[1] == pytest.approx(0.15 / 3, abs=1e-9)


def test_pagerank_weights_split_proportionally(spark):
    # 1 -> 2 with w=3, 1 -> 3 with w=1: after one iteration node 2
    # gets 3x node 3's contribution share
    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "src long, dst long, w long"
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    got = {r.node: r.pr for r in pagerank(edges, verts, n_iter=1).collect()}
    base = 0.15 / 3
    c2, c3 = got[2] - base, got[3] - base
    assert c2 == pytest.approx(3 * c3, rel=1e-6)


def test_pagerank_validation(spark):
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    verts = spark.createDataFrame([(1,), (2,)], "node long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edges, verts, n_iter=0)
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="empty vertex set"):
        pagerank(edges, empty)


def test_triangle_plan_has_no_cartesian(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    plan = (
        triangle_counts(edges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangles_broadcast_and_wedge_paths_agree(spark):
    # the adjacency-intersection (broadcast) path and the shuffled
    # wedge fallback must count identically — deterministic pseudo-
    # random graph with shared boilerplate-style cliques and bridges
    import hashlib

    pairs = set()
    for g in range(40):  # overlapping cliques of size 3-6
        size = 3 + g % 4
        base = int(hashlib.md5(f"g{g}".encode()).hexdigest()[:4], 16) % 60
        members = [base + k * (1 + g % 3) for k in range(size)]
        for i in range(size):
            for j in range(i + 1, size):
                a, b = members[i], members[j]
                if a != b:
                    pairs.add((min(a, b), max(a, b)))
    edges = _edges(spark, sorted(pairs))
    fast = {
        r.node: r.n_triangles for r in triangle_counts(edges).collect()
    }
    slow = {
        r.node: r.n_triangles
        for r in triangle_counts(edges, broadcast_max_edges=0).collect()
    }
    assert fast == slow and len(fast) > 0
