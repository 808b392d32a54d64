"""Distributed graph analytics over DataFrames: co-occurrence graph
construction, degree-ordered triangle counting, and weighted PageRank.

These are the graph passes a curation/analytics pipeline runs on
relational co-occurrence structure (items bought together, documents
sharing shingles, entities sharing attributes) without leaving the
DataFrame planner — no GraphX/RDDs, every step a join/aggregation
Catalyst can reorder, push into, and AQE-replan.

Scale notes, per operator:

- ``cooccurrence_edges``: pairs explode quadratically in GROUP size,
  so the operator hard-caps group width (``max_group_size``, default
  1000 — a group wider than that is a stop-word-like hub whose pairs
  carry no signal and whose n² blow-up stalls the stage) and supports
  a ``min_support`` threshold to drop noise edges before they enter
  any downstream join.
- ``triangle_counts``: the classic degree-orientation trick — orient
  every undirected edge from its lower-(degree, id) endpoint to the
  higher one. Out-degrees are then bounded by O(sqrt(2m)) regardless
  of how skewed the raw degree distribution is, so the wedge
  self-join (the quadratic step) is bounded by m^1.5 total and no
  single hub node produces a straggler task. All-integer math:
  hash-exact cross-engine.
- ``pagerank``: DataFrame power iteration — each round is one
  join (ranks × edges) + one aggregation, the textbook shuffle shape.
  Cross-engine determinism (the DuckDB oracle must hash-match) comes
  from the repo's decimal-bridge convention: each contribution is a
  deterministic scalar double rounded to 12 dp, summed EXACTLY as
  DECIMAL(38,14), and each iteration's rank re-rounds to 9 dp — the
  1e-12 rounding is noise against PageRank's convergence tolerance
  but makes the float sum order-independent. Dangling mass is not
  redistributed (documented variant; both engines implement the same
  recurrence).

Reference parity: the reference has no graph operators; this extends
the engine the same way dedup clustering (operators/dedup.py
connected_components) already does — graph passes expressed
Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    max_group_size: int = 1000,
) -> DataFrame:
    """Undirected co-occurrence edges: items sharing a group value
    become an edge ``(a, b, w)`` with ``a < b`` and ``w`` = number of
    distinct groups containing both. Groups wider than
    ``max_group_size`` are dropped whole (hub guard — see module doc);
    edges below ``min_support`` are dropped after counting."""
    pairs = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
    ).distinct()
    wide = (
        pairs.groupBy("__g")
        .count()
        .filter(F.col("count") <= max_group_size)
        .select("__g")
    )
    kept = pairs.join(wide, "__g")
    # In-array pairing (round 11): the guard above bounds every
    # surviving group at max_group_size, so collecting a group's items
    # into one sorted array is memory-bounded by construction — and the
    # ordered pairs then explode from the array instead of a self-join
    # on __g (which shuffled + sorted the pair table twice). One
    # aggregation exchange replaces the join's exchange + sort; the
    # pair count itself is unchanged (sorted array => a < b for free).
    items = kept.groupBy("__g").agg(
        F.sort_array(F.collect_list("__i")).alias("__items")
    )
    n = F.size("__items")
    pair_arr = F.flatten(
        F.transform(
            F.col("__items"),
            lambda x, i: F.transform(
                F.slice(F.col("__items"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    edges = (
        items.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    if min_support > 1:
        edges = edges.filter(F.col("w") >= min_support)
    return edges


def triangle_counts(
    edges: DataFrame, broadcast_max_edges: int = 12_000_000
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list ``(a, b)`` (weights ignored; duplicate/self edges must
    already be out — :func:`cooccurrence_edges` guarantees both).
    Returns ``(node, n_triangles)`` for nodes in >= 1 triangle.

    Degree orientation bounds the wedge join (module doc): edges
    orient from the endpoint with smaller (degree, id) to the larger,
    wedges pair each source's out-neighbors in orientation order, and
    a wedge closes iff its (b, c) is itself an oriented edge — one
    equi-join against the edge set, no cartesian, no OR-join.

    The wedge set is the quadratic intermediate (m^1.5 rows): when the
    edge list fits a broadcast (< ``broadcast_max_edges`` rows), the
    oriented out-neighbor lists are broadcast instead and each edge
    closes its triangles with one in-expression ``array_intersect`` —
    the m^1.5 rows are never materialized at all (round 11; the
    operator carries m edge rows and emits 2m + T credit rows). Larger
    graphs fall back to the wedge enumeration with a sort-merge closing
    join (the only plan that scales unboundedly); pass 0 to force it.

    Threshold: the m^1.5 wedge cost grows 31x per 10x edges while the
    broadcast path grows ~linearly, so the crossover is far above the
    old 4M default — measured on a 12M-edge co-occurrence graph
    (round 12, 10x scale check): wedge 43.7s vs broadcast 8.0s,
    identical counts. 12M oriented edges broadcast as grouped
    out-neighbor arrays ≈ ~100 MB of longs (~2-300 MB framed, twice:
    src- and dst-keyed) — the guide's "few hundred MB is fine" band;
    per-EXECUTOR memory at cluster scale, so deployments with small
    executors should lower it rather than raise it."""
    from dbcut_spark.operators.pinning import pin

    # the edge list feeds FOUR consumers (two degree scans, the wedge
    # pair, the closing probe): without pinning, Spark re-executes the
    # whole upstream edge construction per consumer — for a
    # co-occurrence graph that means re-running the pairs self-join
    # 4x (measured 21s -> ~5s at sf0.1 on the part graph)
    und = pin(edges.select("a", "b"))
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    j = und.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # oriented edge carries its DESTINATION's (degree, id) so the wedge
    # join can order endpoints by orientation rank without re-joining;
    # pinned: e1, e2, and the closing probe all read it
    ori = pin(
        j.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("ddst"),
        )
    )
    # ori is pinned, so this count is a cache scan, not a recompute
    if broadcast_max_edges and ori.count() <= broadcast_max_edges:
        # Adjacency-intersection path (round 11): when the oriented
        # edge list fits a broadcast, its grouped out-neighbor lists do
        # too (same longs, one array per source). Each oriented edge
        # (u, v) then closes its triangles IN-EXPRESSION —
        # array_intersect(N+(u), N+(v)) — so the m^1.5 wedge set is
        # never materialized as rows: the operator pipeline carries m
        # edge rows and emits 2m + T credit rows (T = triangles), vs
        # the wedge plan's m^1.5-row Generate+probe. Every triangle is
        # found exactly once, at its orientation-minimal edge (the
        # corner ordering x->y, x->z, y->z puts z in N+(x) ∩ N+(y) and
        # in no other edge's intersection); the edge endpoints are
        # credited once per closing corner and each corner once.
        adj = ori.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
        nb_dst = adj.select(
            F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_dst")
        )
        # left join: an orientation sink has no out-edges; slice(nbrs,
        # 1, 0) is a typed-empty array, keeping the node type generic
        e = (
            ori.select("src", "dst")
            .join(F.broadcast(adj), "src")
            .join(F.broadcast(nb_dst), "dst", "left_outer")
        )
        # project the intersection ONCE below the Generate — referencing
        # the raw expression three times inside the explode would rely
        # on codegen subexpression elimination across a Generate input
        e = e.select(
            "src",
            "dst",
            F.array_intersect(
                F.col("nbrs"),
                F.coalesce(F.col("nbrs_dst"), F.slice(F.col("nbrs"), 1, 0)),
            ).alias("common"),
        )
        common = F.col("common")
        ncom = F.size(common)
        credits = (
            e.select(
                F.explode(
                    F.concat(
                        F.transform(
                            common,
                            lambda c: F.struct(
                                c.alias("node"), F.lit(1).alias("cnt")
                            ),
                        ),
                        F.array(
                            F.struct(
                                F.col("src").alias("node"),
                                ncom.alias("cnt"),
                            ),
                            F.struct(
                                F.col("dst").alias("node"),
                                ncom.alias("cnt"),
                            ),
                        ),
                    )
                ).alias("cr")
            )
            .select("cr.node", "cr.cnt")
            .filter(F.col("cnt") > 0)
        )
        return credits.groupBy("node").agg(
            F.sum("cnt").cast("long").alias("n_triangles")
        )
    # Large graphs: the shuffled wedge plan — the only shape that
    # scales unboundedly (pass broadcast_max_edges=0 to force it).
    e1 = ori.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    e2 = ori.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    wedges = e1.join(e2, "src").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = ori.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])
    return (
        tri.select(
            F.explode(
                F.array(F.col("src"), F.col("x"), F.col("y"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank by DataFrame power iteration. ``edges`` has
    columns ``(src, dst, w)`` (w integer-ish weights), ``vertices`` a
    single column ``node`` (the full vertex set — isolated vertices
    keep the teleport mass). Returns ``(node, pr)`` after ``n_iter``
    rounds of::

        pr'(v) = round((1-d)/N + d * S(v), 9)
        S(v)   = exact-decimal sum of round(pr(u) * w(u,v)/W(u), 12)

    Dangling mass is NOT redistributed (documented variant). The
    per-term rounding + DECIMAL(38,14) summation makes the result
    independent of partial-aggregation order, so a SQL oracle running
    the identical recurrence hash-matches (see module doc)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    n = vertices.count()
    if n == 0:
        raise ValueError("pagerank: empty vertex set")
    teleport = round((1.0 - damping) / n, 12)
    # "tw", not "W": Spark resolves case-insensitively, so a total
    # column named W would collide with the edge weight w on the join
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    from dbcut_spark.operators.pinning import pin

    # the ratio w/tw is per-EDGE constant across iterations; pinned so
    # the n_iter-deep final plan evaluates the edge build once, not
    # once per iteration
    ratio_edges = pin(
        edges.join(outw, "src").select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("tw").cast("double")).alias(
                "ratio"
            ),
        )
    )
    ranks = vertices.select(
        F.col("node"), F.lit(round(1.0 / n, 9)).alias("pr")
    )
    for _ in range(n_iter):  # noqa: B007
        contrib = ratio_edges.join(
            ranks.select(F.col("node").alias("src"), "pr"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.round(F.col("pr") * F.col("ratio"), 12)
            .cast("decimal(38,14)")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("s")
        )
        ranks = (
            vertices.join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    vertices_sql: str,
    n: int,
    n_iter: int = 5,
    damping: float = 0.85,
) -> str:
    """The DuckDB twin of :func:`pagerank`, unrolled: one CTE pair
    (contributions, ranks) per iteration running the IDENTICAL
    recurrence — same per-term round(12), same DECIMAL(38,14) exact
    sum, same round(9) per iteration — so the gate hash pins the whole
    numeric contract from one spec. ``n`` must match the vertex count
    the SQL produces (checked by the Spark side at run time)."""
    init = repr(round(1.0 / n, 9))
    teleport = repr(round((1.0 - damping) / n, 12))
    d = repr(damping)
    parts = [
        f"WITH edges AS ({edges_sql})",
        "outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src)",
        "re AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / "
        "CAST(o.tw AS DOUBLE) AS ratio "
        "FROM edges e JOIN outw o ON o.src = e.src)",
        f"v AS ({vertices_sql})",
        f"r0 AS (SELECT node, CAST({init} AS DOUBLE) AS pr FROM v)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"c{k} AS (SELECT re.dst AS node, "
            f"CAST(round(r.pr * re.ratio, 12) AS DECIMAL(38,14)) AS c "
            f"FROM re JOIN r{k - 1} r ON r.node = re.src)"
        )
        parts.append(
            f"r{k} AS (SELECT v.node, "
            f"round(CAST({teleport} AS DOUBLE) + CAST({d} AS DOUBLE) * "
            f"CAST(coalesce(sum(c.c), 0) AS DOUBLE), 9) AS pr "
            f"FROM v LEFT JOIN c{k} c ON c.node = v.node "
            "GROUP BY v.node)"
        )
    return ",\n    ".join(parts) + f"\n    SELECT node, pr FROM r{n_iter}"
