"""Edit-distance join (record linkage): match rows of two tables whose
string keys are within Levenshtein distance ``k`` — WITHOUT the
all-pairs cross join.

The classic entity-resolution primitive (link dirty names / titles /
addresses against a reference table). Spark has the verifier built in
(``levenshtein``, JVM codegen) but no blocked join, so naive use is an
O(n·m) CartesianProduct. This module adds the standard
segment-pigeonhole blocking (PassJoin, Li et al., VLDB'11 — public
algorithm): partition each probe string into ``k+1`` contiguous
segments; at most ``k`` edits can touch at most ``k`` segments, so some
segment survives UNTOUCHED and appears EXACTLY in any within-distance
match, at a position shifted by at most ``k``. Blocking therefore emits

- probe side: its ``k+1`` segments, keyed (segment_index, seg_len, seg);
- indexed side: every substring that could BE such a surviving segment —
  for each hypothetical probe length ``Ls`` within ±k of its own length,
  the segment geometry of ``Ls``, at start positions shifted ±k —
  ≤ (2k+1)·(k+1)·(2k+1) keys per row, a constant for fixed k.

Candidates = equi-join on the key (a SHUFFLE join on bounded-fanout
keys, not a cartesian), then the exact ``levenshtein(s, t, k)`` verify
(threshold form: early-exits at k+1, O(k·len) not O(len²)) plus the
length filter. Pigeonhole guarantees the candidate set is a SUPERSET of
the true pairs, so the join is exact — the oracle twin is a brute-force
levenshtein join (`part_fuzzy_match` gate pins it cross-engine).

Scale: per-row key fanout is constant (k=1 → 6/side, k=2 → 45 on the
indexed side); block hotness follows key skew of the DATA (shared
prefixes land in one block), which is visible/saltable like any join
skew, and the verify is linear in candidates. At 100 TB this is the
difference between a shuffle join plus a cheap verify and an
unrunnable n·m cartesian.

Short strings (len ≤ k) have degenerate segment geometry (empty
segments would key-match everything); they route through a tiny
length-keyed block instead — every string within distance k of a ≤k-char
string has length ≤ 2k, so the block is bounded by the alphabet, not
the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_geometry(k: int):
    """Column factory: for a 1-based balanced (k+1)-partition of a
    string of length ``L`` (a Column), segment ``i`` has
    ``len_i = L div (k+1) + (i < L mod (k+1))`` and 1-based start
    ``pos_i = i·(L div (k+1)) + min(i, L mod (k+1)) + 1``."""

    def geom(L, i):
        base = F.floor(L / (k + 1)).cast("int")
        rem = (L % (k + 1)).cast("int")
        seg_len = base + (i < rem).cast("int")
        pos = i * base + F.least(i, rem) + F.lit(1)
        return pos.cast("int"), seg_len

    return geom


def _probe_keys(df: DataFrame, col: str, id_col: str, k: int) -> DataFrame:
    """(id, L, i, len, seg) — the k+1 segments of each probe string."""
    geom = _seg_geometry(k)
    L = F.length(F.col(col))
    segs = F.transform(
        F.sequence(F.lit(0), F.lit(k)),
        lambda i: F.struct(
            i.cast("int").alias("i"),
            geom(L, i)[1].alias("len"),
            F.col(col).substr(geom(L, i)[0], geom(L, i)[1]).alias("seg"),
        ),
    )
    return (
        df.filter(F.col(col).isNotNull() & (L > k))
        .select(
            F.col(id_col).alias("_pid"),
            L.cast("int").alias("_plen"),
            F.explode(segs).alias("s"),
        )
        .select(
            "_pid",
            "_plen",
            F.col("s.i").alias("i"),
            F.col("s.len").alias("len"),
            F.col("s.seg").alias("seg"),
        )
    )


def _index_keys(df: DataFrame, col: str, id_col: str, k: int) -> DataFrame:
    """(id, Lt, i, len, seg) — every substring of each indexed string
    that could be a surviving probe segment: probe length hypotheses
    Ls ∈ [Lt-k, Lt+k] (capped below at k+1 — shorter probes take the
    short-string path), segment index i ∈ [0, k], start shift
    d ∈ [-k, k], keeping only in-bounds positions; duplicate
    (i, len, pos) triples collapse before the explode."""
    geom = _seg_geometry(k)
    Lt = F.length(F.col(col))
    cands = F.flatten(
        F.transform(
            # probe lengths that could match this string
            F.sequence(
                F.greatest(Lt - k, F.lit(k + 1)).cast("int"),
                (Lt + k).cast("int"),
            ),
            lambda Ls: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k)),
                    lambda i: F.filter(
                        F.transform(
                            F.sequence(F.lit(-k), F.lit(k)),
                            lambda d: F.struct(
                                i.cast("int").alias("i"),
                                geom(Ls, i)[1].alias("len"),
                                (geom(Ls, i)[0] + d).cast("int").alias(
                                    "pos"
                                ),
                            ),
                        ),
                        lambda s: (s["pos"] >= 1)
                        & (s["pos"] + s["len"] - 1 <= Lt)
                        & (s["len"] > 0),
                    ),
                )
            ),
        )
    )
    return (
        # Lt >= 1, NOT Lt > k: a SHORT indexed string (len <= k) can
        # still match a long-enough probe (|Ls-Lt| <= k), and only
        # probes route through the short-string path — dropping short
        # index strings here lost exactly those pairs (caught by the
        # first differential run). Its Ls hypotheses below are already
        # floored at k+1; an EMPTY index string can only match probes
        # of len <= k, which never take this path.
        df.filter(F.col(col).isNotNull() & (Lt >= 1))
        .select(
            F.col(id_col).alias("_iid"),
            Lt.cast("int").alias("_ilen"),
            F.col(col).alias("_istr"),
            F.explode(F.array_distinct(cands)).alias("s"),
        )
        .select(
            "_iid",
            "_ilen",
            F.col("s.i").alias("i"),
            F.col("s.len").alias("len"),
            F.col("_istr").substr(F.col("s.pos"), F.col("s.len")).alias(
                "seg"
            ),
        )
    )


def edit_distance_join(
    probe: DataFrame,
    index: DataFrame,
    probe_col: str,
    index_col: str,
    probe_id: str,
    index_id: str,
    k: int = 1,
) -> DataFrame:
    """All (probe_id, index_id, distance) pairs with
    ``levenshtein(probe_col, index_col) <= k``. Exact — pigeonhole
    blocking generates a candidate superset; the threshold verifier
    prunes it. NULL strings match nothing. ``k`` must be small (1-3):
    key fanout grows O(k³) on the indexed side and the pigeonhole
    weakens as k approaches string length."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if k == 0:
        # distance 0 is a plain equi-join
        return (
            probe.select(
                F.col(probe_id).alias("probe_id"),
                F.col(probe_col).alias("_ps"),
            )
            .join(
                index.select(
                    F.col(index_id).alias("index_id"),
                    F.col(index_col).alias("_is"),
                ),
                F.col("_ps") == F.col("_is"),
            )
            .select("probe_id", "index_id", F.lit(0).alias("distance"))
        )
    if k > 3:
        raise ValueError(
            f"k={k}: segment blocking fans out O(k^3) keys and loses "
            "selectivity for large k — use embedding/LSH similarity "
            "(operators/similarity.py) for loose matching"
        )
    p_str = probe.select(
        F.col(probe_id).alias("probe_id"), F.col(probe_col).alias("_ps")
    )
    i_str = index.select(
        F.col(index_id).alias("index_id"), F.col(index_col).alias("_is")
    )
    # main path: candidate ids from the segment equi-join
    cand = (
        _probe_keys(probe, probe_col, probe_id, k)
        .join(
            _index_keys(index, index_col, index_id, k),
            on=["i", "len", "seg"],
        )
        # length filter folds into the candidate set before the
        # pair-level distinct
        .filter(F.abs(F.col("_plen") - F.col("_ilen")) <= k)
        .select(
            F.col("_pid").alias("probe_id"),
            F.col("_iid").alias("index_id"),
        )
        .distinct()
    )
    # short probes (len <= k): geometry degenerates; any match has
    # len <= 2k, so the block is alphabet-bounded on BOTH sides
    short = (
        probe.filter(
            F.col(probe_col).isNotNull()
            & (F.length(probe_col) <= k)
        )
        .select(F.col(probe_id).alias("probe_id"))
        .crossJoin(
            F.broadcast(
                index.filter(
                    F.col(index_col).isNotNull()
                    & (F.length(index_col) <= 2 * k)
                ).select(F.col(index_id).alias("index_id"))
            )
        )
    )
    pairs = cand.unionByName(short).distinct()
    return (
        pairs.join(p_str, "probe_id")
        .join(i_str, "index_id")
        .withColumn(
            "distance",
            F.expr(f"levenshtein(_ps, _is, {k})"),
        )
        .filter((F.col("distance") >= 0) & (F.col("distance") <= k))
        .select("probe_id", "index_id", "distance")
    )


def best_match(
    probe: DataFrame,
    index: DataFrame,
    probe_col: str,
    index_col: str,
    probe_id: str,
    index_id: str,
    k: int = 1,
) -> DataFrame:
    """ONE match per probe row — the closest index row within distance
    ``k`` (ties break on the smallest index id, deterministically);
    probes with no match within ``k`` are absent. The golden-record
    lookup shape on top of :func:`edit_distance_join`: same blocked
    join, then a per-probe top-1 window (shuffles on probe_id — no
    driver involvement)."""
    from pyspark.sql import Window

    pairs = edit_distance_join(
        probe, index, probe_col, index_col, probe_id, index_id, k=k
    )
    w = Window.partitionBy("probe_id").orderBy("distance", "index_id")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
