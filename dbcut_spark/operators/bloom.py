"""Bloom-filter semi-join pre-filter for the closure frontier.

Problem shape: ``child ⋉ frontier_keys`` where the frontier is too
large to broadcast (``backref_limit: no`` closures — a 100-row root can
fan into millions of frontier keys). Spark then picks a shuffle semi
join, which moves EVERY child row (the 100 TB side) to the shuffle.

Fix, entirely JVM-side Column algebra (no UDF, no driver collect):

1. build a Bloom bitmap from the keys as a tiny DataFrame of
   ``(word_idx, bits)`` longs — k hash positions per key via seeded
   ``xxhash64 % m``, OR-folded per 64-bit word with ``bit_or``; the
   bitmap is ≤ m/64 rows regardless of key count;
2. pre-filter the child with k BROADCAST inner joins on
   ``word_idx_i`` + a bit test — each is a map-side hash-lookup, so the
   child is scanned once and never shuffled;
3. the caller runs the EXACT semi join on the survivors only — Bloom
   false positives (~1% at 10 bits/key) are removed there, and the
   shuffle now carries survivors instead of the whole table.

False negatives are impossible by construction (every true key set all
its bits), so ``bloom_semi_join`` is result-identical to a plain left
semi join — pinned by a differential test.

This mirrors what Spark's own runtime-bloom-filter injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does for selective
shuffle joins, but deterministically and for the semi-join shape the
closure executor emits. Reference parity: the reference never meets
this problem (its per-batch ``IN (...)`` lists cap at the DB's
parameter limit); this is the 100 TB generalization of the same
frontier-restriction step (/root/reference/dbcut/query.py:352-445).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 4  # hash functions
BITS_PER_KEY = 10  # m/n ≈ 10, k=4 → ~1.2% false-positive rate
MAX_BITS = 1 << 28  # 32 MB bitmap → ≤ 4M broadcast rows, driver-safe


def _positions(cols: list[str], seed: int, m: int):
    """Bloom position for one seeded hash: xxhash64 over the key columns
    plus a seed literal, folded into [0, m)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)), F.lit(m))


def bloom_bitmap(keys: DataFrame, cols: list[str], m: int, k: int = DEFAULT_K) -> DataFrame:
    """(word_idx: long, bits: long) rows — the Bloom filter as data.
    Size is ≤ m/64 rows however many keys went in."""
    pos = F.explode(
        F.array(*[_positions(cols, seed, m) for seed in range(k)])
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # pyspark's shiftleft() helper takes a literal shift only —
            # a column shift needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_size(n_keys: int) -> int:
    """Bitmap bits for n keys: ~10 bits/key, power of two, capped so the
    word table stays comfortably broadcastable. Past the cap the filter
    stays correct — the false-positive rate just rises, and the exact
    semi join after absorbs it."""
    m = 64
    while m < n_keys * BITS_PER_KEY and m < MAX_BITS:
        m <<= 1
    return m


def bloom_prefilter(
    child: DataFrame,
    keys: DataFrame,
    cols: list[str],
    m: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Child rows that pass the Bloom membership test on ``cols``
    (superset of the true semi-join result). k broadcast inner joins on
    the word index + a bit test — map-side only; the child never
    shuffles.

    Type alignment is part of the correctness contract: xxhash64 hashes
    an INT 5 and a BIGINT 5 differently, so a parent/child key-type
    mismatch (INT FK referencing a BIGINT PK, common in reflected
    catalogs) would produce FALSE NEGATIVES — rows the exact semi
    join's coercing equality would keep. The key side is therefore cast
    to the CHILD's column types before hashing (a key that overflows
    the child's narrower type casts to NULL, which can never match the
    child anyway). That cast is only value-faithful when both sides
    are the SAME type or both integral: a STRING/NUMERIC mix coerces
    through DOUBLE in the exact join (child '05' == key 5 matches!)
    but hashes as strings ('05' vs '5' — different words), so for any
    such mismatch the prefilter BAILS to the identity (the exact semi
    join after it does all the work — degrade, never drop; round-10
    review)."""
    import pyspark.sql.types as _T

    _integral = (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
    child_types = dict(zip(child.schema.names, [f.dataType for f in child.schema.fields]))
    key_types = dict(zip(keys.schema.names, [f.dataType for f in keys.schema.fields]))
    for c in cols:
        ct, kt = child_types.get(c), key_types.get(c)
        same = type(ct) is type(kt)
        both_integral = isinstance(ct, _integral) and isinstance(kt, _integral)
        if not (same or both_integral):
            return child  # hash representations can't be aligned safely
    keys = keys.select(
        *[F.col(c).cast(child_types[c]).alias(c) if c in child_types else F.col(c) for c in keys.columns]
    )
    from dbcut_spark.operators.pinning import pin

    # pinned: without the cache each broadcast would re-run the whole
    # keys-distinct + bitmap aggregation, k extra shuffles of a
    # multi-million-row key set on the slow path. Memory bound, stated
    # honestly (round-10 review): the k joins each materialize their
    # OWN broadcast of the bitmap relation — self-join disambiguation
    # gives every probe fresh attribute ids, so ReusedExchange never
    # dedupes them (verified empirically) — so peak broadcast footprint
    # is ~k x the word-table relation, ~4 x 64 MB of (long,long) rows
    # at the MAX_BITS cap plus hash-relation overhead. Executors need
    # that headroom on the capped path; routing only chooses Bloom for
    # frontiers where the alternative (shuffling the ENTIRE child
    # table) dwarfs it, and smaller frontiers size m (and the
    # footprint) proportionally down.
    bitmap = pin(bloom_bitmap(keys, cols, m, k))
    out = child
    for seed in range(k):
        pcol = f"__dbcut_bp{seed}"
        out = out.withColumn(pcol, _positions(cols, seed, m))
        out = (
            out.join(
                F.broadcast(bitmap),
                (F.col(pcol) / 64).cast("long") == F.col("word_idx"),
                "inner",
            )
            .filter(
                F.col("bits").bitwiseAND(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pcol} % 64 AS INT))")
                )
                != 0
            )
            .drop(pcol, "word_idx", "bits")
        )
    return out


def bloom_semi_join(
    child: DataFrame,
    keys: DataFrame,
    on_cols: list[str],
    n_keys: int | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact ``child ⋉ keys`` with a Bloom pre-filter in front: the
    shuffle the semi join needs moves only Bloom survivors. ``n_keys``
    sizes the bitmap (counted from ``keys`` when absent — cheap when
    the frontier frame is pinned, which the closure executor
    guarantees)."""
    from dbcut_spark.operators.pinning import pin

    # pinned: the key set feeds the bitmap aggregation AND the exact
    # semi join (and the count below when n_keys wasn't pre-computed) —
    # one distinct shuffle, three consumers
    keys = pin(keys)
    if n_keys is None:
        n_keys = keys.count()
    if n_keys == 0:
        return child.limit(0)
    m = bloom_size(n_keys)
    pre = bloom_prefilter(child, keys, on_cols, m, k)
    return pre.join(keys, on=on_cols, how="left_semi")
