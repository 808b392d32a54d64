"""As-of (point-in-time) join — a training-data-pipeline operator Spark
has no native form of (SURVEY.md §2.4 notes the reference has only FK
equi-joins; this is a beyond-reference addition, same family as the
dedup/similarity operators).

Semantics: for every left row, attach the columns of the single right
row with the same key whose timestamp is the latest at-or-before the
left row's timestamp (``direction='backward'``, inclusive), with a
deterministic tie-break so results are reproducible and oracle-checkable.

Spark-first plan: instead of a range join (which Catalyst would execute
as an exploding inner join + filter) the two sides are tagged and
UNIONED, then a single window pass per key carries the last-seen right
values forward (``last(..., ignorenulls=True)`` over rows between
unbounded preceding and current). Cost: ONE shuffle on the key — the
same partitioning a groupBy would need — and O(n log n) per-partition
sort; no pair blowup, no broadcast requirement on either side. This is
the standard scale shape for point-in-time feature joins (e.g. "most
recent click before each purchase" over 100 TB of events): both sides
co-partition by key, and skewed keys can reuse the salting helpers in
``operators.skew``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    pick: dict[str, str],
    tiebreak: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    ``on``: key columns, same names on both sides (rename first).
    ``left_time`` / ``right_time``: timestamp columns (µs precision).
    ``pick``: {right_col: output_alias} — right columns to attach.
    ``tiebreak``: right column (castable to long); among right rows with
    identical (key, time), the one with the LARGEST tiebreak wins.
    ``tolerance_us``: maximum staleness in microseconds — a match older
    than this yields NULLs (pandas merge_asof's ``tolerance``).

    Left rows with no qualifying right row keep NULLs in the picked
    columns (left-outer semantics).
    """
    return _asof_join(
        left, right, on, left_time, right_time, pick, tiebreak,
        direction="backward", tolerance_us=tolerance_us,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    pick: dict[str, str],
    tiebreak: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Forward inclusive as-of join: for every left row, the EARLIEST
    right row with the same key at-or-after the left timestamp (the
    "next event after" direction — e.g. first purchase after each
    impression). Same one-shuffle window plan as backward, traversed
    in descending time; among (key, time) ties the largest tiebreak
    wins, mirroring backward."""
    return _asof_join(
        left, right, on, left_time, right_time, pick, tiebreak,
        direction="forward", tolerance_us=tolerance_us,
    )


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    pick: dict[str, str],
    tiebreak: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    lcols = [c for c in left.columns]
    # NULL timestamps would otherwise corrupt the window traversal: a
    # null-time RIGHT row can never legitimately match (the ≤/≥
    # comparison is undefined), so drop it. Null-time LEFT rows keep
    # left-outer semantics INSIDE the same window pass: the traversal
    # order is explicitly nulls-FIRST, so they sort before every right
    # row in their partition and the carried pick is still null when
    # they are emitted — no second scan of the left side, no tail-end
    # union (a prior version split them into a separate branch, which
    # read the left fact table twice).
    right = right.filter(F.col(right_time).isNotNull())
    # equi-join NULL semantics: Window.partitionBy groups NULL keys
    # into ONE partition, so a NULL-key right row would attach its
    # values to NULL-key LEFT rows — a match no SQL / DuckDB ASOF /
    # merge_asof equi-join ever makes (NULL never equals NULL), and a
    # silent divergence from the documented oracle-checkable contract
    # (round-10 review). Drop NULL-key right rows up front; NULL-key
    # left rows still pass through, with NULL picks.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    # ALL picked columns travel as ONE struct so they always come from
    # the same right row: carrying each column independently through
    # last(ignorenulls=True) would backfill a NULL field from an OLDER
    # right row, silently mixing columns across rows. The struct itself
    # is non-null on every right row (its FIELDS may be null), and null
    # on left rows, so ignorenulls skips exactly the left rows.
    pick_struct = F.struct(
        *[F.col(src).alias(dst) for src, dst in pick.items()],
        # the matched right row's own time rides along for tolerance
        F.unix_micros(F.col(right_time)).alias("__rt"),
    )
    pick_type = right.select(pick_struct.alias("__pick")).schema["__pick"].dataType
    l_tagged = left.select(
        *lcols,
        F.unix_micros(F.col(left_time)).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(pick_type).alias("__pick"),
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
        *[F.col(k) for k in on],
        F.unix_micros(F.col(right_time)).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(tiebreak).cast("long").alias("__tb"),
        pick_struct.alias("__pick"),
    )
    # ordering puts right rows BEFORE left rows at equal time (inclusive
    # ≤ / ≥), and the max-tiebreak right row last among its time-ties so
    # the carried value is deterministic. Forward direction = identical
    # traversal over descending time. Nulls-first in BOTH directions so
    # null-time left rows are emitted before any right value is carried.
    t_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            t_order,
            F.col("__is_right").desc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__pick"), ignorenulls=True).over(w).alias("__pick")
    matched = l_tagged.unionByName(r_tagged).select(
        *lcols, "__t", "__is_right", carried
    ).filter(F.col("__is_right") == 0)
    if tolerance_us is not None:
        dist = (
            F.col("__t") - F.col("__pick.__rt")
            if direction == "backward"
            else F.col("__pick.__rt") - F.col("__t")
        )
        matched = matched.withColumn(
            "__pick", F.when(dist <= F.lit(tolerance_us), F.col("__pick"))
        )
    return matched.select(
        *lcols,
        *[F.col("__pick")[dst].alias(dst) for dst in pick.values()],
    )
