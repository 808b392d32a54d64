"""Bin-bucketed interval (range) join — points matched to containing
time windows. Beyond-reference, same family as :mod:`operators.asof`
(the reference has only FK equi-joins, SURVEY.md §2.4).

Catalyst executes a raw ``t BETWEEN start AND end`` theta-join as a
broadcast-nested-loop or cartesian product — O(|points|×|intervals|)
per key group. The scale shape instead quantizes time into fixed bins:

- every interval is exploded to the bins it overlaps
  (``(end-start)/bin + O(1)`` rows — bounded when window length is);
- every point lands in exactly ONE bin;
- an equi-join on ``(key…, bin)`` meets each qualifying pair exactly
  once (the point's bin), so the containment refine-filter needs no
  dedup afterwards;
- both sides shuffle on ``(key, bin)`` — ordinary hash partitioning,
  skew-splittable by AQE.

Pick ``bin_us`` near the typical window length: larger bins inflate
false candidates per bin, smaller bins inflate the interval explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ceiling on the bin fan-out of ONE interval row. A single corrupt
#: but ORDERED interval (end = year-2200 epoch-µs) would otherwise
#: F.sequence into billions of elements — one task OOMs/straggles and
#: the whole job dies, the symmetric hazard to the inverted-interval
#: guard below (round-10 review). 10M bins ≈ a 10M-second window at
#: 1s bins: anything past it is data corruption or a mis-sized bin_us,
#: both worth failing loudly, not silently exploding.
MAX_BINS_PER_ROW = 10_000_000


def _guarded_bins(
    start: str, end: str, bin_us: int, max_bins: int
) -> Column:
    """Explode an interval to its bin ids, with an in-plan raise_error
    when one row's fan-out exceeds ``max_bins`` — zero extra jobs, the
    check rides the projection and names the offending bounds."""
    lo = F.floor(F.col(start) / bin_us)
    hi = F.floor(F.col(end) / bin_us)
    hi_checked = (
        F.when(
            hi - lo + 1 > max_bins,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval explodes to more than {max_bins} "
                        f"bins at bin_us={bin_us} ("
                    ),
                    F.col(start).cast("string"),
                    F.lit(" .. "),
                    F.col(end).cast("string"),
                    F.lit(
                        "): corrupt bounds or a mis-sized bin width — "
                        "fix the data or raise max_bins explicitly"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(hi)
    )
    return F.explode(F.sequence(lo, hi_checked))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_time: str,
    start: str,
    end: str,
    bin_us: int,
    max_bins: int = MAX_BINS_PER_ROW,
) -> DataFrame:
    """Inner join of every point to every interval (same ``on`` keys)
    with ``start <= point_time <= end`` (inclusive). Time columns are
    epoch-µs longs. Output = point columns + interval columns."""
    if bin_us <= 0:
        # a zero/negative bin silently NULLs the bin exprs (non-ANSI
        # division) and explode(NULL) drops every interval — a config
        # typo would read as "no matches" (round-8 review fix)
        raise ValueError(f"bin_us must be positive, got {bin_us}")
    # malformed (end < start) intervals can never contain a point, but
    # F.sequence with start > stop generates a DESCENDING sequence —
    # a single inverted record could explode to billions of bins
    # before the refine filter discards them all. Drop them up front.
    i_binned = intervals.filter(F.col(end) >= F.col(start)).withColumn(
        "__bin", _guarded_bins(start, end, bin_us, max_bins)
    )
    p_binned = points.withColumn("__bin", F.floor(F.col(point_time) / bin_us))
    return (
        p_binned.join(i_binned, on + ["__bin"])
        .filter((F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end)))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_us: int,
    max_bins: int = MAX_BINS_PER_ROW,
) -> DataFrame:
    """Inner join of overlapping interval pairs (same ``on`` keys):
    ``l_start <= r_end AND r_start <= l_end`` (inclusive). Time
    columns are epoch-µs longs. Output = left columns + right columns.

    Exactly-once without a dedup pass: both sides explode to their
    bins, but a candidate pair is kept only in the bin containing
    ``greatest(l_start, r_start)`` — the first bin the two intervals
    share — so a pair overlapping many bins still meets once. Both
    sides shuffle on (key, bin), ordinary hash partitioning."""
    if bin_us <= 0:
        raise ValueError(f"bin_us must be positive, got {bin_us}")
    # same inverted-interval guard as point_in_interval_join: end <
    # start can't overlap anything but would explode descending bins
    l_binned = left.filter(F.col(l_end) >= F.col(l_start)).withColumn(
        "__bin", _guarded_bins(l_start, l_end, bin_us, max_bins)
    )
    r_binned = right.filter(F.col(r_end) >= F.col(r_start)).withColumn(
        "__bin", _guarded_bins(r_start, r_end, bin_us, max_bins)
    )
    first_shared = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bin_us)
    return (
        l_binned.join(r_binned, on + ["__bin"])
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )
