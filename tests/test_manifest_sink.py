"""Exactly-once streaming appends into manifest tables
(streaming/manifest_sink.py): replayed micro-batches are no-ops keyed
on the per-query txn map, the map survives compaction and races, and
the streaming rollup composition stays exact."""

import pytest
from pyspark.sql import functions as F

from dbcut_spark.sinks import manifest as mf
from dbcut_spark.streaming.manifest_sink import (
    TXN_KEY,
    append_batch_exactly_once,
    stream_manifest_append,
)


def _mrows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_batch_replay_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    b0 = spark.range(0, 10).select(F.col("id").alias("k"))
    b1 = spark.range(10, 20).select(F.col("id").alias("k"))
    v = append_batch_exactly_once(b0, 0, tbl, "q")
    assert v == 1
    assert append_batch_exactly_once(b0, 0, tbl, "q") is None  # replay
    assert mf.read_snapshot(spark, tbl).count() == 10
    assert append_batch_exactly_once(b1, 1, tbl, "q") == 2
    assert mf.read_snapshot(spark, tbl).count() == 20
    # a LOWER batch id than the recorded one is NOT a replay —
    # Structured Streaming only re-delivers the LAST batch, so behind
    # means a reset checkpoint / reused query_id, and silently
    # dropping those batches would lose data: refuse loudly
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        append_batch_exactly_once(b0, 0, tbl, "q")
    # a different query's ids are independent
    assert append_batch_exactly_once(b0, 0, tbl, "q2") == 3
    assert mf.read_snapshot(spark, tbl).count() == 30
    props = mf.snapshot_properties(tbl)
    assert props[TXN_KEY] == {"q": 1, "q2": 0}


def test_txn_map_survives_compaction(spark, tmp_path):
    """compact_snapshot preserves the head's properties, so replay
    detection survives layout maintenance."""
    tbl = str(tmp_path / "tbl")
    for i in range(3):
        append_batch_exactly_once(
            spark.range(i * 10, i * 10 + 10).coalesce(1), i, tbl, "q"
        )
    res = mf.compact_snapshot(spark, tbl, grace_seconds=0)
    assert res["compacted"]
    assert mf.snapshot_properties(tbl)[TXN_KEY] == {"q": 2}
    # the crash-replay of the LAST batch is still a no-op; older ids
    # still refuse loudly (both facts must survive the compaction)
    assert (
        append_batch_exactly_once(spark.range(20, 30), 2, tbl, "q") is None
    )
    with pytest.raises(RuntimeError, match="checkpoint was reset"):
        append_batch_exactly_once(spark.range(10), 0, tbl, "q")
    assert mf.read_snapshot(spark, tbl).count() == 30


def test_txn_resolver_walks_past_mapless_commits(spark, tmp_path):
    """A manual append without the map does not erase replay detection
    for older batches — the resolver walks back to the newest commit
    that carries one."""
    tbl = str(tmp_path / "tbl")
    append_batch_exactly_once(spark.range(10), 0, tbl, "q")
    mf.publish_snapshot(spark.range(5), tbl, mode="append")  # mapless
    assert append_batch_exactly_once(spark.range(10), 0, tbl, "q") is None
    v = append_batch_exactly_once(spark.range(3), 1, tbl, "q")
    assert v == 3
    assert mf.snapshot_properties(tbl)[TXN_KEY] == {"q": 1}


def test_race_recheck_discovers_own_lost_ack(spark, tmp_path, monkeypatch):
    """A writer whose publish succeeded but crashed before the ack
    retries, loses the version CAS to its own committed manifest, and
    the re-resolved txn map turns the retry into a no-op instead of a
    double write. Simulated: a racer lands a commit carrying the same
    (query, batch) entry between our txn check and our publish."""
    tbl = str(tmp_path / "tbl")
    append_batch_exactly_once(spark.range(10), 0, tbl, "q")

    orig = mf.publish_snapshot

    def racing(df, table_path, **kw):
        if kw.get("properties", {}).get(TXN_KEY, {}).get("q") == 1:
            monkeypatch.setattr(mf, "publish_snapshot", orig)
            orig(
                spark.range(100, 110), table_path, mode="append",
                properties={TXN_KEY: {"q": 1}},
            )
        return orig(df, table_path, **kw)

    monkeypatch.setattr(mf, "publish_snapshot", racing)
    assert append_batch_exactly_once(spark.range(10, 20), 1, tbl, "q") is None
    # only the racer's copy of batch 1 landed
    assert mf.read_snapshot(spark, tbl).count() == 20


def test_stream_manifest_append_with_rollup(spark, sf_dir, tmp_path):
    """End-to-end: a 3-file stream appends exactly-once per batch and
    maintains an incremental rollup; a FRESH checkpoint replays the
    same batches and the txn map keeps the table and view unchanged."""
    from dbcut_spark.operators.matview import rollup
    from dbcut_spark.sources.parquet import read_table

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    stage = tmp_path / "stage"
    stage.mkdir()
    # three deterministic slices, one file each
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(stage))
    tbl = str(tmp_path / "tbl")
    view = str(tmp_path / "view")
    keys = ["event_type"]
    measures = {"n": ("count", None), "total": ("sum", "value")}

    def run(checkpoint: str):
        q = stream_manifest_append(
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage)),
            tbl,
            "evq",
            checkpoint,
            rollup={"view_path": view, "keys": keys, "measures": measures},
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ckpt1"))
    got_tbl = _mrows(mf.read_snapshot(spark, tbl))
    assert len(got_tbl) == events.count()
    got_view = _mrows(mf.read_snapshot(spark, view))
    exp_view = _mrows(rollup(events, keys, measures))
    assert got_view == exp_view
    # a RESUMED checkpoint re-delivers nothing new: the query drains
    # to a no-op and state is unchanged
    run(str(tmp_path / "ckpt1"))
    assert _mrows(mf.read_snapshot(spark, tbl)) == got_tbl
    assert _mrows(mf.read_snapshot(spark, view)) == got_view
    # a FRESH checkpoint restarts batch ids at 0 — behind the table's
    # committed txn. The sink cannot tell identical re-delivery from a
    # changed source, so it REFUSES loudly instead of silently
    # dropping batches, and nothing changes on disk
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        q = stream_manifest_append(
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage)),
            tbl,
            "evq",
            str(tmp_path / "ckpt2"),
        )
        q.awaitTermination(180)
        raise RuntimeError(f"stream should have failed: {q.exception()}")
    assert _mrows(mf.read_snapshot(spark, tbl)) == got_tbl
    assert _mrows(mf.read_snapshot(spark, view)) == got_view


def test_read_changes_pull_loop(spark, tmp_path):
    """read_changes returns exactly the rows each append window added;
    since-head is empty with the head's schema."""
    tbl = str(tmp_path / "cdf")
    mk = lambda lo, hi: spark.range(lo, hi).withColumn(  # noqa: E731
        "v", F.col("id") * 2
    )
    v1 = mf.publish_snapshot(mk(0, 3), tbl)
    v2 = mf.publish_snapshot(mk(3, 5), tbl, mode="append")
    v3 = mf.publish_snapshot(mk(5, 9), tbl, mode="append")
    assert _mrows(mf.read_changes(spark, tbl, v1)) == _mrows(mk(3, 9))
    assert _mrows(mf.read_changes(spark, tbl, v2)) == _mrows(mk(5, 9))
    assert _mrows(mf.read_changes(spark, tbl, v1, version=v2)) == _mrows(
        mk(3, 5)
    )
    empty = mf.read_changes(spark, tbl, v3)
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]


def test_read_changes_refuses_non_append_window(spark, tmp_path):
    """An overwrite (or upsert/compaction) in the window cannot be
    expressed as added rows — loud ValueError, never silent wrong."""
    tbl = str(tmp_path / "cdf2")
    v1 = mf.publish_snapshot(spark.range(3), tbl)
    mf.publish_snapshot(spark.range(10), tbl, mode="overwrite")
    mf.publish_snapshot(spark.range(10, 12), tbl, mode="append")
    with pytest.raises(ValueError, match="not .*append"):
        mf.read_changes(spark, tbl, v1)
    # a window AFTER the overwrite is fine again
    assert _mrows(mf.read_changes(spark, tbl, 2)) == _mrows(
        spark.range(10, 12)
    )


def test_read_changes_schema_evolution_window(spark, tmp_path):
    """A widened append in the window reads back with the HEAD schema:
    pre-widening delta files carry NULL for the added column."""
    tbl = str(tmp_path / "cdf3")
    v1 = mf.publish_snapshot(
        spark.createDataFrame([(1,)], "id int"), tbl
    )
    mf.publish_snapshot(
        spark.createDataFrame([(2,)], "id int"), tbl, mode="append"
    )
    mf.publish_snapshot(
        spark.createDataFrame([(3, "x")], "id int, w string"),
        tbl,
        mode="append",
        schema_evolution="add",
    )
    got = _mrows(mf.read_changes(spark, tbl, v1))
    assert got == [(2, None), (3, "x")]


def test_matview_refresh_still_incremental_after_refactor(spark, tmp_path):
    """refresh_rollup's window logic now rides manifest.append_delta;
    modes and numbers must be unchanged."""
    from dbcut_spark.operators.matview import refresh_rollup

    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    mf.publish_snapshot(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double"),
        base,
    )
    measures = {"n": ("count", None), "s": ("sum", "x")}
    r1 = refresh_rollup(spark, base, view, ["k"], measures)
    assert r1["mode"] == "full"
    mf.publish_snapshot(
        spark.createDataFrame([(1, 5.0)], "k int, x double"),
        base,
        mode="append",
    )
    r2 = refresh_rollup(spark, base, view, ["k"], measures)
    assert r2["mode"] == "incremental" and r2["delta_files"] >= 1
    got = {
        r["k"]: (r["n"], float(r["s"]))
        for r in mf.read_snapshot(spark, view).collect()
    }
    assert got == {1: (2, 15.0), 2: (1, 20.0)}


def test_read_changes_after_vacuum_raises_retention(spark, tmp_path):
    """A change window whose delta files vacuum expired surfaces as a
    loud retention error, never a partial read."""
    tbl = str(tmp_path / "cdf4")
    v1 = mf.publish_snapshot(spark.range(2), tbl)
    mf.publish_snapshot(spark.range(2, 4), tbl, mode="append")
    # overwrite makes v2's delta files unreferenced by the head
    mf.publish_snapshot(spark.range(9), tbl, mode="overwrite")
    mf.vacuum(tbl, keep_last=1, grace_seconds=0.0)
    with pytest.raises((FileNotFoundError, ValueError)):
        mf.read_changes(spark, tbl, v1, version=2)


def test_manifest_inspect_surfaces_pointers(spark, tmp_path):
    """inspect exposes the head's consistency pointers (sync cursors,
    txn maps) so operators see consumer positions without reading
    manifests by hand."""
    tbl = str(tmp_path / "ptr")
    mf.publish_snapshot(
        spark.range(3), tbl, properties={"sync_cursor": {"a": ["raw", 7]}}
    )
    mi = mf.manifest_inspect(tbl)
    assert mi["properties"] == {"sync_cursor": {"a": ["raw", 7]}}


def test_read_changes_rejects_invalid_since(spark, tmp_path):
    tbl = str(tmp_path / "cdf5")
    mf.publish_snapshot(spark.range(2), tbl)
    with pytest.raises(ValueError, match="since_version must be >= 1"):
        mf.read_changes(spark, tbl, 0)


def test_merge_batch_exactly_once_loop_and_replay(spark, tmp_path):
    """Sequential CDC batches through merge_batch_exactly_once: MERGE
    semantics per batch, replay no-ops before staging, a behind-txn
    batch refuses."""
    from dbcut_spark.streaming.manifest_sink import (
        merge_batch_exactly_once,
    )

    tbl = str(tmp_path / "t")

    def b(rows):
        return spark.createDataFrame(
            rows, "id long, v string, op string"
        )

    # batch 0 bootstraps
    v0 = merge_batch_exactly_once(
        b([(1, "a", "U"), (2, "b", "U")]), 0, tbl, "q", ["id"], "op"
    )
    assert v0 == 1
    # batch 1: update 1, delete 2, insert 3
    v1 = merge_batch_exactly_once(
        b([(1, "a2", "U"), (2, "x", "D"), (3, "c", "U")]),
        1, tbl, "q", ["id"], "op",
    )
    assert v1 == 2
    got = {(r.id, r.v) for r in mf.read_snapshot(spark, tbl).collect()}
    assert got == {(1, "a2"), (3, "c")}
    # replay of batch 1: noop, state unchanged, no new version
    assert merge_batch_exactly_once(
        b([(1, "a2", "U"), (2, "x", "D"), (3, "c", "U")]),
        1, tbl, "q", ["id"], "op",
    ) is None
    assert mf.current_version(tbl) == 2
    # behind-txn batch refuses
    with pytest.raises(RuntimeError, match="behind"):
        merge_batch_exactly_once(
            b([(9, "z", "U")]), 0, tbl, "q", ["id"], "op"
        )
    # state identical to sequential merge_snapshot over the same deltas
    twin = str(tmp_path / "twin")
    mf.publish_snapshot(
        b([(1, "a", "U"), (2, "b", "U")]).drop("op"), twin
    )
    mf.merge_snapshot(
        spark,
        b([(1, "a2", "U"), (2, "x", "D"), (3, "c", "U")]),
        twin, ["id"], op_col="op",
    )
    assert _mrows(mf.read_snapshot(spark, tbl)) == _mrows(
        mf.read_snapshot(spark, twin)
    )


def test_stream_manifest_merge_e2e(spark, tmp_path):
    """Real-stream CDC merge: per-file batches apply as MOR merges;
    a resumed checkpoint drains to a no-op."""
    from dbcut_spark.streaming.manifest_sink import stream_manifest_merge

    stage = tmp_path / "cdc"
    stage.mkdir()
    batches = [
        [(1, "a", "U"), (2, "b", "U")],
        [(1, "a2", "U"), (3, "c", "U")],
        [(2, "x", "D"), (4, "d", "U")],
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "id long, v string, op string"
        ).coalesce(1).write.mode("append").parquet(str(stage))
    tbl = str(tmp_path / "t")

    def run(ckpt):
        q = stream_manifest_merge(
            spark.readStream.schema("id long, v string, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage)),
            tbl, "cdcq", ckpt, ["id"], op_col="op",
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ckpt1"))
    got = {(r.id, r.v) for r in mf.read_snapshot(spark, tbl).collect()}
    # batches may arrive in any file order, but each id's final state
    # is order-independent here except (1); accept both orders of the
    # two batches touching id=1 by asserting the set of ids and that
    # deleted id=2 is gone
    assert {r[0] for r in got} == {1, 3, 4}
    head = mf.current_version(tbl)
    # resume: nothing new, no new version
    run(str(tmp_path / "ckpt1"))
    assert mf.current_version(tbl) == head
    assert {
        (r.id, r.v) for r in mf.read_snapshot(spark, tbl).collect()
    } == got
