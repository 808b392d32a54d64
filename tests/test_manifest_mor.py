"""Merge-on-read equality deletes over the manifest protocol
(sinks/manifest.py: delete_keys_snapshot / merge_snapshot and the
tombstone-aware read path).

Semantics under test are Iceberg's equality-delete sequence rules: a
tombstone applies to rows whose data file was committed STRICTLY
BEFORE it, so replaced/deleted keys die while same-commit and later
re-inserts survive; compaction materializes the debt away. The
reference mutates rows in place via SQLAlchemy DELETE/UPDATE
(dbcut/database.py) — these tests pin that operation re-expressed as
immutable snapshot commits.
"""

import pytest
from pyspark.sql import functions as F

from dbcut_spark.sinks import manifest as mf


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, ids, tag="a"):
    return spark.createDataFrame(
        [(i, tag, i * 10) for i in ids], "id long, tag string, val long"
    )


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_delete_keys_basic_no_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, range(10)), tbl)
    m1 = mf._load_manifest(tbl, v1)
    v2 = mf.delete_keys_snapshot(spark, _keys(spark, [2, 5, 7]), tbl)
    m2 = mf._load_manifest(tbl, v2)
    # O(keys): the delete commit inherits every data file verbatim
    assert m2["files"] == m1["files"]
    assert m2["mode"] == "delete"
    assert len(m2["deletes"]) == 1
    assert m2["deletes"][0]["cols"] == ["id"]
    assert m2["deletes"][0]["rows"] == 3
    got = mf.read_snapshot(spark, tbl)
    assert sorted(r.id for r in got.collect()) == [0, 1, 3, 4, 6, 8, 9]
    # schema unchanged, no seq column leaks through
    assert got.columns == ["id", "tag", "val"]


def test_delete_then_reinsert_survives(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(6), "old"), tbl)
    mf.delete_keys_snapshot(spark, _keys(spark, [1, 2, 3]), tbl)
    # re-insert two of the deleted keys AFTER the delete: the tombstone
    # (older seq) must not kill them
    mf.publish_snapshot(_mk(spark, [2, 3], "new"), tbl, mode="append")
    got = {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()}
    assert got == {
        (0, "old"), (4, "old"), (5, "old"), (2, "new"), (3, "new"),
    }


def test_delete_survives_later_appends(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(5)), tbl)
    mf.delete_keys_snapshot(spark, _keys(spark, [0, 4]), tbl)
    mf.publish_snapshot(_mk(spark, [10, 11]), tbl, mode="append")
    mf.publish_snapshot(_mk(spark, [12]), tbl, mode="append")
    got = sorted(r.id for r in mf.read_snapshot(spark, tbl).collect())
    assert got == [1, 2, 3, 10, 11, 12]


def test_two_delete_commits_and_multi_column_keys(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(8)), tbl)
    mf.delete_keys_snapshot(spark, _keys(spark, [1]), tbl)
    # second delete on a DIFFERENT key spec (composite) — one anti join
    # per spec group
    comp = spark.createDataFrame([(6, "a")], "id long, tag string")
    v = mf.delete_keys_snapshot(spark, comp, tbl)
    m = mf._load_manifest(tbl, v)
    assert {tuple(d["cols"]) for d in m["deletes"]} == {
        ("id",), ("id", "tag"),
    }
    got = sorted(r.id for r in mf.read_snapshot(spark, tbl).collect())
    assert got == [0, 2, 3, 4, 5, 7]


def test_validation_errors(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(3)), tbl)
    with pytest.raises(ValueError, match="not a table column"):
        mf.delete_keys_snapshot(
            spark, spark.createDataFrame([(1,)], "nope long"), tbl
        )
    with pytest.raises(ValueError, match="mismatched types"):
        mf.delete_keys_snapshot(
            spark, spark.createDataFrame([(1,)], "id int"), tbl
        )
    # NULL key: refused at stage time (the guard rides the write)
    with pytest.raises(Exception) as ei:
        mf.delete_keys_snapshot(
            spark,
            spark.createDataFrame([(None,)], "id long"),
            tbl,
        )
    assert "NULL in key column" in str(ei.value)
    # empty table: nothing to delete from
    with pytest.raises(FileNotFoundError):
        mf.delete_keys_snapshot(
            spark, _keys(spark, [1]), str(tmp_path / "missing")
        )


def test_empty_keys_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, range(3)), tbl)
    v = mf.delete_keys_snapshot(spark, _keys(spark, []), tbl)
    assert v == v1
    assert mf.current_version(tbl) == v1


def test_vacuum_keeps_live_tombstones_then_compact_clears(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(10)), tbl)
    mf.delete_keys_snapshot(spark, _keys(spark, [3, 4]), tbl)
    before = _rows(mf.read_snapshot(spark, tbl))
    st = mf.manifest_inspect(tbl)
    assert st["delete_files"] == 1 and st["tombstone_rows"] == 2
    # vacuum with keep_last=1 must NOT reap the head's tombstone file
    mf.vacuum(tbl, keep_last=1, grace_seconds=0.0)
    assert _rows(mf.read_snapshot(spark, tbl)) == before
    # compaction materializes the deletes and clears the debt
    res = mf.compact_snapshot(spark, tbl, grace_seconds=0.0)
    assert res["compacted"]
    m = mf._load_manifest(tbl, res["version"])
    assert not m.get("deletes") and not m.get("seqs")
    assert _rows(mf.read_snapshot(spark, tbl)) == before
    st2 = mf.manifest_inspect(tbl)
    assert st2["delete_files"] == 0 and st2["tombstone_rows"] == 0


def test_compact_single_file_with_deletes_still_runs(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(10)).coalesce(1), tbl,
                        repartition=False)
    mf.delete_keys_snapshot(spark, _keys(spark, [0]), tbl)
    res = mf.compact_snapshot(spark, tbl, grace_seconds=0.0)
    assert res["compacted"]
    assert sorted(
        r.id for r in mf.read_snapshot(spark, tbl).collect()
    ) == list(range(1, 10))


def test_merge_snapshot_matches_cow_upsert(spark, tmp_path):
    """Differential: merge_snapshot (MOR) and upsert_snapshot (CoW)
    produce identical final states for the same delta, including op_col
    deletes and a NULL op treated as upsert."""
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    base = _mk(spark, range(20), "base")
    mf.publish_snapshot(base, cow)
    mf.publish_snapshot(base, mor)
    delta = spark.createDataFrame(
        [
            (3, "upd", 333, "U"),
            (7, "upd", 777, None),   # NULL op = upsert, never delete
            (40, "ins", 400, "U"),
            (5, "x", 0, "D"),
            (11, "x", 0, "D"),
        ],
        "id long, tag string, val long, op string",
    )
    mf.upsert_snapshot(spark, delta, cow, ["id"], op_col="op")
    v = mf.merge_snapshot(spark, delta, mor, ["id"], op_col="op")
    assert _rows(mf.read_snapshot(spark, cow)) == _rows(
        mf.read_snapshot(spark, mor)
    )
    # O(delta): every parent data file inherited, none rewritten
    m = mf._load_manifest(mor, v)
    pm = mf._load_manifest(mor, m["parent"])
    assert set(pm["files"]) <= set(m["files"])
    assert m["mode"] == "merge"
    # repeated merges keep converging
    delta2 = spark.createDataFrame(
        [(3, "upd2", 3333, "U"), (7, "x", 0, "D")],
        "id long, tag string, val long, op string",
    )
    mf.upsert_snapshot(spark, delta2, cow, ["id"], op_col="op")
    mf.merge_snapshot(spark, delta2, mor, ["id"], op_col="op")
    assert _rows(mf.read_snapshot(spark, cow)) == _rows(
        mf.read_snapshot(spark, mor)
    )


def test_merge_bootstraps_empty_table(spark, tmp_path):
    tbl = str(tmp_path / "t")
    delta = spark.createDataFrame(
        [(1, "a", 10, "U"), (2, "b", 20, "D")],
        "id long, tag string, val long, op string",
    )
    mf.merge_snapshot(spark, delta, tbl, ["id"], op_col="op")
    assert sorted(
        r.id for r in mf.read_snapshot(spark, tbl).collect()
    ) == [1]


def test_time_travel_sees_pre_delete_state(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, range(4)), tbl)
    v2 = mf.delete_keys_snapshot(spark, _keys(spark, [0, 1]), tbl)
    assert sorted(
        r.id for r in mf.read_snapshot(spark, tbl, version=v1).collect()
    ) == [0, 1, 2, 3]
    assert sorted(
        r.id for r in mf.read_snapshot(spark, tbl, version=v2).collect()
    ) == [2, 3]


def test_where_pruning_composes_with_deletes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    lo = _mk(spark, range(0, 50))
    hi = _mk(spark, range(50, 100))
    mf.publish_snapshot(lo, tbl, stats_cols=["id"])
    mf.publish_snapshot(hi, tbl, mode="append", stats_cols=["id"])
    mf.delete_keys_snapshot(spark, _keys(spark, [60, 61]), tbl)
    rep = mf.prune_report(tbl, [("id", ">=", 50)])
    assert rep["skipped_files"] > 0  # stats pruning still engages
    got = sorted(
        r.id
        for r in mf.read_snapshot(
            spark, tbl, where=[("id", ">=", 50)]
        ).collect()
    )
    assert got == [i for i in range(50, 100) if i not in (60, 61)]


def test_partitioned_table_mor_delete(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _mk(spark, range(12)).withColumn(
        "bucket", (F.col("id") % 3).cast("int")
    )
    mf.publish_snapshot(df, tbl, partition_by=["bucket"])
    mf.delete_keys_snapshot(spark, _keys(spark, [0, 1, 2]), tbl)
    got = sorted(r.id for r in mf.read_snapshot(spark, tbl).collect())
    assert got == list(range(3, 12))
    # partition columns still reconstruct
    assert {r.bucket for r in mf.read_snapshot(spark, tbl).collect()} == {
        0, 1, 2,
    }


def test_bucketed_table_merge_keeps_routing(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(40)), tbl, bucket_by=("id", 4))
    delta = spark.createDataFrame(
        [(3, "upd", 999), (100, "ins", 1)],
        "id long, tag string, val long",
    )
    v = mf.merge_snapshot(spark, delta, tbl, ["id"])
    m = mf._load_manifest(tbl, v)
    assert m["bucket_by"] == {"col": "id", "n": 4}
    # staged files recorded bucket ids so equality probes keep pruning
    staged = [r for r in m["files"] if r not in set(
        mf._load_manifest(tbl, m["parent"])["files"]
    )]
    assert staged and all(r in m["buckets"] for r in staged)
    got = {(r.id, r.val) for r in mf.read_snapshot(
        spark, tbl, where=[("id", "=", 3)]
    ).collect()}
    assert got == {(3, 999)}


def test_read_changes_refuses_delete_window(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, range(3)), tbl)
    mf.delete_keys_snapshot(spark, _keys(spark, [1]), tbl)
    with pytest.raises(ValueError, match="not\\s+append-only|not append-only"):
        mf.read_changes(spark, tbl, since_version=v1)
    # but a pure-append window AFTER the delete reads fine
    v3 = mf.current_version(tbl)
    mf.publish_snapshot(_mk(spark, [9]), tbl, mode="append")
    got = [r.id for r in mf.read_changes(spark, tbl, v3).collect()]
    assert got == [9]


def test_mor_under_object_store_backend(spark, tmp_path):
    from dbcut_spark.sinks.object_store import InMemoryObjectStore

    tbl = str(tmp_path / "t")
    mf.set_manifest_store(InMemoryObjectStore())
    try:
        mf.publish_snapshot(_mk(spark, range(6)), tbl)
        mf.delete_keys_snapshot(spark, _keys(spark, [2]), tbl)
        mf.publish_snapshot(_mk(spark, [2], "back"), tbl, mode="append")
        got = {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()}
        assert (2, "back") in got and (2, "a") not in got
        assert len(got) == 6
    finally:
        mf.set_manifest_store(None)


def test_delete_version_race_retries(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(5)), tbl)
    real = mf._publish
    fails = {"n": 1}

    def flaky(table_path, manifest):
        if fails["n"]:
            fails["n"] -= 1
            # a racing append lands first, then the retry re-inherits it
            mf.publish_snapshot(
                _mk(spark, [50]), tbl, mode="append"
            )
            raise mf.VersionConflictError("lost the race")
        return real(table_path, manifest)

    monkeypatch.setattr(mf, "_publish", flaky)
    v = mf.delete_keys_snapshot(spark, _keys(spark, [0]), tbl, retries=2)
    monkeypatch.setattr(mf, "_publish", real)
    m = mf._load_manifest(tbl, v)
    # the retry inherited the winner's appended file
    assert m["n_files"] > 1
    got = sorted(r.id for r in mf.read_snapshot(spark, tbl).collect())
    assert got == [1, 2, 3, 4, 50]


def test_delete_retries_exhausted_raises(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(3)), tbl)

    def always_lose(table_path, manifest):
        raise mf.VersionConflictError("lost")

    monkeypatch.setattr(mf, "_publish", always_lose)
    with pytest.raises(mf.VersionConflictError):
        mf.delete_keys_snapshot(spark, _keys(spark, [0]), tbl, retries=1)


def _cfg(tmp_path, sf_dir):
    import yaml

    cfg = {
        "databases": {
            "source_uri": sf_dir,
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def test_cli_delete_and_merge(spark, sf_dir, tmp_path):
    """`cli delete TBL KEYS --cols` and `cli merge TBL DELTA --pk`
    end-to-end over a manifest table, then `compact --manifest`
    folds the tombstone debt in."""
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg_path = _cfg(tmp_path, sf_dir)
    tbl = str(tmp_path / "tbl")
    mf.publish_snapshot(_mk(spark, range(10)), tbl)

    keys = str(tmp_path / "keys")
    _keys(spark, [2, 5]).write.parquet(keys)
    res = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "delete", "--cols", "id", tbl, keys],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "delete committed as v2" in res.output
    assert "2 tombstone rows" in res.output
    assert sorted(
        r.id for r in mf.read_snapshot(spark, tbl).collect()
    ) == [0, 1, 3, 4, 6, 7, 8, 9]

    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [(3, "upd", 333, "U"), (7, "x", 0, "D"), (50, "ins", 500, "U")],
        "id long, tag string, val long, op string",
    ).write.parquet(delta)
    res2 = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "merge", "--pk", "id", "--op-col", "op",
         tbl, delta],
        catch_exceptions=False,
    )
    assert res2.exit_code == 0, res2.output
    assert "merge committed as v3" in res2.output
    got = {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()}
    assert (3, "upd") in got and (50, "ins") in got
    assert not any(i == 7 or i == 2 or i == 5 for i, _t in got)

    res3 = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "compact", "--manifest", tbl],
        catch_exceptions=False,
    )
    assert res3.exit_code == 0, res3.output
    m = mf._load_manifest(tbl, mf.current_version(tbl))
    assert not m.get("deletes")
    assert {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()} == got

    # bad --cols is a usage error, not a silent no-op
    res4 = CliRunner().invoke(
        cli, ["-c", cfg_path, "delete", "--cols", "nope", tbl, keys],
    )
    assert res4.exit_code != 0


def test_engine_delete_and_merge_facade(spark, sf_dir, tmp_path):
    from dbcut_spark.api import Engine

    eng = Engine(sf_dir, spark=spark)
    tbl = str(tmp_path / "tbl")
    mf.publish_snapshot(_mk(spark, range(6)), tbl)
    v = eng.manifest_delete(_keys(spark, [0]), tbl)
    assert v == 2
    delta = spark.createDataFrame(
        [(1, "u", 11, "U")], "id long, tag string, val long, op string"
    )
    v2 = eng.manifest_merge(delta, tbl, ["id"], op_col="op")
    assert v2 == 3
    got = {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()}
    assert got == {(1, "u"), (2, "a"), (3, "a"), (4, "a"), (5, "a")}


def test_tombstone_alias_collision_refused(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "x")], "id long, __dbcut_del_id string"
    )
    mf.publish_snapshot(df, tbl)
    with pytest.raises(ValueError, match="tombstone alias"):
        mf.delete_keys_snapshot(spark, _keys(spark, [1]), tbl)


def test_tag_pins_retention_and_resolves(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, range(3), "rel"), tbl)
    mf.tag_snapshot(tbl, "release-1")
    mf.publish_snapshot(_mk(spark, range(5), "new"), tbl,
                        mode="overwrite")
    mf.publish_snapshot(_mk(spark, range(7), "newer"), tbl,
                        mode="overwrite")
    # vacuum keep_last=1 would normally expire v1 and v2; the tag
    # pins v1's files while v2's expire
    deleted = mf.vacuum(tbl, keep_last=1, grace_seconds=0.0)
    assert deleted  # v2's files went
    got = mf.read_snapshot(spark, tbl, version="release-1")
    assert {r.tag for r in got.collect()} == {"rel"}
    assert got.count() == 3
    # v2 (untagged, expired) is a loud retention error
    with pytest.raises(FileNotFoundError):
        mf.read_snapshot(spark, tbl, version=2).collect()
    st = mf.manifest_inspect(tbl)
    assert st["tags"] == {"release-1": v1}
    # delete the tag -> next vacuum reclaims v1 too
    mf.delete_tag(tbl, "release-1")
    mf.vacuum(tbl, keep_last=1, grace_seconds=0.0)
    with pytest.raises(FileNotFoundError):
        mf.read_snapshot(spark, tbl, version="release-1").collect()


def test_tag_create_replace_semantics(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, [1]), tbl)
    mf.publish_snapshot(_mk(spark, [2]), tbl, mode="append")
    assert mf.tag_snapshot(tbl, "stable", version=1) == 1
    with pytest.raises(mf.VersionConflictError, match="already exists"):
        mf.tag_snapshot(tbl, "stable", version=2)
    assert mf.tag_snapshot(tbl, "stable", version=2, replace=True) == 2
    assert mf.resolve_tag(tbl, "stable") == 2
    # default version: the head
    assert mf.tag_snapshot(tbl, "head-now") == 2


def test_tag_validation(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, [1]), tbl)
    for bad in ("", "no/slash", "x" * 65, "123", "a b"):
        with pytest.raises(ValueError, match="invalid tag name"):
            mf.tag_snapshot(tbl, bad)
    with pytest.raises(FileNotFoundError, match="no readable manifest"):
        mf.tag_snapshot(tbl, "ghost", version=99)
    with pytest.raises(FileNotFoundError, match="no tag"):
        mf.resolve_tag(tbl, "nope")
    with pytest.raises(FileNotFoundError, match="no tag"):
        mf.delete_tag(tbl, "nope")
    # a torn tag file is loud on resolve, skipped by list_tags
    import os

    os.makedirs(os.path.join(tbl, "_tags"), exist_ok=True)
    with open(os.path.join(tbl, "_tags", "torn.json"), "w") as f:
        f.write("{not json")
    with pytest.raises(FileNotFoundError, match="unreadable/torn"):
        mf.resolve_tag(tbl, "torn")
    assert "torn" not in mf.list_tags(tbl)


def test_tags_under_object_store_backend(spark, tmp_path):
    from dbcut_spark.sinks.object_store import InMemoryObjectStore

    tbl = str(tmp_path / "t")
    mf.set_manifest_store(InMemoryObjectStore())
    try:
        mf.publish_snapshot(_mk(spark, [1]), tbl)
        mf.publish_snapshot(_mk(spark, [2]), tbl, mode="append")
        mf.tag_snapshot(tbl, "cut", version=1)
        assert mf.resolve_tag(tbl, "cut") == 1
        with pytest.raises(mf.VersionConflictError):
            mf.tag_snapshot(tbl, "cut", version=2)
        mf.tag_snapshot(tbl, "cut", version=2, replace=True)
        assert mf.list_tags(tbl) == {"cut": 2}
        assert mf.read_snapshot(spark, tbl, version="cut").count() == 2
        mf.delete_tag(tbl, "cut")
        assert mf.list_tags(tbl) == {}
    finally:
        mf.set_manifest_store(None)


def test_cli_tag(spark, sf_dir, tmp_path):
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg_path = _cfg(tmp_path, sf_dir)
    tbl = str(tmp_path / "tbl")
    mf.publish_snapshot(_mk(spark, range(3)), tbl)
    runner = CliRunner()
    res = runner.invoke(
        cli, ["-c", cfg_path, "tag", tbl, "gold"], catch_exceptions=False
    )
    assert res.exit_code == 0 and "tagged" in res.output
    res2 = runner.invoke(
        cli, ["-c", cfg_path, "tag", "--list", tbl],
        catch_exceptions=False,
    )
    assert "gold -> v1" in res2.output
    res3 = runner.invoke(
        cli, ["-c", cfg_path, "tag", "--delete", tbl, "gold"],
        catch_exceptions=False,
    )
    assert res3.exit_code == 0 and "deleted" in res3.output
    assert mf.list_tags(tbl) == {}


def _feed(spark, tbl, since, **kw):
    return sorted(
        (r._commit_version, r._change_type, r.id, r.tag)
        for r in mf.read_change_feed(spark, tbl, since, **kw).collect()
    )


def test_change_feed_insert_delete_merge_window(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, [1, 2, 3], "v1"), tbl)       # v1
    mf.publish_snapshot(_mk(spark, [4], "v2"), tbl, "append")   # v2
    mf.delete_keys_snapshot(spark, _keys(spark, [2]), tbl)      # v3
    delta = spark.createDataFrame(
        [(3, "upd", 99, "U"), (4, "x", 0, "D"), (2, "back", 7, "U")],
        "id long, tag string, val long, op string",
    )
    mf.merge_snapshot(spark, delta, tbl, ["id"], op_col="op")   # v4
    got = _feed(spark, tbl, 1)
    assert got == sorted([
        (2, "insert", 4, "v2"),
        (3, "delete", 2, "v1"),       # pre-image of the v3 delete
        (4, "insert", 3, "upd"),
        (4, "insert", 2, "back"),     # re-insert of a v3-deleted key:
                                      # NO v4 delete row for id=2
        (4, "delete", 3, "v1"),       # update pre-image
        (4, "delete", 4, "v2"),       # op='D' pre-image
    ])
    # feed sums to the snapshot diff: replaying inserts minus deletes
    # over v1 state reproduces the head
    head = {(r.id, r.tag) for r in mf.read_snapshot(spark, tbl).collect()}
    assert head == {(1, "v1"), (3, "upd"), (2, "back")}


def test_change_feed_empty_and_refusals(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, [1]), tbl)
    # since == head: empty frame, metadata columns present
    f = mf.read_change_feed(spark, tbl, v1)
    assert f.count() == 0
    assert f.columns == ["id", "tag", "val", "_change_type",
                         "_commit_version"]
    with pytest.raises(ValueError, match="since_version must be >= 1"):
        mf.read_change_feed(spark, tbl, 0)
    # an overwrite in the window refuses
    mf.publish_snapshot(_mk(spark, [9]), tbl, mode="overwrite")
    with pytest.raises(ValueError, match="not row-expressible"):
        mf.read_change_feed(spark, tbl, v1).collect()


def test_change_feed_plain_appends_match_read_changes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = mf.publish_snapshot(_mk(spark, [1]), tbl)
    mf.publish_snapshot(_mk(spark, [2]), tbl, mode="append")
    mf.publish_snapshot(_mk(spark, [3, 4]), tbl, mode="append")
    feed = mf.read_change_feed(spark, tbl, v1)
    assert {r._change_type for r in feed.collect()} == {"insert"}
    plain = {r.id for r in mf.read_changes(spark, tbl, v1).collect()}
    assert {r.id for r in feed.collect()} == plain == {2, 3, 4}


def test_metadata_tables(spark, tmp_path):
    tbl = str(tmp_path / "t")
    mf.publish_snapshot(_mk(spark, range(4)), tbl, stats_cols=["id"])
    mf.publish_snapshot(_mk(spark, [9]), tbl, mode="append",
                        stats_cols=["id"])
    mf.delete_keys_snapshot(spark, _keys(spark, [0]), tbl)
    hist = mf.snapshot_history(spark, tbl).collect()
    assert [(r.version, r.mode) for r in hist] == [
        (1, "overwrite"), (2, "append"), (3, "delete"),
    ]
    assert hist[2].delete_files == 1 and hist[2].tombstone_rows == 1
    assert hist[2].parent == 2
    files = mf.snapshot_files(spark, tbl).collect()
    assert all(r.size_bytes > 0 for r in files)
    assert all(r.stats_cols == ["id"] for r in files)
    # pre-MOR files read back seq 0 (every tombstone applies)
    assert {r.seq for r in files} == {0}
    # a tag name resolves the files view too
    mf.tag_snapshot(tbl, "v-one", version=1)
    f1 = mf.snapshot_files(spark, tbl, version="v-one").collect()
    m1 = mf._load_manifest(tbl, 1)
    assert sorted(r.file for r in f1) == sorted(m1["files"])
    assert len(f1) < len(files)  # v2's append added files
    assert mf.snapshot_history(spark, tbl).filter(
        F.col("mode") == "delete"
    ).count() == 1


def test_replicate_mor_window_single_commit(spark, tmp_path):
    """A source window holding delete + merge commits replicates as
    ONE O(delta) replica commit (mode mor-delta), reproducing the
    source state exactly — including an in-window insert-then-delete
    cancellation — with the consumed-version pointer in the same
    atomic publish (replay is a noop)."""
    from dbcut_spark.operators.sync import replicate_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mf.publish_snapshot(_mk(spark, range(6), "v1"), src)
    r1 = replicate_manifest(spark, src, dst)
    assert r1["mode"] == "bootstrap"

    # window: append -> delete (incl. an in-window id=50) -> merge
    mf.publish_snapshot(_mk(spark, [50, 51], "v2"), src, mode="append")
    mf.delete_keys_snapshot(spark, _keys(spark, [1, 50]), src)
    delta = spark.createDataFrame(
        [(2, "upd", 22, "U"), (3, "x", 0, "D"), (60, "ins", 66, "U")],
        "id long, tag string, val long, op string",
    )
    mf.merge_snapshot(spark, delta, src, ["id"], op_col="op")
    dst_head_before = mf.current_version(dst)
    r2 = replicate_manifest(spark, src, dst)
    assert r2["mode"] == "mor-delta"
    # one commit, not one per source commit
    assert r2["version"] == dst_head_before + 1
    assert _rows(mf.read_snapshot(spark, dst)) == _rows(
        mf.read_snapshot(spark, src)
    )
    # replica data files were NOT rewritten: the bootstrap commit's
    # files are all inherited
    bm = mf._load_manifest(dst, dst_head_before)
    hm = mf._load_manifest(dst, r2["version"])
    assert set(bm["files"]) <= set(hm["files"])
    assert hm["mode"] in ("merge", "delete")
    # replay: noop
    r3 = replicate_manifest(spark, src, dst)
    assert r3["mode"] == "noop"
    # next pull after more commits keeps working incrementally
    mf.publish_snapshot(_mk(spark, [70], "v5"), src, mode="append")
    r4 = replicate_manifest(spark, src, dst)
    assert r4["mode"] == "append"
    assert _rows(mf.read_snapshot(spark, dst)) == _rows(
        mf.read_snapshot(spark, src)
    )


def test_replicate_mor_delete_only_window(spark, tmp_path):
    from dbcut_spark.operators.sync import replicate_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mf.publish_snapshot(_mk(spark, range(5)), src)
    replicate_manifest(spark, src, dst)
    mf.delete_keys_snapshot(spark, _keys(spark, [0, 4]), src)
    r = replicate_manifest(spark, src, dst)
    assert r["mode"] == "mor-delta" and r["rows"] == 0
    assert sorted(
        x.id for x in mf.read_snapshot(spark, dst).collect()
    ) == [1, 2, 3]


def test_replicate_overwrite_window_still_rebuilds(spark, tmp_path):
    from dbcut_spark.operators.sync import replicate_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mf.publish_snapshot(_mk(spark, range(3)), src)
    replicate_manifest(spark, src, dst)
    mf.publish_snapshot(_mk(spark, [9]), src, mode="overwrite")
    r = replicate_manifest(spark, src, dst)
    assert r["mode"] == "rebuild"
    assert sorted(
        x.id for x in mf.read_snapshot(spark, dst).collect()
    ) == [9]


def test_replicate_fan_in_refuses_mor_window(spark, tmp_path):
    """A source tombstone must never delete another source's replica
    rows: fan-in replicas refuse MOR windows loudly (same contract as
    the rebuild refusal)."""
    from dbcut_spark.operators.sync import replicate_manifest

    a, b, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    mf.publish_snapshot(_mk(spark, [1, 2], "a"), a)
    mf.publish_snapshot(_mk(spark, [1, 2], "b"), b)
    replicate_manifest(spark, a, dst, source_id="a")
    replicate_manifest(spark, b, dst, source_id="b")
    mf.delete_keys_snapshot(spark, _keys(spark, [1]), a)
    with pytest.raises(RuntimeError, match="fan-in"):
        replicate_manifest(spark, a, dst, source_id="a")
