"""Incremental cursor sync (operators/sync.py): bootstrap / delta /
noop flow, boundary-tie exactly-once semantics, multi-source cursor
maps, walk-back past foreign commits, CAS races, and the JDBC
push-down variant (live Derby)."""

from __future__ import annotations

import datetime

import pytest

from dbcut_spark.operators.sync import (
    _decode_cursor,
    _encode_cursor,
    incremental_sync,
    parquet_incremental_sync,
)
from dbcut_spark.sinks.manifest import (
    current_version,
    read_snapshot,
    snapshot_properties,
)


def _ids(spark, path):
    return sorted(
        r["id"] for r in read_snapshot(spark, path).select("id").collect()
    )


def _mk_source(spark, tmp_path, rows):
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "id int, cur int, v string").write.mode(
        "overwrite"
    ).parquet(src)
    return src


def test_bootstrap_delta_noop_flow(spark, tmp_path):
    src = _mk_source(
        spark, tmp_path, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]
    )
    tgt = str(tmp_path / "tgt")
    r1 = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r1["mode"] == "bootstrap" and r1["rows"] == 3
    assert r1["cursor"] == 30
    assert _ids(spark, tgt) == [1, 2, 3]

    # source grows; only the delta ships
    spark.createDataFrame(
        [(4, 40, "d"), (5, 50, "e")], "id int, cur int, v string"
    ).write.mode("append").parquet(src)
    r2 = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r2["mode"] == "append" and r2["rows"] == 2
    assert r2["cursor"] == 50
    assert _ids(spark, tgt) == [1, 2, 3, 4, 5]

    # no growth: noop, no new version
    v_before = current_version(tgt)
    r3 = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r3["mode"] == "noop" and r3["rows"] == 0
    assert current_version(tgt) == v_before


def test_strict_cursor_drops_late_ties_without_pk(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [(1, 10, "a"), (2, 20, "b")])
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, src, tgt, "cur")
    # a LATE row sharing the committed max cursor
    spark.createDataFrame(
        [(3, 20, "late")], "id int, cur int, v string"
    ).write.mode("append").parquet(src)
    r = parquet_incremental_sync(spark, src, tgt, "cur")
    # documented strict-> contract: the tie is NOT picked up
    assert r["mode"] == "noop"
    assert _ids(spark, tgt) == [1, 2]


def test_pk_mode_lands_late_ties_exactly_once(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [(1, 10, "a"), (2, 20, "b")])
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(
        spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
    )
    spark.createDataFrame(
        [(3, 20, "late")], "id int, cur int, v string"
    ).write.mode("append").parquet(src)
    r = parquet_incremental_sync(
        spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
    )
    assert r["mode"] == "append" and r["rows"] == 1
    assert _ids(spark, tgt) == [1, 2, 3]
    # replaying the same state is a noop — boundary anti-join holds
    r2 = parquet_incremental_sync(
        spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
    )
    assert r2["mode"] == "noop"
    assert _ids(spark, tgt) == [1, 2, 3]


def test_null_cursor_rejected(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [(1, 10, "a"), (2, None, "b")])
    tgt = str(tmp_path / "tgt")
    with pytest.raises(ValueError, match="NULL"):
        parquet_incremental_sync(spark, src, tgt, "cur")


def test_multi_source_cursor_map_survives(spark, tmp_path):
    """Two sources feed one target; each sync republishes the OTHER
    source's mark so neither ever re-bootstraps."""
    a = _mk_source(spark, tmp_path, [(1, 10, "a")])
    b = str(tmp_path / "srcb")
    spark.createDataFrame(
        [(100, 5, "x")], "id int, cur int, v string"
    ).write.parquet(b)
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, a, tgt, "cur", source_id="a")
    parquet_incremental_sync(spark, b, tgt, "cur", source_id="b")
    props = snapshot_properties(tgt)
    assert set(props["sync_cursor"]) == {"a", "b"}
    # a grows; b's mark must survive a's commit
    spark.createDataFrame(
        [(2, 11, "a2")], "id int, cur int, v string"
    ).write.mode("append").parquet(a)
    parquet_incremental_sync(spark, a, tgt, "cur", source_id="a")
    r = parquet_incremental_sync(spark, b, tgt, "cur", source_id="b")
    assert r["mode"] == "noop"  # b did not re-bootstrap
    assert _ids(spark, tgt) == [1, 2, 100]


def test_cursor_resolves_past_foreign_append(spark, tmp_path):
    """A manual manifest append without the cursor map must not reset
    the mark (resolver walks back to the newest map-carrying commit)."""
    from dbcut_spark.sinks.manifest import publish_snapshot

    src = _mk_source(spark, tmp_path, [(1, 10, "a")])
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, src, tgt, "cur")
    publish_snapshot(
        spark.createDataFrame(
            [(99, 1, "manual")], "id int, cur int, v string"
        ),
        tgt,
        mode="append",
    )
    r = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r["mode"] == "noop"  # mark survived the map-less head
    assert _ids(spark, tgt) == [1, 99]


def test_cas_race_retries_and_converges(spark, tmp_path):
    """A concurrent sync of the SAME source wins the CAS first; the
    loser's retry re-resolves the fresher mark and lands as a noop —
    never double rows."""
    import dbcut_spark.operators.sync as sync_mod

    src = _mk_source(spark, tmp_path, [(1, 10, "a")])
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, src, tgt, "cur")
    spark.createDataFrame(
        [(2, 20, "b")], "id int, cur int, v string"
    ).write.mode("append").parquet(src)

    assert sync_mod is not None
    from dbcut_spark.sinks import manifest as man

    orig = man.publish_snapshot
    fired = {"n": 0}

    def racing_publish(df, table_path, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            # the racer commits the SAME delta first
            orig(
                spark.read.parquet(src).filter("cur > 10"),
                table_path,
                mode="append",
                expected_parent=kw.get("expected_parent"),
                properties=kw.get("properties"),
            )
        return orig(df, table_path, **kw)

    import unittest.mock as mock

    with mock.patch.object(man, "publish_snapshot", racing_publish):
        # patch the name sync.py resolves at call time
        r = incremental_sync(
            spark,
            lambda low: spark.read.parquet(src).filter(
                "cur > %d" % (low if low is not None else -1)
            ),
            tgt,
            "cur",
        )
    # loser retried: the fresher committed mark covers the delta
    assert r["mode"] == "noop"
    assert _ids(spark, tgt) == [1, 2]


def test_timestamp_cursor_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(1, t0, "a"), (2, t0 + datetime.timedelta(hours=1), "b")]
    spark.createDataFrame(rows, "id int, cur timestamp, v string").write.parquet(src)
    tgt = str(tmp_path / "tgt")
    r1 = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r1["rows"] == 2
    spark.createDataFrame(
        [(3, t0 + datetime.timedelta(hours=2), "c")],
        "id int, cur timestamp, v string",
    ).write.mode("append").parquet(src)
    r2 = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r2["mode"] == "append" and r2["rows"] == 1
    assert _ids(spark, tgt) == [1, 2, 3]
    # the committed mark survives a JSON round-trip losslessly
    props = snapshot_properties(tgt)
    assert _decode_cursor(props["sync_cursor"]["default"]) == (
        t0 + datetime.timedelta(hours=2)
    )


def test_encode_decode_domains():
    from decimal import Decimal

    for v in (
        7,
        3.5,
        "s3-key",
        datetime.date(2026, 2, 3),
        datetime.datetime(2026, 2, 3, 4, 5, 6, 789),
        Decimal("12.340"),
    ):
        assert _decode_cursor(_encode_cursor(v)) == v
    with pytest.raises(ValueError):
        _encode_cursor(True)
    with pytest.raises(ValueError):
        _encode_cursor([1, 2])


def test_schema_evolution_add_on_grown_source(spark, tmp_path):
    """A source that grew a column syncs on with schema_evolution='add'
    (old target rows read back NULL); the default stays loud."""
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 10, "a")], "id int, cur int, v string").write.parquet(src)
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, src, tgt, "cur")
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(2, 20, "b", "extra")], "id int, cur int, v string, w string"
    ).write.parquet(src2)
    with pytest.raises(ValueError, match="column"):
        parquet_incremental_sync(spark, src2, tgt, "cur")
    r = parquet_incremental_sync(
        spark, src2, tgt, "cur", schema_evolution="add"
    )
    assert r["mode"] == "append" and r["rows"] == 1
    rows = {
        r["id"]: r["w"]
        for r in read_snapshot(spark, tgt).select("id", "w").collect()
    }
    assert rows == {1: None, 2: "extra"}


def test_cli_sync_parquet(spark, sf_dir, tmp_path):
    """`cli sync SRC TGT --cursor c` end-to-end: bootstrap then noop."""
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id int, cur int, v string"
    ).write.parquet(src)
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
    tgt = str(tmp_path / "tgt")
    # chain-mode click parses options before positionals
    args = ["-c", cfg_path, "sync", "--cursor", "cur",
            "--pk", "id", "--stats", "cur", src, tgt]
    res = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "bootstrap: 2 rows" in res.output
    res2 = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert res2.exit_code == 0, res2.output
    assert "noop: 0 rows" in res2.output
    assert _ids(spark, tgt) == [1, 2]
    # --table on a parquet source is a usage error, not a silent ignore
    res3 = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "sync", "--cursor", "cur", "--table", "x",
         src, tgt],
        catch_exceptions=False,
    )
    assert res3.exit_code != 0


def test_jdbc_incremental_sync_live_derby(spark, tmp_path):
    """End-to-end against a live Derby: the bound must compile into the
    pushed-down query (server-side WHERE), and the sync must converge
    across two growth steps."""
    from dbcut_spark.operators.sync import jdbc_incremental_sync
    from dbcut_spark.sources.jdbc import jdbc_execute

    url = f"jdbc:derby:{tmp_path}/syncdb;create=true"
    jdbc_execute(
        spark,
        url,
        [
            'CREATE TABLE grow (id INT PRIMARY KEY, cur INT, v VARCHAR(10))',
            "INSERT INTO grow VALUES (1, 10, 'a'), (2, 20, 'b')",
        ],
    )
    tgt = str(tmp_path / "tgt")
    # Derby uppercases unquoted identifiers, and the rendered bound
    # quotes the cursor column — so the caller passes it as stored
    r1 = jdbc_incremental_sync(spark, url, "grow", tgt, "CUR")
    assert r1["mode"] == "bootstrap" and r1["rows"] == 2
    jdbc_execute(spark, url, ["INSERT INTO grow VALUES (3, 30, 'c')"])
    r2 = jdbc_incremental_sync(spark, url, "grow", tgt, "CUR")
    assert r2["mode"] == "append" and r2["rows"] == 1
    assert _ids(spark, tgt) == [1, 2, 3]
    r3 = jdbc_incremental_sync(spark, url, "grow", tgt, "CUR")
    assert r3["mode"] == "noop"


# -- manifest-to-manifest replication --------------------------------------


def _pub(spark, path, lo, hi, mode="append"):
    from dbcut_spark.sinks.manifest import publish_snapshot

    return publish_snapshot(
        spark.range(lo, hi).withColumn("v", __import__("pyspark").sql.functions.col("id") * 2),
        path,
        mode=mode,
    )


def test_replicate_bootstrap_delta_noop(spark, tmp_path):
    from dbcut_spark.operators.sync import replicate_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _pub(spark, src, 0, 3, mode="overwrite")
    r1 = replicate_manifest(spark, src, dst)
    assert r1["mode"] == "bootstrap" and r1["rows"] == 3
    _pub(spark, src, 3, 5)
    r2 = replicate_manifest(spark, src, dst)
    assert r2["mode"] == "append" and r2["rows"] == 2
    r3 = replicate_manifest(spark, src, dst)
    assert r3["mode"] == "noop"
    assert _ids(spark, dst) == [0, 1, 2, 3, 4]


def test_replicate_rebuild_on_compacted_source(spark, tmp_path):
    """A compaction (non-append) in the source window rebuilds the
    single-source replica; pulls continue incrementally after."""
    from dbcut_spark.operators.sync import replicate_manifest
    from dbcut_spark.sinks.manifest import compact_snapshot

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _pub(spark, src, 0, 3, mode="overwrite")
    replicate_manifest(spark, src, dst)
    _pub(spark, src, 3, 5)
    compact_snapshot(spark, src)
    r = replicate_manifest(spark, src, dst)
    assert r["mode"] == "rebuild" and r["rows"] == 5
    assert _ids(spark, dst) == [0, 1, 2, 3, 4]
    _pub(spark, src, 5, 6)
    r2 = replicate_manifest(spark, src, dst)
    assert r2["mode"] == "append" and r2["rows"] == 1
    assert _ids(spark, dst) == [0, 1, 2, 3, 4, 5]


def test_replicate_fan_in_two_sources(spark, tmp_path):
    """Two sources fan into one replica: second bootstrap APPENDS, and
    a non-append window on one source refuses (a rebuild would clobber
    the other's rows)."""
    from dbcut_spark.operators.sync import replicate_manifest
    from dbcut_spark.sinks.manifest import compact_snapshot

    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "d")
    _pub(spark, a, 0, 2, mode="overwrite")
    _pub(spark, b, 10, 12, mode="overwrite")
    replicate_manifest(spark, a, dst, source_id="a")
    r = replicate_manifest(spark, b, dst, source_id="b")
    assert r["mode"] == "bootstrap"
    assert _ids(spark, dst) == [0, 1, 10, 11]
    _pub(spark, a, 2, 3)
    replicate_manifest(spark, a, dst, source_id="a")
    assert _ids(spark, dst) == [0, 1, 2, 10, 11]
    _pub(spark, b, 12, 13)
    compact_snapshot(spark, b)
    import pytest as _pt

    with _pt.raises(RuntimeError, match="fan-in"):
        replicate_manifest(spark, b, dst, source_id="b")


def test_replicate_refuses_recreated_source(spark, tmp_path):
    import shutil

    from dbcut_spark.operators.sync import replicate_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _pub(spark, src, 0, 2, mode="overwrite")
    _pub(spark, src, 2, 4)
    _pub(spark, src, 4, 6)
    replicate_manifest(spark, src, dst)
    shutil.rmtree(src)
    _pub(spark, src, 0, 2, mode="overwrite")  # re-created at v1
    with pytest.raises(RuntimeError, match="re-created"):
        replicate_manifest(spark, src, dst)


def test_sync_cursor_survives_compaction(spark, tmp_path):
    """compact_snapshot preserves head properties, so a sync after a
    target compaction stays a noop instead of re-bootstrapping."""
    from dbcut_spark.sinks.manifest import compact_snapshot

    src = _mk_source(spark, tmp_path, [(1, 10, "a"), (2, 20, "b")])
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(spark, src, tgt, "cur")
    compact_snapshot(spark, tgt)
    r = parquet_incremental_sync(spark, src, tgt, "cur")
    assert r["mode"] == "noop"
    assert _ids(spark, tgt) == [1, 2]


def test_cli_replicate(spark, sf_dir, tmp_path):
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _pub(spark, src, 0, 4, mode="overwrite")
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
    args = ["-c", cfg_path, "replicate", src, dst]
    r1 = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert r1.exit_code == 0, r1.output
    assert r1.output.startswith("bootstrap: 4 rows")
    r2 = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert r2.exit_code == 0, r2.output
    assert r2.output.startswith("noop: 0 rows")
    assert _ids(spark, dst) == [0, 1, 2, 3]


def test_sync_randomized_growth_differential(spark, tmp_path):
    """Random growth sequences: rows arrive in random batches whose
    cursors may REGRESS relative to already-synced rows (late arrivals)
    and may tie the committed mark. After every sync, the target must
    equal exactly the source rows VISIBLE under the documented
    contract: everything whose cursor is >= the mark at the time it
    first appeared (pk mode); late ties land, late sub-mark rows are
    dropped — mirrored by a pure-Python fold."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        src = str(tmp_path / f"src{trial}")
        tgt = str(tmp_path / f"tgt{trial}")
        next_id = 0
        visible: dict[int, int] = {}  # id -> cur of expected synced rows
        mark = None
        first = True
        for _batch in range(4):
            n = rng.randint(1, 6)
            rows = []
            for _ in range(n):
                cur = rng.randint(0, 12)
                rows.append((next_id, cur, f"v{next_id}"))
                next_id += 1
            spark.createDataFrame(
                rows, "id int, cur int, v string"
            ).write.mode("overwrite" if first else "append").parquet(src)
            first = False
            # python fold of the contract
            for i, cur, _v in rows:
                if mark is None or cur >= mark:
                    visible[i] = cur
            if visible:
                mark = max(max(visible.values()), mark or 0)
            r = parquet_incremental_sync(
                spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
            )
            if mark is None:
                assert r["mode"] == "noop"
                continue
            assert r["cursor"] == mark, (trial, _batch)
            got = sorted(
                (x["id"], x["cur"])
                for x in read_snapshot(spark, tgt)
                .select("id", "cur")
                .collect()
            )
            assert got == sorted(visible.items()), (trial, _batch)


def test_replicate_cas_race_retries(spark, tmp_path):
    """A foreign writer (another query's batch) takes the replica's
    next version mid-pull; the loser re-resolves and lands its delta on
    the new head instead of failing or doubling."""
    import unittest.mock as mock

    from dbcut_spark.operators.sync import replicate_manifest
    from dbcut_spark.sinks import manifest as man

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _pub(spark, src, 0, 2, mode="overwrite")
    replicate_manifest(spark, src, dst)
    _pub(spark, src, 2, 4)

    orig = man.publish_snapshot
    fired = {"n": 0}

    def racing_publish(df, table_path, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            # a foreign append (no replica pointer) wins the version
            orig(
                spark.createDataFrame([(99, 0)], "id long, v long"),
                table_path,
                mode="append",
            )
        return orig(df, table_path, **kw)

    with mock.patch.object(man, "publish_snapshot", racing_publish):
        r = replicate_manifest(spark, src, dst)
    assert r["mode"] == "append" and r["rows"] == 2
    assert _ids(spark, dst) == [0, 1, 2, 3, 99]


def test_jdbc_render_literal_domains(monkeypatch):
    """Numeric/decimal bounds render UNQUOTED into the pushed-down
    WHERE (a quoted '12.34' against a NUMERIC column is a string
    comparison on strict dialects); non-finite floats refuse; strings
    escape embedded quotes. Captured through a fake JDBC reader — no
    live database."""
    from decimal import Decimal

    import dbcut_spark.operators.sync as s

    captured = {}

    class _FakeReader:
        def option(self, k, v):
            captured[k] = v
            return self

        def options(self, **kw):
            return self

        def load(self):
            return None

    class _FakeSpark:
        class read:  # noqa: N801 - mimics spark.read
            @staticmethod
            def format(_f):
                return _FakeReader()

    def run(low):
        captured.clear()
        monkeypatch.setattr(
            s, "incremental_sync",
            lambda spark, load_since, *a, **kw: load_since(low),
        )
        s.jdbc_incremental_sync(_FakeSpark(), "jdbc:x", "t", "/n", "c")
        return captured.get("query", "")

    assert run(None) == ""  # bootstrap takes the dbtable path, no WHERE
    assert 'WHERE "c" > 10' in run(10)
    assert 'WHERE "c" > 10.5' in run(10.5)
    assert 'WHERE "c" > 12.340' in run(Decimal("12.340"))
    assert "WHERE \"c\" > 'a''b'" in run("a'b")
    with pytest.raises(ValueError, match="non-finite"):
        run(float("inf"))


def test_pk_boundary_read_prunes_files(spark, tmp_path):
    """The pk-mode boundary re-read is footer-stats pruned to the
    mark's files — prove it with prune_report, not trust."""
    from dbcut_spark.sinks.manifest import prune_report

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i, "x") for i in range(1, 5)], "id int, cur int, v string"
    ).coalesce(1).write.parquet(src)
    tgt = str(tmp_path / "tgt")
    parquet_incremental_sync(
        spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
    )
    # grow twice so the target holds several commits' files
    for hi in (8, 12):
        spark.createDataFrame(
            [(i, i, "x") for i in range(hi - 3, hi + 1)],
            "id int, cur int, v string",
        ).coalesce(1).write.mode("append").parquet(src)
        parquet_incremental_sync(
            spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
        )
    rep = prune_report(tgt, [("cur", "=", 12)])
    assert rep["stats_files"] == rep["total_files"]
    assert rep["skipped_files"] >= 1, rep


def test_sync_and_replicate_over_object_store_backend(spark, tmp_path):
    """The whole sync → replicate chain with manifest IO routed through
    the S3-class conditional-PUT double (no rename/link): cursor and
    replica pointers CAS through the store, data files stay filesystem
    parquet (the documented split)."""
    from dbcut_spark.operators.sync import replicate_manifest
    from dbcut_spark.sinks import manifest as mf
    from dbcut_spark.sinks.object_store import InMemoryObjectStore

    mf.set_manifest_store(InMemoryObjectStore())
    try:
        src = _mk_source(spark, tmp_path, [(1, 10, "a"), (2, 20, "b")])
        tgt, dst = str(tmp_path / "tgt"), str(tmp_path / "replica")
        r1 = parquet_incremental_sync(
            spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
        )
        assert r1["mode"] == "bootstrap"
        spark.createDataFrame(
            [(3, 30, "c")], "id int, cur int, v string"
        ).write.mode("append").parquet(src)
        assert parquet_incremental_sync(
            spark, src, tgt, "cur", pk=["id"], stats_cols=["cur"]
        )["mode"] == "append"
        assert replicate_manifest(spark, tgt, dst)["rows"] == 3
        assert replicate_manifest(spark, tgt, dst)["mode"] == "noop"
        assert _ids(spark, dst) == [1, 2, 3]
    finally:
        mf.set_manifest_store(None)
