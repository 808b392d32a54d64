"""Bench/isolate artifact protocol pins (round-9 verdict ask #1).

BENCH_ISOLATE.json is the source of truth for adjudicating suite-level
perf regressions, so the protocol itself is pinned: unknown names are
rejected before any child JVM spawns, error stubs never enter the
artifact, and the canary normalization that cancels shared-host drift
is exact arithmetic.  No SparkSession is needed for any of these.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_isolate_rejects_unknown_names():
    # The round-8 artifact carried a '/root/testdata/sf0.1' error stub
    # because a path argument was accepted as a query name. Unknown
    # names must fail loudly BEFORE any subprocess spawns.
    with pytest.raises(SystemExit, match="unknown queries"):
        bench.isolate_main(["/root/testdata/sf0.1"], "/tmp/x", 0.1)
    with pytest.raises(SystemExit, match="no_such_query"):
        bench.isolate_main(["tpch_q1", "no_such_query"], "/tmp/x", 0.1)


def test_merge_never_admits_error_records():
    prev = {"sf": 0.1, "queries": {"tpch_q1": {"best": 0.5, "runs": [0.5]}}}
    out = {
        "tpch_q1": {"error": "boom"},          # failed re-run of standing
        "tpch_q3": {"error": "boom"},          # failed run, no standing
        "topk_orders": {"best": 1.0, "runs": [1.0], "rows": 3},
    }
    merged = bench.merge_isolate(prev, out, 0.1)
    assert merged["tpch_q1"] == {"best": 0.5, "runs": [0.5]}  # kept
    assert "tpch_q3" not in merged                            # dropped
    assert merged["topk_orders"]["best"] == 1.0               # admitted
    # different-sf artifact: replaced, but error stubs still excluded
    merged2 = bench.merge_isolate(prev, out, 0.01)
    assert set(merged2) == {"topk_orders"}


def test_merge_success_overwrites_standing():
    prev = {"sf": 0.1, "queries": {"tpch_q1": {"best": 0.9}}}
    out = {"tpch_q1": {"best": 0.5, "runs": [0.5], "rows": 6}}
    assert bench.merge_isolate(prev, out, 0.1)["tpch_q1"]["best"] == 0.5


def test_canary_normalization_math():
    sf = bench.CANARY_REF_SF
    # canary ran 2x slower than reference -> normalized total is half
    timings = {bench.CANARY: bench.CANARY_REF_SEC * 2, "other": 1.0}
    assert bench.canary_normalize(100.0, timings, sf) == 50.0
    # canary at reference speed -> identity
    timings = {bench.CANARY: bench.CANARY_REF_SEC}
    assert bench.canary_normalize(10.0, timings, sf) == 10.0
    # no canary in a subset run -> None, never a KeyError
    assert bench.canary_normalize(10.0, {"other": 1.0}, sf) is None
    assert bench.canary_normalize(10.0, {bench.CANARY: 0.0}, sf) is None
    # any other sf: the canary's movement is data size, not host drift
    assert bench.canary_normalize(10.0, timings, 0.01) is None
    assert bench.canary_normalize(10.0, timings, 1.0) is None


def test_summary_line_carries_canary_fields():
    line = bench.summary_line(12.0, {bench.CANARY: 0.5, "q": 1.0}, 0.1)
    d = json.loads(line)
    assert d["value"] == 12.0
    assert d["value_canary_norm"] == pytest.approx(
        12.0 * bench.CANARY_REF_SEC / 0.5, abs=1e-3)
    assert d["canary"]["ref"] == bench.CANARY_REF_SEC
    assert len(line) <= bench.TAIL_BUDGET


def test_isolate_artifact_contains_only_registry_names():
    # The committed artifact itself must be clean: every key a real
    # registered query, every record a successful timing.
    path = os.path.join(REPO, "BENCH_ISOLATE.json")
    with open(path) as f:
        art = json.load(f)
    from dbcut_spark.queries import QUERIES

    for name, rec in art["queries"].items():
        assert name in QUERIES, f"non-registry key in artifact: {name}"
        assert isinstance(rec, dict) and "best" in rec, name


def test_isolate_cli_rejects_unknown_name_end_to_end():
    # Full CLI path: exits non-zero without spawning a JVM (fast).
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", "definitely_not_a_query"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "unknown queries" in (proc.stderr + proc.stdout)
