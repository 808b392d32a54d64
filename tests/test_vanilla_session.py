"""Harness-session contract: every correctness-critical behavior must
hold on a VANILLA SparkSession (no repo confs), because the driver's
correctness gate builds its own session — round 1 lost 5 events_*
queries to a conf (`nanosAsLong`) that only `dbcut_spark.session`
set.

The subprocess is deliberate: `getOrCreate()` inside this pytest
process would reuse the repo-configured session and hide the bug.
"""

import json
import subprocess
import sys

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("vanilla-contract").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry

out = {}
qs = entry.queries()
# one representative per family that could plausibly depend on session
# state: ns-timestamp reads, windows+state, md5 hashing, driver-side
# union-find + composed joins, artifact-loaded centroids, JSON
# extraction, exact percentiles
for name in [
    "events_hourly",
    "events_sessionize",
    "tpch_q1",
    "dedup_simhash",
    "corpus_curate",
    "ann_ivf_topk",
    "events_json_extract",
    "corpus_stats",
]:
    df = qs[name](spark, "/root/testdata/sf0.001")
    out[name] = {"rows": df.count(), "cols": df.columns}

# entry() must also run on a vanilla session (the driver smoke-check)
edf = entry.entry(spark)
out["entry"] = {"rows": edf.count(), "cols": edf.columns}
print("RESULT:" + json.dumps(out))
"""


def test_queries_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][0]
    out = json.loads(line[len("RESULT:"):])
    for name, info in out.items():
        assert info["rows"] >= 0, name
    assert out["events_hourly"]["rows"] > 0
    assert out["corpus_curate"]["rows"] > 0
    assert out["ann_ivf_topk"]["rows"] > 0
    assert out["entry"]["rows"] >= 0
