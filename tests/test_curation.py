"""Semantics tests for corpus-curation operators (oracle parity covers
the registered queries; these pin intended behavior on edge cases)."""

from pyspark.sql import functions as F

from dbcut_spark.operators import curation as cur


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one word repeated
            (2, "w x y z"),          # all distinct
            (3, "solo"),             # no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cur.repetition_stats(df, "text", "doc_id").collect()}
    assert out[1]["n_words"] == 4 and out[1]["distinct_words"] == 1
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["top_bigram_count"] == 3 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_frac"] == 0.333333
    assert out[3]["top_bigram_count"] == 0 and out[3]["top_bigram_frac"] == 0.0


def test_ngram_overlap_flags_only_real_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # contains benchmark 4-gram
            (2, "completely unrelated words entirely here"),
            (3, "too short"),                        # shorter than n -> 0 ngrams
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in cur.ngram_overlap(corpus, bench, "text", "doc_id", n=4).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_ngrams"] == 0 and not out[3]["contaminated"]
    assert len(out) == 3  # benchmark docs never appear in the output


def test_incremental_dedup_exact_and_near(spark):
    ref_text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near_text = ref_text.replace("theta", "thetaX", 1)  # one token differs
    df = spark.createDataFrame(
        [
            (1, ref_text, False),
            (2, "totally different reference content here", False),
            (10, ref_text.upper(), True),   # exact after normalization
            (11, near_text, True),          # near dup of 1
            (12, "brand new unseen content with fresh words", True),
        ],
        ["doc_id", "text", "new"],
    )
    out = {
        r["doc_id"]: r
        for r in cur.incremental_dedup(df, "text", "doc_id", F.col("new")).collect()
    }
    assert set(out) == {10, 11, 12}  # only the new batch is emitted
    assert out[10]["is_exact_dup"] and out[10]["is_near_dup"]
    assert not out[11]["is_exact_dup"] and out[11]["is_near_dup"]
    assert not out[12]["is_exact_dup"] and not out[12]["is_near_dup"]


def test_pii_stats_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe@example.com or call +1-555-0199"),
            (2, "server at 10.0.3.77 and 192.168.0.1 up"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cur.pii_stats(df, "text", "doc_id").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_ips"] == 2
    assert out[3]["n_emails"] == out[3]["n_phones"] == out[3]["n_ips"] == 0
    # redaction changes the hash only when something was redacted
    import hashlib

    raw3 = hashlib.md5(b"nothing sensitive here").hexdigest()
    assert out[3]["redacted_hash"] == raw3
    raw1 = hashlib.md5(
        b"mail me at jane.doe@example.com or call +1-555-0199"
    ).hexdigest()
    assert out[1]["redacted_hash"] != raw1


def test_materialize_corpus_roundtrip(spark, sf_dir, tmp_path):
    """The materialized corpus must contain exactly the keep=true docs,
    partition-pruned reads must work, and the manifest counts must
    reconcile with the decision frame."""
    import json

    from dbcut_spark.operators.curation import materialize_corpus
    from dbcut_spark.queries import QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    decisions = QUERIES["corpus_curate"](spark, sf_dir)
    manifest = materialize_corpus(docs, decisions, str(tmp_path))

    out = spark.read.parquet(str(tmp_path / "corpus"))
    assert out.count() == manifest["n_kept"]
    assert manifest["n_input"] == docs.count()
    assert manifest["n_kept"] + sum(manifest["drop_reasons"].values()) == (
        manifest["n_input"]
    )
    # source-partitioned: a source predicate must prune at the scan
    plan = (
        out.filter(F.col("source") == "src3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    disk = json.load(open(tmp_path / "manifest.json"))
    assert disk == manifest


def test_incremental_dedup_indexed_matches_inmemory(spark, sf_dir, tmp_path):
    """Indexed probe == in-memory form row-for-row on real documents,
    AND the probe scan is partition-pruned to the batch's band buckets
    (the whole point of persisting the index — round-9 verdict #3)."""
    from dbcut_spark.operators.dedup import build_lsh_index, probe_lsh_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_new = F.substring("source", 4, 10).cast("int") >= 10
    ref, batch = docs.filter(~is_new), docs.filter(is_new)

    idx = str(tmp_path / "lsh_index")
    build_lsh_index(ref, idx, "text", "doc_id")

    got = cur.incremental_dedup_indexed(
        spark, idx, batch, "text", "doc_id"
    )
    exp = cur.incremental_dedup(docs, "text", "doc_id", is_new)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )

    # pruning pin: the bands scan carries literal PartitionFilters on
    # (band_idx, bucket) — only matching bucket dirs are listed/read
    pairs = probe_lsh_index(spark, idx, batch.limit(5), "text", "doc_id")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    segs = plan.split("PartitionFilters")[1:]  # one per file scan
    assert any(
        "band_idx" in s[:400] and "bucket" in s[:400] for s in segs
    ), plan


def test_incremental_dedup_indexed_small_fixture(spark, tmp_path):
    """Same exact/near/new triage as the in-memory fixture test, via
    the persisted index; empty batch short-circuits without a scan."""
    from dbcut_spark.operators.dedup import build_lsh_index, probe_lsh_index

    ref_text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near_text = ref_text.replace("theta", "thetaX", 1)
    ref = spark.createDataFrame(
        [(1, ref_text), (2, "totally different reference content here")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, ref_text.upper()),
            (11, near_text),
            (12, "brand new unseen content with fresh words"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "ix")
    build_lsh_index(ref, idx, "text", "doc_id")
    out = {
        r["doc_id"]: r
        for r in cur.incremental_dedup_indexed(
            spark, idx, batch, "text", "doc_id"
        ).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[10]["is_exact_dup"] and out[10]["is_near_dup"]
    assert not out[11]["is_exact_dup"] and out[11]["is_near_dup"]
    assert not out[12]["is_exact_dup"] and not out[12]["is_near_dup"]
    empty = probe_lsh_index(
        spark, idx, batch.limit(0), "text", "doc_id"
    )
    assert empty.count() == 0


def test_lsh_index_append_grows_reference(spark, sf_dir, tmp_path):
    """The dedup-then-ingest loop: probing after lsh_index_append must
    equal probing an index built over the union — without re-hashing
    the standing reference. Appends are BLIND O(batch) writes, so an
    overlapping re-append leaves physical duplicate hashes; the probe
    is a duplicate-proof semi join (identical results), and
    lsh_index_compact sweeps the duplicates physically."""
    from dbcut_spark.operators.dedup import build_lsh_index, lsh_index_append

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_i = F.substring("source", 4, 10).cast("int")
    ref1 = docs.filter(src_i < 5)
    ref2 = docs.filter((src_i >= 5) & (src_i < 10))
    batch = docs.filter(src_i >= 10)

    grown = str(tmp_path / "grown")
    build_lsh_index(ref1, grown, "text", "doc_id")
    lsh_index_append(spark, grown, ref2, "text", "doc_id")

    rebuilt = str(tmp_path / "rebuilt")
    build_lsh_index(ref1.unionByName(ref2), rebuilt, "text", "doc_id")

    got = cur.incremental_dedup_indexed(spark, grown, batch, "text", "doc_id")
    exp = cur.incremental_dedup_indexed(
        spark, rebuilt, batch, "text", "doc_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )
    # overlapping re-append: blind O(batch) write leaves duplicate
    # hashes on disk (the O(corpus) anti-join per batch is gone)...
    lsh_index_append(spark, grown, ref2, "text", "doc_id")
    from dbcut_spark.sinks.manifest import read_snapshot

    exact = read_snapshot(spark, f"{grown}/exact")
    n_total, n_distinct = exact.count(), exact.distinct().count()
    assert n_total > n_distinct
    # ...but the semi-join probe is duplicate-proof: results identical
    got2 = cur.incremental_dedup_indexed(spark, grown, batch, "text", "doc_id")
    assert sorted(map(tuple, got2.collect())) == sorted(
        map(tuple, exp.collect())
    )
    # and compaction sweeps the physical duplicates
    from dbcut_spark.operators.dedup import lsh_index_compact

    stats = lsh_index_compact(spark, grown)
    assert stats["exact_deduped"] == n_total - n_distinct
    exact2 = read_snapshot(spark, f"{grown}/exact")
    assert exact2.count() == n_distinct == exact2.distinct().count()
    got3 = cur.incremental_dedup_indexed(spark, grown, batch, "text", "doc_id")
    assert sorted(map(tuple, got3.collect())) == sorted(
        map(tuple, exp.collect())
    )


def test_lsh_index_compact_lifecycle(spark, sf_dir, tmp_path):
    """Round-9 verdict ask #6: append xN fragments every touched
    (band_idx, bucket) directory; lsh_index_compact (one partitioned
    compaction job via the standard FRAG machinery) bounds files per
    bucket back to 1 and leaves probe results hash-identical — the
    probe filters on partition VALUES, never files. lsh_index_inspect
    is the staleness signal `cli inspect --lsh-index` surfaces."""
    from dbcut_spark.operators.dedup import (
        build_lsh_index,
        lsh_index_append,
        lsh_index_compact,
        lsh_index_inspect,
        probe_lsh_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_i = F.substring("source", 4, 10).cast("int")
    batch = docs.filter(src_i >= 12)
    idx = str(tmp_path / "ix")
    build_lsh_index(docs.filter(src_i < 3), idx, "text", "doc_id")
    for lo, hi in [(3, 6), (6, 9), (9, 12)]:
        lsh_index_append(
            spark, idx, docs.filter((src_i >= lo) & (src_i < hi)),
            "text", "doc_id",
        )
    before = lsh_index_inspect(idx)
    assert before["max_files_per_bucket"] > 1  # appends fragmented it
    exp = sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    )

    stats = lsh_index_compact(spark, idx)
    assert not stats["bands"].get("skipped")
    after = lsh_index_inspect(idx)
    assert after["max_files_per_bucket"] == 1
    assert after["band_files"] < before["band_files"]
    got = sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    )
    assert got == exp
    # meta sidecar untouched by the rewrite
    assert after["meta"] == before["meta"]


def test_lsh_probe_during_append_never_partial(spark, sf_dir, tmp_path, monkeypatch):
    """Round-10 verdict ask #1: index appends are manifest commits, so
    a probe concurrent with an append sees the OLD snapshot or the NEW
    one — never a half-landed batch. Simulated deterministically: an
    append that crashed AFTER staging its band files but BEFORE the
    manifest publish leaves those files on disk, and a probe must
    return exactly the pre-append result (staged files invisible);
    completing the append flips probes atomically to the grown
    result."""
    import pytest as _pt

    from dbcut_spark.operators.dedup import (
        build_lsh_index,
        lsh_index_append,
        probe_lsh_index,
    )
    from dbcut_spark.sinks import manifest as mf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_i = F.substring("source", 4, 10).cast("int")
    ref1 = docs.filter(src_i < 5)
    ref2 = docs.filter((src_i >= 5) & (src_i < 10))
    batch = docs.filter(src_i >= 10).limit(50)

    idx = str(tmp_path / "ix")
    build_lsh_index(ref1, idx, "text", "doc_id")
    before = sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    )

    # crash the append between staging and publish: band files land
    # under data/<uuid>/ but no manifest references them
    real_publish = mf._publish
    monkeypatch.setattr(
        mf, "_publish",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected crash")),
    )
    with _pt.raises(RuntimeError, match="injected crash"):
        lsh_index_append(spark, idx, ref2, "text", "doc_id")
    monkeypatch.setattr(mf, "_publish", real_publish)
    import glob as _glob

    assert _glob.glob(f"{idx}/bands/data/*/*")  # staged wreckage exists
    mid = sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    )
    assert mid == before  # old snapshot exactly — nothing partial

    lsh_index_append(spark, idx, ref2, "text", "doc_id")
    after = sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    )
    assert len(after) >= len(before)
    # the grown result equals a fresh union index's probe (atomic flip
    # to exactly the new snapshot)
    rebuilt = str(tmp_path / "rebuilt")
    build_lsh_index(ref1.unionByName(ref2), rebuilt, "text", "doc_id")
    exp = sorted(
        map(tuple, probe_lsh_index(spark, rebuilt, batch, "text", "doc_id")
            .collect())
    )
    assert after == exp


def test_lsh_probe_concurrent_appends_snapshot_isolation(
    spark, sf_dir, tmp_path
):
    """True-concurrency smoke: a prober thread races three appends;
    every probe result must equal the probe of SOME append prefix
    (snapshot isolation) — a partially-visible append would produce a
    result matching no prefix."""
    import threading

    from dbcut_spark.operators.dedup import (
        build_lsh_index,
        lsh_index_append,
        probe_lsh_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_i = F.substring("source", 4, 10).cast("int")
    slices = [
        docs.filter((src_i >= lo) & (src_i < hi)).localCheckpoint()
        for lo, hi in [(0, 3), (3, 6), (6, 9), (9, 12)]
    ]
    batch = docs.filter(src_i >= 12).limit(40).localCheckpoint()

    # expected result per prefix, from independently built indexes
    expected = []
    for i in range(1, 5):
        p = str(tmp_path / f"pfx{i}")
        pref = slices[0]
        for s in slices[1:i]:
            pref = pref.unionByName(s)
        build_lsh_index(pref, p, "text", "doc_id")
        expected.append(
            sorted(map(tuple, probe_lsh_index(
                spark, p, batch, "text", "doc_id").collect()))
        )

    idx = str(tmp_path / "live")
    build_lsh_index(slices[0], idx, "text", "doc_id")
    stop = threading.Event()
    seen: list = []
    errs: list = []

    def prober():
        try:
            while not stop.is_set():
                seen.append(sorted(map(tuple, probe_lsh_index(
                    spark, idx, batch, "text", "doc_id").collect())))
        except Exception as e:  # surface in the main thread
            errs.append(e)

    t = threading.Thread(target=prober, daemon=True)
    t.start()
    try:
        for s in slices[1:]:
            lsh_index_append(spark, idx, s, "text", "doc_id")
    finally:
        stop.set()
        t.join(timeout=120)
    assert not errs, errs
    assert seen, "prober never completed a probe"
    for got in seen:
        assert got in expected, (
            "a probe saw a band set matching no append prefix — "
            "snapshot isolation violated"
        )
    # and the final state is the full union
    assert seen[-1] == expected[-1] or sorted(
        map(tuple, probe_lsh_index(spark, idx, batch, "text", "doc_id")
            .collect())
    ) == expected[-1]


def test_probe_lsh_index_empty_batch_schema_matches(spark, tmp_path):
    """Round-9 ADVICE: the empty-batch early return must carry the
    SAME schema as the non-empty path (doc_b typed from the index's
    meta id_col), so per-batch probe results union cleanly."""
    from dbcut_spark.operators.dedup import build_lsh_index, probe_lsh_index

    ref = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 3)], "doc_id long, text string"
    )  # LONG index ids
    idx = str(tmp_path / "ix")
    build_lsh_index(ref, idx, "text", "doc_id")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta " * 3)], "doc_id int, text string"
    )  # INT batch ids: the non-empty path coerces and emits doc_b as
    # the INDEX's long — the empty path must match, not emit int
    nonempty = probe_lsh_index(spark, idx, batch, "text", "doc_id")
    empty = probe_lsh_index(spark, idx, batch.limit(0), "text", "doc_id")
    assert [
        (f.name, f.dataType) for f in empty.schema.fields
    ] == [(f.name, f.dataType) for f in nonempty.schema.fields]
    # and they union without error
    assert nonempty.unionByName(empty).count() == nonempty.count()


def test_cli_inspect_lsh_index(spark, sf_dir, tmp_path):
    """`cli inspect --lsh-index PATH` surfaces index file counts and
    the FRAG hint once appends fragment the bucket dirs."""
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli
    from dbcut_spark.operators.dedup import build_lsh_index, lsh_index_append

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "ix")
    build_lsh_index(docs, idx, "text", "doc_id")

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

    runner = CliRunner()
    res = runner.invoke(
        cli, ["-c", cfg_path, "inspect", "--lsh-index", idx],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert f"lsh index {idx}" in res.output
    assert "bucket dirs" in res.output
    assert "FRAG" not in res.output.split("lsh index")[1]

    lsh_index_append(spark, idx, docs.limit(20), "text", "doc_id")
    res2 = runner.invoke(
        cli, ["-c", cfg_path, "inspect", "--lsh-index", idx],
        catch_exceptions=False,
    )
    assert res2.exit_code == 0, res2.output
    assert "FRAG" in res2.output.split("lsh index")[1]


def test_stream_dedup_ingest_matches_batch_loop(spark, sf_dir, tmp_path):
    """Round-10 streaming composition: the foreachBatch dedup-ingest
    loop (probe persisted index -> accept -> append corpus + index)
    over time-ordered micro-batches must land the SAME corpus and an
    equivalently-probing index as the batch loop over the identical
    slices; replaying a drained batch is a no-op (convergence)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from dbcut_spark.operators.dedup import probe_lsh_index
    from dbcut_spark.streaming.dedup import (
        dedup_ingest_batch,
        stream_dedup_ingest,
    )

    full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "text",
        F.substring("source", 4, 10).cast("int").alias("si"),
    )
    slices = [
        full.filter(F.col("si") < 5).drop("si"),
        full.filter((F.col("si") >= 5) & (F.col("si") < 10)).drop("si"),
        full.filter(F.col("si") >= 10).drop("si"),
    ]

    # ---- batch loop (the reference semantics) ----
    idx_b = str(tmp_path / "idx_batch")
    corpus_b = str(tmp_path / "corpus_batch")
    accepted_per_slice = [
        dedup_ingest_batch(sl, idx_b, corpus_b, "text", "doc_id")
        for sl in slices
    ]
    assert accepted_per_slice[0] == slices[0].count()  # bootstrap batch
    assert sum(accepted_per_slice) > 0

    # ---- streaming loop over the same slices as ordered files ----
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    base_t = 1_700_000_000
    for i, sl in enumerate(slices):
        stage = str(tmp_path / f"dstage_{i}")
        sl.coalesce(1).write.parquet(stage)
        part = _glob.glob(_os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src_dir / f"slice_{i}.parquet")
        _shutil.move(part, dst)
        _os.utime(dst, (base_t + 10 * i, base_t + 10 * i))
    idx_s = str(tmp_path / "idx_stream")
    corpus_s = str(tmp_path / "corpus_stream")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = stream_dedup_ingest(
        stream, idx_s, corpus_s, "text", "doc_id",
        checkpoint=str(tmp_path / "ckpt"),
    )
    # availableNow terminates on drain; a timeout return with the query
    # still active would race the assertions below against live batches
    assert q.awaitTermination(600), "stream did not drain in 600s"

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_s).collect()
    )
    exp = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_b).collect()
    )
    assert got == exp
    # the corpora deduplicated something real (cross-slice dups exist)
    assert len(exp) < full.count()

    # the two indexes probe identically on a fresh synthetic batch
    probe = spark.createDataFrame(
        [(99001, slices[0].first()["text"]),
         (99002, "entirely novel probe content never seen before xyz")],
        "doc_id long, text string",
    )
    pa = sorted(map(tuple, probe_lsh_index(
        spark, idx_s, probe, "text", "doc_id").collect()))
    pb = sorted(map(tuple, probe_lsh_index(
        spark, idx_b, probe, "text", "doc_id").collect()))
    assert pa == pb

    # replay convergence: re-ingesting a drained slice accepts nothing
    # and leaves the corpus unchanged
    n_again = dedup_ingest_batch(
        slices[2], idx_b, corpus_b, "text", "doc_id"
    )
    assert n_again == 0
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_b).collect()
    ) == exp


def test_stream_dedup_ingest_compact_cadence(spark, sf_dir, tmp_path):
    """compact_every=N: the streaming loop self-maintains the index —
    after the drain the live snapshot is compacted back to one file
    per bucket, and probes match a never-compacted batch-loop index
    (layout invariance through the cadence)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from dbcut_spark.operators.dedup import lsh_index_inspect, probe_lsh_index
    from dbcut_spark.streaming.dedup import (
        dedup_ingest_batch,
        stream_dedup_ingest,
    )

    full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text",
        F.substring("source", 4, 10).cast("int").alias("si"),
    )
    slices = [
        full.filter(F.col("si") < 4).drop("si"),
        full.filter((F.col("si") >= 4) & (F.col("si") < 8)).drop("si"),
        full.filter((F.col("si") >= 8) & (F.col("si") < 12)).drop("si"),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    t0 = 1_700_000_000
    for i, sl in enumerate(slices):
        stage = str(tmp_path / f"st_{i}")
        sl.coalesce(1).write.parquet(stage)
        part = _glob.glob(_os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src_dir / f"s_{i}.parquet")
        _shutil.move(part, dst)
        _os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    idx_s, corpus_s = str(tmp_path / "idx_s"), str(tmp_path / "corp_s")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = stream_dedup_ingest(
        stream, idx_s, corpus_s, "text", "doc_id",
        checkpoint=str(tmp_path / "ck"), compact_every=1,
    )
    # availableNow terminates on drain; a timeout return with the query
    # still active leaves compactions running — the probes below would
    # then race a live vacuum (observed as files deleted mid-read under
    # host load)
    assert q.awaitTermination(600), "stream did not drain in 600s"

    st = lsh_index_inspect(idx_s)
    assert st["max_files_per_bucket"] == 1  # cadence kept it compact

    # semantics unchanged vs the never-compacted batch loop
    idx_b, corpus_b = str(tmp_path / "idx_b"), str(tmp_path / "corp_b")
    for sl in slices:
        dedup_ingest_batch(sl, idx_b, corpus_b, "text", "doc_id")
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_s).collect()
    ) == sorted(r["doc_id"] for r in spark.read.parquet(corpus_b).collect())
    probe = full.filter(F.col("si") >= 12).drop("si").limit(30)
    pa = sorted(map(tuple, probe_lsh_index(
        spark, idx_s, probe, "text", "doc_id").collect()))
    pb = sorted(map(tuple, probe_lsh_index(
        spark, idx_b, probe, "text", "doc_id").collect()))
    assert pa == pb


def test_null_text_counts_never_negative(spark):
    """Non-ANSI Spark's size(NULL) = -1 must never leak into the
    per-doc counts: NULL-text (failed-extraction) docs report NULL,
    not -1 (round-10 review)."""
    d = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id long, text string"
    )
    rep = {r["doc_id"]: r for r in
           cur.repetition_stats(d, "text", "doc_id").collect()}
    assert rep[1]["n_words"] == 3
    assert rep[2]["n_words"] is None and rep[2]["distinct_words"] is None
    pii = {r["doc_id"]: r for r in
           cur.pii_stats(d, "text", "doc_id").collect()}
    assert pii[1]["n_emails"] == 0
    assert pii[2]["n_emails"] is None and pii[2]["n_ips"] is None
    spans = {r["doc_id"]: r for r in
             cur.remove_repeated_spans(d, "text", "doc_id").collect()}
    assert spans[2]["n_tokens"] is None if "n_tokens" in spans[2] else True
    assert spans[2]["n_removed"] is None
    assert spans[2]["clean_text"] == "" and spans[2]["n_kept"] == 0


def test_lsh_index_set_pointer_consistency(spark, sf_dir, tmp_path):
    """The _set pointer pins a CONSISTENT (bands, exact) pair: a bands
    append whose pointer has not landed yet (crash window) is invisible
    to probes — both sides still resolve the previous logical state —
    and re-pointing makes it visible. Compaction re-points before
    vacuuming, and probe results are layout-invariant across it."""
    from dbcut_spark.operators import dedup as dd
    from dbcut_spark.operators.curation import incremental_dedup_indexed
    from dbcut_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    batch1 = docs.filter(F.col("doc_id") % 3 == 1)
    probe = docs.filter(F.col("doc_id") % 3 == 2).limit(200)

    idx = str(tmp_path / "idx")
    dd.build_lsh_index(ref, idx, "text", "doc_id", n_buckets=4)
    sv = dd._set_versions(idx)
    assert sv == {"bands": 1, "exact": 1}

    baseline = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in incremental_dedup_indexed(
            spark, idx, probe, "text", "doc_id", 0.5
        ).collect()
    }

    # simulate the crash window: batch1's bands land WITHOUT a pointer
    # update (publish directly, bypassing lsh_index_append)
    from dbcut_spark.sinks.manifest import publish_snapshot

    meta_bands = dd._sig_bands(
        dd.minhash_signatures(batch1, "text", "doc_id", 16, 4),
        "doc_id", 16, 4,
    ).withColumn("bucket", dd._lsh_bucket(4))
    publish_snapshot(
        dd._bands_for_write(meta_bands, 4, 4),
        idx + "/bands", mode="append",
        partition_by=["band_idx", "bucket"], repartition=False,
    )
    # pointer unchanged -> probes still see the consistent OLD pair
    assert dd._set_versions(idx) == sv
    mid = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in incremental_dedup_indexed(
            spark, idx, probe, "text", "doc_id", 0.5
        ).collect()
    }
    assert mid == baseline

    # a proper append re-points; compaction keeps results and advances
    # the pointer to the compacted versions
    dd.lsh_index_append(spark, idx, batch1, "text", "doc_id")
    sv2 = dd._set_versions(idx)
    assert sv2["bands"] > sv["bands"] and sv2["exact"] > sv["exact"]
    after_append = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in incremental_dedup_indexed(
            spark, idx, probe, "text", "doc_id", 0.5
        ).collect()
    }
    dd.lsh_index_compact(spark, idx, grace_seconds=0)
    sv3 = dd._set_versions(idx)
    assert sv3["bands"] >= sv2["bands"] and sv3["exact"] >= sv2["exact"]
    after_compact = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in incremental_dedup_indexed(
            spark, idx, probe, "text", "doc_id", 0.5
        ).collect()
    }
    assert after_compact == after_append

    # pointer-less legacy index: head-resolution fallback still works
    import shutil

    shutil.rmtree(idx + "/_set")
    legacy = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in incremental_dedup_indexed(
            spark, idx, probe, "text", "doc_id", 0.5
        ).collect()
    }
    assert legacy == after_compact
