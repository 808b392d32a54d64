"""Automatic catalog/reflection cache (reference
/root/reference/dbcut/database.py:131-143,207-209: reflected metadata is
persisted per cache key and loaded instead of re-reflecting)."""

import json
import os

from dbcut_spark.catalog import Catalog, ForeignKey, TableSpec
from dbcut_spark.catalog_cache import CatalogCache, cached_catalog, source_digest


def _toy_catalog() -> Catalog:
    cat = Catalog()
    cat.tables["a"] = TableSpec("a", ("id",), ("id", "b_id"))
    cat.tables["b"] = TableSpec("b", ("id",), ("id",), defaults={"id": "0"})
    cat.fks = [ForeignKey("a", ("b_id",), "b", ("id",))]
    return cat


def _mk_source(tmp_path, names=("a", "b")):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for n in names:
        (src / f"{n}.parquet").write_bytes(b"PAR1")
    return str(src)


def test_second_construction_reads_cache(tmp_path):
    src = _mk_source(tmp_path)
    cache_dir = str(tmp_path / "cache")
    calls = []

    def reflect():
        calls.append(1)
        return _toy_catalog()

    c1 = cached_catalog(src, cache_dir, reflect)
    assert len(calls) == 1
    c2 = cached_catalog(src, cache_dir, reflect)
    assert len(calls) == 1  # served from cache — no second reflection
    assert c2.to_json() == c1.to_json()
    # round-trip fidelity includes FKs, synthetic-PK flag, defaults
    assert c2.fks == c1.fks
    assert c2.tables["b"].defaults == {"id": "0"}


def test_digest_change_invalidates(tmp_path):
    src = _mk_source(tmp_path)
    cache_dir = str(tmp_path / "cache")
    calls = []

    def reflect():
        calls.append(1)
        return _toy_catalog()

    cached_catalog(src, cache_dir, reflect)
    d0 = source_digest(src)
    # schema drift: a table is rewritten (mtime bumps) → digest changes
    target = os.path.join(src, "a.parquet")
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    assert source_digest(src) != d0
    cached_catalog(src, cache_dir, reflect)
    assert len(calls) == 2  # re-reflected
    # ...and a new table appearing also invalidates
    (  # noqa: SIM115
        open(os.path.join(src, "c.parquet"), "wb")
    ).write(b"PAR1")
    cached_catalog(src, cache_dir, reflect)
    assert len(calls) == 3


def test_force_refresh_and_no_cache(tmp_path):
    src = _mk_source(tmp_path)
    cache_dir = str(tmp_path / "cache")
    calls = []

    def reflect():
        calls.append(1)
        return _toy_catalog()

    cached_catalog(src, cache_dir, reflect)
    cached_catalog(src, cache_dir, reflect, force_refresh=True)
    assert len(calls) == 2  # --force-refresh busts a fresh entry
    cached_catalog(src, cache_dir, reflect)
    assert len(calls) == 2  # ...but rewrote it, so the next run hits
    # --no-cache: neither reads nor writes
    cache = CatalogCache(cache_dir)
    cache.purge()
    cached_catalog(src, cache_dir, reflect, enabled=False)
    assert cache.load(src) is None


def test_corrupt_or_foreign_entry_is_a_miss(tmp_path):
    src = _mk_source(tmp_path)
    cache_dir = str(tmp_path / "cache")
    cache = CatalogCache(cache_dir)
    cache.save(src, _toy_catalog())
    path = cache._path(src)
    with open(path, "w") as f:
        f.write("{not json")
    calls = []
    cached_catalog(src, cache_dir, lambda: (calls.append(1), _toy_catalog())[1])
    assert calls  # corrupt entry → silent re-reflect + overwrite
    with open(path) as f:
        assert json.load(f)["catalog"]["tables"]["a"]["pk"] == ["id"]


def test_jdbc_source_is_uri_trusted(tmp_path):
    """No cheap digest exists for a live database — the entry is keyed
    by URI alone and busted explicitly (reference behavior)."""
    url = "jdbc:postgresql://db/prod"
    assert source_digest(url) is None
    cache_dir = str(tmp_path / "cache")
    calls = []

    def reflect():
        calls.append(1)
        return _toy_catalog()

    cached_catalog(url, cache_dir, reflect)
    cached_catalog(url, cache_dir, reflect)
    assert len(calls) == 1
    CatalogCache(cache_dir).purge(url)
    cached_catalog(url, cache_dir, reflect)
    assert len(calls) == 2


def test_engine_uses_catalog_cache_transparently(spark, sf_dir, tmp_path, monkeypatch):
    """Second Engine construction against the same source must not
    reflect again — the e2e form of the reference's cached_metadata."""
    import shutil

    import dbcut_spark.catalog as catmod
    from dbcut_spark.api import Engine

    src = tmp_path / "db"
    src.mkdir()
    for t in ("region", "nation"):
        shutil.copytree(
            f"{sf_dir}/{t}.parquet", src / f"{t}.parquet"
        ) if os.path.isdir(f"{sf_dir}/{t}.parquet") else shutil.copy(
            f"{sf_dir}/{t}.parquet", src / f"{t}.parquet"
        )
    cfg = {"cache": str(tmp_path / "cache")}
    real = catmod.detect_catalog
    calls = []

    def spy(spark_, source_):
        calls.append(1)
        return real(spark_, source_)

    monkeypatch.setattr(catmod, "detect_catalog", spy)
    e1 = Engine(str(src), spark=spark, config=cfg)
    assert len(calls) == 1
    e2 = Engine(str(src), spark=spark, config=cfg)
    assert len(calls) == 1  # cache hit — no re-reflection
    assert e2.catalog.to_json() == e1.catalog.to_json()
    # extraction still works off the cached catalog
    frames = e2.extract({"from": "nation", "limit": 3})
    # the 2-table source doesn't match the TPC-H detection set, so the
    # catalog is INFERRED; inference can't name-match n_regionkey to
    # r_regionkey, so the closure is the root table alone
    assert "nation" in frames and frames["nation"].count() == 3
    e2.release()
    e3 = Engine(str(src), spark=spark, config={**cfg, "force_refresh": True})
    assert len(calls) == 2
    assert e3.catalog.to_json() == e1.catalog.to_json()


def test_cache_entry_redacts_credentials(tmp_path):
    """jdbc: URLs may embed credentials; the cache entry's breadcrumb
    field must not persist them in plaintext."""
    import json as _json

    from dbcut_spark.catalog_cache import CatalogCache

    url = "jdbc:postgresql://h/db?user=app&password=s3cret&ssl=true"
    cache = CatalogCache(str(tmp_path / "c"))
    cache.save(url, _toy_catalog())
    with open(cache._path(url)) as f:
        entry = _json.load(f)
    assert "s3cret" not in _json.dumps(entry)
    assert entry["source"].endswith("password=***&ssl=true")
    # redaction doesn't affect cache hits (keying is by the raw URL)
    assert cache.load(url) is not None


def test_digest_sees_partition_subdir_changes(tmp_path):
    """An append INSIDE an existing hive-partition dir must bump the
    digest: only the partition dir's mtime changes, not the table
    dir's (round-8 review fix)."""
    import os
    import time

    from dbcut_spark.catalog_cache import source_digest

    src = tmp_path / "src"
    part = src / "t.parquet" / "yr=2024"
    part.mkdir(parents=True)
    (part / "part-0.parquet").write_bytes(b"x")
    d1 = source_digest(str(src))
    time.sleep(0.02)
    (part / "part-1.parquet").write_bytes(b"y")
    # refresh the partition dir mtime explicitly (filesystem may have
    # coarse resolution)
    os.utime(part)
    d2 = source_digest(str(src))
    assert d1 != d2


def test_result_purge_keeps_catalog_cache(tmp_path):
    """purgecache clears RESULT entries only — the reflection cache
    lives under the same root in catalog/ and belongs to a different
    layer (round-8 review fix)."""
    import os

    from dbcut_spark.cache import ResultCache

    rc = ResultCache(str(tmp_path))
    os.makedirs(os.path.join(rc.cache_dir, "a" * 40))
    os.makedirs(os.path.join(rc.cache_dir, "catalog"))
    marker = os.path.join(rc.cache_dir, "catalog", "x.json")
    open(marker, "w").write("{}")
    rc.purge()
    assert not os.path.exists(os.path.join(rc.cache_dir, "a" * 40))
    assert os.path.exists(marker)


def test_digest_sees_multilevel_partition_changes(tmp_path):
    """An append inside a 2-level hive layout (a=1/b=2/part-*.parquet)
    bumps only the INNERMOST dir's mtime — the depth-1 digest was blind
    to it (round-9 ADVICE fix: dirs are statted at every depth)."""
    import os
    import time

    from dbcut_spark.catalog_cache import source_digest

    src = tmp_path / "src"
    inner = src / "t.parquet" / "a=1" / "b=2"
    inner.mkdir(parents=True)
    (inner / "part-0.parquet").write_bytes(b"x")
    d1 = source_digest(str(src))
    time.sleep(0.02)
    (inner / "part-1.parquet").write_bytes(b"y")
    os.utime(inner)  # only the innermost dir moves
    d2 = source_digest(str(src))
    assert d1 != d2
    # a NEW deep partition dir also registers
    time.sleep(0.02)
    deeper = src / "t.parquet" / "a=1" / "b=3"
    deeper.mkdir()
    (deeper / "part-0.parquet").write_bytes(b"z")
    assert source_digest(str(src)) != d2


def test_digest_sees_inplace_nested_overwrite(tmp_path):
    """An in-place overwrite of a NESTED data file under an existing
    name bumps no directory mtime — leaf files are now statted at
    every depth, so the digest must still change (round-9 ADVICE
    fix)."""
    import os
    import time

    from dbcut_spark.catalog_cache import source_digest

    src = tmp_path / "src"
    inner = src / "t.parquet" / "a=1" / "b=2"
    inner.mkdir(parents=True)
    part = inner / "part-0.parquet"
    part.write_bytes(b"xx")
    d1 = source_digest(str(src))
    time.sleep(0.02)
    # same name, same size, new mtime (content rewritten in place);
    # freeze every DIRECTORY mtime to prove no dir stat can save us
    dir_times = {
        p: os.stat(p).st_mtime_ns
        for p in [src / "t.parquet", src / "t.parquet" / "a=1", inner]
    }
    part.write_bytes(b"yy")
    for p, t_ns in dir_times.items():
        os.utime(p, ns=(t_ns, t_ns))
    assert source_digest(str(src)) != d1


def test_infer_catalog_ambiguous_pk_names_infer_no_fks(spark, tmp_path):
    """Two tables both keyed 'id' must infer NO foreign keys: the old
    single-owner dict picked an arbitrary winner and fabricated an FK
    from every other table's own PK into it, joining unrelated id
    spaces (round-10 review)."""
    from dbcut_spark.catalog import infer_catalog

    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        str(tmp_path / "alpha.parquet")
    )
    spark.createDataFrame([(1, "b")], "id long, w string").write.parquet(
        str(tmp_path / "beta.parquet")
    )
    spark.createDataFrame(
        [(1, 1, 1)], "pair_id long, alpha_id long, beta_id long"
    ).write.parquet(str(tmp_path / "pair.parquet"))
    cat = infer_catalog(spark, str(tmp_path))
    # 'id' is ambiguous -> no edges from it; unique PK names still infer
    assert all("id" not in fk.child_cols or fk.child_cols[0] != "id"
               for fk in cat.fks)
    assert not any(
        fk.child_cols == ("id",) for fk in cat.fks
    ), cat.fks


def test_detect_catalog_extras_fall_through_and_copy(spark, tmp_path):
    """A dir with the five probe tables PLUS an unknown table must not
    get the static harness catalog (the extra table would be invisible
    to every command); and the harness catalog comes back as a COPY,
    not the shared module singleton (round-10 review)."""
    from dbcut_spark.catalog import TPCH_CATALOG, detect_catalog

    for t_ in ("region", "nation", "customer", "orders", "lineitem"):
        spark.createDataFrame([(1,)], "id long").write.parquet(
            str(tmp_path / f"{t_}.parquet")
        )
    spark.createDataFrame([(1,)], "ps_id long").write.parquet(
        str(tmp_path / "partsupp_extra.parquet")
    )
    cat = detect_catalog(spark, str(tmp_path))
    assert "partsupp_extra" in cat.tables  # inferred, nothing dropped

    # exact harness subset -> curated catalog, as a fresh copy
    import shutil

    shutil.rmtree(tmp_path / "partsupp_extra.parquet")
    cat2 = detect_catalog(spark, str(tmp_path))
    assert set(cat2.tables) == set(TPCH_CATALOG.tables)
    assert cat2 is not TPCH_CATALOG
    cat2.fks.append("sentinel")
    assert "sentinel" not in TPCH_CATALOG.fks


def test_estimate_row_count_recurses_partitioned_layout(spark, tmp_path):
    """Hive-partitioned tables counted 0 under the depth-1 listing —
    and rows(T)=0 is the closure's cheapest broadcastability proof, so
    a huge partitioned table got force-broadcast (round-10 review)."""
    from dbcut_spark.sources.parquet import estimate_row_count

    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, i % 3) for i in range(90)], "id long, p int"
    ).write.partitionBy("p").parquet(path)
    assert estimate_row_count(path) == 90


def test_load_config_queries_expanded_once(tmp_path, monkeypatch):
    """The CLI path env-expanded queries twice (load_config AND
    normalize_query), breaking the documented $$ escape and
    re-expanding '$' inside env-var VALUES (round-10 review)."""
    from dbcut_spark.config import load_config, normalize_query

    monkeypatch.setenv("WHO", "alice")
    monkeypatch.setenv("TEMPLATED", "${WHO}")
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(
        """
databases:
  source_uri: ${TEMPLATED}-dir
queries:
  - from: "customer"
    where: {name: "$$WHO"}
"""
    )
    cfg = load_config(str(cfg_path))
    # non-query config expands once: the env VALUE lands verbatim
    assert cfg["databases"]["source_uri"] == "${WHO}-dir"
    # queries reach normalize_query unexpanded; ONE expansion turns
    # the documented $$ escape into a literal dollar string
    spec = normalize_query(cfg["queries"][0], cfg)
    assert spec.where == {"name": "$WHO"}
