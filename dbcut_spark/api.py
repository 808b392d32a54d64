"""Programmatic façade — the library entry points a notebook / job
user calls instead of the CLI. Thin sugar over the same plan builder,
executor, and sinks the CLI uses (one code path, two front doors).

    from dbcut_spark.api import Engine

    eng = Engine("/data/sf0.1")                       # parquet source
    frames = eng.extract({"from": "customer", "limit": 100})
    eng.load(frames, "/data/target")                  # insert-ignore
    eng.load(frames, "jdbc:derby:/tmp/db;create=true")
    docs = eng.nested_json({"from": "customer", "limit": 5})
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dbcut_spark.catalog import TPCH_CATALOG, Catalog
from dbcut_spark.operators.closure import (
    ClosureExecutor,
    parquet_loader,
    parquet_table_rows,
)
from dbcut_spark.plans.extraction import ExtractionPlan, build_plan


class Engine:
    """One source database (parquet directory), its catalog, and the
    executor — the object a reference user's ``Database`` maps to."""

    def __init__(
        self,
        source: str,
        spark: SparkSession | None = None,
        catalog: Catalog | None = None,
        config: dict | None = None,
    ):
        if spark is None:
            from dbcut_spark.session import get_spark

            spark = get_spark("dbcut-spark-api")
        self.spark = spark
        self.source = source
        self.config = dict(config or {})
        if catalog is None:
            # automatic reflection cache, same path as the CLI (see
            # catalog_cache module docstring). config keys: "cache"
            # (dir), "no_cache" / "force_refresh" (booleans)
            from dbcut_spark.catalog import detect_catalog
            from dbcut_spark.catalog_cache import cached_catalog

            catalog = cached_catalog(
                source,
                self.config.get("cache", "~/.cache/dbcut_spark"),
                lambda: detect_catalog(spark, source),
                enabled=not self.config.get("no_cache", False),
                force_refresh=self.config.get("force_refresh", False),
            )
        self.catalog = catalog
        if source.startswith("jdbc:"):
            from dbcut_spark.sources.jdbc import jdbc_table_rows, source_loader

            # DatabaseMetaData-reflected catalog + partitioned JDBC
            # scans: the live-database source path, same executor;
            # statistics-store row estimates feed the same routing
            # channel parquet footers do (round-10 verdict ask #4)
            self.executor = ClosureExecutor(
                spark, source_loader(spark, source, self.catalog),
                table_rows=jdbc_table_rows(spark, source),
            )
        else:
            self.executor = ClosureExecutor(
                spark, parquet_loader(spark, source),
                table_rows=parquet_table_rows(source),
            )

    def plan(self, query: dict) -> ExtractionPlan:
        """YAML-shaped query dict → extraction plan (inspect
        ``.tree.render()`` before executing)."""
        return build_plan(self.catalog, dict(query), self.config)

    def estimate(self, query: dict, stats_fn=None):
        """Static scan-cost / frontier-routing preview of an extraction
        (plans/cost.py): footer-derived rows + bytes per scan and the
        predicted broadcast-vs-runtime routing per edge. Zero Spark
        jobs — call before :meth:`extract` on a big source to see what
        the closure would touch. Parquet sources price fully from
        footers; JDBC sources default ``stats_fn`` to the statistics-
        store row estimates (``sources.jdbc.jdbc_table_rows``, no exact
        counting in the zero-job preview) — routing stays row-based,
        scan bytes honestly read as unknown. Pass ``stats_fn`` to
        override."""
        from dbcut_spark.plans.cost import TableStats, estimate_plan

        if stats_fn is None and self.source.startswith("jdbc:"):
            from dbcut_spark.sources.jdbc import jdbc_table_rows

            rows_fn = jdbc_table_rows(
                self.spark, self.source, exact_fallback=False
            )

            def stats_fn(table: str):  # noqa: F811 - deliberate default
                n = rows_fn(table)
                return None if n is None else TableStats(n, 0, 0, {})

        return estimate_plan(self.plan(query), self.source, stats_fn=stats_fn)

    def extract(self, query: dict) -> dict[str, DataFrame]:
        """Referentially-consistent closure: {table: DataFrame}.

        The returned frames share persisted frontier intermediates —
        after materializing them (collect/count/write), call
        :meth:`release` so a long-lived session doesn't accumulate
        pinned storage; :meth:`load` and :meth:`sql_dump` release
        automatically."""
        return self.executor.execute(self.plan(query))

    def release(self) -> None:
        """Unpersist the frontier intermediates pinned by extractions
        (safe to call any time; frames stay valid, just lazily
        recomputed if re-used)."""
        from dbcut_spark.operators.pinning import release_pinned

        release_pinned()

    def load(
        self, frames: dict[str, DataFrame], destination: str
    ) -> dict[str, int]:
        """Insert-ignore every frame into a parquet directory or a
        ``jdbc:`` URL (parents first). Returns inserted counts."""
        from dbcut_spark.catalog import topo_order
        from dbcut_spark.sinks.insert_ignore import (
            insert_ignore_parquet,
            jdbc_insert_auto,
        )

        topo = {t: i for i, t in enumerate(topo_order(self.catalog))}
        out: dict[str, int] = {}
        jdbc = destination.startswith("jdbc:")
        if not jdbc:
            os.makedirs(destination, exist_ok=True)
        for table in sorted(frames, key=lambda t: topo.get(t, len(topo))):
            df = frames[table]
            pk = list(self.catalog.table(table).pk)
            if jdbc:
                out[table] = jdbc_insert_auto(
                    self.spark, df, destination, table, pk
                )
            else:
                out[table] = insert_ignore_parquet(
                    self.spark,
                    df,
                    os.path.join(destination, f"{table}.parquet"),
                    pk,
                )
        self.release()
        return out

    def upsert(
        self,
        frames: dict[str, DataFrame],
        destination: str,
        dialect: str = "ansi",
        schema_evolution: str = "strict",
    ) -> dict[str, tuple[int, int]]:
        """MERGE every frame into a parquet directory or ``jdbc:`` URL
        (parents first): rows replace same-PK rows or append. Returns
        {table: (updated, inserted)}. Parquet targets get the
        partition-pruned rewrite; JDBC targets the staged server-side
        MERGE (``dialect`` picks the upsert syntax).
        ``schema_evolution`` ("strict" | "add", parquet targets only)
        controls what an extra incoming column does: raise, or widen
        the target with NULL backfill."""
        from dbcut_spark.catalog import topo_order
        from dbcut_spark.sinks.insert_ignore import jdbc_upsert, upsert_parquet

        topo = {t: i for i, t in enumerate(topo_order(self.catalog))}
        jdbc = destination.startswith("jdbc:")
        if not jdbc:
            os.makedirs(destination, exist_ok=True)
        out: dict[str, tuple[int, int]] = {}
        for table in sorted(frames, key=lambda t: topo.get(t, len(topo))):
            pk = list(self.catalog.table(table).pk)
            if jdbc:
                out[table] = jdbc_upsert(
                    self.spark, frames[table], destination, table, pk, dialect
                )
            else:
                out[table] = upsert_parquet(
                    self.spark,
                    frames[table],
                    os.path.join(destination, f"{table}.parquet"),
                    pk,
                    schema_evolution=schema_evolution,
                )
        self.release()
        return out

    def delete_keys(
        self, keys: dict[str, DataFrame], destination: str
    ) -> dict[str, int]:
        """Row-level delete by PK from a parquet directory or ``jdbc:``
        URL — children FIRST (reverse topological), so FK-checked
        targets never see a dangling parent. Returns {table: deleted}."""
        from dbcut_spark.catalog import topo_order
        from dbcut_spark.sinks.insert_ignore import (
            delete_keys_parquet,
            jdbc_delete_keys,
        )

        order = {t: i for i, t in enumerate(reversed(topo_order(self.catalog)))}
        jdbc = destination.startswith("jdbc:")
        out: dict[str, int] = {}
        for table in sorted(keys, key=lambda t: order.get(t, len(order))):
            pk = list(self.catalog.table(table).pk)
            if jdbc:
                out[table] = jdbc_delete_keys(
                    self.spark, keys[table], destination, table, pk
                )
            else:
                out[table] = delete_keys_parquet(
                    self.spark,
                    keys[table],
                    os.path.join(destination, f"{table}.parquet"),
                    pk,
                )
        self.release()
        return out

    def compact(
        self,
        destination: str,
        target_file_mb: int = 128,
        min_frag_mb: float = 0.0,
    ) -> dict[str, dict]:
        """Small-files maintenance on a parquet destination previously
        written by :meth:`load`/:meth:`upsert`: every table rewrites to
        size-targeted files (partition layout preserved). With
        ``min_frag_mb`` tables whose average data file already meets
        the threshold are skipped ({"skipped": True} in their stats) —
        pay the rewrite only where `inspect` flags FRAG. Returns
        {table: stats}."""
        from dbcut_spark.catalog import topo_order
        from dbcut_spark.sinks.compact import compact_parquet

        out: dict[str, dict] = {}
        for table in topo_order(self.catalog):
            path = os.path.join(destination, f"{table}.parquet")
            if not os.path.exists(path):
                continue
            # the frag gate lives in compact_parquet (one
            # implementation, one tree walk)
            out[table] = compact_parquet(
                self.spark,
                path,
                target_file_mb=target_file_mb,
                min_frag_mb=min_frag_mb,
            )
        return out

    def sync(
        self,
        source: str,
        target_path: str,
        cursor_col: str,
        table: str | None = None,
        **opts,
    ) -> dict:
        """Incremental cursor sync into a manifest table
        (operators/sync.py): ``source`` is a parquet path or a
        ``jdbc:`` url (then ``table`` is required and the bound
        compiles into a server-side WHERE). Each call moves O(delta)
        rows and advances the committed high-water mark in the same
        atomic commit; see :func:`dbcut_spark.operators.sync.
        incremental_sync` for pk/boundary-tie semantics."""
        from dbcut_spark.operators.sync import (
            jdbc_incremental_sync,
            parquet_incremental_sync,
        )

        if source.startswith("jdbc:"):
            if not table:
                raise ValueError("table is required for a jdbc: source")
            return jdbc_incremental_sync(
                self.spark, source, table, target_path, cursor_col, **opts
            )
        if table:
            raise ValueError("table applies to jdbc: sources only")
        return parquet_incremental_sync(
            self.spark, source, target_path, cursor_col, **opts
        )

    def replicate(self, src_path: str, dst_path: str, **opts) -> dict:
        """Manifest→manifest incremental replication (pull only the
        files the source appended since the replica's consumed
        version); see :func:`dbcut_spark.operators.sync.
        replicate_manifest`."""
        from dbcut_spark.operators.sync import replicate_manifest

        return replicate_manifest(self.spark, src_path, dst_path, **opts)

    def manifest_delete(
        self, keys: DataFrame, table_path: str, **opts
    ) -> int:
        """Merge-on-read delete from a MANIFEST table: an O(keys)
        equality-delete tombstone commit, no data file rewritten (the
        per-catalog-table parquet twin is :meth:`delete_keys`); see
        :func:`dbcut_spark.sinks.manifest.delete_keys_snapshot`."""
        from dbcut_spark.sinks.manifest import delete_keys_snapshot

        return delete_keys_snapshot(self.spark, keys, table_path, **opts)

    def manifest_merge(
        self,
        delta: DataFrame,
        table_path: str,
        pk: list[str],
        op_col: str | None = None,
        **opts,
    ) -> int:
        """Merge-on-read MERGE of a CDC delta into a MANIFEST table:
        one O(delta) commit (staged rows + one tombstone); the
        copy-on-write manifest twin is upsert_snapshot, the
        per-catalog-table parquet twin is :meth:`upsert`. See
        :func:`dbcut_spark.sinks.manifest.merge_snapshot`."""
        from dbcut_spark.sinks.manifest import merge_snapshot

        return merge_snapshot(
            self.spark, delta, table_path, pk, op_col=op_col, **opts
        )

    def check(
        self, df: DataFrame, rules: list[dict], refs: dict | None = None
    ) -> DataFrame:
        """Data-quality expectations report (one row per rule); see
        :func:`dbcut_spark.operators.expect.check_constraints`."""
        from dbcut_spark.operators.expect import check_constraints

        return check_constraints(df, rules, refs=refs)

    def profile(self, df: DataFrame, **opts) -> DataFrame:
        """One-pass per-column profile; see
        :func:`dbcut_spark.operators.profile.table_profile`."""
        from dbcut_spark.operators.profile import table_profile

        return table_profile(df, **opts)

    def nested_json(self, query: dict) -> DataFrame:
        """One nested document per root row (reference dumpjson)."""
        from dbcut_spark.sinks.json_export import nested_documents

        plan = self.plan(query)
        _, frontiers = self.executor.execute_nodes(plan)
        return nested_documents(plan, frontiers)

    def sql_dump(self, query: dict, dialect: str = "sqlite"):
        """Yield CREATE TABLE + INSERT statements (reference dumpsql).
        Reflected server defaults from the catalog ride into the DDL
        (cross-dialect current-timestamp rewrite applied)."""
        from dbcut_spark.sinks.sqldump import (
            catalog_raw_defaults,
            dump_sql,
            topo_frames,
        )

        frames = topo_frames(self.catalog, self.extract(query))
        pks = {t: list(self.catalog.table(t).pk) for t in frames}
        defaults = catalog_raw_defaults(self.catalog, frames)
        try:
            yield from dump_sql(frames, pks, dialect, defaults=defaults)
        finally:
            # release even when the consumer stops early (islice, an
            # exception mid-dump) — otherwise the pinned frontier
            # intermediates leak for the life of the session
            self.release()
