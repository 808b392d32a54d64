"""Record/replay table loaders (reference parity: the experimental
``Recorder`` snapshots every SQL interaction for offline test replay,
``/root/reference/dbcut/contrib/record.py:13-121`` — rows pickled per
statement hash. Spark-first form: snapshot each *table* a query run
loads as parquet under a named cassette directory, then replay runs
read only the cassette — no source database/files needed).

Cassette layout::

    <dir>/<name>/<table>.parquet
    <dir>/<name>/manifest.json      {"tables": [...], "source": "..."}
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class RecordingLoader:
    """Wrap a TableLoader; every table it serves is also written to the
    cassette (once — repeated loads reuse the snapshot, which also makes
    re-reads cheap)."""

    def __init__(self, inner, spark: SparkSession, cassette_dir: str, source_id: str = ""):
        self.inner = inner
        self.spark = spark
        self.dir = cassette_dir
        self.source_id = source_id
        os.makedirs(self.dir, exist_ok=True)
        m = self.manifest()
        # provenance guard: resuming a cassette recorded from a
        # DIFFERENT source would serve the old source's tables as if
        # they were the new one's AND rewrite the manifest's source
        # field, silently poisoning the cassette beyond detection —
        # the field exists precisely to catch this (round-10 review)
        prev = m.get("source")
        if m and prev != source_id:
            raise ValueError(
                f"cassette {cassette_dir!r} was recorded from source "
                f"{prev!r}, not {source_id!r}; use a fresh cassette "
                "directory per source"
            )
        self._recorded: set[str] = set(m.get("tables", []))

    def _path(self, table: str) -> str:
        return os.path.join(self.dir, f"{table}.parquet")

    def manifest(self) -> dict:
        mpath = os.path.join(self.dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)
        return {}

    def _write_manifest(self) -> None:
        # atomic tmp+rename: the manifest rewrites after every newly
        # recorded table, and a crash mid-flush would leave a truncated
        # file that bricks the whole cassette at the next construction
        mpath = os.path.join(self.dir, "manifest.json")
        tmp = f"{mpath}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"tables": sorted(self._recorded), "source": self.source_id},
                f,
                indent=1,
                sort_keys=True,
            )
        os.replace(tmp, mpath)

    def __call__(self, table: str) -> DataFrame:
        if table not in self._recorded:
            self.inner(table).write.mode("overwrite").parquet(self._path(table))
            self._recorded.add(table)
            self._write_manifest()
        return self.spark.read.parquet(self._path(table))


class ReplayLoader:
    """Serve tables exclusively from a cassette — the offline twin; a
    table the recording never touched raises, like the reference's
    replay of an unknown statement hash."""

    def __init__(self, spark: SparkSession, cassette_dir: str):
        self.spark = spark
        self.dir = cassette_dir
        mpath = os.path.join(cassette_dir, "manifest.json")
        try:
            with open(mpath) as f:
                self._tables = set(json.load(f).get("tables", []))
        except (OSError, ValueError):
            self._tables = set()

    def __call__(self, table: str) -> DataFrame:
        # membership comes from the MANIFEST, not bare file existence:
        # a crashed recording leaves a partially-committed parquet dir
        # for a table the manifest never acknowledged, and serving it
        # would silently return truncated data instead of the KeyError
        # this class promises (round-10 review)
        if table not in self._tables:
            raise KeyError(
                f"table {table!r} was not recorded in cassette {self.dir!r}"
            )
        return self.spark.read.parquet(os.path.join(self.dir, f"{table}.parquet"))
