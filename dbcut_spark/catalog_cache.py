"""Automatic catalog/reflection cache (reference parity: dbcut pickles
reflected SQLAlchemy metadata per cache key and reuses it transparently
on the next run — ``/root/reference/dbcut/database.py:131-143`` loads
``metadata.cache`` when present, ``:207-209`` writes it after the first
reflection, keyed by a per-database cache directory).

Here the cached artifact is the engine-neutral :class:`Catalog` JSON
(tables, PKs, FKs, reflected defaults) keyed by (engine version, source
URI), with a cheap SOURCE DIGEST stored alongside for freshness:

- parquet-directory sources digest the top-level ``*.parquet`` entries'
  (name, mtime_ns) — a rewrite of any table bumps its directory mtime,
  so schema drift invalidates without opening a single footer;
- ``jdbc:`` sources have no cheap content digest (information_schema IS
  the thing we're avoiding), so like the reference the entry trusts the
  URI and is busted explicitly (``--force-refresh`` / :meth:`purge`).

Why it matters: reflection costs one footer read per table on parquet
and 3-5 catalog round-trips on a live database — per *process*. The
reference's users run the CLI repeatedly against the same source; this
makes every construction after the first metadata-free.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import dbcut_spark
from dbcut_spark.catalog import Catalog

_FORMAT = 2  # bump to orphan all existing entries on layout change

_SECRET_RE = re.compile(r"(?i)\b(password|pwd|secret|token)=([^&;]*)")


def _redact(source: str) -> str:
    return _SECRET_RE.sub(lambda m: f"{m.group(1)}=***", source)


def source_digest(source: str) -> str | None:
    """Freshness fingerprint for a source, or None when no cheap one
    exists (then the cache is URI-trusted, reference behavior).

    Depth: the top-level <table>.parquet entries PLUS, for directory
    tables, every nested directory AND leaf file down to the deepest
    partition level, each as (path, mtime_ns, size). Leaf files used
    to be statted at depth 1 only, on the assumption that writers
    always create new part-file names — but nothing enforces that, and
    an in-place overwrite of a nested data file under an existing name
    bumps no directory mtime, so the digest served a stale catalog
    (round-9 ADVICE fix: the digest is now exact for any content
    change that moves a file's mtime or size, at any depth). Cost is
    one scandir stat per directory entry — the DirEntry stat is served
    from the readdir batch on the common platforms. The walk is
    BOUNDED (``_DIGEST_MAX_ENTRIES``, env-overridable): every cache
    load pays it, so on a millions-of-part-files source an exact
    digest would cost more metadata I/O than the reflection it caches;
    past the bound the digest degrades to the truncated prefix (still
    change-sensitive for everything it statted) and such sources
    should be fronted by a real metastore (round-10 review)."""
    if source.startswith("jdbc:"):
        return None

    max_entries = int(
        os.environ.get("DBCUT_SPARK_DIGEST_MAX_ENTRIES", "100000")
    )

    def walk(root: str, rel: str, out: list) -> None:
        for c in sorted(os.scandir(root), key=lambda x: x.name):
            if len(out) >= max_entries:
                out.append(("__truncated__", 0, 0))
                return
            st = c.stat(follow_symlinks=False)
            out.append((f"{rel}/{c.name}", st.st_mtime_ns, st.st_size))
            if c.is_dir(follow_symlinks=False):
                walk(c.path, f"{rel}/{c.name}", out)

    try:
        entries = []
        for e in sorted(
            os.scandir(source), key=lambda x: x.name
        ):
            if not e.name.endswith(".parquet"):
                continue
            st = e.stat(follow_symlinks=False)
            entries.append((e.name, st.st_mtime_ns, st.st_size))
            if e.is_dir():
                walk(e.path, e.name, entries)
    except OSError:
        return None
    if not entries:
        return None
    blob = json.dumps(entries).encode()
    return hashlib.sha1(blob).hexdigest()


class CatalogCache:
    """One JSON file per (format, engine version, source URI) under
    ``<cache_dir>/catalog/``."""

    def __init__(self, cache_dir: str):
        self.dir = os.path.join(os.path.expanduser(cache_dir), "catalog")

    def _path(self, source: str) -> str:
        key = hashlib.sha1(
            f"{_FORMAT}\x00{dbcut_spark.__version__}\x00{source}".encode()
        ).hexdigest()
        return os.path.join(self.dir, f"{key}.json")

    def load(self, source: str) -> Catalog | None:
        """The cached catalog, or None on miss/staleness. A stale or
        corrupt entry reads as a miss — the caller re-reflects and
        overwrites."""
        path = self._path(source)
        try:
            with open(path) as f:
                entry = json.load(f)
        except (OSError, ValueError):
            return None
        if entry.get("digest") != source_digest(source):
            return None
        try:
            return Catalog.from_json(json.dumps(entry["catalog"]))
        except (KeyError, TypeError, ValueError):
            return None

    def save(
        self, source: str, catalog: Catalog, digest: str | None = None
    ) -> str:
        """Write-through after a real reflection. Atomic (tmp+rename)
        so a concurrent reader never sees a torn entry. Pass the
        ``digest`` computed BEFORE reflection ran: fingerprinting after
        the fact would stamp a post-rewrite digest onto a pre-rewrite
        catalog if the source changed mid-reflection, making the
        staleness check permanently blind to that change (round-8
        review fix) — a pre-reflection digest makes a concurrent
        rewrite read as stale on the next load instead."""
        os.makedirs(self.dir, exist_ok=True)
        path = self._path(source)
        entry = {
            "version": dbcut_spark.__version__,
            # debugging breadcrumb only (load() keys by path, not this
            # field) — redact credentials a jdbc: URL may embed so they
            # never land in a plaintext cache file
            "source": _redact(source),
            "digest": digest if digest is not None else source_digest(source),
            "catalog": json.loads(catalog.to_json()),
        }
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return path

    def purge(self, source: str | None = None) -> None:
        import shutil

        if source is None:
            if os.path.isdir(self.dir):
                shutil.rmtree(self.dir)
            return
        try:
            os.remove(self._path(source))
        except OSError:
            pass


def cached_catalog(
    source: str,
    cache_dir: str,
    reflect,
    *,
    enabled: bool = True,
    force_refresh: bool = False,
) -> Catalog:
    """The one code path both front doors (CLI ``Ctx`` and ``Engine``)
    use: serve the cached catalog when fresh, else call ``reflect()``
    (a zero-arg callable returning a Catalog) and write through.
    ``enabled=False`` bypasses entirely (--no-cache); ``force_refresh``
    re-reflects and overwrites (--force-refresh). Deliberately takes no
    SparkSession: on a hit, no session (and no source I/O beyond the
    digest stat) is needed — reflect() captures whatever it needs."""
    cache = CatalogCache(cache_dir)
    if enabled and not force_refresh:
        hit = cache.load(source)
        if hit is not None:
            return hit
    # fingerprint BEFORE reflecting (see CatalogCache.save)
    digest = source_digest(source)
    catalog = reflect()
    if enabled:
        cache.save(source, catalog, digest=digest)
    return catalog
