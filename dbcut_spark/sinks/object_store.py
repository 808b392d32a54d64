"""In-memory S3-class object-store double for the manifest protocol
(round-10 verdict ask #3).

``sinks/manifest.py`` documents two mappings for its atomic commit:
POSIX hard-link create-if-absent (the default), and conditional PUT on
an object store. This module makes the second mapping EXECUTABLE: a
flat key→object store exposing exactly the primitives every real
object store has — list-by-prefix, GET, conditional create
(If-None-Match: *), conditional delete (If-Match: etag) — and
deliberately NOTHING POSIX-specific: no rename, no link, no fsync.
``manifest.set_manifest_store`` routes all manifest IO through it, so
the whole crash matrix runs against both backends in tests.

Weak-store fault injection (what the POSIX backend can never produce):

- :meth:`put_torn` plants a TRUNCATED object at a key — models a
  weak store whose writes are not atomic (a real conditional PUT is);
- :meth:`inject_torn_read` makes the next GET of a key return
  truncated bytes while the stored object stays valid — models a
  torn/partial read. This is the fault that drives the
  restore-the-stolen-winner recovery branch in
  ``manifest._publish_conditional_put``.

Concurrency: every method takes one lock, so each primitive is atomic
exactly like its real-store counterpart (objects change generation —
etag — on every write; conditional ops compare generations).
"""

from __future__ import annotations

import threading


class InMemoryObjectStore:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._objects: dict[str, tuple[bytes, str]] = {}
        self._gen = 0
        self._torn_next_read: dict[str, bytes] = {}
        # observability for tests
        self.ops: list[tuple] = []

    def _next_etag(self) -> str:
        self._gen += 1
        return f"g{self._gen}"

    def list(self, prefix: str) -> list[str]:
        """Keys under ``prefix`` (their basenames, like a delimiter
        listing)."""
        import os

        p = prefix.rstrip("/") + "/"
        with self._lock:
            self.ops.append(("list", prefix))
            return sorted(
                os.path.basename(k)
                for k in self._objects
                if k.startswith(p) and "/" not in k[len(p):]
            )

    def read(self, path: str) -> tuple[bytes, str] | None:
        """(data, etag) or None. A pending injected torn read returns
        truncated data ONCE with the real object's etag."""
        with self._lock:
            self.ops.append(("read", path))
            got = self._objects.get(path)
            if got is None:
                return None
            torn = self._torn_next_read.pop(path, None)
            if torn is not None:
                return (torn, got[1])
            return got

    def create_if_absent(self, path: str, data: bytes) -> None:
        """Conditional PUT (If-None-Match: *): atomic create, raises
        FileExistsError when the key exists — the loser sees the error,
        never a clobbered or torn object."""
        with self._lock:
            self.ops.append(("create_if_absent", path))
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = (data, self._next_etag())

    def delete_if_match(self, path: str, etag: str) -> bytes | None:
        """Conditional delete (If-Match): removes the object only if
        its generation still matches, returning the FULL stored bytes
        (the deleter learns exactly what it removed — the re-validation
        handle the torn-recovery protocol needs). None = precondition
        failed (changed or already gone): exactly one concurrent
        deleter of a generation wins."""
        with self._lock:
            self.ops.append(("delete_if_match", path, etag))
            got = self._objects.get(path)
            if got is None or got[1] != etag:
                return None
            del self._objects[path]
            return got[0]

    # -- weak-store fault injection (tests only) ------------------------

    def put_torn(self, path: str, data: bytes, keep: int) -> None:
        """Plant a truncated object: models a weak store whose write
        was not atomic. Overwrites any existing object at the key."""
        with self._lock:
            self._objects[path] = (data[:keep], self._next_etag())

    def inject_torn_read(self, path: str, keep: int) -> None:
        """Make the NEXT read of ``path`` return its first ``keep``
        bytes while the stored object stays intact."""
        with self._lock:
            data, _ = self._objects[path]
            self._torn_next_read[path] = data[:keep]

    def force_put(self, path: str, data: bytes) -> None:
        """Unconditional PUT (tests: simulate a foreign writer
        re-taking a slot)."""
        with self._lock:
            self._objects[path] = (data, self._next_etag())
