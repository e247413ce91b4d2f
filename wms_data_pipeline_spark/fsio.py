"""Scheme-aware control-plane file I/O via the Hadoop FileSystem API.

``ParquetTable`` / ``PartitionedMergeTable`` keep their commit record in a
tiny ``_VERSION`` pointer file next to the data. The DATA side
(``spark.read/write.parquet``) was always scheme-agnostic, but the pointer
was driver-local ``open()``/``os.replace`` — meaning the warehouse root had
to live on the driver's local disk. On a real cluster the control plane
must live on the same store as the data (``hdfs://``, ``s3a://``, ...), so
this module routes the pointer reads/writes/renames and the stale-dir
probes through ``org.apache.hadoop.fs.FileSystem`` — the same pattern as
``streaming.pipeline._require_neardup_index``. Any filesystem Spark can
read parquet from now also carries the table pointer.

ATOMICITY, by scheme (single-writer discipline is assumed for the default
``_VERSION`` rewrite protocol — same as the reference's
one-staging-run-per-entity model; ``ParquetTable(concurrent_writers=True)``
upgrades to create-exclusive commit markers, see below):

- ``file://`` (and schemeless local paths): ``rename`` maps to POSIX
  ``rename(2)`` which atomically overwrites — identical guarantees to the
  old ``os.replace``.
- ``hdfs://``: ``FileSystem.rename`` refuses to overwrite, so the flip is
  try-rename-first, and only on failure preserve-dest-as-``.old``-then-
  rename. A reader racing that fallback window observes the ``.old``
  pointer (the PREVIOUS committed version — stale but safe) via
  ``read_text_committed`` instead of a missing pointer; a crash inside the
  window likewise recovers to the previous version rather than losing the
  pointer outright (ADVICE r12).
- ``s3a://``: rename is emulated copy+delete — NOT atomic. Single-writer
  publishes remain correct (the pointer content is a bare integer written
  whole), but concurrent readers may briefly see the old pointer or a
  missing one (then the ``.old`` fallback). Multi-writer or strict-reader
  deployments should graduate to Delta/Iceberg optimistic commit (SURVEY
  §7.3 hard part 3) — exactly the caveat those formats exist to solve.

CREATE-EXCLUSIVE (``create_exclusive``), the optimistic-concurrency
primitive behind ``concurrent_writers=True`` commit markers:

- Dispatch is on the RESOLVED filesystem's scheme (``fs.getUri()``), not
  the raw path string: a schemeless root resolves through ``fs.defaultFS``
  exactly like every other TableFS op, so on a cluster with
  ``defaultFS=hdfs://`` a schemeless table takes the Hadoop leg rather
  than silently writing markers to the driver's local disk (ADVICE r13).
- ``file://``/local: driver-side ``O_CREAT|O_EXCL`` — kernel-atomic; two
  racing claimants get exactly one winner.
- ``hdfs://``: ``FileSystem.create(path, overwrite=false)`` — the
  existence check is namenode-side and atomic with the create.
- ``s3a://``: the same call is check-then-put — NOT conditional at the
  store, so two racers can both "win". Do not enable
  ``concurrent_writers`` on s3a; it remains single-writer-only pending a
  real table format.

Each call is one py4j round-trip; fine for control-plane files, never used
on the data path.
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import SparkSession


def join(base: str, *parts: str) -> str:
    """URI-safe path join: keeps the scheme/authority of ``base`` intact
    (``os.path.join`` would too on POSIX, but be explicit about it)."""
    out = base.rstrip("/")
    for p in parts:
        out = out + "/" + p.strip("/")
    return out


class TableFS:
    """Small-file I/O for one table root, on whatever filesystem the
    root's scheme resolves to (Hadoop ``Path.getFileSystem``)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._jvm = spark._jvm
        self._jpath_cls = self._jvm.org.apache.hadoop.fs.Path
        fs = self._jpath_cls(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # Local paths resolve to ChecksumFileSystem, which writes .crc
        # sidecars next to every pointer and then refuses to read a pointer
        # an operator hand-restored with `echo` (checksum mismatch — exactly
        # the recovery flow CorruptTablePointerError documents). Unwrap to
        # the raw filesystem for these byte-sized control files; HDFS/S3A
        # are not checksum-wrapped and pass through unchanged.
        try:
            fs = fs.getRawFileSystem()
        except Exception:
            pass
        self._fs = fs

    def _p(self, path: str):
        return self._jpath_cls(path)

    # -- probes -------------------------------------------------------------
    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def list_names(self, path: str) -> "list[str]":
        """Child entry basenames of a directory; [] if it doesn't exist."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    # -- small-file read/write ----------------------------------------------
    def read_text(self, path: str) -> "str | None":
        """Full contents of a small text file, or None if absent."""
        p = self._p(path)
        if not self._fs.exists(p):
            return None
        stream = self._fs.open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """Write-tmp-then-rename pointer flip (see module docstring for the
        per-scheme atomicity story)."""
        tmp = self._p(path + ".tmp")
        dst = self._p(path)
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # Try the overwriting rename first (atomic on file://). Where rename
        # refuses an existing destination (HDFS), PRESERVE the committed
        # pointer as .old before the second rename instead of deleting it:
        # a crash (or a racing reader) inside the window then finds the
        # previous committed version via read_text_committed rather than no
        # pointer at all (ADVICE r12 — delete-then-rename lost the pointer).
        if not self._fs.rename(tmp, dst):
            old = self._p(path + ".old")
            self._fs.delete(old, False)
            self._fs.rename(dst, old)
            if not self._fs.rename(tmp, dst):
                raise IOError(
                    f"could not publish pointer {path!r} (rename failed "
                    f"twice); tmp file left at {path + '.tmp'!r}, previous "
                    f"pointer preserved at {path + '.old'!r}"
                )

    def read_text_committed(self, path: str) -> "str | None":
        """``read_text`` with the crashed-flip fallback: when the pointer
        itself is missing, serve ``<path>.old`` — the PREVIOUS committed
        pointer preserved by ``write_text_atomic``'s non-overwriting-rename
        path. Stale-but-safe: the flip that crashed never committed, so the
        previous version IS the table's current state. (``<path>.tmp`` is
        never consulted — it holds the UNcommitted flip target.)"""
        got = self.read_text(path)
        if got is not None:
            return got
        return self.read_text(path + ".old")

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomically create ``path`` with ``text`` iff it does not already
        exist; returns False when another writer holds it. The optimistic-
        concurrency claim primitive — per-scheme atomicity in the module
        docstring (kernel O_EXCL locally, namenode-atomic on HDFS, NOT safe
        on s3a)."""
        # Dispatch on the RESOLVED filesystem's scheme, not on the raw path
        # string: a schemeless path resolves through fs.defaultFS (same as
        # every other TableFS op), so on a cluster with defaultFS=hdfs:// a
        # schemeless table root must take the Hadoop create(overwrite=false)
        # leg. urlparse-dispatch would write the marker to the DRIVER'S
        # local disk while _marker_versions lists HDFS — invisible markers,
        # every concurrent publisher "winning" the same version (ADVICE r13
        # high). Only a root that actually resolves to the local/raw-local
        # filesystem takes the kernel O_EXCL fast path.
        try:
            resolved_scheme = self._fs.getUri().getScheme()
        except Exception:
            resolved_scheme = None
        if resolved_scheme == "file":
            return self._create_exclusive_local(path, text)
        return self._create_exclusive_hadoop(path, text)

    def _create_exclusive_local(self, path: str, text: str) -> bool:
        parsed = urllib.parse.urlparse(path)
        local = parsed.path if parsed.scheme == "file" else path
        os.makedirs(os.path.dirname(local), exist_ok=True)
        try:
            fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, text.encode("utf-8"))
        finally:
            os.close(fd)
        return True

    def _create_exclusive_hadoop(self, path: str, text: str) -> bool:
        try:
            out = self._fs.create(self._p(path), False)
        except Exception:
            # Hadoop raises FileAlreadyExistsException (py4j-wrapped) when
            # overwrite=false loses the race; anything else resurfaces on
            # the next probe.
            if self.exists(path):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

    # -- mutation -----------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, recursive)
