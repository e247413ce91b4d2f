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

ATOMICITY, by scheme (single-writer discipline is assumed throughout —
same as the reference's one-staging-run-per-entity model):

- ``file://`` (and schemeless local paths): ``rename`` maps to POSIX
  ``rename(2)`` which atomically overwrites — identical guarantees to the
  old ``os.replace``.
- ``hdfs://``: ``FileSystem.rename`` refuses to overwrite, so the flip is
  try-rename-first, and only on failure delete-dest-then-rename. A reader
  racing that fallback window can observe a missing pointer for an
  instant; ``ParquetTable`` already treats missing-pointer-with-committed-
  dirs as ``CorruptTablePointerError`` rather than silently serving an
  empty table, and the window only exists on stores without overwriting
  rename.
- ``s3a://``: rename is emulated copy+delete — NOT atomic. Single-writer
  publishes remain correct (the pointer content is a bare integer written
  whole), but concurrent readers may briefly see the old pointer or a
  missing one. Multi-writer or strict-reader deployments should graduate
  to Delta/Iceberg optimistic commit (SURVEY §7.3 hard part 3) — exactly
  the caveat those formats exist to solve.

Each call is one py4j round-trip; fine for control-plane files, never used
on the data path.
"""

from __future__ import annotations

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
        # Try the overwriting rename first (atomic on file://); fall back to
        # delete-then-rename where rename refuses an existing destination.
        if not self._fs.rename(tmp, dst):
            self._fs.delete(dst, False)
            if not self._fs.rename(tmp, dst):
                raise IOError(
                    f"could not publish pointer {path!r} (rename failed "
                    f"twice); tmp file left at {path + '.tmp'!r}"
                )

    # -- mutation -----------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, recursive)
