"""Filesystem operations through the Hadoop ``FileSystem`` API.

The write path (W1 idempotent appends, retention, compaction) must not
assume a POSIX local filesystem: at 100 TB the tables live on HDFS / S3 /
GCS, where ``os.path`` / ``shutil`` silently operate on the wrong world.
Every path-level operation therefore goes through the JVM's
``org.apache.hadoop.fs.FileSystem`` resolved FOR THAT PATH's scheme —
``file:/``, ``hdfs://`` and ``s3a://`` all behave identically from here.

Used by io.first_wins_append (existence probe) and plans/maintenance.py
(partition listing / retention delete / compaction swap).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath)) and bool(fs.getFileStatus(hpath).isDirectory())


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names (final path component) under ``path``."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def file_sizes(spark: SparkSession, path: str, suffix: str = ".parquet") -> dict[str, int]:
    """{name: bytes} for plain files under ``path`` matching ``suffix``."""
    fs, hpath = _fs_and_path(spark, path)
    return {
        st.getPath().getName(): st.getLen()
        for st in fs.listStatus(hpath)
        if st.isFile() and st.getPath().getName().endswith(suffix)
    }


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, hsrc = _fs_and_path(spark, src)
    jvm = spark._jvm
    return bool(fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst)))


# Filesystem schemes whose ``create(path, overwrite=false)`` is a
# HEAD-then-PUT (or equivalent) and therefore NOT an atomic
# exactly-one-winner primitive. HDFS (namenode-serialized) and file:/
# (ChecksumFileSystem O_EXCL) are atomic; object stores are not. abfs(s)
# with the hierarchical-namespace gen2 endpoint IS atomic, but the client
# can't tell HNS from flat from the URI alone, so it's listed — opt out
# explicitly if your account is HNS.
NON_ATOMIC_CREATE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "cos", "swift"}
)


def path_scheme(path: str) -> str:
    """URI scheme of ``path`` ('' for scheme-less local paths)."""
    head, sep, _ = path.partition("://")
    return head.lower() if sep else ""


def has_atomic_create(path: str) -> bool:
    """Whether ``create(overwrite=false)`` on this path is exactly-one-wins."""
    return path_scheme(path) not in NON_ATOMIC_CREATE_SCHEMES


def try_acquire_marker(spark: SparkSession, path: str) -> bool:
    """Atomically create an empty marker file; ``False`` iff one exists.

    The primitive behind the W1 single-writer lock (io.writer_lock):
    ``FileSystem.create(path, overwrite=false)`` is atomic on HDFS (the
    namenode serializes creates) and rejected-on-existing through the
    local ``ChecksumFileSystem`` — exactly-one of N concurrent callers
    wins. On S3A a create is HEAD-then-PUT and NOT atomic; callers that
    need the exactly-one guarantee must check :func:`has_atomic_create`
    first (io.writer_lock hard-fails on object-store schemes) — same
    caveat as the compaction swap (plans/maintenance.py).

    Only the already-exists rejection maps to ``False``; any other failure
    (transient IO, permissions) propagates so a real error is never
    reported as "lock held" (ADVICE r5).
    """
    fs, hpath = _fs_and_path(spark, path)
    try:
        fs.create(hpath, False).close()
        return True
    except Exception as e:  # Py4JJavaError wrapping the JVM exception
        java_exc = getattr(e, "java_exception", None)
        name = java_exc.getClass().getName() if java_exc is not None else type(e).__name__
        # Classify on the exception CLASS and its DIRECT message only —
        # str(e) on a Py4JJavaError renders the whole Java stack trace and
        # cause chain, where "already exists" about some unrelated path
        # would misreport a real IO error as "lock held".
        msg = java_exc.getMessage() if java_exc is not None else str(e)
        msg = (msg or "").lower()
        # Hadoop ≥2.x local/HDFS raise o.a.h.fs.FileAlreadyExistsException;
        # some FS impls raise plain IOException("... already exists").
        if "FileAlreadyExistsException" in name or "already exists" in msg:
            return False
        raise
