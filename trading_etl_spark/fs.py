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


def try_acquire_marker(spark: SparkSession, path: str) -> bool:
    """Atomically create an empty marker file; ``False`` if one exists.

    The primitive behind the W1 single-writer lock (io.writer_lock):
    ``FileSystem.create(path, overwrite=false)`` is atomic on HDFS (the
    namenode serializes creates) and rejected-on-existing through the
    local ``ChecksumFileSystem`` — exactly-one of N concurrent callers
    wins. On S3A a create is HEAD-then-PUT and NOT atomic; single-writer
    coordination on an object store needs an external lock service or an
    ACID table format (Delta/Iceberg) instead — same caveat as the
    compaction swap (plans/maintenance.py).
    """
    fs, hpath = _fs_and_path(spark, path)
    try:
        fs.create(hpath, False).close()
        return True
    except Exception:
        return False
