"""Filesystem IO for index metadata and maintenance — local fast path +
Hadoop FileSystem for every other scheme.

The index DATA always moves through Spark/pyarrow readers and writers,
which are scheme-agnostic already. What used to be local-only was the
small control plane around them: the manifest read/write, the
colocation-unit directory listing, and merge_segments' directory swap.
This module routes those through `org.apache.hadoop.fs.FileSystem` (via
the session JVM) whenever the path has a non-local scheme, so an index
rooted at s3a://... / hdfs://... supports the full maintenance story —
appends, tiered merges AND full compaction — not just reads.

Scheme notes:
- "" and "file": direct os/open calls (no JVM round trip; also works
  with no active SparkSession — e.g. load_manifest from a bare driver).
- hdfs:// (and other real filesystems): FileSystem.rename is atomic —
  same guarantees as the posix path.
- s3a:// : rename is COPY+DELETE (not atomic, O(bytes)). The swap
  protocol stays crash-RECOVERABLE (the marker file names both
  directories and either is a complete index) but the swap window is
  longer; for high-traffic indexes prefer merge_tier (pure-append) or
  swap a pointer a level above.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def is_local(path: str) -> bool:
    return urlparse(path).scheme in ("", "file")


def local_path(path: str) -> str:
    """Strip a file: scheme down to an os path ('file:/x' / 'file:///x'
    → '/x'); plain paths pass through."""
    u = urlparse(path)
    if u.scheme == "file":
        return u.path
    return path


def _jfs(path: str, spark: SparkSession | None = None):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"non-local path {path!r} needs an active SparkSession for "
            "Hadoop FileSystem access")
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, jpath, jvm


def exists(path: str, spark: SparkSession | None = None) -> bool:
    if is_local(path):
        return os.path.exists(local_path(path))
    fs, p, _ = _jfs(path, spark)
    return bool(fs.exists(p))


def read_text(path: str, spark: SparkSession | None = None) -> str:
    if is_local(path):
        with open(local_path(path)) as f:
            return f.read()
    fs, p, jvm = _jfs(path, spark)
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream)).decode("utf-8")
    finally:
        stream.close()


def write_text(path: str, data: str, spark: SparkSession | None = None) -> None:
    """Plain (non-atomic) create-or-overwrite — marker files."""
    if is_local(path):
        with open(local_path(path), "w") as f:
            f.write(data)
        return
    fs, p, _ = _jfs(path, spark)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(path: str, data: str,
                      spark: SparkSession | None = None) -> None:
    """Write-then-rename overwrite. Atomic ONLY on the local branch
    (os.replace). The non-local branch must delete the destination
    before Hadoop's rename (which refuses to overwrite), so there is a
    crash window between delete and rename where the destination does
    not exist — and on s3a the rename itself is copy+delete. Do NOT use
    this for a commit point on non-local filesystems: use
    `write_text_new` with a fresh (versioned) name, whose destination
    only ever appears complete (index_build's manifest commit does
    exactly that)."""
    if is_local(path):
        lp = local_path(path)
        tmp = f"{lp}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, lp)
        return
    fs, p, _ = _jfs(path, spark)
    tmp = f"{path}.tmp"
    write_text(tmp, data, spark)
    _, tp, _ = _jfs(tmp, spark)
    fs.delete(p, False)
    if not fs.rename(tp, p):
        raise OSError(f"rename {tmp} -> {path} failed")


def write_text_new(path: str, data: str,
                   spark: SparkSession | None = None) -> None:
    """Commit a NEW object: write a temp sibling, rename onto the fresh
    destination name. Nothing is deleted first, so at every instant the
    destination either does not exist yet or is complete — the building
    block for versioned last-writer-wins commits (the manifest protocol).
    Atomic on posix/HDFS; on s3a the rename is a server-side copy of one
    small temp object and the destination appears atomically (S3 PUT/
    copy visibility is per-object atomic). Raises if `path` exists."""
    if exists(path, spark):
        raise FileExistsError(f"write_text_new: {path} already exists")
    if is_local(path):
        lp = local_path(path)
        tmp = f"{lp}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, lp)
        return
    tmp = f"{path}.tmp"
    write_text(tmp, data, spark)
    fs, p, _ = _jfs(path, spark)
    _, tp, _ = _jfs(tmp, spark)
    if not fs.rename(tp, p):
        raise OSError(f"rename {tmp} -> {path} failed")


def listdir(path: str, spark: SparkSession | None = None) -> list[str]:
    """Child names of a directory; [] when it doesn't exist."""
    if is_local(path):
        lp = local_path(path)
        return sorted(os.listdir(lp)) if os.path.isdir(lp) else []
    fs, p, _ = _jfs(path, spark)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def mkdirs(path: str, spark: SparkSession | None = None) -> None:
    if is_local(path):
        os.makedirs(local_path(path), exist_ok=True)
        return
    fs, p, _ = _jfs(path, spark)
    fs.mkdirs(p)


def delete(path: str, spark: SparkSession | None = None) -> None:
    """Recursive delete, ignore-missing."""
    if is_local(path):
        lp = local_path(path)
        if os.path.isdir(lp) and not os.path.islink(lp):
            shutil.rmtree(lp, ignore_errors=True)
        elif os.path.exists(lp):
            os.remove(lp)
        return
    fs, p, _ = _jfs(path, spark)
    fs.delete(p, True)


def du(path: str, spark: SparkSession | None = None) -> int:
    """Recursive byte size of a file/dir; 0 when missing. Local: one
    os.walk; remote: the namenode's getContentSummary (HDFS answers
    from metadata; object stores list — fine for the inspection
    call-sites, which run once per report, never per query)."""
    if is_local(path):
        lp = local_path(path)
        if os.path.isfile(lp):
            return os.path.getsize(lp)
        total = 0
        for root, _, files in os.walk(lp):
            for f in files:
                fp = os.path.join(root, f)
                if os.path.exists(fp):
                    total += os.path.getsize(fp)
        return total
    fs, p, _ = _jfs(path, spark)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def rename(src: str, dst: str, spark: SparkSession | None = None) -> None:
    """Directory/file move. Atomic on posix/HDFS; copy+delete on s3a."""
    if is_local(src) and is_local(dst):
        os.rename(local_path(src), local_path(dst))
        return
    fs, sp, _ = _jfs(src, spark)
    _, dp, _ = _jfs(dst, spark)
    if not fs.rename(sp, dp):
        raise OSError(f"rename {src} -> {dst} failed")


def list_files(path: str,
               spark: SparkSession | None = None) -> list[tuple[str, int]]:
    """Recursive (file_path, byte_size) under a directory, sorted; a
    plain file lists itself; [] when missing. Local: os.walk; remote:
    FileSystem.listFiles(recursive) — one namenode/listing call stream,
    no data movement."""
    if is_local(path):
        lp = local_path(path)
        if os.path.isfile(lp):
            return [(lp, os.path.getsize(lp))]
        out = []
        for root, _, files in os.walk(lp):
            for f in files:
                fp = os.path.join(root, f)
                if os.path.exists(fp):
                    out.append((fp, os.path.getsize(fp)))
        return sorted(out)
    fs, p, _ = _jfs(path, spark)
    if not fs.exists(p):
        return []
    it = fs.listFiles(p, True)
    out = []
    while it.hasNext():
        st = it.next()
        out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def copy_file(src: str, dst: str,
              spark: SparkSession | None = None) -> None:
    """Stream-copy ONE file across any scheme pair, creating parent
    dirs; overwrites an existing destination (callers decide staleness
    by size/hash first). Local→local: shutil; anything else:
    hadoop.fs.FileUtil.copy through the session JVM."""
    if is_local(src) and is_local(dst):
        ld = local_path(dst)
        os.makedirs(os.path.dirname(ld), exist_ok=True)
        shutil.copyfile(local_path(src), ld)
        return
    sfs, sp, jvm = _jfs(src, spark)
    dfs, dp, _ = _jfs(dst, spark)
    spark = spark or SparkSession.getActiveSession()
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    if not jvm.org.apache.hadoop.fs.FileUtil.copy(
            sfs, sp, dfs, dp, False, True, conf):
        raise OSError(f"copy {src} -> {dst} failed")
