"""Index snapshot / verify / restore — the Elasticsearch `_snapshot`
API reshaped for a manifest-committed index.

A snapshot is a consistent, verified copy of everything the manifest
has COMMITTED — never a directory walk of the live root, which can
contain fully-written-but-uncommitted segment dirs from a crashed
append (the same rule every reader follows,
index_query.py committed_* listing). Because committed files are
immutable (base groups are written once; segments and tombstone dirs
are append-only units; compaction swaps whole directories), a snapshot
taken from one manifest read is point-in-time consistent with no
coordination: concurrent appends commit segments the snapshot simply
does not include.

Layout: the destination mirrors the index's relative layout, so a
completed snapshot IS an openable index root — `IndexSearcher(dest)`
works directly, and "restore" is the same copy run in reverse. Next to
it, `SNAPSHOT.json` records every file's (relative path, size, sha256)
plus the manifest echo; the manifest itself is re-committed at the
destination through the same versioned atomic protocol the index uses
(`_write_manifest_atomic`), so a torn snapshot is never mistaken for a
complete one — `load_manifest(dest)` only sees a manifest once every
data file landed.

Verification is DISTRIBUTED: sha256 of every file rides one Spark job
over the `binaryFile` source (executor JVMs read + hash; nothing
streams through the driver), computed on the SOURCE files and
recomputed on the copies — a content check end to end, not a size
check. Incremental re-snapshots skip files already present at the
destination with identical size + recorded hash (segment immutability
makes size+existing-hash a sound skip test; the fresh hash job still
re-verifies everything it copied).

Scale notes: the per-file copy loop runs on the driver (Hadoop
FileUtil streams executor-free); at petabyte scale you'd fan the copy
itself out (distcp or a binaryFile write job) — the verification side
is already a distributed job, and the consistency/commit protocol here
is unchanged by who moves the bytes. `binaryFile` caps single files at
2 GB; the build writes many small parquet parts, far below it.
"""

from __future__ import annotations

import json
import time
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.config import IndexPaths
from data_text_search_spark.operators.index_build import (
    _write_manifest_atomic,
    committed_doc_stats_paths,
    committed_postings_dirs,
    committed_term_stats_paths,
    committed_tombstone_paths,
    load_manifest,
)
from data_text_search_spark.sources import fsio

SNAPSHOT_FILE = "SNAPSHOT.json"


def _norm(path: str) -> str:
    """Scheme-normalized form for path identity (binaryFile returns
    'file:/x' URIs for local '/x' inputs)."""
    u = urlparse(path)
    return u.path if u.scheme in ("", "file") else path


def _committed_dirs(root: str, manifest: dict) -> list[str]:
    paths = IndexPaths(root)
    dirs = (committed_postings_dirs(root, manifest)
            + committed_term_stats_paths(root, manifest)
            + committed_doc_stats_paths(root, manifest)
            + committed_tombstone_paths(root, manifest))
    # the tokenized checkpoint feeds search_after / facets / fuzzy-phrase:
    # base dir + committed segments' dirs only (uncommitted appends own
    # their dirs and must stay invisible — same rule as postings)
    dirs.append(paths.tokenized)
    dirs += [paths.tokenized_seg(s["segment"])
             for s in manifest.get("segments", [])]
    return dirs


def _committed_files(root: str, manifest: dict,
                     spark: SparkSession) -> list[tuple[str, int]]:
    """(relative_path, size) of every committed file, deduplicated.
    `.`-hidden sidecars (LocalFS `.crc` checksum files) are excluded:
    Hadoop regenerates them per filesystem, and a copied one that ever
    went stale would fail reads of a perfectly good copy."""
    nroot = _norm(root).rstrip("/")
    seen: dict[str, int] = {}
    for d in _committed_dirs(root, manifest):
        for fp, size in fsio.list_files(d, spark):
            rel = _norm(fp)
            if not rel.startswith(nroot + "/"):
                raise ValueError(f"committed file {fp} outside root {root}")
            rel = rel[len(nroot) + 1:]
            if rel.rsplit("/", 1)[-1].startswith("."):
                continue
            seen[rel] = size
    return sorted(seen.items())


def _hashable(rels) -> list[str]:
    """binaryFile skips `_`-prefixed files (_SUCCESS markers): those are
    copied and size-checked but not content-hashed (they carry no data)."""
    return [r for r in rels if not r.rsplit("/", 1)[-1].startswith("_")]


def _hash_files(spark: SparkSession, base: str,
                rels: list[str]) -> dict[str, str]:
    """rel → sha256 hex for the given files under `base`, one
    distributed binaryFile job (executors read + hash; driver receives
    only (path, digest) rows)."""
    if not rels:
        return {}
    nbase = _norm(base).rstrip("/")
    paths = [f"{base.rstrip('/')}/{r}" for r in rels]
    rows = (spark.read.format("binaryFile").load(paths)
            .select("path", F.sha2(F.col("content"), 256).alias("h"))
            .collect())
    out = {}
    for r in rows:
        p = _norm(r["path"])
        if not p.startswith(nbase + "/"):
            raise ValueError(f"hash job returned foreign path {p}")
        out[p[len(nbase) + 1:]] = r["h"]
    missing = set(rels) - set(out)
    if missing:
        raise ValueError(f"hash job missed {sorted(missing)[:5]}")
    return out


def snapshot_index(spark: SparkSession, root: str, dest: str,
                   incremental: bool = True) -> dict:
    """Copy the committed index at `root` to `dest` and verify every
    byte (source-vs-copy sha256, distributed). `incremental=True` skips
    files already at `dest` with identical size AND a matching hash
    recorded by a previous snapshot — re-snapshotting after appends
    copies only the new segments. Returns a report dict; raises on any
    hash mismatch (the broken copy is deleted so a later verify cannot
    mistake it for good data)."""
    t0 = time.perf_counter()
    manifest = load_manifest(root)
    if not manifest or not manifest.get("complete"):
        raise ValueError(f"no complete index at {root}")
    files = _committed_files(root, manifest, spark)
    prior: dict[str, list] = {}
    prior_doc = read_snapshot_info(dest, spark)
    if incremental and prior_doc:
        prior = {f["rel"]: f for f in prior_doc["files"]}

    hashable = _hashable([r for r, _ in files])
    src_hash = _hash_files(spark, root, hashable)
    to_copy = []
    for rel, size in files:
        p = prior.get(rel)
        if (p and p["size"] == size
                and p.get("sha256") == src_hash.get(rel)
                and fsio.exists(f"{dest.rstrip('/')}/{rel}", spark)):
            continue
        to_copy.append((rel, size))
    for rel, _ in to_copy:
        fsio.copy_file(f"{root.rstrip('/')}/{rel}",
                       f"{dest.rstrip('/')}/{rel}", spark)
    dst_hash = _hash_files(spark, dest, hashable)
    bad = [r for r in hashable if dst_hash[r] != src_hash[r]]
    if bad:
        for r in bad:
            fsio.delete(f"{dest.rstrip('/')}/{r}", spark)
        raise OSError(f"snapshot copy corrupted {len(bad)} file(s), "
                      f"removed: {bad[:5]}")

    info = {
        "source_root": root,
        "n_docs": manifest.get("n_docs"),
        "files": [{"rel": r, "size": s, "sha256": src_hash.get(r)}
                  for r, s in files],
        "manifest": manifest,
    }
    fsio.mkdirs(dest, spark)
    # SNAPSHOT.json is bookkeeping, not the commit point (a torn one
    # costs a full re-copy on the next incremental pass, never
    # correctness); the manifest below is the LAST write — the
    # snapshot's commit, through the index's own versioned protocol
    fsio.write_text_atomic(f"{dest.rstrip('/')}/{SNAPSHOT_FILE}",
                           json.dumps(info, sort_keys=True), spark)
    _write_manifest_atomic(IndexPaths(dest).manifest, manifest)
    return {"ok": True, "files": len(files), "copied": len(to_copy),
            "bytes": sum(s for _, s in files),
            "bytes_copied": sum(s for _, s in to_copy),
            "seconds": round(time.perf_counter() - t0, 3)}


def read_snapshot_info(dest: str,
                       spark: SparkSession | None = None) -> dict | None:
    p = f"{dest.rstrip('/')}/{SNAPSHOT_FILE}"
    if not fsio.exists(p, spark):
        return None
    return json.loads(fsio.read_text(p, spark))


def verify_snapshot(spark: SparkSession, dest: str) -> dict:
    """Re-verify a snapshot in place: every recorded file present with
    the recorded size AND sha256 (one distributed hash job), manifest
    loadable + complete. Returns {"ok", "files", "bad", "missing"} —
    never raises on corruption (this is the check you run BEFORE
    trusting a restore)."""
    info = read_snapshot_info(dest, spark)
    if info is None:
        return {"ok": False, "files": 0, "bad": [],
                "missing": [SNAPSHOT_FILE]}
    missing, to_hash, bad = [], [], []
    for f in info["files"]:
        p = f"{dest.rstrip('/')}/{f['rel']}"
        if not fsio.exists(p, spark):
            missing.append(f["rel"])
        elif f["sha256"] is None:  # _SUCCESS-style marker: size check
            if fsio.du(p, spark) != f["size"]:
                bad.append(f["rel"])
        else:
            to_hash.append(f)
    got = _hash_files(spark, dest, [f["rel"] for f in to_hash])
    bad += [f["rel"] for f in to_hash
            if got[f["rel"]] != f["sha256"]]
    m = load_manifest(dest)
    ok = (not missing and not bad and bool(m and m.get("complete")))
    return {"ok": ok, "files": len(info["files"]), "bad": bad,
            "missing": missing,
            "manifest_complete": bool(m and m.get("complete"))}


def restore_snapshot(spark: SparkSession, snap: str, target: str) -> dict:
    """Materialize a verified index at `target` from a snapshot — the
    same copy+hash protocol in reverse (a snapshot IS an index root, so
    restore exists for placing it somewhere writable/hot). Refuses a
    snapshot that fails verification."""
    rep = verify_snapshot(spark, snap)
    if not rep["ok"]:
        raise ValueError(f"snapshot at {snap} fails verification: {rep}")
    info = read_snapshot_info(snap, spark)
    for f in info["files"]:
        fsio.copy_file(f"{snap.rstrip('/')}/{f['rel']}",
                       f"{target.rstrip('/')}/{f['rel']}", spark)
    hashable = [f for f in info["files"] if f["sha256"] is not None]
    got = _hash_files(spark, target, [f["rel"] for f in hashable])
    bad = [f["rel"] for f in hashable if got[f["rel"]] != f["sha256"]]
    if bad:
        raise OSError(f"restore corrupted {len(bad)} file(s): {bad[:5]}")
    _write_manifest_atomic(IndexPaths(target).manifest, info["manifest"])
    return {"ok": True, "files": len(info["files"]),
            "bytes": sum(f["size"] for f in info["files"])}
