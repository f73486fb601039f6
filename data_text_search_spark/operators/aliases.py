"""Index aliases + rollover: the ES alias/ILM ops layer over roots.

A 100-TB deployment never queries physical index roots directly: a
named ALIAS decouples readers from layout so generations can roll,
merge, or rebuild behind a stable name. This module is that layer for
this engine's roots, composed from pieces that already exist:

- an alias resolves to ONE root (plain `IndexSearcher`) or MANY
  (`FederatedSearcher` — exact global statistics, so a multi-member
  alias scores identically to one combined index; federation.py),
- the registry (`aliases.json`) commits through the index manifests'
  versioned protocol (fresh `.v<seq>` object per commit, readers take
  the highest, GC after — no instant without a complete registry on
  ANY filesystem; index_build.py's manifest rationale) hardened with a
  CAS on the version number (create-only write of seq+1; a lost race
  re-applies the mutation on the winner's state), so alias re-points
  are atomic AND concurrent ops on different aliases compose — a
  reader sees the old membership or the new, never a torn list, and a
  slower writer can never silently erase a faster one's change,
- ES-style rollover for batch-built generations: `needs_rollover`
  checks the current write member's committed manifest (docs /
  segment count — no data scan), `rollover` atomically appends an
  already-built new generation and marks it the write index. The
  engine's generations are built from ingest batches (build_index /
  append_segment), so rollover TARGETS an existing root rather than
  creating an empty index — the honest analog for a batch pipeline.

Reference scope anchor: the reference app manages a single in-memory
corpus per session (search_funcs.py); aliases/rollover belong to the
beyond-reference deployment surface, like federation and routing.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from data_text_search_spark.operators.index_build import (
    _manifest_versions,
    load_manifest,
)
from data_text_search_spark.sources import fsio

REGISTRY = "aliases.json"


class AliasCatalog:
    """Named pointers from alias → index roots, with atomic updates."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._path = f"{root}/{REGISTRY}"

    # ---- registry IO (versioned, CAS on the version number) -----------

    def _load_versioned(self) -> tuple[dict, int]:
        """(registry, seq of the version read; 0 = empty). Retries the
        documented concurrent-GC race on ANY read error — non-local
        filesystems surface it as Py4J/Java IO errors, not
        FileNotFoundError — re-raising only when the object still
        exists (a real fault), mirroring load_manifest."""
        for _ in range(8):
            versions = _manifest_versions(self._path, self.spark)
            if not versions:
                return {}, 0
            seq, vpath = versions[-1]
            try:
                return (json.loads(fsio.read_text(vpath, self.spark)),
                        seq)
            except Exception:
                if fsio.exists(vpath, self.spark):
                    raise
                continue  # GC'd under us — a newer version exists
        raise RuntimeError(
            f"alias registry at {self._path}: latest version vanished on "
            "8 consecutive reads — concurrent commit storm or filesystem "
            "fault")

    def _load(self) -> dict:
        return self._load_versioned()[0]

    def _mutate(self, fn) -> None:
        """Read-modify-write with a CAS on the version number: `fn`
        transforms a registry snapshot; the commit targets seq+1 via a
        CREATE-ONLY write, so two concurrent ops on DIFFERENT aliases
        can never silently erase each other (the round-5 protocol was
        whole-file last-writer-wins: the slower writer took a fresh seq
        and dropped the faster one's change). A lost CAS re-reads and
        re-applies `fn` on the fresh state; `fn`'s own validation
        errors (duplicate create, missing alias) propagate unchanged."""
        fsio.mkdirs(self.root, self.spark)
        for _ in range(8):
            reg, seq = self._load_versioned()
            new = fn(dict(reg))
            try:
                fsio.write_text_new(
                    f"{self._path}.v{seq + 1:016d}",
                    json.dumps(new, indent=1, sort_keys=True), self.spark)
            except FileExistsError:
                continue  # lost the race — retry on the winner's state
            # post-commit GC (best-effort, like _write_manifest_atomic)
            # — only versions we SUPERSEDED: a concurrent committer may
            # already have landed seq+2, which must survive
            for old_seq, old in _manifest_versions(self._path, self.spark):
                if old_seq <= seq:
                    try:
                        fsio.delete(old, self.spark)
                    except Exception:
                        pass
            return
        raise RuntimeError(
            f"alias registry at {self._path}: lost 8 consecutive CAS "
            "commits — unreasonable write contention")

    # ---- alias CRUD ----------------------------------------------------

    def list_aliases(self) -> dict:
        """{alias: {"indexes": [...], "write": root}} snapshot."""
        return self._load()

    def create(self, name: str, roots: list[str],
               write: str | None = None) -> None:
        """Register a new alias. `write` names the rollover target
        (default: the last root). Refuses an existing name — re-point
        with update()/rollover() so intent is explicit."""
        if not roots:
            raise ValueError("an alias needs at least one index root")
        w = write or roots[-1]
        if w not in roots:
            raise ValueError(f"write index {w!r} is not a member")

        def _do(reg: dict) -> dict:
            if name in reg:
                raise ValueError(f"alias {name!r} already exists — use "
                                 "update() or rollover() to re-point it")
            reg[name] = {"indexes": list(roots), "write": w}
            return reg

        self._mutate(_do)

    def update(self, name: str, add: list[str] = (),
               remove: list[str] = (), write: str | None = None) -> None:
        """Atomic membership swap (ES _aliases actions semantics: one
        commit applies every action — a reader sees all or none)."""
        def _do(reg: dict) -> dict:
            if name not in reg:
                raise KeyError(f"no alias {name!r}")
            ent = reg[name]
            roots = [r for r in ent["indexes"] if r not in set(remove)]
            roots += [r for r in add if r not in roots]
            if not roots:
                raise ValueError(f"update would leave alias {name!r} "
                                 "empty — use delete()")
            w = write or ent["write"]
            if w not in roots:
                w = roots[-1]
            reg[name] = {"indexes": roots, "write": w}
            return reg

        self._mutate(_do)

    def delete(self, name: str) -> None:
        def _do(reg: dict) -> dict:
            if name not in reg:
                raise KeyError(f"no alias {name!r}")
            del reg[name]
            return reg

        self._mutate(_do)

    # ---- resolution -----------------------------------------------------

    def resolve(self, name: str) -> list[str]:
        reg = self._load()
        if name not in reg:
            raise KeyError(f"no alias {name!r}")
        return list(reg[name]["indexes"])

    def write_index(self, name: str) -> str:
        reg = self._load()
        if name not in reg:
            raise KeyError(f"no alias {name!r}")
        return reg[name]["write"]

    def open(self, name: str):
        """IndexSearcher for a single-member alias, FederatedSearcher
        (exact global stats) for a multi-member one."""
        from data_text_search_spark.operators.federation import (
            FederatedSearcher,
        )
        from data_text_search_spark.operators.index_query import (
            IndexSearcher,
        )
        roots = self.resolve(name)
        if len(roots) == 1:
            return IndexSearcher(self.spark, roots[0])
        return FederatedSearcher(self.spark, roots)

    # ---- rollover --------------------------------------------------------

    def needs_rollover(self, name: str, max_docs: int | None = None,
                       max_segments: int | None = None) -> bool:
        """ES rollover conditions against the WRITE member's committed
        manifest — counts only, never a data scan."""
        m = load_manifest(self.write_index(name))
        if not m or not m.get("complete"):
            raise ValueError(f"write index of {name!r} has no complete "
                             "manifest")
        if max_docs is not None and int(m.get("n_docs", 0)) >= max_docs:
            return True
        segs = m.get("segments") or []
        if max_segments is not None and len(segs) >= max_segments:
            return True
        return False

    def rollover(self, name: str, new_root: str,
                 max_docs: int | None = None,
                 max_segments: int | None = None,
                 force: bool = False) -> bool:
        """If a condition holds (or force), atomically append the
        already-built `new_root` generation and make it the write
        index. Returns whether the roll happened. The new root must be
        a complete index — rolling to a half-built generation would
        poison every reader of the alias."""
        if not (force or self.needs_rollover(name, max_docs,
                                             max_segments)):
            return False
        if not (load_manifest(new_root) or {}).get("complete"):
            raise ValueError(f"rollover target {new_root} has no "
                             "complete manifest — build it first")
        def _do(reg: dict) -> dict:
            ent = reg[name]
            roots = list(ent["indexes"])
            if new_root not in roots:
                roots.append(new_root)
            reg[name] = {"indexes": roots, "write": new_root}
            return reg

        self._mutate(_do)
        return True
