"""Generation-committed parquet segments — the shared commit protocol for
incrementally-maintained indexes (fulltext postings, ANN buckets, IVF
clusters).

The reference maintains its Lucene/vector indexes incrementally: every
add_episode upserts into indexes created once by
build_indices_and_constraints (/root/reference/graphiti_core/utils/
maintenance/graph_data_operations.py:73-80); it never rebuilds them per
batch. The batch analog at 10^12-document scale is the Lucene segment /
Iceberg snapshot model:

- every write (the initial build, then each delta batch) lands as a new
  immutable GENERATION: ``{root}/{part}/gen=N/...`` for each data subdir
  (postings/docs/vectors/...), written with parquet ``append`` — a new gen
  never touches existing files;
- superseded rows (a re-crawled url replacing its older version) are not
  rewritten in place; the update appends TOMBSTONES ``(id, dead_gen)``
  and readers anti-join them (Lucene's deleted-docs bitmap);
- a generation becomes visible ONLY when its marker ``{root}/_commits/
  gen_N`` exists, and the marker is written LAST. Readers resolve
  ``committed = max N with a marker`` and filter every scan with
  ``gen <= committed`` — a partition filter, pruned at the parquet source.

Crash story: a writer that dies mid-update leaves gen dirs with no marker —
invisible to every reader (the index stays at its previous committed
snapshot), removed by the next writer via ``clean_uncommitted``. Readers
need no recovery path at all. Tombstone accumulation is bounded by
compaction (see the per-index ``compact_*`` functions), which rewrites the
live rows as a fresh gen-0 index and swaps it in under a journal marker.

Object-store portability: marker-last commits and clean_uncommitted work
unchanged on S3-class stores (atomic object PUT + strong list-after-write);
ONLY the compaction swap assumes POSIX rename — on an object store it
becomes a manifest-pointer flip with identical journal semantics (the
Iceberg snapshot-pointer model; full adaptation notes in README.md
"Index layer on object stores").
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

_GEN_RE = re.compile(r"^gen_(\d+)$")
_GEN_DIR_RE = re.compile(r"^gen=(\d+)$")


def _commits_dir(root: str) -> Path:
    return Path(root) / "_commits"


def committed_gen(root: str) -> int | None:
    """Highest generation with a commit marker, or None (no index)."""
    d = _commits_dir(root)
    if not d.exists():
        return None
    gens = [int(m.group(1)) for f in d.iterdir()
            if (m := _GEN_RE.match(f.name))]
    return max(gens) if gens else None


def commit_gen(root: str, gen: int) -> None:
    """Publish generation ``gen`` (atomic: a marker file either exists or
    doesn't — there is no partial state a reader can observe)."""
    d = _commits_dir(root)
    d.mkdir(parents=True, exist_ok=True)
    (d / f"gen_{gen}").touch()


def clean_uncommitted(root: str, parts: tuple[str, ...]) -> list[str]:
    """Remove gen=N data dirs with no commit marker (a prior writer died
    mid-update). Returns the removed dir paths. Safe to run any time: a
    marker is only ever written after ALL of its gen's data dirs are
    complete, so an unmarked gen dir is garbage by definition."""
    ok = committed_gen(root)
    removed = []
    for part in parts:
        base = Path(root) / part
        if not base.exists():
            continue
        for d in base.iterdir():
            m = _GEN_DIR_RE.match(d.name)
            if m and (ok is None or int(m.group(1)) > ok):
                shutil.rmtree(d, ignore_errors=True)
                removed.append(str(d))
    return removed


def has_gens(path: str) -> bool:
    """True if ``path`` holds at least one gen=N partition dir. An append
    of an empty DataFrame (or clean_uncommitted) can leave the dir with
    only a _SUCCESS marker — unreadable by schema inference, and logically
    empty anyway."""
    p = Path(path)
    return p.exists() and any(_GEN_DIR_RE.match(d.name) for d in p.iterdir())


def swap_marker(root: str) -> Path:
    return Path(root).parent / (Path(root).name + ".compact.SWAP")


def finish_swap(root: str) -> None:
    """Complete a (possibly interrupted) compaction swap. The journal
    marker is written only after the staging root is FULLY built and
    committed, so recovery is unconditional and idempotent: drop whatever
    remains of the old root, move staging in, clear the marker."""
    marker = swap_marker(root)
    if not marker.exists():
        return
    staging = Path(marker.read_text().strip())
    if staging.exists():
        if Path(root).exists():
            shutil.rmtree(root)
        staging.rename(root)
    marker.unlink()


def compact_swap(root: str, staging: str) -> None:
    """Journal-then-swap a fully-committed staging root over ``root``."""
    marker = swap_marker(root)
    tmp = marker.with_suffix(".tmp")
    tmp.write_text(staging)
    tmp.rename(marker)
    finish_swap(root)
