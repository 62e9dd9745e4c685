"""Versioned-manifest index layout shared by the persisted TEXT and
IVF indexes — the Lucene segments_N / Iceberg-metadata pattern applied
to both search-index lifecycles.

An index directory holds IMMUTABLE child directories (postings/cell
segments, dfreq/stats/centroids metadata tables) plus ONE pointer
file, ``_CURRENT``: a JSON manifest naming exactly which children form
the live index. Every mutation (merge, compact) writes NEW children
and then atomically replaces the pointer — so a crash at ANY point
leaves either the old manifest (fully intact old index, plus orphan
directories nobody references) or the new one (fully intact new
index). Torn states are structurally impossible: there is no window
in which a reader can observe half-swapped partitions, and a crashed
merge needs no recovery beyond re-running it (the r7
``_MERGE_IN_PROGRESS`` marker + delete-then-rebuild protocol this
replaces existed only because per-directory rename sequences were not
atomic as a whole).

On an object store the ``os.replace`` pointer flip becomes a
conditional PUT of the manifest object — the same design carries over
unchanged, which is exactly why Iceberg/Delta/Lucene all converge on
it. Orphans are reclaimed by :func:`vacuum`, which only ever deletes
children the CURRENT manifest does not reference (called after a
compaction flip, never concurrently with a reader holding an older
manifest — production would add a retention grace period here).
"""

from __future__ import annotations

import json
import os
import uuid

#: the pointer file: the ONLY mutable name in an index directory
MANIFEST = "_CURRENT"


def new_dir_name(prefix: str) -> str:
    """Collision-free immutable child name (``seg-<hex>``)."""
    return f"{prefix}-{uuid.uuid4().hex[:12]}"


def has_index(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def read_manifest(path: str, expect_format: str) -> dict:
    """Resolve the live manifest; refuses a directory that is not a
    published index of the expected format (missing/foreign pointer),
    with the rebuild instruction in the message."""
    try:
        with open(os.path.join(path, MANIFEST)) as fh:
            m = json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"no {expect_format} at {path}: the {MANIFEST} pointer is "
            "missing — either nothing was ever published here or the "
            "directory is not an index; build one with the writer "
            "(write_text_index / write_ivf_index)"
        ) from None
    if m.get("format") != expect_format:
        raise ValueError(
            f"index at {path} is format {m.get('format')!r}, expected "
            f"{expect_format!r}"
        )
    return m


def write_manifest(path: str, manifest: dict) -> None:
    """Atomic pointer flip: write to a temp name in the SAME directory
    (os.replace is only atomic within a filesystem) and replace. This
    is the single commit point of every index mutation."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))


def referenced_children(manifest: dict) -> set[str]:
    """Every child directory name the manifest points at: the segments
    list, any string-valued table pointer (dfreq/stats/centroids), and
    any list-valued pointer group (tombstone segments)."""
    out: set[str] = set()
    for k, v in manifest.items():
        if k in ("format", "version"):
            continue
        if isinstance(v, str):
            out.add(v)
        elif isinstance(v, (list, tuple)):
            out.update(x for x in v if isinstance(x, str))
    return out


def vacuum(path: str, expect_format: str) -> list[str]:
    """Delete child directories the CURRENT manifest does not
    reference (crashed-merge orphans, superseded metadata tables,
    pre-compaction segments). Returns the deleted names. Safe against
    crashes (deleting an orphan twice is a no-op) but NOT against
    concurrent readers holding an older manifest — production inserts
    a retention grace period; callers here run it after compaction."""
    import shutil

    live = referenced_children(read_manifest(path, expect_format))
    deleted = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if name == MANIFEST or not os.path.isdir(full):
            continue
        if name not in live:
            shutil.rmtree(full, ignore_errors=True)
            deleted.append(name)
    return deleted
