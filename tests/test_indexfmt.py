"""Unit tests (no Spark) for the shared manifest/segment index layout
— the commit-point primitives both persisted indexes stand on."""

from __future__ import annotations

import json
import os

import pytest

from ecommerce_realtime_pipeline_spark.operators import indexfmt


def _mk(path, manifest):
    os.makedirs(path, exist_ok=True)
    indexfmt.write_manifest(str(path), manifest)


def test_manifest_round_trip_and_atomic_tmp_cleanup(tmp_path):
    p = str(tmp_path / "idx")
    m = {
        "format": "text-index",
        "version": 3,
        "segments": ["seg-a", "seg-b"],
        "dfreq": "dfreq-x",
        "stats": "stats-y",
    }
    _mk(p, m)
    assert indexfmt.read_manifest(p, "text-index") == m
    # the tmp staging file never survives a successful flip
    assert [f for f in os.listdir(p) if f.startswith(indexfmt.MANIFEST)] == [
        indexfmt.MANIFEST
    ]
    assert indexfmt.has_index(p)


def test_read_manifest_missing_pointer_names_the_recovery(tmp_path):
    with pytest.raises(ValueError, match="pointer is missing"):
        indexfmt.read_manifest(str(tmp_path / "nope"), "text-index")
    assert not indexfmt.has_index(str(tmp_path / "nope"))


def test_read_manifest_refuses_foreign_format(tmp_path):
    """Opening an IVF index with the text reader (or vice versa) must
    fail on the format tag, not produce garbage reads."""
    p = str(tmp_path / "idx")
    _mk(p, {"format": "ivf-index", "version": 1, "segments": ["seg-a"]})
    with pytest.raises(ValueError, match="format 'ivf-index'"):
        indexfmt.read_manifest(p, "text-index")


def test_referenced_children_collects_segments_and_table_pointers():
    m = {
        "format": "text-index",
        "version": 7,
        "segments": ["seg-a", "seg-b"],
        "dfreq": "dfreq-x",
        "stats": "stats-y",
    }
    assert indexfmt.referenced_children(m) == {
        "seg-a",
        "seg-b",
        "dfreq-x",
        "stats-y",
    }


def test_vacuum_deletes_only_unreferenced_dirs(tmp_path):
    """Vacuum must delete orphan/superseded child DIRS, keep every
    referenced child, keep the pointer file, and ignore plain files
    (it never touches anything that is not a directory)."""
    p = str(tmp_path / "idx")
    _mk(
        p,
        {
            "format": "ivf-index",
            "version": 2,
            "segments": ["seg-live"],
            "centroids": "centroids-live",
        },
    )
    for d in ("seg-live", "centroids-live", "seg-orphan", "centroids-old"):
        os.makedirs(os.path.join(p, d))
        with open(os.path.join(p, d, "part-0.parquet"), "w") as fh:
            fh.write("x")
    with open(os.path.join(p, "stray-file"), "w") as fh:
        fh.write("not a dir")
    deleted = indexfmt.vacuum(p, "ivf-index")
    assert deleted == ["centroids-old", "seg-orphan"]
    left = sorted(os.listdir(p))
    assert left == [
        indexfmt.MANIFEST,
        "centroids-live",
        "seg-live",
        "stray-file",
    ]
    # idempotent: a second vacuum deletes nothing
    assert indexfmt.vacuum(p, "ivf-index") == []


def test_write_manifest_flip_is_replace_not_append(tmp_path):
    """A second flip fully replaces the pointer contents (no partial
    JSON): simulate successive merges and check the last one wins."""
    p = str(tmp_path / "idx")
    _mk(p, {"format": "text-index", "version": 1, "segments": ["seg-a"]})
    _mk(
        p,
        {"format": "text-index", "version": 2, "segments": ["seg-a", "seg-b"]},
    )
    with open(os.path.join(p, indexfmt.MANIFEST)) as fh:
        on_disk = json.load(fh)
    assert on_disk["version"] == 2 and on_disk["segments"] == ["seg-a", "seg-b"]
