"""Unit tests for tools/rotate_window.py — the generator of the
driver's 50-query verification window (round-8 verdict task 7). The
ordering rules are load-bearing (a mis-rotation leaves stale driver
evidence), so they get direct coverage: evidence folding takes the
LATEST round per query, the window layout puts closers last and
warmers before their in-window dependents."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(os.path.dirname(__file__), "..", "tools", "rotate_window.py"),
)
rotate_window = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(rotate_window)


def test_fold_evidence_takes_latest_round_and_flags_red(tmp_path, monkeypatch):
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": green, "b": green}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"a": red, "c": green}))
    monkeypatch.setattr(rotate_window, "REPO", str(tmp_path))
    ev = rotate_window.fold_evidence()
    assert ev["a"] == (2, False)  # latest verdict wins, red recorded
    assert ev["b"] == (1, True)
    assert ev["c"] == (2, True)


def test_order_window_moves_closers_last_and_warmers_first():
    names = [
        "streaming_windowed_kpi",
        "emb_knn_ivfpq",          # dependent, listed before its warmer
        "pipeline_end_to_end",
        "emb_knn_ivf",            # warmer
        "monitoring_stats",
        "docs_bm25_search",
    ]
    out = rotate_window.order_window(names)
    # closers at the very end, original relative order preserved
    assert out[-3:] == [
        "streaming_windowed_kpi",
        "pipeline_end_to_end",
        "monitoring_stats",
    ]
    # the warmer now precedes its dependent
    assert out.index("emb_knn_ivf") < out.index("emb_knn_ivfpq")
    assert sorted(out) == sorted(names)  # nothing lost or duplicated


def test_order_window_without_warmer_is_stable():
    names = ["q1", "q2", "streaming_x", "q3"]
    assert rotate_window.order_window(names) == ["q1", "q2", "q3", "streaming_x"]


def test_registry_matches_live_entrypoint():
    """The tool's registry view must cover the live queries() dict
    exactly — a drift here would rotate phantom names."""
    sys.path.insert(0, rotate_window.REPO)
    import __spark_entry__ as entry

    reg = rotate_window.registry()
    assert set(reg) == set(entry.queries())
    # rendered references use the entrypoint's own module aliases
    assert all("." in ref for ref in reg.values())
