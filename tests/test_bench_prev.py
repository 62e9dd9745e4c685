"""bench.py's round-over-round mover defense must be
environment-independent (round-9 verdict task 2): with no env var,
the previous artifact defaults to the NEWEST serialized
BENCH_LOCAL_r*.json next to the script, so a driver-style invocation
still emits a populated prev_comparison."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


def test_default_prev_picks_highest_round(tmp_path):
    for r in (7, 10, 9):
        (tmp_path / f"BENCH_LOCAL_r{r:02d}.json").write_text("{}")
    (tmp_path / "BENCH_LOCAL_notaround.json").write_text("{}")
    got = bench._default_prev(str(tmp_path))
    assert got.endswith("BENCH_LOCAL_r10.json")


def test_default_prev_empty_dir_is_safe(tmp_path):
    assert bench._default_prev(str(tmp_path)) == ""


def test_default_prev_resolves_in_this_repo():
    # the repo carries serialized artifacts from earlier rounds, so a
    # no-env invocation MUST find one (the driver-style path is live)
    assert bench._default_prev() != ""


def test_movers_flags_both_directions_above_floor():
    cur = {"a": 2.0, "b": 0.2, "c": 1.0, "d": 0.4}
    prev = {"a": 0.6, "b": 0.05, "c": 0.9, "d": 1.0}
    flagged, cmp_, drift = bench._movers(cur, prev)
    assert drift is None           # < ENV_DRIFT_MIN_SHARED queries
    assert "a" in flagged          # 3.3x up, above floor
    assert "b" not in flagged      # 4x up but under the 0.5s floor
    assert "c" not in flagged      # 1.1x: not a mover
    assert "d" in flagged          # 2.5x DOWN, above floor
    assert cmp_["a"]["mover"] and cmp_["d"]["mover"]
    assert set(cmp_) == {"a", "b", "c", "d"}


def test_movers_environment_drift_adjustment():
    """The r13 environment-control (r12 judge task 1): a uniformly
    3x-slower host day must flag NOTHING (the median ratio IS the
    drift, adj_ratio ≈ 1 everywhere), while a query that regressed
    3x ON TOP of the drift is still flagged; and on a drift-free day
    the adjustment is a no-op."""
    prev = {f"q{i:02d}": 1.0 for i in range(12)}
    # uniform 3x day: every query 3.0s vs prev 1.0s
    cur = {n: 3.0 for n in prev}
    flagged, cmp_, drift = bench._movers(cur, prev)
    assert drift == 3.0 and flagged == []
    assert all(c["adj_ratio"] == 1.0 for c in cmp_.values())
    # same day, but q00 regressed 3x on top of the drift
    cur["q00"] = 9.0
    flagged, cmp_, drift = bench._movers(cur, prev)
    assert drift == 3.0 and flagged == ["q00"]
    assert cmp_["q00"]["adj_ratio"] == 3.0 and cmp_["q00"]["mover"]
    # drift-free day: raw == adjusted
    cur = {n: 1.0 for n in prev}
    cur["q01"] = 4.0
    flagged, cmp_, drift = bench._movers(cur, prev)
    assert drift == 1.0 and flagged == ["q01"]
    assert cmp_["q01"]["adj_ratio"] == cmp_["q01"]["ratio"] == 4.0


def test_attach_lifecycle_prev(tmp_path, monkeypatch):
    """Task-8 pin: the lifecycle block carries the PREVIOUS round's
    serve numbers + cur/prev ratios inside the current artifact, with
    the same-SF guard the query mover check applies."""
    import json

    prev = {
        "sf": bench._sf_from_dir(bench.SF_DIR),
        "stress": {
            "lifecycle": {
                "text": {
                    "base": {"serve_sec": 0.5},
                    "stress": {"serve_sec": 0.6},
                    "serve_ratio": 1.2,
                },
            }
        },
    }
    p = tmp_path / "BENCH_LOCAL_prev.json"
    p.write_text(json.dumps(prev))
    monkeypatch.setattr(bench, "PREV_PATH", str(p))
    lc = {
        "text": {
            "base": {"serve_sec": 1.0},
            "stress": {"serve_sec": 1.5},
            "serve_ratio": 1.5,
        }
    }
    bench._attach_lifecycle_prev(lc)
    got = lc["text"]["prev"]
    assert got["base"] == {"serve_sec": 0.5, "serve_vs_prev": 2.0}
    assert got["stress"] == {"serve_sec": 0.6, "serve_vs_prev": 2.5}
    assert got["serve_ratio"] == 1.2
    # cross-SF prev: refused, block untouched
    prev["sf"] = 999.0
    p.write_text(json.dumps(prev))
    lc2 = {"text": {"base": {"serve_sec": 1.0}}}
    bench._attach_lifecycle_prev(lc2)
    assert "prev" not in lc2["text"]


def test_close_round_picks_full_artifact_not_summary(tmp_path):
    """tools/close_round.py must select the FULL bench artifact (the
    line carrying "metric"), not the compact bench_summary line that
    bench.py prints last for the driver's 2000-char stdout tail."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "close_round_mod",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "close_round.py"
        ),
    )
    cr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cr)
    full = {"metric": "suite_median_wall_sec", "value": 1.0, "queries": {}}
    summary = {"bench_summary": True, "suite_sec": 1.0, "n": 0}
    stdout = "\n".join(["# noise", json.dumps(full), json.dumps(summary)])
    assert cr.pick_artifact(stdout) == json.dumps(full)
    assert cr.pick_artifact("no json here\n{not json}") is None
    assert cr.pick_artifact(json.dumps(summary)) is None  # summary alone


def test_summary_line_stays_under_driver_tail_at_250_queries():
    """The truncation-proof contract at registry growth (r11 verdict
    task 7): simulate a 250-query registry where EVERY query moved
    (the pathological movers dict that ballooned r11's tail) — the
    final summary line must stay under 1800 chars (the driver keeps
    2000), i.e. the movers cap does its job with long query names."""
    names = [f"docs_extremely_long_query_name_number_{i:04d}" for i in range(250)]
    per_query = {n: 1.2345 for n in names}
    prev_cmp = {
        n: {
            "prev": 0.5,
            "cur": 1.2345,
            "ratio": 2.469,
            "adj_ratio": 2.469,
            "mover": True,
        }
        for n in names
    }
    solo = {n: 0.9876 for n in names}
    line = bench.summary_line(
        308.1234, 250, 0.1, list(names), prev_cmp, per_query, solo, 1.013
    )
    assert len(line) < 1800, len(line)
    import json

    parsed = json.loads(line)
    assert parsed["bench_summary"] is True and parsed["n"] == 250
    assert len(parsed["movers"]) == bench.SUMMARY_MOVERS_CAP
