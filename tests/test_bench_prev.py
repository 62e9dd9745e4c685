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
    # since r14 the summary line carries the driver contract keys too
    # (metric/value/unit + fitted queries); pick_artifact must still
    # skip it via the bench_summary marker
    summary = {
        "bench_summary": True,
        "metric": "suite_median_wall_sec",
        "value": 1.0,
        "unit": "sec",
        "suite_sec": 1.0,
        "n": 0,
        "queries": {"a": 1.0},
    }
    stdout = "\n".join(["# noise", json.dumps(full), json.dumps(summary)])
    assert cr.pick_artifact(stdout) == json.dumps(full)
    assert cr.pick_artifact("no json here\n{not json}") is None
    assert cr.pick_artifact(json.dumps(summary)) is None  # summary alone


def test_summary_line_stays_under_driver_tail_at_250_queries():
    """The truncation-proof contract at registry growth (r11 verdict
    task 7): simulate a 250-query registry where EVERY query moved
    (the pathological movers dict that ballooned r11's tail) — the
    final summary line must stay under 1800 chars (the driver keeps
    2000), i.e. the movers cap and the queries auto-fit do their job
    with long query names."""
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
        308.1234, 250, 0.1, list(names), prev_cmp, per_query, solo, 1.013,
        perquery_path="/root/repo/BENCH_PERQUERY_c32.json",
    )
    assert len(line) < 1800, len(line)
    import json

    parsed = json.loads(line)
    assert parsed["bench_summary"] is True and parsed["n"] == 250
    assert len(parsed["movers"]) == bench.SUMMARY_MOVERS_CAP
    # r13 verdict task 1: the driver contract keys ride the final line
    assert parsed["metric"] == "suite_median_wall_sec"
    assert parsed["value"] == 308.1234 and parsed["unit"] == "sec"
    assert parsed["bench_perquery_path"].endswith("BENCH_PERQUERY_c32.json")
    # the fitted queries map is non-empty, size-capped, and counts its
    # own truncation honestly
    assert parsed["queries"] and len(parsed["queries"]) < 250
    assert parsed["queries_truncated"] == 250 - len(parsed["queries"])


def test_summary_line_small_registry_carries_full_queries_map():
    """Below the tail budget nothing is truncated: every query rides
    the final line, so a small-registry driver parse sees the complete
    map (the r02 behavior, restored for any registry that fits)."""
    import json

    per_query = {f"q{i:02d}": round(0.1 * i, 4) for i in range(20)}
    line = bench.summary_line(
        10.0, 20, 0.1, [], {}, per_query, {}, 1.0, perquery_path="/x.json"
    )
    parsed = json.loads(line)
    assert parsed["queries"] == per_query
    assert parsed["queries_truncated"] == 0


def test_fit_queries_descending_cost_and_budget():
    per_query = {"cheap": 0.1, "mid": 1.0, "heavy": 9.0, "skip": None}
    fitted = bench._fit_queries(per_query, 10_000)
    assert list(fitted) == ["heavy", "mid", "cheap"]  # descending cost
    tiny = bench._fit_queries(per_query, len('"heavy": 9.0') + 4)
    assert list(tiny) == ["heavy"]  # budget admits only the worst
    assert bench._fit_queries(per_query, 0) == {}


def test_adopt_solo_replaces_headline_and_keeps_old_number():
    """r13 verdict task 5: a contention-inflated median is replaced by
    the solo best-of in the headline map; the displaced number is
    returned (kept verbatim in the artifact); a solo that did NOT beat
    the median, a failed solo (None), and an unknown name are no-ops."""
    per_query = {"a": 5.05, "b": 0.3, "c": 1.0}
    solo = {"a": 0.26, "b": 0.4, "c": None, "ghost": 0.1}
    displaced = bench._adopt_solo(per_query, solo)
    assert per_query == {"a": 0.26, "b": 0.3, "c": 1.0}
    assert displaced == {"a": 5.05}


def test_write_perquery_roundtrip(tmp_path, monkeypatch):
    """The sidecar carries the FULL queries map at the path the summary
    line advertises — the driver-readable channel for 213 queries that
    cannot fit the 2000-char stdout tail."""
    import json

    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    out = {
        "metric": "suite_median_wall_sec",
        "value": 1.5,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"a": 1.0, "b": 0.5},
        "queries_concurrent_median": {"a": 2.0},
        "solo_sec": {"a": 1.0},
        "env_drift": 0.99,
        "movers": [],
        "suite_runs_sec": [1.6, 1.5, 1.5],
    }
    real = os.path.join
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    path = bench._write_perquery(out)
    assert path == real(str(tmp_path), "BENCH_PERQUERY_c8.json")
    doc = json.loads(open(path).read())
    assert doc["queries"] == out["queries"]
    assert doc["cpus"] == 8
    assert doc["queries_concurrent_median"] == {"a": 2.0}
