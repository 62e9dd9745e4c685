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
    flagged, cmp_ = bench._movers(cur, prev)
    assert "a" in flagged          # 3.3x up, above floor
    assert "b" not in flagged      # 4x up but under the 0.5s floor
    assert "c" not in flagged      # 1.1x: not a mover
    assert "d" in flagged          # 2.5x DOWN, above floor
    assert cmp_["a"]["mover"] and cmp_["d"]["mover"]
    assert set(cmp_) == {"a", "b", "c", "d"}


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
        n: {"prev": 0.5, "cur": 1.2345, "ratio": 2.469, "mover": True}
        for n in names
    }
    solo = {n: 0.9876 for n in names}
    line = bench.summary_line(
        308.1234, 250, 0.1, list(names), prev_cmp, per_query, solo
    )
    assert len(line) < 1800, len(line)
    import json

    parsed = json.loads(line)
    assert parsed["bench_summary"] is True and parsed["n"] == 250
    assert len(parsed["movers"]) == bench.SUMMARY_MOVERS_CAP
