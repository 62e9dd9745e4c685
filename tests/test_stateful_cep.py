"""Unit tests for the applyInPandasWithState funnel/CEP operator
(streaming/stateful.py) — the pure transition function and the pandas
state function driven through a fake GroupState. The end-to-end
streaming form is covered by the streaming_funnel_cep fixture query's
oracle test (tests/test_oracle_diff.py)."""

from __future__ import annotations

import pandas as pd

from ecommerce_realtime_pipeline_spark.streaming.stateful import (
    FUNNEL_STAGES,
    _advance,
    make_funnel_fn,
)

US = 1_000_000


class FakeState:
    """Stand-in for pyspark's GroupState: tuple state + timeout calls
    recorded, watermark injectable."""

    def __init__(self, state=None, timed_out=False, wm_ms=0):
        self._state = state
        self.hasTimedOut = timed_out  # noqa: N815 — mirrors GroupState
        self._wm_ms = wm_ms
        self.timeout_set_ms: int | None = None
        self.removed = False

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        assert self._state is not None
        return self._state

    def update(self, v):
        self._state = tuple(v)

    def remove(self):
        self._state = None
        self.removed = True

    def getCurrentWatermarkMs(self):  # noqa: N802
        return self._wm_ms

    def setTimeoutTimestamp(self, ms):  # noqa: N802
        assert ms > self._wm_ms, "timeout must sit beyond the watermark"
        self.timeout_set_ms = ms


def run_fn(events, state, gap_s=300):
    """Feed one micro-batch (list of (t_us, etype)) through the state
    function; return emitted rows as a list of dicts."""
    fn = make_funnel_fn(gap_s)
    pdf = pd.DataFrame(
        {"t_us": [t for t, _ in events], "event_type": [e for _, e in events]}
    )
    out = list(fn(("cX",), iter([pdf]), state))
    return [r._asdict() for df in out for r in df.itertuples(index=False)]


def test_advance_happy_path():
    st = (0, None, None)
    st2 = _advance(*st, "page_view", 10)
    assert st2 == (1, 10, 10, False)
    st3 = _advance(*st2[:3], "add_to_cart", 20)
    assert st3 == (2, 10, 20, False)
    st4 = _advance(*st3[:3], "purchase", 30)
    assert st4 == (0, 10, 30, True)  # completed


def test_advance_neutral_and_out_of_stage_events_ignored():
    # neutral event types never move the machine
    assert _advance(1, 10, 10, "product_view", 50) == (1, 10, 10, False)
    assert _advance(2, 10, 20, "remove_from_cart", 50) == (2, 10, 20, False)
    # skipping a stage is ignored (purchase before add_to_cart)
    assert _advance(1, 10, 10, "purchase", 50) == (1, 10, 10, False)
    # a second page_view neither restarts nor extends
    assert _advance(1, 10, 10, "page_view", 50) == (1, 10, 10, False)
    # nothing before page_view starts a funnel
    assert _advance(0, None, None, "purchase", 50) == (0, None, None, False)


def test_fn_completes_funnel_out_of_order_batch():
    st = FakeState()
    rows = run_fn(
        [(30 * US, "purchase"), (10 * US, "page_view"), (20 * US, "add_to_cart")],
        st,
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["outcome"], r["last_stage"], r["n_events"]) == (
        "converted",
        FUNNEL_STAGES[-1],
        3,
    )
    assert (r["started_us"], r["last_us"]) == (10 * US, 30 * US)
    assert not st.exists  # completed funnel leaves no state


def test_fn_repeated_conversions_in_one_batch():
    seq = [
        (1 * US, "page_view"),
        (2 * US, "add_to_cart"),
        (3 * US, "purchase"),
        (4 * US, "page_view"),
        (5 * US, "add_to_cart"),
        (6 * US, "purchase"),
    ]
    rows = run_fn(seq, FakeState())
    assert [r["started_us"] for r in rows] == [1 * US, 4 * US]
    assert all(r["outcome"] == "converted" for r in rows)


def test_fn_partial_funnel_sets_state_and_timeout():
    st = FakeState()
    rows = run_fn([(10 * US, "page_view"), (20 * US, "add_to_cart")], st, gap_s=60)
    assert rows == []
    assert st.get == (2, 10 * US, 20 * US)
    assert st.timeout_set_ms == (20 + 60) * 1000  # last + gap, in ms


def test_fn_timeout_emits_obituary_and_clears():
    st = FakeState(state=(2, 10 * US, 20 * US), timed_out=True)
    fn = make_funnel_fn(60)
    rows = [
        r._asdict()
        for df in fn(("cX",), iter([]), st)
        for r in df.itertuples(index=False)
    ]
    assert len(rows) == 1
    r = rows[0]
    assert (r["outcome"], r["last_stage"], r["n_events"]) == (
        "abandoned",
        "add_to_cart",
        2,
    )
    assert st.removed


def test_fn_drops_rows_below_watermark():
    # watermark at t=100s: a purchase at t=50s must be dropped, NOT
    # complete the stage-2 funnel sitting in state.
    st = FakeState(state=(2, 10 * US, 20 * US), wm_ms=100_000)
    rows = run_fn([(50 * US, "purchase")], st, gap_s=60)
    assert rows == []
    assert st.get == (2, 10 * US, 20 * US)  # untouched
    # timeout re-pinned beyond the watermark even though last+gap passed
    assert st.timeout_set_ms == 100_001


def test_fn_timeout_never_set_at_or_below_watermark():
    # fresh partial funnel whose last+gap is already behind the
    # watermark: setTimeoutTimestamp must still be legal (wm+1).
    st = FakeState(wm_ms=10_000_000)
    rows = run_fn([(10_500 * US, "page_view")], st, gap_s=1)
    assert rows == []
    assert st.timeout_set_ms == 10_501_000  # last+gap (legal) — sanity
    st2 = FakeState(wm_ms=20_000_000)
    run_fn([(20_000 * US, "page_view")], st2, gap_s=0)
    assert st2.timeout_set_ms == 20_000_001  # clamped to wm+1
