"""Property tests for the two-pass exact order-statistic sketches:
randomized values (heavy ties, NULL injection, adversarial ranges)
against plain-Python sorted() ground truth — the binning/rank
arithmetic is exactly the kind of code where an off-by-one hides at a
boundary no fixture hits (rank == n, all-one-bin, duplicate runs
straddling a bin edge)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_realtime_pipeline_spark.operators import sketch as SK

# values drawn from a SMALL integer pool cast to float => heavy ties;
# plus a wide-float pool => bin-boundary stress. Lengths stay small so
# each example is one quick local job.
_VALS = st.one_of(
    st.integers(min_value=-5, max_value=5).map(float),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
)


@given(
    st.lists(_VALS, min_size=1, max_size=40),
    st.integers(min_value=0, max_value=6),  # NULL rows to inject
    st.lists(
        st.sampled_from([0.01, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@settings(max_examples=12, deadline=None)
def test_exact_quantiles_match_sorted_ground_truth(spark, vals, n_nulls, qs):
    rows = [(v,) for v in vals] + [(None,)] * n_nulls
    df = spark.createDataFrame(rows, "v double")
    got = dict(SK.exact_quantiles_twopass(df, "v", qs, n_bins=8))
    ordered = sorted(vals)
    n = len(ordered)
    for q in qs:
        k = max(1, min(math.ceil(q * n), n))
        assert got[q] == pytest.approx(ordered[k - 1]), (q, k, ordered)


@given(
    st.lists(_VALS, min_size=1, max_size=40),
    st.integers(min_value=0, max_value=6),
    st.data(),
)
@settings(max_examples=12, deadline=None)
def test_exact_rank_rows_match_sorted_ground_truth(spark, vals, n_nulls, data):
    # ids are distinct so the (v, id) lexicographic order is total
    rows = [(v, i) for i, v in enumerate(vals)] + [
        (None, 1000 + i) for i in range(n_nulls)
    ]
    df = spark.createDataFrame(rows, "v double, id long")
    n = len(vals)
    ks = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=n),
                min_size=1,
                max_size=3,
                unique=True,
            )
        )
    )
    got = SK.exact_rank_rows_twopass(df, "v", "id", ks, n_bins=8)
    ordered = sorted(((v, i) for i, v in enumerate(vals)))
    for (k, v, tie), want in zip(got, [ordered[k - 1] for k in ks]):
        assert (v, tie) == pytest.approx(want), (k, ordered)
