"""Property tests for the exact-Jaccard verification tail: random
token sequences against plain-Python set arithmetic, plus the
ANSI-divide edge a fixture corpus never hits (two sub-n-token docs =
two empty shingle sets)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import dedup as DD

_TOK = st.sampled_from(list("abcdefg"))  # tiny alphabet => real overlap
_DOC = st.lists(_TOK, min_size=0, max_size=12).map(" ".join)


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(_DOC, _DOC)
@settings(max_examples=15, deadline=None)
def test_verify_jaccard_matches_python_sets(spark, ta, tb):
    docs = spark.createDataFrame(
        [(1, ta), (2, tb)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(2, 1)], "doc_a long, doc_b long")
    out = DD.verify_jaccard(cand, docs, threshold=0.0).collect()
    sa, sb = _shingles(ta), _shingles(tb)
    union = len(sa | sb)
    want = round(len(sa & sb) / union, 4) if union else 0.0
    assert len(out) == 1
    assert out[0]["jaccard"] == pytest.approx(want)


def test_verify_jaccard_empty_shingle_sets_is_zero(spark):
    """Two sub-n-token docs: Jaccard of two empty sets is 0 by
    convention — the bare 0/0 used to throw DIVIDE_BY_ZERO under ANSI
    (unreachable from the shipped candidate generators, but this is a
    general-purpose operator)."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(2, 1)], "doc_a long, doc_b long")
    out = DD.verify_jaccard(cand, docs, threshold=0.0).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [(2, 1, 0.0)]
    # and a positive threshold filters the pair instead of crashing
    assert DD.verify_jaccard(cand, docs, threshold=0.5).count() == 0
