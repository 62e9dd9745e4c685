"""Property-based pins of the BPE merge procedure (hypothesis).

The engine's `apply_merge` is a two-pass space-padded string replace;
its contract (documented in the docstring) is: identical to textbook
greedy left-to-right BPE whenever the pair's symbols don't form runs
of ≥5 identical symbols, and deterministic/engine-portable always.
These tests pin BOTH halves against pure-Python references — no Spark
job per example (the string procedure is replayed with str.replace,
which shares the non-overlapping left-to-right semantics of Spark's
and DuckDB's `replace`); one batched Spark job at the end confirms the
JVM implements the same procedure.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def two_pass_replace(seq: str, w1: str, w2: str) -> str:
    pat, rep = f" {w1} {w2} ", f" {w1}{w2} "
    return f" {seq} ".replace(pat, rep).replace(pat, rep).strip()


def textbook_greedy(seq: str, w1: str, w2: str) -> str:
    syms = seq.split(" ")
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == w1 and syms[i + 1] == w2:
            out.append(w1 + w2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return " ".join(out)


SYM = st.sampled_from(["a", "b", "c", "ab", "</w>"])
SEQS = st.lists(SYM, min_size=1, max_size=12).map(" ".join)
PAIRS = st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"]))


def _run_len_ok(seq: str, w1: str, w2: str) -> bool:
    """No ≥5-run of the (identical) pair symbol — the documented
    regime where two-pass replace == textbook greedy."""
    if w1 != w2:
        return True
    syms = seq.split(" ")
    run = best = 0
    for s in syms:
        run = run + 1 if s == w1 else 0
        best = max(best, run)
    return best < 5


@given(SEQS, PAIRS)
@settings(max_examples=400, deadline=None)
def test_two_pass_equals_textbook_outside_long_runs(seq, pair):
    w1, w2 = pair
    if _run_len_ok(seq, w1, w2):
        assert two_pass_replace(seq, w1, w2) == textbook_greedy(seq, w1, w2)


@given(SEQS, PAIRS)
@settings(max_examples=400, deadline=None)
def test_two_pass_is_fixpoint_for_distinct_pairs(seq, pair):
    """For w1 ≠ w2 two passes must reach the fixpoint: a third pass
    changes nothing (the property that makes the merge complete)."""
    w1, w2 = pair
    if w1 == w2:
        return
    out = two_pass_replace(seq, w1, w2)
    pat, rep = f" {w1} {w2} ", f" {w1}{w2} "
    assert f" {out} ".replace(pat, rep).strip() == out


def test_spark_replace_matches_python_reference(spark):
    """One batched job: the JVM `replace` chain must implement the
    same procedure as the Python reference on an adversarial set
    (shared boundaries, self-pairs, long runs, </w> merges)."""
    from ecommerce_realtime_pipeline_spark.operators import text as TX

    cases = [
        "a b a b </w>", "a a a </w>", "a a a a a </w>", "a a a a a a </w>",
        "b a b a b </w>", "ab a b ab </w>", "c a b d </w>", "a c b </w>",
        "a b </w>", "b b b b a b </w>", "a b a b a b a b </w>", "a </w>",
    ]
    for (w1, w2) in [("a", "b"), ("a", "a"), ("b", "</w>"), ("ab", "</w>")]:
        seqs = spark.createDataFrame(
            [(f"w{i}", 1, s) for i, s in enumerate(cases)],
            "word string, freq int, seq string",
        )
        got = {
            r["word"]: r["seq"] for r in TX.apply_merge(seqs, w1, w2).collect()
        }
        for i, s in enumerate(cases):
            assert got[f"w{i}"] == two_pass_replace(s, w1, w2), (s, w1, w2)
