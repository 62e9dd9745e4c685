"""`ENGINE_CHECKPOINT_MODE=reliable` equivalence across EVERY
iterative consumer of ``session.materialize`` (round-9 verdict task
5; pagerank's test lives in test_graph_bloom_incr.py): swapping the
materialization primitive from localCheckpoint to Dataset.checkpoint
must be invisible in the results — it changes durability, never
values — and the mode string itself must be validated so a typo'd
env var cannot silently lose the durability it exists to provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import dedup as D
from ecommerce_realtime_pipeline_spark.operators import model as M
from ecommerce_realtime_pipeline_spark.operators import text as T


def _pairs(spark):
    """A 6-chain plus a triangle — deep enough that LSS actually
    iterates and min-label propagates over multiple rounds."""
    edges = [(i, i + 1) for i in range(10, 16)] + [(1, 2), (2, 3), (1, 3)]
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _words(spark):
    """(word, freq) vocabulary — bpe_train's input frame."""
    rows = [
        ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("news", 4)
    ]
    return spark.createDataFrame(rows, "word string, freq long")


def _feats(spark):
    return spark.createDataFrame(
        [(float(i % 7) / 7.0, float((i * 3) % 5) / 5.0, i % 2) for i in range(40)],
        "f1 double, f2 double, y int",
    )


_OPS = {
    "bpe_merges": lambda spark: sorted(
        tuple(r) for r in T.bpe_learn_merges(_words(spark), n_merges=6).collect()
    ),
    "lss_clusters": lambda spark: sorted(
        tuple(r) for r in D.neardup_clusters_lss(_pairs(spark)).collect()
    ),
    "minlabel_clusters": lambda spark: sorted(
        tuple(r) for r in D.neardup_clusters(_pairs(spark)).collect()
    ),
    "logistic_gd": lambda spark: sorted(
        tuple(r)
        for r in M.logistic_train(_feats(spark), ["f1", "f2"], iters=3).collect()
    ),
}


@pytest.mark.parametrize("op", sorted(_OPS))
def test_reliable_checkpoint_mode_matches_local(spark, monkeypatch, op):
    """Bit-identical results in both checkpoint modes, and reliable
    mode actually writes checkpoint data to the (auto-assigned)
    SparkContext checkpoint dir."""
    import os

    fn = _OPS[op]
    monkeypatch.setenv("ENGINE_CHECKPOINT_MODE", "local")
    want = fn(spark)
    monkeypatch.setenv("ENGINE_CHECKPOINT_MODE", "reliable")
    assert fn(spark) == want
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None
    local = ckpt_dir.removeprefix("file:")
    assert any(os.scandir(local))


def test_reliable_mode_accepts_case_and_whitespace(spark, monkeypatch):
    """'Reliable ' (case/space noise) must still select the durable
    path — normalization, not silent local fallback."""
    from ecommerce_realtime_pipeline_spark.session import materialize

    monkeypatch.setenv("ENGINE_CHECKPOINT_MODE", " Reliable ")
    df = materialize(spark.range(3).select(F.col("id")))
    assert sorted(r["id"] for r in df.collect()) == [0, 1, 2]
    assert spark.sparkContext.getCheckpointDir() is not None


def test_unknown_checkpoint_mode_raises(spark, monkeypatch):
    """A typo'd mode ('durable') must fail loudly — silently falling
    back to localCheckpoint would lose executor-loss durability on
    exactly the long cluster jobs the knob exists for."""
    from ecommerce_realtime_pipeline_spark.session import materialize

    monkeypatch.setenv("ENGINE_CHECKPOINT_MODE", "durable")
    with pytest.raises(ValueError, match="not a checkpoint mode"):
        materialize(spark.range(3))
