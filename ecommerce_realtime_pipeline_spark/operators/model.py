"""In-engine model training (SURVEY §2.9 training-data extensions):
full-batch gradient-descent logistic regression — the model-based
quality-classifier stage of a pretraining data pipeline (the
fastText-classifier role in published corpus recipes), trained INSIDE
the engine so the scoring pass needs no external model artifact.

Determinism contract (what makes a trained model SQL-oracle-checkable):
feature values are plain double expressions (identical IEEE arithmetic
in Spark and DuckDB), the sigmoid is libm exp (same stance as the
surprisal/mixture-weight oracles), and every per-row gradient term is
cast to DECIMAL(28,14) BEFORE summing — exact, partition-order-
independent accumulation, the same trick the Lloyd/k-means kernel
uses. One double division per weight per iteration.

Scale stance: each GD iteration is ONE scan + partial-agg reduce to a
single row (the weight vector), chained by a 1-row broadcast cross
join — no driver-side collect anywhere, so the whole train→score plan
is a single declarative DAG. Iterations are fixed-count (that is what
lets a SQL oracle replay them CTE-for-CTE; convergence-driven stopping
would be a driver loop). At 100 TB: per iteration one pass over the
data with a k-double reduce — the textbook distributed full-batch GD
layout; minibatching would swap the scan for a hash-Bernoulli sample
(`text.hash_bernoulli`) without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAD_DECIMAL = "decimal(28,14)"


def _sigmoid(z: Column) -> Column:
    # int literal 1 on both engines: INT/(INT+DOUBLE) resolves to
    # DOUBLE identically in Spark and DuckDB
    return F.lit(1) / (F.lit(1) + F.exp(-z))


def _z(feature_cols: list[str], prefix: str = "_w_") -> Column:
    """w·x with the bias first and left-associated adds — the oracle
    writes the same textual order so the float path is identical."""
    z = F.col(f"{prefix}bias")
    for c in feature_cols:
        z = z + F.col(f"{prefix}{c}") * F.col(c)
    return z


def logistic_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 2,
    lr: float = 1.0,
) -> DataFrame:
    """Train logistic regression by ``iters`` full-batch GD steps from
    w = 0 and return the 1-row weight frame
    (_w_bias, _w_<feature>, ...). ``label_col`` must be int 0/1.

    Update rule: w += lr * Σ (y − σ(w·x)) x / n, the exact-sum form
    described in the module docstring.

    Each round's 1-row weight frame is pinned through
    ``session.materialize`` (the engine checkpoint primitive —
    ``ENGINE_CHECKPOINT_MODE`` selects local vs reliable): without the
    cut, iteration k's plan nests k crossJoin(broadcast(w)) layers
    over the full gradient chain, so analysis cost grows superlinearly
    in ``iters`` and a long training run replays every earlier scan on
    recompute. Values are bit-identical either way (a checkpoint never
    changes results), which the reliable-mode equivalence test pins."""
    from ecommerce_realtime_pipeline_spark.session import materialize

    spark = feats.sparkSession
    n_row = feats.agg(F.count("*").alias("_n"))
    w = spark.range(1).select(
        F.lit(0.0).alias("_w_bias"),
        *[F.lit(0.0).alias(f"_w_{c}") for c in feature_cols],
    )
    y = F.col(label_col)
    for _ in range(iters):
        j = feats.crossJoin(F.broadcast(w))
        resid = y - _sigmoid(_z(feature_cols))
        grads = j.agg(
            F.first("_w_bias").alias("_w_bias"),
            *[F.first(f"_w_{c}").alias(f"_w_{c}") for c in feature_cols],
            F.sum(resid.cast(_GRAD_DECIMAL)).alias("_g_bias"),
            *[
                F.sum((resid * F.col(c)).cast(_GRAD_DECIMAL)).alias(f"_g_{c}")
                for c in feature_cols
            ],
        )
        w = grads.crossJoin(F.broadcast(n_row)).select(
            (
                F.col("_w_bias")
                + F.lit(lr) * (F.col("_g_bias").cast("double") / F.col("_n"))
            ).alias("_w_bias"),
            *[
                (
                    F.col(f"_w_{c}")
                    + F.lit(lr) * (F.col(f"_g_{c}").cast("double") / F.col("_n"))
                ).alias(f"_w_{c}")
                for c in feature_cols
            ],
        )
        w = materialize(w)
    return w


def logistic_score(
    feats: DataFrame, w: DataFrame, feature_cols: list[str]
) -> DataFrame:
    """Attach the decision margin `z` (σ(z) ≥ 0.5 ⇔ z ≥ 0) to every
    row via a 1-row broadcast of the weight frame."""
    return feats.crossJoin(F.broadcast(w)).withColumn("z", _z(feature_cols))
