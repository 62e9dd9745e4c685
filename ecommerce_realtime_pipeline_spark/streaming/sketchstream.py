"""Streaming sketch maintenance: an HLL register table kept up to date
by `foreachBatch` max-merge — approximate distinct-counts over an
unbounded stream with BOUNDED state (group_cardinality × 2^p rows,
forever), no watermark needed because registers never need eviction.

Replay safety falls out of the algebra: max-merge is IDEMPOTENT, so a
crashed/replayed micro-batch re-merging the same registers converges
to the same table — stronger than the usual at-least-once caveats (a
SUM-merged sketch like Count-Min would need the journal treatment the
near-dup indexes use; HLL does not).

At 100 TB the register table is still 256 rows per group: the state
IS the dashboard. Fold on read (`sketch.hll_fold`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ecommerce_realtime_pipeline_spark.operators import sketch as SK
from ecommerce_realtime_pipeline_spark.streaming.ingest import _atomic_overwrite

STREAM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def merge_hll_batch(
    spark: SparkSession, batch_df: DataFrame, regs_path: str
) -> None:
    """foreachBatch hook: fold the micro-batch to registers, max-merge
    with the persisted table, atomically swap. Idempotent under batch
    replay (max of max)."""
    new = SK.hll_registers(batch_df, "user_id", ["event_type"])
    if os.path.exists(regs_path):
        old = spark.read.parquet(regs_path)
        merged = SK.hll_merge([old, new], ["event_type"])
    else:
        merged = SK.hll_merge([new], ["event_type"])
    _atomic_overwrite(merged, regs_path)


def run_hll_stream(
    spark: SparkSession, src: str, regs_path: str, ckpt: str
):
    """One availableNow pass of the user-event stream into the
    register table."""
    stream = spark.readStream.schema(STREAM_SCHEMA).json(src)
    return (
        stream.writeStream.foreachBatch(
            lambda b, _eid: merge_hll_batch(spark, b, regs_path)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def estimates(spark: SparkSession, regs_path: str) -> DataFrame:
    """Fold the maintained registers → per-type estimate."""
    regs = spark.read.parquet(regs_path)
    return SK.hll_fold(regs, ["event_type"]).select(
        "event_type", F.round("hll_estimate", 2).alias("hll_estimate")
    )


# -- streaming Count-Min (journaled: SUM-merge needs replay protection) -----


def merge_cms_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, journal_path: str
) -> None:
    """foreachBatch hook for the SUM-merged sketch: append this
    micro-batch's counter DELTAS tagged with the epoch id. Unlike the
    HLL max-merge, summing is NOT idempotent — a replayed batch would
    double-count — so the journal carries (batch_id, r, c, cnt) and
    the fold dedups by epoch first (same one-job journal + replay-
    idempotent-reader semantics as the streaming near-dup indexes)."""
    deltas = SK.cms_counters(batch_df, "user_id").select(
        F.lit(int(batch_id)).alias("batch_id"), "_r", "_c", "cnt"
    )
    deltas.write.mode("append").parquet(journal_path)


def run_cms_stream(spark: SparkSession, src: str, journal_path: str, ckpt: str):
    """One availableNow pass of the user-event stream into the
    counter journal."""
    stream = spark.readStream.schema(STREAM_SCHEMA).json(src)
    return (
        stream.writeStream.foreachBatch(
            lambda b, eid: merge_cms_batch(spark, b, eid, journal_path)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def cms_counters_from_journal(spark: SparkSession, journal_path: str) -> DataFrame:
    """Replay-idempotent fold: a re-appended epoch writes identical
    delta rows, so max-per-(epoch, r, c) dedups them exactly; the
    epoch sum then equals the true multiset counters."""
    j = spark.read.parquet(journal_path)
    per_epoch = j.groupBy("batch_id", "_r", "_c").agg(F.max("cnt").alias("cnt"))
    return per_epoch.groupBy("_r", "_c").agg(F.sum("cnt").alias("cnt"))
