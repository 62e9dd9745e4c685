"""Incremental near-duplicate dedup for a DOCUMENT STREAM against an
accumulating MinHash-LSH index — the dedup-new-crawl-against-history
pass every continuously-fed training-data pipeline needs (batch-mode
near-dup over a closed corpus is ``operators/dedup.py``; this module
is its streaming counterpart).

Per micro-batch:
  1. band the batch's MinHash signatures (``dedup.banded_signatures``),
  2. equi-join those band keys against the persisted index of every
     previously ACCEPTED doc (plus an in-batch self-join, min-id
     canonical),
  3. verify candidates with exact Jaccard over full shingle sets,
  4. append per-doc decisions, and append only NOVEL docs' band keys /
     texts to the index.

Scale stance (100 TB): per-trigger work is |batch|·bands index rows
joined on (band, bucket) against the history index — an equi-join,
never batch × history on raw text; verification touches candidate
pairs only. The index is append-only parquet here (single-writer test
scope — a deployment swaps in a transactional table format and
partitions the index by ``band`` so each trigger's join prunes to the
bucket files it needs, exactly like the bucketed silver upsert in
``streaming/ingest.py``). Within-batch duplicate marking is the
standard greedy min-id-canonical rule; full transitive clustering over
the accepted corpus remains a batch job (``dedup.neardup_clusters``).

Failure semantics: the file source's checkpoint gives exactly-once
BATCH delivery; the foreachBatch appends themselves are idempotent
only down to the batch level, so a crash between the two appends can
leave a batch's decisions without its index rows — ``read_decisions``
dedups on (batch_id, doc_id) for the replay case, and a transactional
sink closes the remaining window in production.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import dedup as DD

DOC_STREAM_SCHEMA = "doc_id long, text string"


def _paths(work_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(work_dir, "index_bands"),
        os.path.join(work_dir, "index_docs"),
        os.path.join(work_dir, "decisions"),
    )


def dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    work_dir: str,
    batch_id: int,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
) -> None:
    """Process one micro-batch: decide dup/novel per doc, persist the
    decisions, grow the index with the novel docs."""
    bands_path, docs_path, dec_path = _paths(work_dir)
    batch = batch.select("doc_id", "text").localCheckpoint()
    if batch.isEmpty():
        return
    banded = DD.banded_signatures(batch, num_hashes, bands, n).localCheckpoint()

    # in-batch candidates: newer (larger) id is the dup candidate, so
    # the earliest-seen doc of a cluster stays canonical
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") > F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    all_docs = batch
    if os.path.exists(bands_path):
        hist = spark.read.parquet(bands_path)
        vs_hist = (
            banded.join(hist.withColumnRenamed("doc_id", "hist_id"), ["band", "bucket"])
            .filter(F.col("doc_id") != F.col("hist_id"))
            .select(F.col("doc_id").alias("doc_a"), F.col("hist_id").alias("doc_b"))
        )
        cand = cand.unionByName(vs_hist)
        all_docs = batch.unionByName(spark.read.parquet(docs_path))
    verified = DD.verify_jaccard(cand.distinct(), all_docs, threshold, n)
    matches = verified.groupBy("doc_a").agg(F.min("doc_b").alias("matched_id"))

    decisions = (
        batch.join(matches, batch.doc_id == matches.doc_a, "left")
        .select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "doc_id",
            F.col("matched_id").isNotNull().alias("is_dup"),
            "matched_id",
        )
        .localCheckpoint()
    )
    decisions.write.mode("append").parquet(dec_path)

    novel = decisions.filter(~F.col("is_dup")).select("doc_id")
    banded.join(novel, "doc_id").write.mode("append").parquet(bands_path)
    batch.join(novel, "doc_id").write.mode("append").parquet(docs_path)


def run_neardup_stream(
    spark: SparkSession,
    src_dir: str,
    work_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
):
    """Drain all currently-available document files through the dedup
    pass (availableNow). Re-running with the same checkpoint processes
    only files that arrived since — the incremental crawl-snapshot
    loop."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch(
            spark, batch_df, work_dir, epoch_id, threshold, num_hashes, bands, n
        )

    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(src_dir)
    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_decisions(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-doc dedup decisions, deduped on (batch_id, doc_id) so a
    replayed batch (crash between appends) cannot double-count."""
    _, _, dec_path = _paths(work_dir)
    return spark.read.parquet(dec_path).dropDuplicates(["batch_id", "doc_id"])
