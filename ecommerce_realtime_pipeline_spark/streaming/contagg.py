"""Continuous aggregate: a streaming-maintained materialized view
refreshed INCREMENTALLY per micro-batch — the batch
``normalize.incremental_agg`` algebra fused into the ingest stream, so
a per-group KPI table (here: order count + revenue by status) stays
current at the cost of |batch| per trigger instead of a table rescan.
This is the "hypertable continuous aggregate" workload shape on plain
parquet.

Exactly-once design (the crash windows, named):
- Each refresh writes a FULL new aggregate version to
  ``{agg_path}/v=<epoch>`` via stage + atomic rename. The aggregate is
  group-cardinality-sized (|statuses| rows), so a full version per
  epoch is cheaper than any delta log — and versions double as the
  time-travel history.
- Replay protection is the EPOCH MARKER: a committed ``v=<epoch>``
  directory means this epoch was applied; ``refresh_epoch`` returns
  immediately on replay. This matters because the delta is computed
  against the silver PRE-IMAGE — after the upsert lands, the same
  batch would produce a zero delta, so "recompute on replay" is NOT
  an option; skip-if-committed is.
- Ordering inside the foreachBatch: refresh FIRST (pre-image intact),
  silver upsert second (idempotent last-write-wins). Crash between
  them → replay skips the committed refresh and redoes the upsert;
  crash before the rename → replay recomputes the identical delta
  from the unchanged pre-image. Both windows converge.
- Out-of-order envelopes: a batch row contributes ONLY if it wins the
  upsert's last-write-wins comparison against the silver pre-image
  (the same ``latest_by_key`` over the tagged union decides) — a stale
  redelivery that the upsert would discard leaves the view untouched
  too, keeping refresh ≡ recompute under reordering (test-pinned).

Scale: the pre-image lookup is bucket-pruned exactly like the upsert
(only buckets containing batch keys are read); the delta aggregation
touches |batch| rows; the version write is |groups| rows. DECIMAL
contributions keep refresh ≡ recompute bit-for-bit (asserted against a
full silver aggregation in tests and the driver fixture query).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import normalize as N
from ecommerce_realtime_pipeline_spark.schemas import ENTITY_SCHEMAS
from ecommerce_realtime_pipeline_spark.streaming.ingest import (
    _atomic_overwrite,
    bucket_of,
    deduped_stream,
    stream_envelopes,
    upsert_batch,
)

_SUM_TYPE = "decimal(18,2)"

#: high-watermark file: the largest epoch whose ``v=<epoch>`` marker
#: has been PRUNED. The markers double as the exactly-once replay
#: ledger, so pruning one would otherwise reopen its replay window (a
#: foreachBatch redelivery — or an epoch-id reset from a recreated
#: checkpoint — would re-apply the delta against the post-image). The
#: watermark keeps the ledger's answer for pruned epochs: applied.
_PRUNE_WM_FILE = "_pruned_through"

#: identity binding for the replay ledger: the streaming query id (from
#: the checkpoint's ``metadata`` file) the epoch markers + pruned-WM
#: were recorded under. Epoch ids are only comparable WITHIN one
#: checkpoint generation — if the checkpoint is recreated, epoch ids
#: restart at 0 and a bare ``epoch_id <= _pruned_through`` check would
#: silently skip refreshes for genuinely new data while the upsert
#: still lands, leaving the view permanently stale. ``run_ingest_with_agg``
#: detects the generation change and rebases the view from silver.
_LEDGER_ID_FILE = "_ledger_query_id"

#: full-recompute base version written by :func:`rebase_from_silver`;
#: used as ``prev`` when no ``v=<epoch>`` marker exists yet.
_BASE_DIR = "base"


def pruned_through(agg_path: str) -> int:
    """Largest epoch retired by :func:`prune_versions` (-1 if none)."""
    try:
        with open(os.path.join(agg_path, _PRUNE_WM_FILE)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """Streaming query id persisted in the checkpoint's ``metadata``
    file (stable across restarts of the SAME checkpoint; a recreated
    checkpoint gets a fresh id). None if the checkpoint is new."""
    import json

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return str(json.load(f)["id"])
    except (FileNotFoundError, ValueError, KeyError):
        return None


def _ledger_query_id(agg_path: str) -> str | None:
    try:
        with open(os.path.join(agg_path, _LEDGER_ID_FILE)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def _write_ledger_query_id(agg_path: str, query_id: str) -> None:
    os.makedirs(agg_path, exist_ok=True)
    tmp = os.path.join(agg_path, _LEDGER_ID_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(query_id)
    os.replace(tmp, os.path.join(agg_path, _LEDGER_ID_FILE))


def rebase_from_silver(
    spark: SparkSession,
    silver_path: str,
    agg_path: str,
    group_col: str,
    sum_col: str,
) -> None:
    """Rebuild the aggregate from the silver POST-image and reset the
    epoch ledger — the recovery for a recreated checkpoint (epoch ids
    restarting at 0), where bare epoch-id comparisons against the old
    markers/pruned-WM are meaningless.

    Safe to run spuriously: the base equals a full recompute, and any
    replayed batch then computes its delta against a pre-image that
    already CONTAINS the batch rows, so retract+add cancel to a zero
    delta (the same last-write-wins winner rule; test-pinned). Crash
    order: the base commits atomically FIRST, old ``v=`` markers and
    the pruned-WM are dropped after — a crash in between leaves stale
    markers that the next start's identity check rebases again.
    """
    import shutil

    if os.path.isdir(silver_path):
        base = (
            spark.read.parquet(silver_path)
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(sum_col).cast(_SUM_TYPE))
                .cast(_SUM_TYPE)
                .alias("sum_val"),
            )
        )
    else:
        base = spark.createDataFrame(
            [], f"{group_col} string, n_rows long, sum_val {_SUM_TYPE}"
        )
    _atomic_overwrite(base, os.path.join(agg_path, _BASE_DIR))
    for e in _committed_epochs(agg_path):
        shutil.rmtree(os.path.join(agg_path, f"v={e}"), ignore_errors=True)
    try:
        os.remove(os.path.join(agg_path, _PRUNE_WM_FILE))
    except FileNotFoundError:
        pass


def _committed_epochs(agg_path: str) -> list[int]:
    """Committed = directories named exactly ``v=<int>``. The staging
    artifacts of an in-flight or crashed write are siblings named
    ``v=<int>__tmp_*`` / ``__old_*`` — they must be ignored, not
    parsed (a crashed writer would otherwise wedge every reader)."""
    if not os.path.isdir(agg_path):
        return []
    out = []
    for d in os.listdir(agg_path):
        if d.startswith("v=") and d[2:].isdigit():
            out.append(int(d[2:]))
    return sorted(out)


def read_continuous_agg(spark: SparkSession, agg_path: str) -> DataFrame:
    """Latest committed aggregate version (falls back to the rebase
    ``base`` when no epoch has committed since the last rebase)."""
    epochs = _committed_epochs(agg_path)
    if epochs:
        return spark.read.parquet(os.path.join(agg_path, f"v={epochs[-1]}"))
    base = os.path.join(agg_path, _BASE_DIR)
    if os.path.isdir(base):
        return spark.read.parquet(base)
    raise FileNotFoundError(f"no committed aggregate version in {agg_path}")


def refresh_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    entity: str,
    silver_path: str,
    agg_path: str,
    epoch_id: int,
    group_col: str,
    sum_col: str,
    n_buckets: int = 16,
) -> None:
    """Incrementally refresh the aggregate for one micro-batch AGAINST
    THE SILVER PRE-IMAGE (call before the upsert). Skip-if-committed
    makes it exactly-once under foreachBatch replay."""
    version_dir = os.path.join(agg_path, f"v={epoch_id}")
    if os.path.isdir(version_dir) or epoch_id <= pruned_through(agg_path):
        return  # replayed epoch: already applied (marker or pruned-WM)
    typed, _bad = N.parse_envelope(batch_df, entity)
    id_field = ENTITY_SCHEMAS[entity].fields[0].name
    batch_rows = N.latest_by_key(typed, id_field, N.ORDER_COLS[entity])
    d_val = F.col(sum_col).cast(_SUM_TYPE)
    if os.path.isdir(silver_path):
        keys = batch_rows.select(id_field).distinct()
        buckets = [
            r[0]
            for r in keys.select(
                bucket_of(id_field, n_buckets).alias("b")
            )
            .distinct()
            .collect()
        ]
        pre = (
            spark.read.parquet(silver_path)
            .filter(F.col("bucket").isin(buckets))
            .join(F.broadcast(keys), id_field, "left_semi")
        )
        # A batch row only contributes if it WINS the upsert's
        # last-write-wins comparison against the silver pre-image —
        # replicated by running the SAME latest_by_key over the tagged
        # union (an out-of-order/stale envelope loses to the silver row
        # and must leave the view untouched; test-pinned).
        tagged = pre.withColumn("_src", F.lit("pre")).unionByName(
            batch_rows.withColumn("_src", F.lit("batch")),
            allowMissingColumns=True,
        )
        winner_keys = (
            N.latest_by_key(tagged, id_field, N.ORDER_COLS[entity])
            .filter(F.col("_src") == "batch")
            .select(id_field)
            .localCheckpoint()
        )
        retract = pre.join(F.broadcast(winner_keys), id_field, "left_semi").select(
            F.col(group_col).alias("_g"),
            F.lit(-1).cast("long").alias("_dn"),
            (-d_val).alias("_ds"),
        )
        add = batch_rows.join(
            F.broadcast(winner_keys), id_field, "left_semi"
        ).select(
            F.col(group_col).alias("_g"),
            F.lit(1).cast("long").alias("_dn"),
            d_val.alias("_ds"),
        )
        deltas = add.unionByName(retract)
    else:
        deltas = batch_rows.select(
            F.col(group_col).alias("_g"),
            F.lit(1).cast("long").alias("_dn"),
            d_val.alias("_ds"),
        )
    delta_agg = deltas.groupBy("_g").agg(
        F.sum("_dn").alias("_dn"), F.sum("_ds").alias("_ds")
    )
    try:
        prev = read_continuous_agg(spark, agg_path)
    except FileNotFoundError:
        prev = spark.createDataFrame(
            [], f"{group_col} string, n_rows long, sum_val {_SUM_TYPE}"
        )
    _atomic_overwrite(
        N.merge_agg_delta(prev, delta_agg, group_col, _SUM_TYPE), version_dir
    )


def run_ingest_with_agg(
    spark: SparkSession,
    source_dir: str,
    entity: str,
    silver_path: str,
    agg_path: str,
    checkpoint_dir: str,
    group_col: str,
    sum_col: str,
    watermark: str = "10 minutes",
):
    """Ingest stream with the continuous aggregate fused in: per
    micro-batch, refresh the view from the pre-image (exactly-once via
    the epoch marker), then run the idempotent silver upsert.

    Replay-ledger identity check (crash class: RECREATED CHECKPOINT):
    the epoch markers and ``_pruned_through`` are only meaningful for
    the epoch-id sequence of ONE checkpoint generation. Before start,
    the checkpoint's persisted query id is compared against the id the
    ledger was recorded under; on mismatch (checkpoint deleted and
    recreated → ids restart at 0, or a ledger that predates identity
    binding) the view is REBASED from silver and the old ledger
    dropped, so restarting epochs can never be mis-skipped as
    "already applied" (new data) nor double-applied (replayed data —
    its delta against the post-image cancels to zero). The new query
    id is bound to the ledger right after start.
    """
    ledger_bound = (
        pruned_through(agg_path) >= 0 or bool(_committed_epochs(agg_path))
    )
    if ledger_bound:
        chk_id = _checkpoint_query_id(checkpoint_dir)
        if chk_id is None or chk_id != _ledger_query_id(agg_path):
            rebase_from_silver(
                spark, silver_path, agg_path, group_col, sum_col
            )
    stream = deduped_stream(stream_envelopes(spark, source_dir), watermark)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # the availableNow NO-DATA batch (watermark-advance eviction for
        # the offset dedup) carries zero rows but would pay a FULL
        # zero-delta refresh — winner-key checkpoint, pre-image scan, and
        # a whole new aggregate version write (measured ~1.5 s at the
        # fixture SF) — plus the upsert's parse/collect pass. An empty
        # batch's delta is zero against ANY pre-image, so skipping it is
        # replay-stable without an epoch marker: a redelivered empty
        # epoch is skipped identically, and the marker/pruned-WM ledger
        # only ever needs to cover epochs that changed the view.
        if batch_df.isEmpty():
            return
        refresh_epoch(
            spark,
            batch_df,
            entity,
            silver_path,
            agg_path,
            int(epoch_id),
            group_col,
            sum_col,
        )
        upsert_batch(spark, batch_df, entity, silver_path)

    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _write_ledger_query_id(agg_path, str(query.id))
    return query


def prune_versions(agg_path: str, keep: int = 3) -> list[int]:
    """Retention maintenance for the version history: drop all but the
    newest ``keep`` committed versions. The epoch markers double as the
    replay ledger, so BEFORE any directory is deleted the
    ``_pruned_through`` watermark is advanced (tmp + atomic rename) to
    the largest victim epoch — ``refresh_epoch`` consults it, so a
    foreachBatch redelivery of a pruned epoch (or an epoch-id reset
    from a recreated checkpoint) still reads as "already applied"
    instead of re-applying its delta against the post-image. Crash
    order is safe in both windows: WM written but dirs not yet deleted
    → pruned epochs just linger (valid, longer history); dirs deleted
    only after the WM is durable. Deletion is oldest-first and the
    newest version is never touched. Returns the pruned epochs."""
    if keep < 1:
        raise ValueError("prune_versions: keep must be >= 1")
    epochs = _committed_epochs(agg_path)
    victims = epochs[:-keep] if len(epochs) > keep else []
    if not victims:
        return victims
    wm = max(max(victims), pruned_through(agg_path))
    tmp = os.path.join(agg_path, _PRUNE_WM_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(wm))
    os.replace(tmp, os.path.join(agg_path, _PRUNE_WM_FILE))
    import shutil

    for e in victims:
        shutil.rmtree(os.path.join(agg_path, f"v={e}"), ignore_errors=True)
    return victims
