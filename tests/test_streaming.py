"""Streaming integration tests (SURVEY §2.7): file-source ingest with
watermarked offset dedup, exactly-once counts after a replayed
duplicate batch, last-write-wins upsert, listener-captured processing
stats, offset bookkeeping — mirrors the intent of the reference's
tests/integration/test_producer_integration.py:133-240."""

from __future__ import annotations

import json
import os

import pytest

from ecommerce_realtime_pipeline_spark.streaming import ingest as I

TS = "2025-01-01T00:00:00Z"


def _envelope_line(offset, cid, email, updated=TS, partition=0, topic="customers"):
    payload = json.dumps(
        {
            "customer_id": cid,
            "email": email,
            "name": "A",
            "created_at": TS,
            "updated_at": updated,
        }
    )
    return json.dumps(
        {
            "topic": topic,
            "topic_partition": partition,
            "topic_offset": offset,
            "message_key": cid,
            "payload": payload,
            "consumed_at": TS,
        }
    )


def _write_file(dirpath, name, lines):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "silver": str(tmp_path / "silver"),
        "ckpt": str(tmp_path / "ckpt"),
        "offsets": str(tmp_path / "offsets"),
    }


def _run(spark, dirs):
    q = I.run_ingest(
        spark,
        dirs["src"],
        "customers",
        dirs["silver"],
        dirs["ckpt"],
        offsets_path=dirs["offsets"],
    )
    q.awaitTermination(120)


def test_exactly_once_and_upsert(spark, dirs):
    # batch 1: three customers, duplicate offset inside the batch
    _write_file(
        dirs["src"],
        "b1.json",
        [
            _envelope_line(1, "c1", "c1@x.com"),
            _envelope_line(2, "c2", "c2@x.com"),
            _envelope_line(2, "c2", "c2-replay@x.com"),  # duplicate offset
            _envelope_line(3, "c3", "c3@x.com"),
        ],
    )
    _run(spark, dirs)
    silver = spark.read.parquet(dirs["silver"])
    assert silver.count() == 3  # offset dedup dropped the replay
    assert {r["customer_id"] for r in silver.collect()} == {"c1", "c2", "c3"}

    # batch 2: replay of batch-1 rows (same offsets) + one genuine update
    _write_file(
        dirs["src"],
        "b2.json",
        [
            _envelope_line(1, "c1", "c1@x.com"),  # exact replay
            _envelope_line(9, "c1", "c1-new@x.com", updated="2025-02-01T00:00:00Z"),
        ],
    )
    _run(spark, dirs)
    silver = spark.read.parquet(dirs["silver"])
    rows = {r["customer_id"]: r for r in silver.collect()}
    assert silver.count() == 3  # replays did not duplicate
    assert rows["c1"]["email"] == "c1-new@x.com"  # last-write-wins (R4)
    assert rows["c1"]["inserted_at"] is not None  # audit stamp (R10)

    # offsets bookkeeping (R19)
    offs = {
        (r["topic"], r["partition_id"]): r["offset_committed"]
        for r in spark.read.parquet(dirs["offsets"]).collect()
    }
    assert offs[("customers", 0)] == 9


def test_listener_captures_progress(spark, dirs):
    listener = I.StatsListener("customers_silver")
    spark.streams.addListener(listener)
    try:
        _write_file(dirs["src"], "b1.json", [_envelope_line(1, "c1", "c1@x.com")])
        _run(spark, dirs)
    finally:
        spark.streams.removeListener(listener)
    stats = listener.to_df(spark)
    rows = stats.collect()
    assert len(rows) >= 1
    assert rows[0]["table_name"] == "customers_silver"
    assert sum(r["records_processed"] for r in rows) >= 1
    assert all(r["batch_timestamp"] is not None for r in rows)


def test_parse_failures_quarantined_not_dropped(spark, dirs):
    _write_file(
        dirs["src"],
        "b1.json",
        [
            _envelope_line(1, "c1", "c1@x.com"),
            json.dumps(
                {
                    "topic": "customers",
                    "topic_partition": 0,
                    "topic_offset": 2,
                    "message_key": "x",
                    "payload": "{definitely not json",
                    "consumed_at": TS,
                }
            ),
        ],
    )
    _run(spark, dirs)
    silver = spark.read.parquet(dirs["silver"])
    assert silver.count() == 1  # garbage row did not land in silver
