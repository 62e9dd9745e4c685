"""Watermarked windowed streaming aggregation (§2.7): closed windows
are emitted exactly once; data later than the watermark horizon is
dropped (bounded state) — the documented divergence from the
reference's unbounded-lateness Postgres upserts."""

from __future__ import annotations

import json
import os

from ecommerce_realtime_pipeline_spark.streaming import ingest as I

BASE = "2025-03-01T10:{mm:02d}:{ss:02d}Z"


def _event_line(offset, mm, ss, etype="view"):
    ts = BASE.format(mm=mm, ss=ss)
    payload = json.dumps(
        {
            "event_id": f"e{offset}",
            "event_type": etype,
            "customer_id": "c1",
            "timestamp": ts,
        }
    )
    return json.dumps(
        {
            "topic": "events",
            "topic_partition": 0,
            "topic_offset": offset,
            "message_key": f"e{offset}",
            "payload": payload,
            "consumed_at": "2025-03-01T10:00:00Z",
        }
    )


def _write(dirpath, name, lines):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _run(spark, src, sink, ckpt):
    q = I.run_windowed_counts(spark, src, sink, ckpt, watermark="10 minutes")
    q.awaitTermination(120)


def test_windowed_counts_close_once_and_drop_late(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    # batch 1: two views + one click in the 10:00 window, plus a 10:15
    # row that advances the watermark to 10:05 (> 10:01 window end)
    _write(
        src,
        "b1.json",
        [
            _event_line(1, 0, 10, "view"),
            _event_line(2, 0, 40, "view"),
            _event_line(3, 0, 50, "click"),
            _event_line(4, 15, 0, "view"),
        ],
    )
    _run(spark, src, sink, ckpt)

    # batch 2: a LATE view for the already-closed 10:00 window (event
    # time < checkpointed watermark) + a 10:30 row advancing the
    # watermark past the 10:15 window
    _write(src, "b2.json", [_event_line(5, 0, 20, "view"), _event_line(6, 30, 0, "view")])
    _run(spark, src, sink, ckpt)

    # batch 3: one more advancer so every previously closed window has
    # had a batch in which to be emitted
    _write(src, "b3.json", [_event_line(7, 45, 0, "view")])
    _run(spark, src, sink, ckpt)

    rows = spark.read.parquet(sink).collect()
    by_key = {
        (r["window_start"].strftime("%H:%M"), r["type"]): r["n"] for r in rows
    }
    # 10:00 window closed with batch-1 counts only — the late row is gone
    assert by_key[("10:00", "view")] == 2
    assert by_key[("10:00", "click")] == 1
    # each (window, type) emitted exactly once
    assert len(rows) == len(by_key)
    # the 10:15 window closed with its single row
    assert by_key[("10:15", "view")] == 1
