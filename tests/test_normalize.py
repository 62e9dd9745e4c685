"""Unit tests for the normalization ETL: envelope parse, offset dedup,
last-write-wins upsert, item explode with generated line_total."""

from __future__ import annotations

import datetime as dt
import json

from ecommerce_realtime_pipeline_spark.operators import normalize as N
from ecommerce_realtime_pipeline_spark.schemas import RAW_ENVELOPE_SCHEMA

TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _envelope(spark, rows):
    return spark.createDataFrame(
        [
            (topic, part, off, key, payload, TS)
            for (topic, part, off, key, payload) in rows
        ],
        RAW_ENVELOPE_SCHEMA,
    )


def _customer_payload(cid, email="a@x.com", name="A", updated="2025-01-01T00:00:00Z"):
    return json.dumps(
        {
            "customer_id": cid,
            "email": email,
            "name": name,
            "created_at": "2025-01-01T00:00:00Z",
            "updated_at": updated,
        }
    )


def test_offset_dedup_exactly_once(spark):
    raw = _envelope(
        spark,
        [
            ("customers", 0, 1, "c1", _customer_payload("c1")),
            ("customers", 0, 1, "c1", _customer_payload("c1")),  # replayed
            ("customers", 0, 2, "c2", _customer_payload("c2")),
        ],
    )
    assert N.dedup_offsets(raw).count() == 2


def test_parse_envelope_quarantines_garbage(spark):
    raw = _envelope(
        spark,
        [
            ("customers", 0, 1, "c1", _customer_payload("c1")),
            ("customers", 0, 2, "x", "{not json at all"),
            ("customers", 0, 3, "x", json.dumps({"email": "no-id@x.com"})),
        ],
    )
    typed, bad = N.parse_envelope(raw, "customers")
    assert typed.count() == 1
    assert typed.collect()[0]["customer_id"] == "c1"
    assert {r["topic_offset"] for r in bad.collect()} == {2, 3}
    # quarantined rows keep the raw payload for reprocessing
    assert all(r["payload"] for r in bad.collect())


def test_last_write_wins_upsert(spark):
    raw = _envelope(
        spark,
        [
            ("customers", 0, 1, "c1", _customer_payload("c1", email="old@x.com")),
            (
                "customers",
                0,
                9,
                "c1",
                _customer_payload("c1", email="new@x.com", updated="2025-02-01T00:00:00Z"),
            ),
            ("customers", 1, 4, "c2", _customer_payload("c2")),
        ],
    )
    silver, bad = N.normalize_entity(raw, "customers")
    assert bad.count() == 0
    rows = {r["customer_id"]: r for r in silver.collect()}
    assert len(rows) == 2
    assert rows["c1"]["email"] == "new@x.com"  # newest updated_at won
    assert rows["c1"]["inserted_at"] is not None  # audit stamp (R10)
    assert rows["c1"]["last_modified"] is not None


def test_explode_order_items_line_total(spark):
    payload = json.dumps(
        {
            "order_id": "o1",
            "customer_id": "c1",
            "items": [
                {"product_id": "p1", "quantity": 3, "unit_price": 1.115},
                {"product_id": "p2", "quantity": 2, "unit_price": 2.50},
            ],
            "total": 8.34,
            "status": "pending",
            "created_at": "2025-01-01T00:00:00Z",
            "updated_at": "2025-01-01T00:00:00Z",
        }
    )
    empty = json.dumps(
        {
            "order_id": "o2",
            "customer_id": "c1",
            "items": [],
            "total": 0,
            "status": "pending",
            "created_at": "2025-01-01T00:00:00Z",
            "updated_at": "2025-01-01T00:00:00Z",
        }
    )
    raw = _envelope(spark, [("orders", 0, 1, "o1", payload), ("orders", 0, 2, "o2", empty)])
    silver, _ = N.normalize_entity(raw, "orders")
    items = N.explode_order_items(silver)
    rows = {(r["order_id"], r["product_id"]): r for r in items.collect()}
    assert set(rows) == {("o1", "p1"), ("o1", "p2")}  # o2 contributes none
    # from_json lands unit_price in DECIMAL(10,2): 1.115 → 1.12, so
    # line_total = 3 * 1.12 = 3.36 (exact at money scale)
    assert float(rows[("o1", "p1")]["line_total"]) == 3.36
    assert float(rows[("o1", "p2")]["line_total"]) == 5.00


def test_normalize_entity_events_orders_by_timestamp(spark):
    """The generic entity API must work for events, which have no
    updated_at: ORDER_COLS routes last-write-wins through the immutable
    event timestamp (newest wins, offset tiebreak)."""

    def ev(eid, ts):
        return json.dumps(
            {
                "event_id": eid,
                "event_type": "page_view",
                "customer_id": "c1",
                "timestamp": ts,
            }
        )

    raw = _envelope(
        spark,
        [
            ("events", 0, 1, "e1", ev("e1", "2025-01-01T00:00:00Z")),
            ("events", 0, 2, "e1", ev("e1", "2025-02-01T00:00:00Z")),
            ("events", 0, 3, "e2", ev("e2", "2025-01-01T00:00:00Z")),
        ],
    )
    silver, bad = N.normalize_entity(raw, "events")
    assert bad.count() == 0
    rows = {r["event_id"]: r for r in silver.collect()}
    assert set(rows) == {"e1", "e2"}
    assert rows["e1"]["timestamp"].month == 2  # newest timestamp won
    assert rows["e1"]["inserted_at"] is not None  # audit stamp rode along


def test_order_col_map_covers_all_entities():
    from ecommerce_realtime_pipeline_spark.schemas import ENTITY_SCHEMAS

    assert set(N.ORDER_COLS) == set(ENTITY_SCHEMAS)
    for entity, col in N.ORDER_COLS.items():
        assert col in [f.name for f in ENTITY_SCHEMAS[entity].fields], (entity, col)


def test_snapshot_diff_classification(spark):
    """insert/delete/update/unchanged classification, including the
    null-vs-'null' fingerprint distinction."""
    from ecommerce_realtime_pipeline_spark.operators.normalize import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),        # unchanged -> absent from feed
            (2, "b", 99),        # update
            (3, "null", 30),     # NULL -> 'null' string must be an update
            (5, "e", 50),        # insert
        ],                        # 4 deleted
        "id long, s string, v long",
    )
    got = {r["id"]: r["op"] for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_rejects_schema_drift(spark):
    from ecommerce_realtime_pipeline_spark.operators.normalize import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "id long, s string")
    new = spark.createDataFrame([(1, "a", 2)], "id long, s string, extra long")
    import pytest as _pt

    with _pt.raises(ValueError):
        snapshot_diff(old, new, ["id"])


def test_snapshot_diff_separator_byte_not_ambiguous(spark):
    """('a\\x01','b') -> ('a','\\x01b') moves a byte across the column
    boundary: per-column hashing must classify it as an update (a raw
    concat fingerprint would see identical bytes and drop it)."""
    from ecommerce_realtime_pipeline_spark.operators.normalize import snapshot_diff

    old = spark.createDataFrame([(1, "a\x01", "b")], "id long, x string, y string")
    new = spark.createDataFrame([(1, "a", "\x01b")], "id long, x string, y string")
    got = [tuple(r) for r in snapshot_diff(old, new, ["id"]).collect()]
    assert got == [(1, "update")]
