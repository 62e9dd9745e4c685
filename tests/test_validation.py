"""Unit tests for the validation/quarantine operator family — the Spark
counterpart of the reference's SQL constraints (CHECK/UNIQUE/FK in
sql/init/02_create_tables.sql:56-121) and its corruption post-condition
test style (tests/unit/test_corruptions.py)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal as D

from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import validation as V
from ecommerce_realtime_pipeline_spark.schemas import (
    CUSTOMER_SCHEMA,
    EVENT_SCHEMA,
    ORDER_SCHEMA,
    PRODUCT_SCHEMA,
)

TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _products(spark, rows):
    return spark.createDataFrame(rows, PRODUCT_SCHEMA)


def test_row_rules_route_violations(spark):
    df = _products(
        spark,
        [
            ("p1", "ok", "books", D("10.00"), "d", 5, TS, TS),
            ("p2", None, "books", D("10.00"), "d", 5, TS, TS),  # missing name
            ("p3", "neg", "books", D("-3.00"), "d", 5, TS, TS),  # invalid price
            ("p4", "negstock", None, D("1.00"), "d", -2, TS, TS),  # 2 violations
        ],
    )
    valid, quarantine, metrics = V.validate_entity("products", df)
    assert {r["product_id"] for r in valid.collect()} == {"p1"}
    q = {r["product_id"]: set(r[V.VIOLATIONS_COL]) for r in quarantine.collect()}
    assert q["p2"] == {"product_name_not_null"}
    assert q["p3"] == {"product_price_non_negative"}
    assert q["p4"] == {"product_category_not_null", "product_stock_non_negative"}
    m = {(r["table_name"], r["rule"]): r["n_violations"] for r in metrics.collect()}
    assert m[("products", "product_name_not_null")] == 1
    assert m[("products", "product_stock_non_negative")] == 1


def test_unique_email_first_wins(spark):
    df = spark.createDataFrame(
        [
            ("c1", "a@x.com", "A", TS, TS),
            ("c2", "a@x.com", "A2", TS + dt.timedelta(hours=1), TS),  # later dup
            ("c3", "b@y.org", "B", TS, TS),
            ("c4", None, "NoMail", TS, TS),  # null email: not a unique conflict
        ],
        CUSTOMER_SCHEMA,
    )
    valid, quarantine, _ = V.validate_entity("customers", df)
    assert {r["customer_id"] for r in quarantine.collect()} >= {"c2"}
    q = {r["customer_id"]: set(r[V.VIOLATIONS_COL]) for r in quarantine.collect()}
    assert "customer_email_unique" in q["c2"]
    # c4 fails NOT NULL but NOT uniqueness
    assert q["c4"] == {"customer_email_not_null", "customer_email_format"}
    assert {r["customer_id"] for r in valid.collect()} == {"c1", "c3"}


def test_fk_orders_to_customers(spark):
    customers = spark.createDataFrame([("c1", "a@x.com", "A", TS, TS)], CUSTOMER_SCHEMA)
    orders = spark.createDataFrame(
        [
            ("o1", "c1", [("p1", 1, D("5.00"))], D("5.00"), "pending", TS, TS),
            ("o2", "ghost", [("p1", 1, D("5.00"))], D("5.00"), "pending", TS, TS),  # orphan
            ("o3", None, [("p1", 1, D("5.00"))], D("5.00"), "pending", TS, TS),  # null, not FK
        ],
        ORDER_SCHEMA,
    )
    valid, quarantine, _ = V.validate_entity("orders", orders, {"customers": customers})
    q = {r["order_id"]: set(r[V.VIOLATIONS_COL]) for r in quarantine.collect()}
    assert q["o2"] == {"order_fk_customer"}
    assert q["o3"] == {"order_customer_id_not_null"}
    assert {r["order_id"] for r in valid.collect()} == {"o1"}


def test_order_domain_and_empty_items(spark):
    orders = spark.createDataFrame(
        [
            ("o1", "c1", [("p1", 2, D("3.00"))], D("6.00"), "shipped", TS, TS),
            ("o2", "c1", [], D("0.00"), "pending", TS, TS),  # empty items
            ("o3", "c1", [("p1", 1, D("1.00"))], D("1.00"), "teleported", TS, TS),  # bad status
            ("o4", "c1", [("p1", 1, D("1.00"))], D("-1.00"), None, TS, TS),  # neg + null status
        ],
        ORDER_SCHEMA,
    )
    _, quarantine, _ = V.validate_entity("orders", orders)
    q = {r["order_id"]: set(r[V.VIOLATIONS_COL]) for r in quarantine.collect()}
    assert q["o2"] == {"order_items_not_empty"}
    assert q["o3"] == {"order_status_domain"}
    assert q["o4"] == {"order_total_non_negative", "order_status_not_null"}


def test_event_rules(spark):
    events = spark.createDataFrame(
        [
            ("e1", "page_view", "c1", TS),
            ("e2", "warp", "c1", TS),  # invalid type
            ("e3", None, "c1", TS),  # deleted field → null
            ("e4", "purchase", None, TS),  # missing customer
        ],
        EVENT_SCHEMA,
    )
    valid, quarantine, _ = V.validate_entity("events", events)
    q = {r["event_id"]: set(r[V.VIOLATIONS_COL]) for r in quarantine.collect()}
    assert q["e2"] == {"event_type_domain"}
    assert q["e3"] == {"event_type_not_null"}
    assert q["e4"] == {"event_customer_id_not_null"}
    assert {r["event_id"] for r in valid.collect()} == {"e1"}


def test_order_total_check_per_line_then_sum(spark):
    # Reference contract (schemas.py:79-82): per-line round THEN sum.
    # With DECIMAL(10,2) prices each line total is exact; the header must
    # equal the line sum, and a drifted header is flagged.
    orders = spark.createDataFrame(
        [
            ("o1", "c1", [("p1", 3, D("1.12")), ("p2", 2, D("2.50"))], D("8.36"), "pending", TS, TS),
            ("o2", "c1", [("p1", 3, D("1.12"))], D("3.35"), "pending", TS, TS),  # drifted header
            ("o3", "c1", [], D("0.00"), "pending", TS, TS),
        ],
        ORDER_SCHEMA,
    )
    out = {r["order_id"]: r for r in V.order_total_check(orders).collect()}
    assert out["o1"]["total_matches"] is True
    assert float(out["o1"]["computed_total"]) == 8.36
    assert out["o2"]["total_matches"] is False
    assert float(out["o2"]["computed_total"]) == 3.36
    assert float(out["o3"]["computed_total"]) == 0.0


def test_unique_compound_key_order_items(spark):
    items = spark.createDataFrame(
        [
            ("o1", "p1", 1, D("2.00")),
            ("o1", "p1", 3, D("2.00")),  # duplicate product in order
            ("o1", "p2", 1, D("2.00")),
        ],
        "order_id string, product_id string, quantity int, unit_price decimal(10,2)",
    )
    valid, quarantine, _ = V.validate_entity("order_items", items)
    assert valid.count() == 2
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["quantity"] == 3  # first-by-order wins
    assert set(q[0][V.VIOLATIONS_COL]) == {"item_order_product_unique"}


def test_no_collect_in_plan(spark):
    """Validation is a pure plan: building it triggers no jobs."""
    df = _products(spark, [("p1", "n", "books", D("1.00"), "d", 1, TS, TS)])
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    V.validate_entity("products", df)
    after = tracker.getJobIdsForGroup(None)
    assert before == after
