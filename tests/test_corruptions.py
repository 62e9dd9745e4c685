"""Corruption-engine tests (SURVEY §2.3): the post-condition matrix of
the reference's tests/unit/test_corruptions.py:32-119 ported to the
columnar operators — every corruption type of every entity asserted with
the rate forced to 1.0, batch gating with settings-driven rates, and the
end-to-end corruption → validation quarantine wiring."""

from __future__ import annotations

import pytest

from ecommerce_realtime_pipeline_spark.operators import corruptions as C
from ecommerce_realtime_pipeline_spark.operators import generate as G
from ecommerce_realtime_pipeline_spark.operators import validation as V
from ecommerce_realtime_pipeline_spark.settings import Settings

SEED = 42


@pytest.fixture(scope="module")
def batch(spark):
    return G.generate_batch(spark, 20, 20, 20, 20, seed=SEED)


# --- per-type post-conditions, rate forced to 1.0 (reference style) -------


def test_product_missing_name(spark, batch):
    out = C.corrupt_products(batch.products, 1.0, SEED, corruption="missing_name")
    assert all(r["name"] is None for r in out.collect())


def test_product_invalid_price(spark, batch):
    out = C.corrupt_products(batch.products, 1.0, SEED, corruption="invalid_price")
    assert all(float(r["price"]) <= 0 for r in out.collect())


def test_product_missing_category(spark, batch):
    out = C.corrupt_products(batch.products, 1.0, SEED, corruption="missing_category")
    assert all(r["category"] is None for r in out.collect())


def test_product_negative_stock(spark, batch):
    out = C.corrupt_products(batch.products, 1.0, SEED, corruption="negative_stock")
    assert all(r["stock_quantity"] <= 0 for r in out.collect())


def test_product_empty_description(spark, batch):
    out = C.corrupt_products(batch.products, 1.0, SEED, corruption="empty_description")
    assert all(r["description"] == "" for r in out.collect())


def test_customer_corruptions(spark, batch):
    missing = C.corrupt_customers(batch.customers, 1.0, SEED, corruption="missing_email")
    assert all(r["email"] is None for r in missing.collect())
    invalid = C.corrupt_customers(batch.customers, 1.0, SEED, corruption="invalid_email")
    assert all(r["email"] == "not-an-email" for r in invalid.collect())
    noname = C.corrupt_customers(batch.customers, 1.0, SEED, corruption="missing_name")
    assert all(r["name"] is None for r in noname.collect())


def test_order_corruptions(spark, batch):
    no_cust = C.corrupt_orders(batch.orders, 1.0, SEED, corruption="missing_customer_id")
    assert all(r["customer_id"] is None for r in no_cust.collect())
    empty = C.corrupt_orders(batch.orders, 1.0, SEED, corruption="empty_items")
    assert all(r["items"] == [] for r in empty.collect())
    # 'deleted field' → NULL (SURVEY §7 mapping)
    no_status = C.corrupt_orders(batch.orders, 1.0, SEED, corruption="invalid_status")
    assert all(r["status"] is None for r in no_status.collect())
    neg = C.corrupt_orders(batch.orders, 1.0, SEED, corruption="negative_total")
    assert all(float(r["total"]) <= 0 for r in neg.collect())


def test_event_corruptions(spark, batch):
    no_cust = C.corrupt_events(batch.events, 1.0, SEED, corruption="missing_customer_id")
    assert all(r["customer_id"] is None for r in no_cust.collect())
    no_type = C.corrupt_events(batch.events, 1.0, SEED, corruption="invalid_event_type")
    assert all(r["event_type"] is None for r in no_type.collect())


def test_unknown_corruption_rejected(spark, batch):
    with pytest.raises(ValueError):
        C.corrupt_products(batch.products, 1.0, SEED, corruption="teleport")


# --- batch gating ---------------------------------------------------------


def test_rate_zero_is_identity(spark, batch):
    out = C.corrupt_products(batch.products, 0.0, SEED)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.products.collect()))


def test_batch_rates_roughly_hold(spark):
    """Bernoulli gates: with rate 1.0 every row is corrupted (some
    corruption type applies); with 0.0 none are."""
    big = G.generate_batch(spark, 300, 300, 0, 0, seed=9)
    all_corrupt = C.corrupt_customers(big.customers, 1.0, SEED)
    # every row hit by exactly one of the 3 corruption types
    base = {r["customer_id"]: r for r in big.customers.collect()}
    changed = sum(
        1
        for r in all_corrupt.collect()
        if (r["email"] != base[r["customer_id"]]["email"])
        or (r["name"] != base[r["customer_id"]]["name"])
    )
    assert changed == 300


def test_corruption_is_deterministic(spark, batch):
    a = C.corrupt_orders(batch.orders, 0.5, SEED).collect()
    b = C.corrupt_orders(batch.orders.repartition(7), 0.5, SEED).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- end-to-end: corruption feeds validation quarantine -------------------


def test_corrupted_batch_lands_in_quarantine(spark):
    settings = Settings(
        corruption_product_rate=1.0,
        corruption_customer_rate=1.0,
        corruption_order_rate=1.0,
        corruption_event_rate=1.0,
    )
    batch = G.generate_batch(
        spark, 30, 30, 30, 30, seed=SEED, corruption_enabled=True, settings=settings
    ).drop_indexes()
    parents = {"customers": batch.customers}
    for entity, df in [
        ("products", batch.products),
        ("customers", batch.customers),
        ("orders", batch.orders),
        ("events", batch.events),
    ]:
        valid, quarantine, metrics = V.validate_entity(entity, df, parents)
        n_q = quarantine.count()
        # every corruption type violates at least one rule except
        # empty_description (DDL allows description=''), so quarantine
        # captures the (large) majority of a fully-corrupted batch
        assert n_q >= df.count() * 0.5, entity
        assert metrics.count() > 0, entity
