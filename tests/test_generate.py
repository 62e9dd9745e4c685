"""Generator tests (SURVEY §2.2): seed determinism that survives
repartitioning, batch shape, referential coherence, order-total
arithmetic — the Spark analog of the reference's
tests/unit/test_producer.py generation contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import generate as G


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_same_seed_same_rows_any_partitioning(spark):
    """G1: determinism is f(seed, row-id) — identical output for
    different partition counts and across repeated runs."""
    a = G.gen_products(spark, 50, seed=7)
    b = G.gen_products(spark, 50, seed=7).repartition(13)
    assert _rows(a) == _rows(b)
    c = G.gen_customers(spark, 30, seed=7)
    d = G.gen_customers(spark, 30, seed=7).repartition(5)
    assert _rows(c) == _rows(d)


def test_different_seed_different_rows(spark):
    a = G.gen_products(spark, 20, seed=1).select("name", "price", "category")
    b = G.gen_products(spark, 20, seed=2).select("name", "price", "category")
    assert _rows(a) != _rows(b)


def test_batch_shape_and_coherence(spark):
    """G7: counts match the request; orders reference generated
    customers/products; events reference generated customers."""
    batch = G.generate_batch(spark, 8, 6, 15, 30, seed=11)
    assert batch.products.count() == 8
    assert batch.customers.count() == 6
    assert batch.orders.count() == 15
    assert batch.events.count() == 30

    cust_ids = {r[0] for r in batch.customers.select("customer_id").collect()}
    prod_ids = {r[0] for r in batch.products.select("product_id").collect()}
    assert {r[0] for r in batch.orders.select("customer_id").collect()} <= cust_ids
    assert {r[0] for r in batch.events.select("customer_id").collect()} <= cust_ids
    item_pids = {
        r[0]
        for r in batch.orders.select(
            F.explode("items.product_id").alias("pid")
        ).collect()
    }
    assert item_pids <= prod_ids


def test_product_field_domains(spark):
    rows = G.gen_products(spark, 200, seed=3).collect()
    from ecommerce_realtime_pipeline_spark.schemas import PRODUCT_CATEGORIES

    for r in rows:
        assert r["name"].startswith("Product ")
        assert r["category"] in PRODUCT_CATEGORIES
        assert 2.0 <= float(r["price"]) <= 500.0
        assert 0 <= r["stock_quantity"] <= 500
        desc = r["description"]
        assert desc.endswith(".") and 5 <= len(desc.split(" ")) <= 12


def test_customer_email_derived_from_name(spark):
    rows = G.gen_customers(spark, 100, seed=5).collect()
    for r in rows:
        local, _, domain = r["email"].partition("@")
        assert local == r["name"].lower().replace(" ", ".")
        assert domain in ("example.com", "shop.test", "mail.local")


def test_order_items_and_total(spark):
    """G5/G8: 1–5 items each, every total equals the per-line
    bround-then-sum recomputation, items sorted deterministically."""
    batch = G.generate_batch(spark, 10, 5, 40, 10, seed=13)
    from ecommerce_realtime_pipeline_spark.operators.validation import order_total_check

    checked = order_total_check(batch.orders)
    rows = checked.collect()
    assert all(1 <= len(r["items"]) <= 5 for r in rows)
    assert all(r["total_matches"] for r in rows)


def test_unique_ids(spark):
    batch = G.generate_batch(spark, 50, 50, 50, 50, seed=17)
    for df, col in [
        (batch.products, "product_id"),
        (batch.customers, "customer_id"),
        (batch.orders, "order_id"),
        (batch.events, "event_id"),
    ]:
        n = df.count()
        assert df.select(col).distinct().count() == n
