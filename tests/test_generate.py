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


def test_produced_topics_fixture_memoizes_and_matches_real_publish(
    spark, tmp_path, monkeypatch
):
    """The session topic-tree memo must be invisible to consumers:
    (1) the linked tree a `_memo_publisher` caller receives is
    byte-identical to what the real `produce_batch` writes for the
    same spec, with identical counts; (2) the REAL produce runs once
    per (session, spec) — later calls reuse the tree without a new
    publish; (3) a different spec misses the memo."""
    import os

    from ecommerce_realtime_pipeline_spark.plans import gen as GP
    from ecommerce_realtime_pipeline_spark.sources import produce as P

    spec = dict(
        product_count=0, customer_count=7, order_count=0, event_count=0,
        seed=33, n_partitions=2, entities=("customers",),
    )
    real_dir = str(tmp_path / "real")
    real_counts = P.produce_batch(spark, real_dir, **spec)

    calls = {"n": 0}
    real_produce = P.produce_batch

    def counting(*a, **kw):
        calls["n"] += 1
        return real_produce(*a, **kw)

    monkeypatch.setattr(P, "produce_batch", counting)
    linked1 = str(tmp_path / "linked1")
    counts1 = GP._memo_publisher(spark, linked1, **spec)
    linked2 = str(tmp_path / "linked2")
    counts2 = GP._memo_publisher(spark, linked2, **spec)
    assert counts1 == counts2 == real_counts
    assert calls["n"] <= 1  # 0 if an earlier test in this session built it

    # the linked tree is content-identical to a fresh real publish
    # (part-file NAMES carry write UUIDs; consumers read directories,
    # so compare each directory's merged line multiset). consumed_at
    # is the publisher's wall-clock stamp — it differs between ANY two
    # real publishes, so no deterministic query output can depend on
    # it; drop it before comparing.
    import json as _json

    def _dirs(root):
        out = {}
        for dp, _dn, fns in os.walk(root):
            lines = []
            for fn in fns:
                if fn.startswith(("_", ".")):
                    continue
                with open(os.path.join(dp, fn)) as fh:
                    for ln in fh.read().splitlines():
                        rec = _json.loads(ln)
                        rec.pop("consumed_at", None)
                        lines.append(_json.dumps(rec, sort_keys=True))
            if lines:
                out[os.path.relpath(dp, root)] = sorted(lines)
        return out

    assert _dirs(real_dir) == _dirs(linked1)

    # different spec = different memo key = a real publish
    before = calls["n"]
    GP._memo_publisher(
        spark, str(tmp_path / "linked3"),
        **{**spec, "customer_count": 8},
    )
    assert calls["n"] == before + 1
