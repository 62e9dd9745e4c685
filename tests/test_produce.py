"""Producer-path tests (SURVEY §2.1 S1–S3): envelope round-trip,
forced order totals, broker-bookkeeping determinism, and the full
produce→ingest loop (mirrors the reference's
tests/integration/test_producer_integration.py intent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import generate as G
from ecommerce_realtime_pipeline_spark.operators.corruptions import corrupt_orders
from ecommerce_realtime_pipeline_spark.schemas import CUSTOMER_SCHEMA
from ecommerce_realtime_pipeline_spark.settings import Settings
from ecommerce_realtime_pipeline_spark.sources import produce as P
from ecommerce_realtime_pipeline_spark.streaming import ingest as I


@pytest.fixture(scope="module")
def batch(spark):
    return G.generate_batch(spark, 20, 20, 20, 20, seed=7).drop_indexes().materialize()


def test_envelope_roundtrip_lossless(spark, batch):
    """value = strict JSON of the payload: from_json(to_json(x)) == x."""
    env = P.to_envelope(batch.customers, "customers")
    back = env.select(
        "key", F.from_json("value", CUSTOMER_SCHEMA).alias("p")
    ).select("key", "p.*")
    orig = {r["customer_id"]: r for r in batch.customers.collect()}
    got = {r["customer_id"]: r for r in back.collect()}
    assert set(got) == set(orig)
    for cid, r in got.items():
        assert r["key"] == cid  # keyed by entity id (S1)
        assert r["email"] == orig[cid]["email"]
        assert r["created_at"] == orig[cid]["created_at"]


def test_topic_routing_respects_settings(spark, batch):
    s = Settings(topic_customers="customers.v2")
    env = P.to_envelope(batch.customers, "customers", s)
    assert env.select("topic").distinct().collect()[0][0] == "customers.v2"


def test_force_totals_repairs_corrupted_header(spark, batch):
    """S2: produce_order recomputes the total, so a negative_total
    corruption never reaches the wire (reference produce_order calls
    compute_total unconditionally)."""
    bad = corrupt_orders(batch.orders, rate=1.0, corruption="negative_total")
    assert bad.filter(F.col("total") < 0).count() > 0  # corruption landed
    env = P.to_envelope(bad, "orders")
    from ecommerce_realtime_pipeline_spark.schemas import ORDER_SCHEMA

    back = env.select(F.from_json("value", ORDER_SCHEMA).alias("p")).select("p.*")
    assert back.filter(F.col("total") < 0).count() == 0
    mism = back.withColumn("_rt", P.computed_total("items")).filter(
        F.col("total") != F.col("_rt")
    )
    assert mism.count() == 0


def test_partition_offset_assignment(spark, batch):
    env = P.assign_partitions_offsets(P.to_envelope(batch.events, "events"), 4)
    rows = env.select("topic_partition", "topic_offset").collect()
    parts = {r["topic_partition"] for r in rows}
    assert parts <= {0, 1, 2, 3}
    # offsets dense from 0 within each partition (broker semantics)
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["topic_partition"], []).append(r["topic_offset"])
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def test_produce_then_ingest_e2e(spark, tmp_path):
    """The full loop: S3 publish → S4-S6 streaming ingest → silver
    equals the generated entity set."""
    topics = str(tmp_path / "topics")
    counts = P.produce_batch(
        spark, topics, customer_count=25, seed=11, n_partitions=2
    )
    assert counts["customers"] == 25
    q = I.run_ingest(
        spark,
        f"{topics}/customers",
        "customers",
        str(tmp_path / "silver"),
        str(tmp_path / "ckpt"),
        offsets_path=str(tmp_path / "offsets"),
    )
    q.awaitTermination(120)
    silver = spark.read.parquet(str(tmp_path / "silver"))
    gen_customers = (
        G.generate_batch(spark, 0, 25, 0, 0, seed=11).drop_indexes().customers
    )
    assert silver.count() == 25
    got = {(r["customer_id"], r["email"]) for r in silver.collect()}
    want = {(r["customer_id"], r["email"]) for r in gen_customers.collect()}
    assert got == want
    # R19 bookkeeping reflects the published offsets
    offs = spark.read.parquet(str(tmp_path / "offsets"))
    assert offs.count() <= 2  # one row per partition
    assert offs.agg(F.sum("offset_committed")).collect()[0][0] is not None


def test_produce_throughput_floor(spark, tmp_path):
    """BASELINE.md: the reference CI asserts > 100 msg/s for a
    1,000-message produce. Mirror the floor against the file-topic
    stand-in end-to-end (generate → envelope → land)."""
    import time

    t0 = time.time()
    counts = P.produce_batch(
        spark, str(tmp_path / "topics"), event_count=1000, customer_count=10, seed=3
    )
    elapsed = time.time() - t0
    n = sum(counts.values())
    assert n >= 1000
    assert n / elapsed > 100, f"{n / elapsed:.0f} msg/s under the 100 msg/s floor"


def test_orders_ingest_maintains_child_items(spark, tmp_path):
    """R11/R9 in the streaming path: order_items child table re-derived
    from the silver order snapshot with generated line_total."""
    topics = str(tmp_path / "topics")
    P.produce_batch(
        spark, topics, product_count=10, customer_count=5, order_count=15, seed=13
    )
    q = I.run_ingest(
        spark,
        f"{topics}/orders",
        "orders",
        str(tmp_path / "silver"),
        str(tmp_path / "ckpt"),
        items_path=str(tmp_path / "items"),
    )
    q.awaitTermination(120)
    silver = spark.read.parquet(str(tmp_path / "silver"))
    items = spark.read.parquet(str(tmp_path / "items"))
    n_expected = silver.agg(F.sum(F.size("items"))).collect()[0][0]
    assert items.count() == n_expected
    bad = items.filter(
        F.col("line_total")
        != F.bround(F.col("quantity").cast("decimal(18,2)") * F.col("unit_price"), 2)
    )
    assert bad.count() == 0
    # every child references a surviving order header (cascade coupling)
    orphans = items.join(silver.select("order_id"), "order_id", "left_anti")
    assert orphans.count() == 0
