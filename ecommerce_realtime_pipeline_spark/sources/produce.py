"""Producer / publish path (SURVEY §2.1 S1–S3).

The reference publishes entities as JSON bytes keyed by the entity id,
with per-entity topic routing and an eager ``compute_total()`` on
orders before publish (``src/data_generator/producer.py:105-235``).
Spark-first mapping: an entity DataFrame becomes an **envelope**
DataFrame ``(topic, key, value)`` via ``to_json(struct(...))`` — the
exact shape ``df.write.format("kafka")`` consumes — and "publish" is
one distributed write, not a per-record loop.

What intentionally does NOT carry over: the reference's retry/backoff
on local queue full and its delivery callbacks
(``producer.py:105-148``) are client-buffer mechanics of a per-record
librdkafka producer. In Spark the writer task IS the delivery unit —
task retry + sink transactionality (checkpointed epochs for streams,
job commit for batch) subsume them; per-record backoff would be
driver-side looping, the anti-pattern.

No broker runs in this container, so ``write_topic`` lands envelopes
as JSON-lines files under ``<dir>/<topic>/`` — the same envelope rows
``streaming.ingest.stream_envelopes`` consumes, which closes the
produce→consume loop end-to-end in tests. ``kafka_writer_options``
documents the real-broker config (acks/idempotence/compression,
``producer.py:68-77``) for deployments with a broker.

Scale stance: envelope construction is a pure projection (no shuffle).
Partition assignment is ``pmod(xxhash64(key), n)`` — the shape of
Kafka's default hash partitioner, deterministic per key. Offset
assignment (broker-side in Kafka) is a per-partition ``row_number``
for the file stand-in: one shuffle on the partition id, proportional
to the published batch, not to history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import generate as G
from ecommerce_realtime_pipeline_spark.schemas import ENTITY_SCHEMAS
from ecommerce_realtime_pipeline_spark.settings import Settings

# entity → (id column, Settings topic attribute) — producer.py:153-181
ENTITY_ROUTING: dict[str, tuple[str, str]] = {
    "products": ("product_id", "topic_products"),
    "customers": ("customer_id", "topic_customers"),
    "orders": ("order_id", "topic_orders"),
    "events": ("event_id", "topic_events"),
}


def kafka_writer_options(settings: Settings) -> dict[str, str]:
    """The reference producer's delivery configuration
    (``producer.py:68-77``) translated to Spark kafka-sink options; used
    only when a broker is configured."""
    return {
        "kafka.bootstrap.servers": settings.kafka_bootstrap_servers,
        "kafka.acks": "all",
        "kafka.enable.idempotence": "true",
        "kafka.compression.type": "lz4",
        "kafka.linger.ms": "5",
    }


def entity_topic(entity: str, settings: Settings | None = None) -> str:
    settings = settings or Settings()
    return getattr(settings, ENTITY_ROUTING[entity][1])


def computed_total(items_col: str | F.Column = "items") -> F.Column:
    """G8 header total from an items array: per-line bround then sum
    (``schemas.py:60-61,79-82``)."""
    return F.bround(
        F.aggregate(
            F.coalesce(items_col, F.array()),
            F.lit(0).cast("decimal(18,2)"),
            lambda acc, x: (
                acc + F.bround(x["quantity"].cast("decimal(18,2)") * x["unit_price"], 2)
            ).cast("decimal(18,2)"),
        ),
        2,
    ).cast("decimal(10,2)")


def force_order_totals(orders: DataFrame) -> DataFrame:
    """S2: ``produce_order`` recomputes the header total from the items
    before publish (``producer.py:169-176``) so downstream consumers
    never see a stale total."""
    return orders.withColumn("total", computed_total("items"))


def to_envelope(df: DataFrame, entity: str, settings: Settings | None = None) -> DataFrame:
    """S1/S2: entity rows → ``(topic, key, value)`` publish envelopes.

    ``value`` is the JSON of exactly the entity's declared payload
    fields (strict schema — the same StructType ``from_json`` parses on
    the consume side, so produce→consume round-trips losslessly).
    Orders get their total recomputed first (S2 contract).
    """
    if entity not in ENTITY_ROUTING:
        raise KeyError(f"unknown entity: {entity}")
    if entity == "orders":
        df = force_order_totals(df)
    id_col = ENTITY_ROUTING[entity][0]
    payload_cols = [f.name for f in ENTITY_SCHEMAS[entity].fields]
    return df.select(
        F.lit(entity_topic(entity, settings)).alias("topic"),
        F.col(id_col).alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def assign_partitions_offsets(
    envelopes: DataFrame, n_partitions: int = 4, base_offset: int = 0
) -> DataFrame:
    """Broker-side bookkeeping for the file-topic stand-in: partition =
    hash(key) mod n (Kafka default-partitioner shape, deterministic per
    key), offset = dense per-partition sequence ordered by key (a
    deterministic stand-in for arrival order)."""
    part = F.pmod(F.xxhash64("key"), F.lit(n_partitions)).cast("int")
    with_part = envelopes.withColumn("topic_partition", part)
    rn = F.row_number().over(
        Window.partitionBy("topic", "topic_partition").orderBy("key")
    )
    return with_part.withColumn(
        "topic_offset", (rn + F.lit(base_offset - 1)).cast("long")
    )


def write_topic(
    envelopes: DataFrame,
    topics_dir: str,
    n_partitions: int = 4,
    base_offset: int = 0,
) -> None:
    """S1 sink (file stand-in): land envelopes as JSON-lines under
    ``<topics_dir>/<topic>/`` in the RAW_ENVELOPE_SCHEMA shape that
    ``streaming.ingest.stream_envelopes`` reads. With a real broker,
    replace with ``.write.format("kafka").options(**kafka_writer_options)``
    on the (topic, key, value) frame and drop the bookkeeping columns —
    the broker assigns partition/offset."""
    full = assign_partitions_offsets(envelopes, n_partitions, base_offset).select(
        "topic",
        "topic_partition",
        "topic_offset",
        F.col("key").alias("message_key"),
        F.col("value").alias("payload"),
        F.current_timestamp().alias("consumed_at"),
    )
    # one directory per topic (a Kafka topic stand-in). The topic set is
    # ≤ #entities, so collecting it is a constant-size driver list, not a
    # per-row loop; each topic lands in one distributed write.
    topics = [r[0] for r in full.select("topic").distinct().collect()]
    for t in topics:
        full.filter(F.col("topic") == t).write.mode("append").json(
            os.path.join(topics_dir, t)
        )


def produce_batch(
    spark: SparkSession,
    topics_dir: str,
    product_count: int | None = None,
    customer_count: int | None = None,
    order_count: int | None = None,
    event_count: int | None = None,
    seed: int = 42,
    corruption_enabled: bool = False,
    settings: Settings | None = None,
    n_partitions: int = 4,
) -> dict[str, int]:
    """S3: generate a seeded synthetic batch and publish all four entity
    sets (``producer.py:186-235``). Counts default to the settings batch
    shape (reference CLI defaults 5/5/10/25, ``producer.py:268-271``).
    Returns per-topic published counts (the ProducerMetrics equivalent).
    The batch write is synchronous — ``flush=True`` semantics are
    inherent."""
    settings = settings or Settings()
    batch = G.generate_batch(
        spark,
        settings.default_products if product_count is None else product_count,
        settings.default_customers if customer_count is None else customer_count,
        settings.default_orders if order_count is None else order_count,
        settings.default_events if event_count is None else event_count,
        seed=seed,
        corruption_enabled=corruption_enabled,
        settings=settings,
    ).drop_indexes().materialize()
    counts: dict[str, int] = {}
    for entity, df in (
        ("products", batch.products),
        ("customers", batch.customers),
        ("orders", batch.orders),
        ("events", batch.events),
    ):
        env = to_envelope(df, entity, settings)
        write_topic(env, topics_dir, n_partitions=n_partitions)
        counts[entity_topic(entity, settings)] = env.count()
    return counts


def run_cli(argv: list[str] | None = None) -> int:
    """The reference's producer CLI (``producer.py:266-300``) against
    the file-topic stand-in: ``python -m
    ecommerce_realtime_pipeline_spark.sources.produce --topics-dir /tmp/topics``."""
    import argparse

    from ecommerce_realtime_pipeline_spark.session import get_spark

    parser = argparse.ArgumentParser(description="Produce a synthetic batch")
    parser.add_argument("--topics-dir", required=True)
    parser.add_argument("--products", type=int, default=None)
    parser.add_argument("--customers", type=int, default=None)
    parser.add_argument("--orders", type=int, default=None)
    parser.add_argument("--events", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--corrupt", action="store_true")
    args = parser.parse_args(argv)
    counts = produce_batch(
        get_spark("producer_cli"),
        args.topics_dir,
        product_count=args.products,
        customer_count=args.customers,
        order_count=args.orders,
        event_count=args.events,
        seed=args.seed,
        corruption_enabled=args.corrupt,
    )
    print(counts)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(run_cli())
