"""Env-driven engine configuration.

Mirrors the reference's pydantic-settings surface
(``src/config/settings.py:7-76``) field-for-field where meaningful for a
Spark engine: batch shape defaults, corruption probabilities, topic
names, and adds Spark-side knobs (sf dir, shuffle partitions).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class Settings:
    # Topic routing — reference settings.py:27-30
    topic_orders: str = field(default_factory=lambda: _env("TOPIC_ORDERS", "orders"))
    topic_customers: str = field(default_factory=lambda: _env("TOPIC_CUSTOMERS", "customers"))
    topic_products: str = field(default_factory=lambda: _env("TOPIC_PRODUCTS", "products"))
    topic_events: str = field(default_factory=lambda: _env("TOPIC_EVENTS", "events"))

    # Default batch shape — reference producer.py:268-271, settings.py:20
    default_products: int = 5
    default_customers: int = 5
    default_orders: int = 10
    default_events: int = 25
    batch_size: int = field(default_factory=lambda: int(_env("BATCH_SIZE", "50")))

    # Corruption probabilities — reference settings.py:63-67
    corruption_product_rate: float = field(
        default_factory=lambda: float(_env("CORRUPTION_PRODUCT_RATE", "0.01"))
    )
    corruption_customer_rate: float = field(
        default_factory=lambda: float(_env("CORRUPTION_CUSTOMER_RATE", "0.02"))
    )
    corruption_order_rate: float = field(
        default_factory=lambda: float(_env("CORRUPTION_ORDER_RATE", "0.03"))
    )
    corruption_event_rate: float = field(
        default_factory=lambda: float(_env("CORRUPTION_EVENT_RATE", "0.04"))
    )

    # Kafka (used only when a broker is configured; tests use file sources)
    kafka_bootstrap_servers: str = field(
        default_factory=lambda: _env("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    )

    # Spark-side
    sf_dir: str = field(
        default_factory=lambda: _env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus: int = field(default_factory=lambda: int(_env("SPARK_GRAFT_CPUS", "32")))
