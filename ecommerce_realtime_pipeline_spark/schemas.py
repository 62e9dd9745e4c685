"""Typed schemas for every engine table.

Mirrors the reference's strict Pydantic models
(``src/data_generator/schemas.py:12-110``, ``extra="forbid"``) and the
normalized SQL DDL (``sql/init/02_create_tables.sql:52-141``). In Spark
"strict" means: explicit StructType everywhere, ``from_json`` with a
declared schema (never inference), and parse failures routed to a
quarantine instead of silently dropped.

Money is DecimalType(10,2) at rest (DDL ``DECIMAL(10,2)``); the
reference's Python ``round(x, 2)`` is half-even → use ``F.bround`` for
arithmetic parity (SURVEY §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Entity schemas (silver layer) — reference schemas.py:12-110
# ---------------------------------------------------------------------------

MONEY = T.DecimalType(10, 2)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),  # corruptible → null
        T.StructField("category", T.StringType(), True),
        T.StructField("price", MONEY, True),
        T.StructField("description", T.StringType(), True),
        T.StructField("stock_quantity", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("email", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

ORDER_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("unit_price", MONEY, False),
    ]
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("items", T.ArrayType(ORDER_ITEM_SCHEMA), True),
        T.StructField("total", MONEY, True),
        T.StructField("status", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

# Normalized child table — DDL 02_create_tables.sql:93-109
ORDER_ITEMS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("product_id", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("unit_price", MONEY, False),
        T.StructField("line_total", MONEY, False),  # generated column
    ]
)

# ---------------------------------------------------------------------------
# Raw envelope (bronze) — DDL 02_create_tables.sql:9-47
# ---------------------------------------------------------------------------

RAW_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("topic_partition", T.IntegerType(), False),
        T.StructField("topic_offset", T.LongType(), False),
        T.StructField("message_key", T.StringType(), True),
        T.StructField("payload", T.StringType(), False),  # raw JSON string
        T.StructField("consumed_at", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Monitoring — DDL 02_create_tables.sql:125-141
# ---------------------------------------------------------------------------

CONSUMER_OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("offset_committed", T.LongType(), False),
        T.StructField("consumer_group", T.StringType(), False),
        T.StructField("last_updated", T.TimestampType(), False),
    ]
)

PROCESSING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("records_processed", T.LongType(), False),
        T.StructField("records_failed", T.LongType(), False),
        T.StructField("batch_timestamp", T.TimestampType(), False),
        T.StructField("processing_duration_ms", T.LongType(), False),
    ]
)

# Entity name → payload schema (topic routing, producer.py:153-181)
ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "products": PRODUCT_SCHEMA,
    "customers": CUSTOMER_SCHEMA,
    "orders": ORDER_SCHEMA,
    "events": EVENT_SCHEMA,
}

# Domains enforced by SQL CHECK constraints (02_create_tables.sql:81-82,113-114)
ORDER_STATUSES = ("pending", "processing", "shipped", "delivered", "cancelled")
EVENT_TYPES = ("page_view", "product_view", "add_to_cart", "remove_from_cart", "purchase")

# Generator domains (utils.py:65-82)
PRODUCT_CATEGORIES = (
    "electronics",
    "fashion",
    "books",
    "home",
    "sports",
    "toys",
    "beauty",
    "grocery",
)
EMAIL_DOMAINS = ("example.com", "shop.test", "mail.local")
