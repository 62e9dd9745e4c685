"""PySpark-native analytics engine with the query and data-processing
capabilities of lfp-coding/ecommerce-realtime-pipeline.

Brand-new, Spark-first design (DataFrame / Spark SQL / Structured
Streaming) — NOT a port of the reference's Kafka/Postgres execution
mechanics. See SURVEY.md for the capability blueprint.

Layout:
    session.py    — SparkSession factory (UTC, AQE, arrow)
    settings.py   — env-driven config (mirrors reference settings surface)
    schemas.py    — StructTypes for entities, envelope, monitoring
    catalog.py    — testdata table registry (parquet views)
    generators.py — seed-deterministic synthetic data (G1-G8)
    corruptions.py— columnar fault injection (C1-C5)
    operators/    — validation, dedup, similarity, text, multimodal, etl
    plans/        — KPI / analytics queries (R13-R24)
    sources/      — file + kafka source/sink builders
    streaming/    — Structured Streaming pipeline + metrics listener
"""

__version__ = "0.1.0"
