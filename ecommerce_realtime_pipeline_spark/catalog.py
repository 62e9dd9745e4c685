"""Testdata catalog: registers the driver's parquet tables as temp views.

Mirrors the reference's storage bootstrap (``sql/init/01_create_schemas.sql``
+ ``02_create_tables.sql`` executed at container init) — in Spark the
"catalog init" is just view registration over columnar files; Catalyst
gets schema + min/max pushdown from the parquet footers for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ecommerce_realtime_pipeline_spark.settings import Settings

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = Settings().sf_dir


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → columnar, pushdown-capable.

    ``events.ts`` normalizes to a µs TIMESTAMP (LTZ) whatever the
    driver generated: TIMESTAMP(NANOS) parquet (Spark 4 rejects it —
    read ns as long via legacy conf, floor-truncate ns→µs) or a naive
    µs timestamp (Spark infers TIMESTAMP_NTZ — cast to LTZ, value-
    preserving under the session's pinned UTC). Both match DuckDB's
    read of the same file, so oracle ``epoch_us`` comparisons line up,
    and downstream ``unix_micros`` (LTZ-only) always resolves.
    """
    if name == "events":
        # Our session factory sets these at build time; set them here too
        # so load_table also works on a driver-owned session. Scoped to
        # the events read path — the only ns-timestamp table — so other
        # reads are unaffected. The UTC pin matters for the NTZ branch:
        # NTZ→LTZ cast is only value-preserving when the session zone is
        # UTC; without it a non-UTC driver session silently shifts every
        # ts by the zone offset and breaks oracle epoch_us parity.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            from pyspark.sql import functions as F

            # explicit timestamp_ltz: cast("timestamp") resolves through
            # spark.sql.timestampType and would be a no-op on a session
            # that defaults to TIMESTAMP_NTZ, leaving unix_micros
            # (LTZ-only) unresolvable downstream.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all testdata tables as temp views; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def init_catalog(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """S7 catalog bootstrap — the Spark counterpart of the reference's
    file-ordered SQL init (``sql/init/01→03``, ``init-multi-db.sh``):
    register data views plus empty, schema-typed monitoring tables
    (``processing_stats``, ``consumer_offsets`` —
    ``02_create_tables.sql:125-141``) so monitoring queries are valid
    from the first batch. Index DDL (``03_create_indexes.sql``) has no
    Spark equivalent by design: parquet footers + Catalyst pushdown
    replace b-tree/GIN indexes."""
    from ecommerce_realtime_pipeline_spark.schemas import (
        CONSUMER_OFFSETS_SCHEMA,
        PROCESSING_STATS_SCHEMA,
    )

    out = register_views(spark, sf_dir)
    for name, schema in (
        ("processing_stats", PROCESSING_STATS_SCHEMA),
        ("consumer_offsets", CONSUMER_OFFSETS_SCHEMA),
    ):
        if not spark.catalog.tableExists(name):
            df = spark.createDataFrame([], schema)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-BUCKETED (and optionally sorted) managed
    table — the at-rest layout that makes repeated equi-joins and
    aggregations on ``key`` shuffle-free: two tables bucketed on the
    same key with the same bucket count sort-merge-join with NO
    Exchange on either side (Spark reads bucket i of A against bucket i
    of B), and a groupBy(key) needs no shuffle either.

    This is the curated-layout counterpart of the reference's
    b-tree-indexed Postgres tables (``sql/init/03_create_indexes.sql``):
    at 100 TB you pay ONE shuffle at write time, then every nightly
    join/rollup on the key reads co-located buckets. Choose
    ``n_buckets`` so a bucket ~ one task's memory (e.g. facts at 100 TB
    → tens of thousands of buckets).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
