"""Batch file sources — schema-STRICT CSV / JSONL readers with a
corrupt-row quarantine, for entity data delivered out-of-band (vendor
drops, backfills, exports) rather than through the envelope stream.

The reference ingests only via Kafka JSON (its consumer modules are
stubs); this is the batch-side completion of the same strict-schema
stance (SURVEY §1.2): never infer schemas, never drop bad rows
silently — a record that fails the declared entity StructType lands in
a quarantine frame with the raw text intact for reprocessing, exactly
like ``normalize.parse_envelope`` does for envelope payloads.

Scale: both readers are plain distributed file scans (CSV/JSON
splittable by line); the PERMISSIVE + ``columnNameOfCorruptRecord``
path is evaluated inside the scan — one pass, no post-hoc re-parse.
The quarantine split is two filters over one cached-at-the-source
projection, and Catalyst prunes the corrupt-record column away from
the happy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecommerce_realtime_pipeline_spark.schemas import ENTITY_SCHEMAS

#: internal corrupt-record capture column ('_'-prefixed convention)
_CORRUPT = "__corrupt_record"


def _schema_with_capture(entity: str) -> T.StructType:
    """Entity StructType + the corrupt-record capture column (Spark
    requires it declared in the read schema to populate it)."""
    base = ENTITY_SCHEMAS[entity]
    return T.StructType(
        list(base.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )


def _split_quarantine(
    raw: DataFrame, entity: str
) -> tuple[DataFrame, DataFrame]:
    """(typed, quarantine): a row is quarantined when the reader
    captured raw text for it (parse failure), OR any field the entity
    schema declares NON-NULLABLE parsed NULL — a MISSING required
    field produces no corrupt record in PERMISSIVE mode, so the
    nullability contract is the only net that catches it. Mirrors
    ``parse_envelope``'s strict-id stance, generalized to every
    required field.

    CONSUMER NOTE: Spark rejects scans whose referenced columns are
    ONLY the corrupt-record capture (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    — when aggregating over the quarantine's ``raw_record`` alone,
    include any data column in the same aggregate (pattern in
    ``gen.filesrc_quarantine_shape``)."""
    required = [f.name for f in ENTITY_SCHEMAS[entity].fields if not f.nullable]
    bad_pred = F.col(_CORRUPT).isNotNull()
    for name in required:
        bad_pred = bad_pred | F.col(name).isNull()
    quarantine = raw.filter(bad_pred).select(
        F.col(_CORRUPT).alias("raw_record"), *ENTITY_SCHEMAS[entity].names
    )
    typed = raw.filter(~bad_pred).drop(_CORRUPT)
    return typed, quarantine


def read_jsonl(
    spark: SparkSession, path: str, entity: str
) -> tuple[DataFrame, DataFrame]:
    """Strict-schema JSON-lines reader → (typed, quarantine).

    Known (documented) parser lenience: Spark's JSON reader CONVERTS a
    numeric value in a timestamp field to an epoch timestamp instead of
    failing — a legal value the quarantine cannot distinguish from
    intent. Unparseable strings ARE captured as corrupt records, and
    missing required fields are caught by the nullability net."""
    raw = (
        spark.read.schema(_schema_with_capture(entity))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split_quarantine(raw, entity)


def read_csv(
    spark: SparkSession, path: str, entity: str
) -> tuple[DataFrame, DataFrame]:
    """Strict-schema CSV reader (header, ISO timestamps) →
    (typed, quarantine). Orders are excluded by design: their nested
    ``items`` array has no faithful CSV encoding — deliver orders as
    JSONL (or the envelope stream), never flattened CSV.

    Parsing rides ``from_csv`` over whole text lines instead of the
    native CSV scan ON PURPOSE: the native scan parses only the
    PROJECTED columns, so a quarantine filter that references the
    corrupt-record column never parses the malformed field and the bad
    row silently counts as clean (verified: the same file answered
    'quarantine is empty' under pruning). One expression per line
    parses the full record, so corrupt detection is projection-
    independent — the ``parse_envelope`` layout applied to CSV.

    DELIVERY CONTRACT: line-oriented — embedded quotes/commas are
    handled by standard CSV quoting (round-trip property-tested), but
    a NEWLINE inside a value is not representable (the text reader
    splits records on lines); deliver newline-bearing fields as JSONL."""
    if entity == "orders":
        raise ValueError(
            "read_csv: orders carry a nested items array — use read_jsonl"
        )
    schema = _schema_with_capture(entity)
    header = ",".join(ENTITY_SCHEMAS[entity].names)
    lines = spark.read.text(path).filter(F.col("value") != F.lit(header))
    parsed = lines.select(
        F.from_csv(
            "value",
            ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
            ),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
                "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss'Z'",
                # preserve whitespace-bearing values verbatim (both the
                # writer and parser TRIM by default, silently turning
                # ' ' into NULL — round-trip property-tested)
                "ignoreLeadingWhiteSpace": "false",
                "ignoreTrailingWhiteSpace": "false",
            },
        ).alias("_p"),
        F.col("value").alias("_raw"),
    )
    raw = parsed.select(
        "_p.*",
        F.when(F.col(f"_p.{_CORRUPT}").isNotNull(), F.col("_raw")).alias(
            "_raw_line"
        ),
    ).withColumn(_CORRUPT, F.col("_raw_line")).drop("_raw_line")
    return _split_quarantine(raw, entity)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Round-trip writer (ISO-8601 timestamps so ``read_jsonl`` and the
    envelope parser accept the output verbatim)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            out = out.withColumn(
                f.name, F.date_format(f.name, "yyyy-MM-dd'T'HH:mm:ss'Z'")
            )
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Round-trip CSV writer (header + the same ISO timestamp format
    ``read_csv`` declares)."""
    df.write.mode("overwrite").option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss'Z'"
    ).option("ignoreLeadingWhiteSpace", "false").option(
        "ignoreTrailingWhiteSpace", "false"
    ).csv(path)
