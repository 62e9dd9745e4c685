"""Multi-dimensional data layout (Z-order / Morton curve) — the
file-skipping lever for tables queried on MORE THAN ONE column.

A 1-D sort gives parquet min/max footer pruning on exactly one column;
any predicate on a second column scans everything. Interleaving the
bits of k normalized column ranks places rows on a space-filling curve,
so every file covers a small HYPER-RECTANGLE of the key space and a
box predicate on ANY subset of the z-columns prunes files (the
Delta/Iceberg OPTIMIZE ZORDER idea, done here with plain parquet +
expressions).

Design:
- ``zorder_key``: per column, rank-normalize to ``bits`` bits via the
  column's (min, max) — a 1-row broadcast, no shuffle — then interleave
  with shift/mask expressions (pure codegen, no UDF). Ties/NULLs map to
  bucket 0.
- ``write_zordered``: repartitionByRange on the key (range exchange =
  contiguous curve segments per file) + sortWithinPartitions, one
  parquet write. The key column ``_z`` is kept in the file: it IS the
  clustering index, and re-layout jobs (compaction) reuse it.
- Correctness contract: layout is a PHYSICAL permutation — the driver
  oracle for ``events_zorder_roundtrip`` aggregates the raw table, so
  the hash-diff proves the rewrite loses/duplicates nothing. The
  file-skipping WIN is pinned in tests by computing per-file min/max
  spans from ``input_file_name`` and counting files intersecting a box
  predicate: z-order must beat the 1-D sort layout on the second
  column.

Scale: min/max are one columnar agg; the range exchange is the same
shuffle any sorted write pays. At 100 TB this runs per partition
(e.g. per day) as the scheduled clustering job, exactly like
``compact_buckets`` runs for the silver layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (2 cols × 16 bits → 32-bit key; raise for more
#: resolution, k·bits ≤ 63 for a BIGINT key).
ZBITS = 16


def _normalized(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-normalize a numeric column into [0, 2^bits) using the
    broadcast (min, max): floor((x-lo)/(hi-lo) * (2^bits - 1) + 0.5).
    Degenerate ranges (hi == lo) and NULLs map to 0."""
    span = (hi - lo).cast("double")
    scaled = (
        (F.col(col).cast("double") - lo.cast("double"))
        / span
        * F.lit((1 << bits) - 1)
    )
    # the outer coalesce realizes the NULLs→0 contract: a NULL value
    # (or an all-NULL column, where span itself is NULL) would
    # otherwise propagate NULL through floor() and leave rows with a
    # NULL clustering key in the NULLs-first range partition.
    return F.coalesce(
        F.when(span <= 0, F.lit(0))
        .otherwise(F.floor(scaled + F.lit(0.5)))
        .cast("long"),
        F.lit(0).cast("long"),
    )


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZBITS, key_col: str = "_z"
) -> DataFrame:
    """Attach the Morton key over ``cols``: bit j of column i lands at
    key bit ``j * n_cols + i``. Bounds ride one 1-row broadcast."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("zorder: n_cols * bits must fit a signed long")
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = _normalized(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        out = out.withColumn(f"_zn_{c}", v)
        for j in range(bits):
            key = key + F.expr(
                f"shiftleft(shiftright(_zn_{c}, {j}) & 1L, {j * n + i})"
            )
    drop = [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols] + [
        f"_zn_{c}" for c in cols
    ]
    return out.withColumn(key_col, key).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Z-curve over ``cols``: range-partition on the key (contiguous curve
    segments per file) + in-file sort, so parquet footer min/max on
    EVERY z-column is tight per file."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_spans(df_from_path: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max spans for ``cols`` (the footer-stats view a
    scan planner prunes with): one agg over ``input_file_name``."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df_from_path.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )
