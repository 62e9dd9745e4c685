"""Temporal join operators: as-of join and range join.

The reference's funnel/attribution workload ("which page view led to
this purchase", README.md:15 funnel analysis) needs joins Spark's
relational core lacks as primitives. Both are implemented in their
scale-correct shapes:

- **As-of join** (``asof_join``): the union-and-window formulation —
  tag both sides, sort within the key by time, carry the most recent
  right-side row forward with ``last(..., ignorenulls)``. ONE shuffle
  on the key, no join at all, so there is no candidate blow-up on hot
  keys: cost is a sort of |L|+|R| per key, the same plan a 1000-node
  cluster wants for 100 TB of events. (The naive inequality join is
  quadratic per key; pandas ``merge_asof`` is single-node.)

- **Range join** (``range_join``): bucket both sides into
  ``width``-sized time buckets, explode the left side to the bucket
  window that can contain matches (ceil(range/width)+1 buckets), then
  an EQUI-join on (key, bucket) + exact predicate filter. Catalyst gets
  a shuffled hash join on a compound key instead of a
  broadcast-nested-loop over an inequality — the standard interval-join
  layout (Flink's interval join, Databricks' range-join hints do the
  same binning).

Determinism contract: ties among right rows at the same timestamp are
broken by the highest ``right_id`` — both here (window order pushes it
last) and in the DuckDB oracle (ORDER BY ts DESC, id DESC LIMIT 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str | None = None,
    allow_exact_matches: bool = True,
    tolerance_sec: float | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    (``direction="backward"``, the default) or the EARLIEST right row
    at-or-after (``direction="forward"``) its timestamp, per key;
    ``allow_exact_matches`` toggles the at-boundary inclusion either
    way.

    Returns the left rows with the right row's columns added under
    ``prefix`` (null when no right row qualifies). Ties among right
    rows at the same timestamp resolve to the HIGHEST ``right_id``
    backward and the LOWEST forward (the "latest before / first
    after" convention, mirrored in the oracles).

    Scale: one shuffle on ``on`` + one sort — no join operator, so hot
    keys cost O(n log n), never O(n²). ``tolerance_sec`` nulls matches
    outside the window (applied post-hoc, free).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("_r")
    # side ordinal: right rows must sort BEFORE the left rows they are
    # visible to at equal timestamps (inclusive) — or AFTER (strict).
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(r_side).alias("_side"),
        (F.col(right_id) if right_id else F.lit(0)).alias("_rid"),
        r_payload,
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rid"].dataType).alias("_rid"),
        F.lit(None).cast(r_tag.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    both = r_tag.withColumn("_l", F.lit(None).cast(l_tag.schema["_l"].dataType)).unionByName(
        l_tag
    )
    backward = direction == "backward"
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc() if backward else F.col("_t").desc(),
            F.col("_side").asc(),
            F.col("_rid").asc_nulls_first()
            if backward
            else F.col("_rid").desc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_l").isNotNull())
    )
    if tolerance_sec is not None:
        gap = (
            F.unix_micros(F.col("_l")[left_ts]) - F.unix_micros(F.col("_m")[right_ts])
            if backward
            else F.unix_micros(F.col("_m")[right_ts]) - F.unix_micros(F.col("_l")[left_ts])
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= int(tolerance_sec * 1_000_000), F.col("_m"))
        )
    out_cols: list[Column] = [F.col("_l")[c].alias(c) for c in left.columns]
    out_cols += [F.col("_m")[c].alias(f"{prefix}{c}") for c in right.columns]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_sec: float,
    upper_sec: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner join of left×right rows with the same key and
    ``left.ts + lower_sec <= right.ts < left.ts + upper_sec``.

    Returns left columns + right columns (right's key/ts renamed with
    ``r_`` if they collide). Scale: both sides bucketed to
    ``width = upper-lower`` seconds; the left side explodes to the
    2 candidate buckets a match can land in, then a shuffled-hash
    EQUI-join on (key, bucket) + exact filter. Fan-out is a constant 2×
    on the (usually far smaller) left side — never a per-key cross
    product, and AQE handles residual key skew.
    """
    width_us = max(int((upper_sec - lower_sec) * 1_000_000), 1)
    lo_us = int(lower_sec * 1_000_000)
    hi_us = int(upper_sec * 1_000_000)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # right rows land in bucket floor(ts/width); a left row's admissible
    # right window [ts+lo, ts+hi) spans exactly 2 such buckets.
    lb = F.floor((l_us + F.lit(lo_us)) / F.lit(width_us))
    l_exp = left.withColumn("_lus", l_us).withColumn(
        "_bkt", F.explode(F.array(lb.cast("long"), (lb + 1).cast("long")))
    )
    rename = {c: f"r_{c}" for c in right.columns if c in left.columns}
    r_tag = right.withColumn("_rus", r_us).withColumn(
        "_bkt", F.floor(r_us / F.lit(width_us)).cast("long")
    )
    for old, new in rename.items():
        r_tag = r_tag.withColumnRenamed(old, new)
    joined = l_exp.join(
        r_tag,
        (l_exp["_bkt"] == r_tag["_bkt"])
        & (F.col(f"r_{on}" if on in rename else on) == l_exp[on]),
    ).filter(
        (F.col("_rus") >= F.col("_lus") + F.lit(lo_us))
        & (F.col("_rus") < F.col("_lus") + F.lit(hi_us))
    )
    keep = [l_exp[c] for c in left.columns] + [
        F.col(rename.get(c, c)) for c in right.columns
    ]
    return joined.select(*keep)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: spread a hot key of ``big`` across
    ``n_salts`` sub-partitions by salting with a deterministic hash of
    ``salt_from`` (any column unique-ish per row), replicating ``small``
    once per salt value, and joining on (key, salt).

    When to use: AQE's skew-join split is the first line of defense,
    but it can only split what it can see post-shuffle — a single hot
    key that must sort-merge against a non-broadcastable side still
    lands one task's sort on one core. Salting moves the split into the
    plan itself: the hot key becomes ``n_salts`` independent join
    groups at the cost of an ``n_salts``× replication of the SMALL
    side. Deterministic (xxhash64, no RNG) — layout-independent.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    b = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    s = small.withColumn("_salt", F.explode(salts))
    return b.join(s, [on, "_salt"], how).drop("_salt")
