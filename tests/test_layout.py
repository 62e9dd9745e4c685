"""Pins for the Z-order layout operator: key construction, content
invariance of the rewrite, and the actual file-skipping win over a 1-D
sort layout (the property that justifies the operator at 100 TB)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.catalog import load_table
from ecommerce_realtime_pipeline_spark.operators import layout as L


def test_zorder_key_interleaves_bits(spark):
    """With 2 cols and ranges [0, 2^bits-1] the normalization is the
    identity, so the key must be the exact Morton interleave."""
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["_z"]
        for r in L.with_zorder_key(df, ["x", "y"], bits=2).collect()
    }

    def morton(x, y):
        z = 0
        for j in range(2):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    for (x, y), z in out.items():
        assert z == morton(x, y), (x, y, z)


def test_zorder_rejects_overflowing_key(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        L.with_zorder_key(df, ["x", "y"], bits=32)


def test_zorder_beats_1d_sort_on_second_column(spark, sf_dir):
    """THE property that pays for the operator: under a 2-D box
    predicate, fewer z-ordered files intersect the box than files
    sorted on one column only (the 1-D layout is ignorant of the
    second column, so ~every file spans its full range)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lo_v, hi_v = events.agg(F.min("value"), F.max("value")).collect()[0]
    # the adversarial predicate for a user-sorted layout: a narrow band
    # on the SECOND column only — 1-D footer stats cannot prune at all
    box_v = (lo_v + (hi_v - lo_v) * 0.40, lo_v + (hi_v - lo_v) * 0.55)
    tmp = tempfile.mkdtemp(prefix="eng_zorder_t_")
    try:
        L.write_zordered(events, f"{tmp}/z", ["user_id", "value"], n_files=8)
        (
            events.repartitionByRange(8, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(f"{tmp}/lin")
        )

        def candidate_files(path: str) -> int:
            spans = L.file_spans(
                spark.read.parquet(path), ["user_id", "value"]
            ).collect()
            assert len(spans) == 8
            return sum(
                1
                for r in spans
                if r["min_value"] <= box_v[1] and r["max_value"] >= box_v[0]
            )

        n_z, n_lin = candidate_files(f"{tmp}/z"), candidate_files(f"{tmp}/lin")
        # user-sorted files each span ~the full value range → nothing
        # prunes; z-order files cover value sub-bands → real skipping
        assert n_lin == 8, n_lin
        assert n_z < n_lin, (n_z, n_lin)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zorder_rewrite_preserves_rows(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    tmp = tempfile.mkdtemp(prefix="eng_zorder_t2_")
    try:
        L.write_zordered(events, f"{tmp}/z", ["user_id", "value"])
        back = spark.read.parquet(f"{tmp}/z")
        assert back.count() == events.count()
        assert back.select(F.sum("event_id")).collect()[0][0] == (
            events.select(F.sum("event_id")).collect()[0][0]
        )
        assert back.where(F.col("_z").isNull()).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
