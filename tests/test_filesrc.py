"""Batch file sources: strict-schema CSV/JSONL round-trips and the
corrupt-row quarantine (bad rows survive with raw text, never dropped
silently; the happy path never sees them)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import generate as G
from ecommerce_realtime_pipeline_spark.sources import filesrc as FS


def _gen_customers(spark, n=12):
    return (
        G.generate_batch(spark, 0, n, 0, 0, seed=11)
        .drop_indexes()
        .materialize()
        .customers
    )


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*sorted(df.columns)).collect()
    )


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    cust = _gen_customers(spark)
    path = str(tmp_path / "cust_jsonl")
    FS.write_jsonl(cust, path)
    typed, quarantine = FS.read_jsonl(spark, path, "customers")
    assert quarantine.count() == 0
    assert _rows(typed) == _rows(cust)


def test_csv_roundtrip_lossless(spark, tmp_path):
    cust = _gen_customers(spark)
    path = str(tmp_path / "cust_csv")
    FS.write_csv(cust, path)
    typed, quarantine = FS.read_csv(spark, path, "customers")
    assert quarantine.count() == 0
    assert _rows(typed) == _rows(cust)


def test_jsonl_corrupt_rows_quarantined_not_dropped(spark, tmp_path):
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    good = (
        '{"customer_id": "c1", "email": "c1@x.test", "name": "C1", '
        '"created_at": "2025-03-01T00:00:00Z", '
        '"updated_at": "2025-03-01T00:00:00Z"}'
    )
    no_id = (
        '{"email": "ghost@x.test", "name": "Ghost", '
        '"created_at": "2025-03-01T00:00:00Z", '
        '"updated_at": "2025-03-01T00:00:00Z"}'
    )
    broken = '{"customer_id": "c2", "email": '  # truncated JSON
    with open(os.path.join(path, "a.jsonl"), "w") as f:
        f.write("\n".join([good, no_id, broken]) + "\n")
    typed, quarantine = FS.read_jsonl(spark, path, "customers")
    assert typed.count() == 1
    assert typed.collect()[0]["customer_id"] == "c1"
    q = quarantine.collect()
    assert len(q) == 2
    # the unparseable row keeps its raw text for reprocessing
    raws = {r["raw_record"] for r in q}
    assert broken in raws


def test_csv_rejects_orders(spark):
    with pytest.raises(ValueError, match="nested items"):
        FS.read_csv(spark, "/nonexistent", "orders")


def test_csv_type_violation_quarantined(spark, tmp_path):
    path = str(tmp_path / "badcsv")
    os.makedirs(path)
    with open(os.path.join(path, "a.csv"), "w") as f:
        f.write("customer_id,email,name,created_at,updated_at\n")
        f.write("c1,c1@x.test,C1,2025-03-01T00:00:00Z,2025-03-01T00:00:00Z\n")
        f.write("c2,c2@x.test,C2,not-a-timestamp,2025-03-01T00:00:00Z\n")
    typed, quarantine = FS.read_csv(spark, path, "customers")
    assert [r["customer_id"] for r in typed.collect()] == ["c1"]
    assert quarantine.count() == 1


def test_quarantine_feeds_normalize_path(spark, tmp_path):
    """The typed side plugs straight into the silver upsert contract:
    last-write-wins dedup over the file-delivered rows behaves exactly
    like the envelope path."""
    from ecommerce_realtime_pipeline_spark.operators import normalize as N

    cust = _gen_customers(spark, n=6)
    newer = cust.withColumn(
        "updated_at", F.col("updated_at") + F.expr("INTERVAL 1 HOUR")
    ).withColumn("name", F.concat(F.col("name"), F.lit(" v2")))
    path = str(tmp_path / "two_versions")
    FS.write_jsonl(cust.unionByName(newer), path)
    typed, _ = FS.read_jsonl(spark, path, "customers")
    latest = N.latest_by_key(typed, "customer_id", "updated_at")
    assert latest.count() == 6
    assert all(r["name"].endswith(" v2") for r in latest.collect())


def test_jsonl_type_violation_and_missing_field_quarantined(spark, tmp_path):
    """An unparseable timestamp string captures the corrupt record; a
    MISSING required field has no corrupt record to capture, so the
    non-nullable schema contract is the net that quarantines it. (A
    numeric timestamp is a silent epoch CONVERSION in Spark's JSON
    parser — legal, not catchable, documented in filesrc.)"""
    path = str(tmp_path / "tv")
    os.makedirs(path)
    rows = [
        '{"customer_id": "c1", "email": "e", "name": "n", '
        '"created_at": "2025-03-01T00:00:00Z", '
        '"updated_at": "2025-03-01T00:00:00Z"}',
        '{"customer_id": "c3", "email": "e", "name": "n", '
        '"created_at": "oops", "updated_at": "2025-03-01T00:00:00Z"}',
        '{"customer_id": "c4", "email": "e", "name": "n", '
        '"updated_at": "2025-03-01T00:00:00Z"}',
    ]
    with open(os.path.join(path, "a.jsonl"), "w") as f:
        f.write("\n".join(rows) + "\n")
    typed, quarantine = FS.read_jsonl(spark, path, "customers")
    assert [r["customer_id"] for r in typed.collect()] == ["c1"]
    q = {r["customer_id"]: r["raw_record"] for r in quarantine.collect()}
    assert set(q) == {"c3", "c4"}
    assert q["c3"] is not None  # parse failure keeps the raw text


def test_csv_roundtrip_quoting_property(spark, tmp_path):
    """Values containing commas, double quotes, and leading/trailing
    spaces must survive the write→read cycle byte-for-byte (standard
    CSV quoting on both sides). Newlines are excluded by the documented
    line-oriented delivery contract."""
    from hypothesis import given, settings, strategies as st

    texty = st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters="\n\r\x00"
        ),
        min_size=0,
        max_size=24,
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(texty, min_size=1, max_size=5, unique=True))
    def check(names):
        rows = [
            (
                f"c{i}",
                f"c{i}@x.test",
                name,
                __import__("datetime").datetime(2025, 3, 1),
                __import__("datetime").datetime(2025, 3, 1),
            )
            for i, name in enumerate(names)
        ]
        df = spark.createDataFrame(
            rows,
            "customer_id string, email string, name string, "
            "created_at timestamp, updated_at timestamp",
        )
        path = str(tmp_path / f"h{abs(hash(tuple(names))) % 10**9}")
        FS.write_csv(df, path)
        typed, quarantine = FS.read_csv(spark, path, "customers")
        assert quarantine.count() == 0
        got = {r["customer_id"]: r["name"] for r in typed.collect()}
        # Spark's CSV writer emits empty string as NULL-indistinct; both
        # read back as None — normalize for compare
        want = {f"c{i}": (n if n != "" else None) for i, n in enumerate(names)}
        assert got == want

    check()
