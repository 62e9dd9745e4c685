"""Health-check surface tests (SURVEY §2.8): all-green on the
testdata catalog, targeted failures for missing tables / missing or
stale offsets ledgers, and the readiness boolean. The reference
declares health_checks as an empty stub; this pins the implemented
Spark-first behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark import monitoring as M
from ecommerce_realtime_pipeline_spark.sources import produce as P
from ecommerce_realtime_pipeline_spark.streaming import ingest as I

SF = "/root/testdata/sf0.001"


def test_all_checks_ok_on_testdata(spark):
    report = M.health_checks(spark, SF)
    rows = {r["check"]: r for r in report.collect()}
    assert rows["spark_session"]["status"] == M.OK
    for t in ("orders", "lineitem", "documents", "embeddings"):
        assert rows[f"table:{t}"]["status"] == M.OK, rows[f"table:{t}"]["detail"]
    assert rows["streaming_queries"]["status"] == M.OK
    assert M.is_healthy(report)


def test_missing_table_fails_not_raises(spark, tmp_path):
    report = M.health_checks(spark, str(tmp_path), tables=("orders",))
    row = report.filter(F.col("check") == "table:orders").collect()[0]
    assert row["status"] == M.FAIL
    assert not M.is_healthy(report)


def test_offsets_ledger_missing_and_fresh(spark, tmp_path):
    # missing ledger → fail
    report = M.health_checks(
        spark, SF, tables=(), offsets_path=str(tmp_path / "offsets")
    )
    row = report.filter(F.col("check") == "consumer_offsets").collect()[0]
    assert row["status"] == M.FAIL and "missing" in row["detail"]

    # run a tiny ingest to create a real ledger → ok, and fresh
    topics = str(tmp_path / "topics")
    P.produce_batch(spark, topics, 0, 5, 0, 0, seed=3, n_partitions=1)
    q = I.run_ingest(
        spark,
        f"{topics}/customers",
        "customers",
        str(tmp_path / "silver"),
        str(tmp_path / "ckpt"),
        offsets_path=str(tmp_path / "offsets"),
    )
    q.awaitTermination(120)
    report = M.health_checks(
        spark,
        SF,
        tables=(),
        offsets_path=str(tmp_path / "offsets"),
        max_offset_age_seconds=3600,
    )
    row = report.filter(F.col("check") == "consumer_offsets").collect()[0]
    assert row["status"] == M.OK, row["detail"]

    # impossible freshness bound → stale
    report = M.health_checks(
        spark,
        SF,
        tables=(),
        offsets_path=str(tmp_path / "offsets"),
        max_offset_age_seconds=0.0,
    )
    row = report.filter(F.col("check") == "consumer_offsets").collect()[0]
    assert row["status"] == M.FAIL and "stale" in row["detail"]
