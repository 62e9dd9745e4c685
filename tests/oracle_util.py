"""DuckDB differential-oracle helper, mirroring the driver's compare:
row-count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we keep exact too (repr of double)
        return repr(v)
    return str(v)


def assert_matches_oracle(spark_df, con, sql: str, query_name: str = "?"):
    spark_cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(_norm(row[i]) for i in order) for row in res.fetchall()]

    assert spark_cols == duck_cols, f"{query_name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{query_name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    )
    s, d = sorted(spark_rows), sorted(duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{query_name}: value mismatch, first diffs: {mismatches}"
