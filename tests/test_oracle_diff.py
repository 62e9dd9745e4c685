"""Differential tests: every queries() entry with an oracle must match
DuckDB exactly (the driver's t2 correctness gate, run here at sf0.001
for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import assert_matches_oracle, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_match(name, spark, sf_dir, duck):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_all_queries_run(spark, sf_dir):
    """Every queries() entry (oracle or not) runs and has a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
