"""Oracle-differential tests for every registry query (the driver's
correctness gate, run locally at sf0.01)."""

from __future__ import annotations

import pytest

from tests.oracle import compare, duckdb_conn, run_oracle


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def oracle_con(sf_oracle):
    con = duckdb_conn(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_oracle, oracle_con):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_oracle)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    spark_df = QUERIES[name](spark, sf_oracle)
    want = run_oracle(oracle_con, ORACLES[name], name=name)
    compare(spark_df, want, name=name)


def test_no_oracle_emits_forbidden_duckdb_types(oracle_con):
    """Registry-wide dtype gate (the r7 lesson): DuckDB's integer sum()
    returns HUGEINT; fetchdf() coerces it to int64 so a pandas value
    compare passes while the driver's engine-type-level hash fails.
    Every oracle must bind to Spark-comparable types — catches an
    un-CAST sum() the moment the wave lands, not 4 rounds later."""
    from tests.oracle import check_oracle_types

    for name in sorted(ORACLES):
        check_oracle_types(oracle_con.sql(ORACLES[name]), name=name)


def test_entry_smoke(spark, sf_small):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_contract_every_query_has_an_oracle():
    """The correctness gate's own contract: every queries() entry has
    an oracle_sql() twin (the driver records weaker rows-only checks
    for orphans — this registry intentionally has none), and the
    oracle dict carries no dead keys."""
    assert set(ORACLES) == set(QUERIES), (
        sorted(set(QUERIES) - set(ORACLES)),
        sorted(set(ORACLES) - set(QUERIES)),
    )
    assert all(callable(f) for f in QUERIES.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in ORACLES.values())
