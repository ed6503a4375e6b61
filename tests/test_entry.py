"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"sample_id", "gene_id", "row_id", "value"}


def test_every_query_has_unique_name():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "no queries registered"
    # every oracle key must have a query
    assert set(o) <= set(q), set(o) - set(q)
