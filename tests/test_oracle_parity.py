"""Local mirror of the driver's correctness gate: every registered
query runs on Spark at sf0.01 and must EXACTLY match its DuckDB
oracle (row count, column names, order-insensitive values) — the
driver hashes values, so near-equal is not enough.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from gexp_ml_dask_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_ORACLE


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        if pdf[col].dtype == object:
            pdf[col] = pdf[col].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


ORACLE_QUERIES = sorted(set(QUERIES) & set(ORACLE))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(QUERIES[name](spark, SF_ORACLE).toPandas())
    want = _normalize(duck.execute(ORACLE[name]).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = pd.to_numeric(g, errors="coerce")
            wa = pd.to_numeric(w, errors="coerce")
            both_nan = ga.isna() & wa.isna()
            equal = (ga == wa) | both_nan
            if not equal.all():
                bad = (~equal).idxmax()
                diff = abs(float(ga[bad]) - float(wa[bad])) if not (
                    math.isnan(float(ga[bad])) or math.isnan(float(wa[bad]))
                ) else float("nan")
                raise AssertionError(
                    f"{name}.{col}: first mismatch row {bad}: "
                    f"{ga[bad]!r} vs {wa[bad]!r} (abs diff {diff})"
                )
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{col}"
            )


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return rows.
    Materialize EVERY column (toPandas), not count() — Catalyst
    prunes unused deterministic UDF columns, so count() can pass a
    plan whose UDF throws on real data (caught once with a
    SparseVector duplicate-index bug)."""
    rows_only = sorted(set(QUERIES) - set(ORACLE))
    for name in rows_only:
        pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
        assert len(pdf) >= 0, name
