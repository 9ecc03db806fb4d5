"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema + value
compare, order-insensitive) so regressions surface locally before a round
verify does.
"""

from __future__ import annotations

import pytest

from edgy_spark.catalog import QUERIES, load_all_registrations
from tests.conftest import SF_SMOKE, assert_matches_oracle

load_all_registrations()

WITH_ORACLE = sorted(name for name, spec in QUERIES.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in QUERIES.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_SMOKE)
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_SMOKE)
    assert df.columns  # stable schema
    assert df.count() >= 0
