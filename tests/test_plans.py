"""Physical-plan audits: the 100 TB story depends on filters reaching the
parquet scan, dimensions broadcasting, aggregates combining map-side, and
top-k never doing a global sort.  These assertions pin those properties so
a refactor that silently regresses the plan fails CI, not the cluster.

(Referenced by edgy_spark/session.py's config rationale.)
"""

from __future__ import annotations

import re

from edgy_spark.catalog import QUERIES, load_all_registrations
from tests.conftest import SF_SMOKE

load_all_registrations()


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_shipdate" in m.group(1), m and m.group(1)
    assert "l_discount" in m.group(1)


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    # the fact-fact join may be SMJ/shuffled-hash; but no nested loop
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_partial_aggregation(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # two-phase hash agg: partial (map-side) + final after one exchange
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "priciest_parts_topk")
    assert "TakeOrderedAndProject" in plan


def test_anti_join_is_broadcast(spark):
    plan = _plan(spark, "customers_without_orders")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_grouping_sets_single_scan(spark):
    plan = _plan(spark, "grouping_sets_revenue")
    assert "Expand" in plan
    # one physical file scan (each scan prints one Location line)
    assert plan.count("Location: InMemoryFileIndex") == 1
