"""Plan lint: sweep EVERY registered query's physical plan for the
smells that kill a 100 TB run.

Unlike test_plan_quality.py (deep assertions on chosen queries), this
is a broad guardrail: any new query that accidentally plans a
non-broadcast cartesian product, or whose shuffle count explodes,
fails here before it ever ships.
"""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark.plans.registry import QUERIES
import __spark_entry__  # noqa: F401  (registers every query)

SF = "/root/testdata/sf0.001"

#: shuffle-heavy by design (multi-stage pipelines / iterative loops) —
#: still bounded, but above the default cap.
EXCHANGE_CAP_OVERRIDES = {
    "curation_pipeline": 40,
    "curation_pipeline_lsh": 40,
    "dedup_connected_components": 40,
    "dedup_cluster_histogram": 40,
    "knn_recall_at_k": 30,
    "mix_sources_token_budget": 30,
}
DEFAULT_EXCHANGE_CAP = 20


def _cases():
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _cases())
def test_plan_has_no_scale_smells(spark, name):
    plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    # a non-broadcast cartesian product is O(n*m) shuffle-side — never
    # acceptable; broadcast nested-loop (range joins vs tiny spines) is
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    cap = EXCHANGE_CAP_OVERRIDES.get(name, DEFAULT_EXCHANGE_CAP)
    n_ex = plan.count("Exchange ")
    assert n_ex <= cap, f"{name} plans {n_ex} exchanges (cap {cap})"
