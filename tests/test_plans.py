"""Plan-shape regression tests: pushdown, pruning, broadcast joins, codegen.

A lost pushdown or a dimension join degrading to sort-merge is a silent 10×
at 100 TB — pin the plan properties the engine's performance depends on.
"""

from __future__ import annotations

import __spark_entry__ as E
from keboola_storage_duckdb_spark.plans import plan_facts


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    facts = plan_facts(E.q_pricing_summary(spark, sf_dir))
    # the l_shipdate predicate must reach the parquet scan
    assert any("l_shipdate" in p for p in facts["pushed_filters"]), facts
    # the scan must not read all 16 lineitem columns
    assert facts["read_schemas"], facts
    schema = facts["read_schemas"][0]
    assert "l_comment" not in schema and "l_receiptdate" not in schema
    executed = plan_facts(E.q_pricing_summary(spark, sf_dir), execute=True)
    assert executed["codegen_spans"] >= 1, executed


def test_export_projection_prunes_to_three_columns(spark, sf_dir):
    facts = plan_facts(E.q_export_projection(spark, sf_dir))
    schema = facts["read_schemas"][0]
    for col in ("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"):
        assert col in schema  # 3 projected + 2 filtered (status, totalprice)
    assert "o_orderdate" not in schema and "o_orderpriority" not in schema
    assert any("o_totalprice" in p for p in facts["pushed_filters"])


def test_dim_joins_broadcast(spark, sf_dir):
    # fact × dimension joins must broadcast — no shuffle of the fact side
    facts = plan_facts(E.q_join_lineitem_part(spark, sf_dir))
    assert facts["joins"] and all(
        j == "BroadcastHashJoin" for j in facts["joins"]), facts
    facts = plan_facts(E.q_join_cust_orders_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in facts["joins"], facts


def test_execute_query_broadcasts_dims(spark, sf_dir):
    facts = plan_facts(E.q_execute_query(spark, sf_dir))
    # nation and region are tiny: Catalyst must pick broadcast for them
    assert facts["joins"].count("BroadcastHashJoin") >= 2, facts


def test_typed_where_pushes_equality_filters(spark, sf_dir):
    facts = plan_facts(E.q_typed_where(spark, sf_dir))
    pushed = " ".join(facts["pushed_filters"])
    assert "c_mktsegment" in pushed and "c_nationkey" in pushed, facts
