"""Plan inspection & assertions (EXPLAIN parity + scale guardrails).

Reference: exec/ExplainTask.java:117 renders the operator DAG. Spark-first
we expose the formatted Catalyst plan plus *assertions* used by tests and
CI to pin the physical properties that matter at 100 TB: filters pushed
to the scan, prunable column sets, broadcast joins where expected, no
cartesian products, whole-stage codegen coverage.
"""

from hive_2_3_2_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    explain_str,
    scan_read_schema,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "explain_str",
    "scan_read_schema",
]
