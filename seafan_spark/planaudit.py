"""Physical-plan scale audit — the 100 TB failure modes, as an API.

``scale_report`` inspects a DataFrame's executed plan for the patterns
that kill distributed execution: cartesian products, single-partition
exchanges that aren't the benign final step of a scalar aggregate, and
non-scalar broadcast nested-loop joins. It also surfaces the positive
signals (pushed filters, whole-stage codegen spans, broadcast joins) so
a query author can iterate toward the plan they want without reading
raw ``explain`` output. ``tests/test_plans.py`` runs the same checks
over every driver-contract query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScaleReport:
    exchanges: int = 0
    single_partition_exchanges: int = 0
    benign_single_partition: int = 0  # directly above a partial HashAggregate
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    #: best-effort: an un-executed AdaptiveSparkPlan reports 0 (codegen is
    #: decided per final stage at runtime); meaningful with AQE off or on
    #: an executed plan's string
    codegen_stages: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    flags: list[str] = field(default_factory=list)  # scale anti-patterns

    @property
    def scale_safe(self) -> bool:
        return not self.flags


def scale_report(df: DataFrame) -> ScaleReport:
    """Audit ``df``'s executed plan. ``report.flags`` lists anti-patterns;
    empty flags == scale-safe by these heuristics."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    r = ScaleReport()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange" in line and "ReusedExchange" not in line:
            r.exchanges += 1
        if "Exchange SinglePartition" in line:
            r.single_partition_exchanges += 1
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            if "HashAggregate" in nxt:
                r.benign_single_partition += 1
            else:
                r.flags.append(f"single-partition exchange at plan line {i}")
        if "BroadcastHashJoin" in line:
            r.broadcast_hash_joins += 1
        if "SortMergeJoin" in line:
            r.sort_merge_joins += 1
        if "BroadcastNestedLoopJoin" in line:
            r.nested_loop_joins += 1
            if "IdentityBroadcastMode" not in plan:
                r.flags.append("non-scalar broadcast nested-loop join")
        if "CartesianProduct" in line:
            r.cartesian_products += 1
            r.flags.append("cartesian product")
        # codegen appears as "WholeStageCodegen (n)" in formatted plans and
        # as a "*(n)" operator prefix in simple/adaptive plan strings
        if "WholeStageCodegen" in line or line.lstrip().lstrip("+-: ").startswith("*("):
            r.codegen_stages += 1
        if "PushedFilters: [" in line:
            inner = line.split("PushedFilters: [", 1)[1].rsplit("]", 1)[0]
            if inner.strip():
                r.pushed_filters.append(inner.strip())
    return r
