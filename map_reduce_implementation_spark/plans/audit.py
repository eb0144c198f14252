"""Physical-plan audit helpers — the "did Catalyst do what we designed
for?" feedback loop (pushdown, pruning, broadcast, codegen).

Used by tests/test_plans.py to assert scale properties that row-count
correctness can't see: a plan that reads all columns for a 2-column
projection is wrong at 100 TB even though its output matches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    text: str

    @property
    def pushed_filters(self) -> list[str]:
        return re.findall(r"PushedFilters: \[([^\]]*)\]", self.text)

    @property
    def read_schemas(self) -> list[str]:
        return re.findall(r"ReadSchema: (\S+)", self.text)

    @property
    def has_broadcast_join(self) -> bool:
        return "BroadcastHashJoin" in self.text or "BroadcastNestedLoopJoin" in self.text

    @property
    def has_sort_merge_join(self) -> bool:
        return "SortMergeJoin" in self.text

    @property
    def n_shuffle_exchanges(self) -> int:
        """Numbered shuffle Exchange operators (broadcasts excluded)."""
        return len(re.findall(r"\(\d+\) Exchange\b", self.text))

    @property
    def n_broadcast_exchanges(self) -> int:
        return len(re.findall(r"\(\d+\) BroadcastExchange\b", self.text))

    @property
    def whole_stage_codegen(self) -> bool:
        # formatted mode marks codegen'd operators with "[codegen id : N]"
        return "codegen id" in self.text or "WholeStageCodegen" in self.text

    @property
    def has_partial_agg(self) -> bool:
        # partial-mode HashAggregate shows partial_<fn> aggregate exprs
        return "partial_" in self.text

    @property
    def has_python_udf(self) -> bool:
        return "BatchEvalPython" in self.text or "ArrowEvalPython" in self.text

    @property
    def has_take_ordered(self) -> bool:
        return "TakeOrderedAndProject" in self.text


def audit_plan(df: DataFrame) -> PlanAudit:
    return PlanAudit(explain_str(df, "formatted"))
