"""Doc-error budget + failure sink (SURVEY §5 error handling).

Reference: per-document cast failures become DocCastFailure records, counted
against an error budget (max count / max ratio) and appended to a gzip JSONL
sink (graflo/hq/caster.py:89-118, hq/ingestion_parameters.py:17-74,
test/test_caster_doc_errors.py).

Spark design: failures are a *side channel DataFrame*, not exceptions — a
failure predicate splits the frame once (two filters over one scan; Catalyst
shares the subplan), the budget check is one count aggregate, and the sink is
a distributed gzip-JSON write. Nothing here is per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DocErrorBudgetExceeded(RuntimeError):
    def __init__(self, n_failures: int, n_total: int, budget: "ErrorBudget"):
        self.n_failures, self.n_total, self.budget = n_failures, n_total, budget
        super().__init__(
            f"{n_failures}/{n_total} documents failed "
            f"(budget: max_failures={budget.max_failures}, "
            f"max_ratio={budget.max_ratio})"
        )


@dataclass
class ErrorBudget:
    """Reference IngestionParams error budget: absolute cap and/or ratio cap;
    ``None`` means unlimited on that axis."""

    max_failures: int | None = None
    max_ratio: float | None = None

    def check(self, n_failures: int, n_total: int) -> None:
        if self.max_failures is not None and n_failures > self.max_failures:
            raise DocErrorBudgetExceeded(n_failures, n_total, self)
        if (
            self.max_ratio is not None
            and n_total > 0
            and n_failures / n_total > self.max_ratio
        ):
            raise DocErrorBudgetExceeded(n_failures, n_total, self)


def split_failures(
    df: DataFrame, condition: Column, error: str
) -> tuple[DataFrame, DataFrame]:
    """Split a frame into (ok, failures) on a failure predicate; failures
    carry ``_error``. NULL predicate results count as failures (an
    un-evaluable check is itself an error, matching the reference's
    fail-closed tolerance)."""
    failed = F.coalesce(condition, F.lit(True))
    ok = df.filter(~failed)
    failures = df.filter(failed).withColumn("_error", F.lit(error))
    return ok, failures


def cast_failure_condition(df: DataFrame, casts: dict[str, str]) -> Column:
    """Failure predicate for type casts: input present but try_cast yields
    NULL (the Spark twin of the reference's per-field caster errors,
    hq/document_caster.py:91-142)."""
    cond = F.lit(False)
    for col, t in casts.items():
        bad = F.col(col).isNotNull() & F.col(col).try_cast(t).isNull()
        cond = cond | bad
    return cond


def enforce_budget(
    ok: DataFrame,
    failures: DataFrame,
    budget: ErrorBudget | None = None,
    sink_path: str | None = None,
) -> DataFrame:
    """Count failures (one aggregate), write them to a gzip JSON sink, raise
    when the budget is blown; returns ``ok`` for chaining."""
    n_fail = failures.count()
    if sink_path is not None and n_fail:
        failures.write.mode("append").option("compression", "gzip").json(sink_path)
    if budget is not None and n_fail:
        n_total = n_fail + ok.count()
        budget.check(n_fail, n_total)
    return ok
