"""Doc-error budget + failure sink tests (reference test_caster_doc_errors)."""

import pytest
from pyspark.sql import functions as F

from graflo_spark.errors import (
    DocErrorBudgetExceeded,
    ErrorBudget,
    cast_failure_condition,
    enforce_budget,
    split_failures,
)


@pytest.fixture
def mixed(spark):
    rows = [("1", "a"), ("2", "b"), ("x", "c"), (None, "d"), ("5", None)]
    return spark.createDataFrame(rows, "num string, tag string")


def test_cast_failure_split(spark, mixed):
    cond = cast_failure_condition(mixed, {"num": "long"})
    ok, fail = split_failures(mixed, cond, "bad cast")
    assert ok.count() == 4  # NULL input is not a cast failure
    assert fail.count() == 1
    assert fail.first()["_error"] == "bad cast"


def test_null_predicate_fails_closed(spark, mixed):
    # a predicate that is NULL for some rows counts those rows as failures
    cond = F.when(F.col("tag") == "c", True)
    ok, fail = split_failures(mixed, cond, "weird")
    assert fail.count() == mixed.count()  # NULL -> failure for non-'c' too


def test_budget_enforcement(spark, mixed, tmp_path):
    cond = cast_failure_condition(mixed, {"num": "long"})
    ok, fail = split_failures(mixed, cond, "bad cast")

    out = enforce_budget(ok, fail, ErrorBudget(max_failures=5))
    assert out.count() == 4

    with pytest.raises(DocErrorBudgetExceeded):
        enforce_budget(ok, fail, ErrorBudget(max_failures=0))
    with pytest.raises(DocErrorBudgetExceeded):
        enforce_budget(ok, fail, ErrorBudget(max_ratio=0.1))

    sink = str(tmp_path / "failures")
    enforce_budget(ok, fail, ErrorBudget(max_failures=5), sink_path=sink)
    back = spark.read.json(sink)
    assert back.count() == 1 and "_error" in back.columns
