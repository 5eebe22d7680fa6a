import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from graflo_spark.session import get_spark

    # Interpreted execution for the TEST session only (r15): the suite
    # runs thousands of fresh single-use plans over toy frames, where
    # whole-stage-codegen buys nothing and every plan pays a Janino
    # compile — on this box pathologically slow ones (see session.py's
    # codegen-cache note). Measured 3.5x on fresh-plan toy queries and
    # 2-3x on whole test files; results are identical (Spark's
    # interpreted mode is the reference semantics its own test matrix
    # runs). The driver's oracle gate (tools/check_oracle.py) still runs
    # the default COMPILED mode over all 50 registered queries, so
    # codegen-path coverage is not lost. SPARK_GRAFT_TEST_CODEGEN=1
    # restores compiled mode for offline cross-mode runs; tests that
    # assert ON codegen itself re-enable it locally (the conf is
    # runtime-settable).
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_CODEGEN", "") != "1":
        extra = {
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        }
    s = get_spark("graflo-spark-tests", shuffle_partitions=4,
                  extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: load(spark, sf_dir, n) for n in names}


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    """events table with ts normalized to TIMESTAMP via the one shared
    ingress helper — tests must not re-implement the ns->ts conversion."""
    from graflo_spark.io import to_event_time

    return to_event_time(load(spark, sf_dir, "events"))


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for n in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{sf_dir}/{n}.parquet')"
        )
    return con
