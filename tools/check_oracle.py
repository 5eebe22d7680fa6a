"""Local correctness gate: run every queries() entry against its DuckDB
oracle, mimicking the driver's row-count + schema + order-insensitive
value-hash comparison. Usage:

    python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    def render(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        return str(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(render)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as entry
    from graflo_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    t_gate0 = time.perf_counter()
    timings: dict[str, tuple[float, float]] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t_q0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.perf_counter() - t_q0
        if name not in oracles:
            timings[name] = (t_spark, 0.0)
            print(f"weak {name}: rows={len(spdf)} (no oracle)")
            n_weak += 1
            continue
        t_o0 = time.perf_counter()
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle sql raised")
            traceback.print_exc()
            n_fail += 1
            continue
        timings[name] = (t_spark, time.perf_counter() - t_o0)
        if sorted(map(str.lower, spdf.columns)) != sorted(map(str.lower, opdf.columns)):
            print(f"FAIL {name}: columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            n_fail += 1
            continue
        opdf.columns = [c for c in opdf.columns]
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rows {len(spdf)} vs {len(opdf)}")
            n_fail += 1
            continue
        a, b = norm_frame(spdf), norm_frame(opdf)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: values differ; first diffs:")
            print(pd.concat(
                {"spark": a[diff].head(3), "duckdb": b[diff].head(3)}, axis=1))
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(spdf)}")
        n_pass += 1

    gate_wall = time.perf_counter() - t_gate0
    if "--timings" in sys.argv:
        print(f"\n# gate wall: {gate_wall:.1f}s; per-query (spark_s, oracle_s), slowest first:")
        for name, (ts, to) in sorted(
                timings.items(), key=lambda kv: -(kv[1][0] + kv[1][1])):
            print(f"#   {name}: spark={ts:.2f}s oracle={to:.2f}s total={ts+to:.2f}s")
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
