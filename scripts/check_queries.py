"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() through DuckDB at sf0.01; compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_queries.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype kind for the type-strict gate.  The driver's value
    hash is type-strict (int 0 != float 0.0), so an int64-vs-float64
    column divergence between Spark and the DuckDB oracle must FAIL
    here too (VERDICT r04 §What's wrong 1: DuckDB sum() -> HUGEINT ->
    float64 via fetchdf masked by the old check_dtype=False compare)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "obj"


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
    from logset_spark.queries import REGISTRY
    from logset_spark.session import get_spark

    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark("check_queries", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn, sql = REGISTRY[name]
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(got)} rows [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        kinds_g = {c: dtype_kind(got[c]) for c in g.columns}
        kinds_e = {c: dtype_kind(exp[c]) for c in e.columns}
        bad = {
            c: (kinds_g[c], kinds_e[c])
            for c in g.columns
            if kinds_g[c] != kinds_e[c]
            and {kinds_g[c], kinds_e[c]} == {"int", "float"}
        }
        if bad:
            print(f"FAIL {name}: dtype kind mismatch (spark vs oracle): {bad}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False,
                                          rtol=0, atol=1e-9)
            print(f"PASS {name}: {len(g)} rows [{dt:.1f}s]")
            n_pass += 1
        except AssertionError as exc:
            print(f"FAIL {name}: values differ: {str(exc)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
