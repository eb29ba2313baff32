"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, normalizes (columns sorted by name,
rows sorted, numeric types unified), and reports per-query match status.

Usage:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _kind_class(s: pd.Series) -> str:
    """Coarse dtype class used for the driver-strict pre-check.

    The driver hashes values after sorting columns by name, so an int column
    on one side vs a float column on the other (e.g. DuckDB HUGEINT from
    ``sum()`` over integers landing in pandas as float64) hash-mismatches even
    when every value is numerically identical.  ``normalize`` below coerces
    both sides per-side and erased that evidence — this classifier runs on the
    RAW frames first.  Decimal-object columns class as float: both engines
    round-trip DECIMAL aggregates through float-compatible reprs and the
    driver has always passed those.
    """
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k in "fc":
        return "float"
    if k == "b":
        return "bool"
    if k == "O" and s.map(lambda v: isinstance(v, Decimal)).any():
        return "float"
    return "other"


def strict_dtype_check(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str | None:
    """Driver-strict: dtype-kind class must match per column BEFORE coercion."""
    a = {c: _kind_class(spark_df[c]) for c in spark_df.columns}
    b = {c: _kind_class(duck_df[c]) for c in duck_df.columns}
    for c in sorted(set(a) & set(b)):
        if a[c] != b[c]:
            return (f"strict dtype mismatch in '{c}': spark {a[c]}"
                    f"({spark_df[c].dtype}) vs oracle {b[c]}({duck_df[c].dtype})"
                    " — driver hash would fail; CAST the oracle column")
    return None


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, Decimal)).any():
            df[c] = df[c].astype(float)
        if df[c].dtype.kind in "fc":
            df[c] = df[c].round(9)
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np
            bad = ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-8, equal_nan=True)
        else:
            bad = av.astype(str).values != bv.astype(str).values
        if bad.any():
            i = int(bad.argmax()) if hasattr(bad, "argmax") else list(bad).index(True)
            return f"value mismatch in '{c}' row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from omop2obo_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c

    con = fresh_con()

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    # a misspelled name on argv must fail loudly, not silently verify
    # nothing and exit 0
    unknown = only - set(qs)
    for name in sorted(unknown):
        print(f"FAIL  {name}: unknown query name")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            spark_raw = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_raw)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_raw = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            con = fresh_con()  # a fatal error invalidates the connection
            continue
        diff = strict_dtype_check(spark_raw, duck_raw)
        if not diff:
            diff = compare(normalize(spark_raw), normalize(duck_raw))
        if diff:
            print(f"FAIL  {name}: {diff} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"OK    {name}: {len(spark_raw)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
