#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate — TYPE-SENSITIVE.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]

The driver reads the Spark parquet with pandas (preserving decimal128 /
int64 as Python objects) and the oracle via DuckDB's .df() (which coerces
DECIMAL->float64, HUGEINT->float64/object), sorts columns by name, sorts
rows, then hashes the stringified values.  Numerically-equal values with
different representations (Decimal('138014.00') vs 138014.0) therefore
MISMATCH.  Round 1's check.py read both sides through DuckDB, which
coerced the types identically and produced a false-green gate
(ADVICE.md r01).  This version reproduces the driver:

  spark side : pandas.read_parquet (pyarrow) — decimals stay Decimal,
               int64-with-nulls becomes float64+NaN, arrays become
               numpy arrays (which CRASH sort_values, like the driver)
  oracle side: duckdb .df()
  compare    : sort cols by name, sort rows by all cols, str() each cell
"""
import sys, os, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Driver-hash proxy: the stringified cell value."""
    if v is None:
        return "None"
    if isinstance(v, float) and v != v:  # NaN
        return "NaN"
    return str(v)


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    return cols, [[cell(v) for v in row] for row in df.itertuples(index=False)]


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got_cols, got = frame_rows(pd.read_parquet(spark_path))
        except Exception as e:
            print(f"FAIL {name}: spark read/sort error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        try:
            exp_cols, exp = frame_rows(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(got, exp)) if g != e), None)
        if bad is not None:
            print(f"FAIL {name}: row {bad} differs\n  spark:  {got[bad]}\n  oracle: {exp[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
