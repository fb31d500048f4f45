#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB with views over the
same sf parquet tables; compares row-by-row with columns sorted by name.
Floats compared with tiny relative tolerance for reporting, but exact
mismatches are flagged since the driver hashes values.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    try:
        return a == b
    except Exception:
        return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        grows = [[canon(r[i]) for i in gidx] for r in got]
        erows = [[canon(r[i]) for i in eidx] for r in exp]
        if len(grows) != len(erows):
            print(f"FAIL {name}: rowcount {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(grows, erows)):
            if not all(eq(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs\n  spark:  {g}\n  oracle: {e}")
            n_fail += 1
        else:
            # type check (decimal vs float etc.) — report only
            tmismatch = []
            for gv, ev in zip(grows[0] if grows else [], erows[0] if erows else []):
                if gv is not None and ev is not None and type(gv) != type(ev):
                    tmismatch.append((type(gv).__name__, type(ev).__name__))
            note = f" [type note: {tmismatch}]" if tmismatch else ""
            print(f"PASS {name} ({len(grows)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
