#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the oracle SQL from oracle_sql.json in DuckDB against the same parquet
tables, sort columns by name and rows by all columns, and compare values.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    import os
    for qdir in sorted(p for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)):
        name = qdir.split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.read_parquet(files[0])
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        dtype_warn = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            # the driver's hash is dtype-sensitive: an int64 Spark column
            # vs a float64 oracle column (DuckDB HUGEINT sum) hash-differs
            # even when values match. Flag any numeric-kind mismatch.
            if gc.dtype != ec.dtype and (gc.dtype.kind in "iuf" or ec.dtype.kind in "iuf"):
                dtype_warn.append(f"{c}:{gc.dtype}!={ec.dtype}")
            try:
                same = (gc.isna() & ec.isna()) | (gc == ec)
                if not bool(same.all()):
                    bad = c
                    break
            except Exception:  # noqa: BLE001
                if not gc.astype(str).equals(ec.astype(str)):
                    bad = c
                    break
        if bad is None and dtype_warn:
            print(f"FAIL {name}: dtype mismatch would break driver hash: "
                  f"{', '.join(dtype_warn)}")
            n_fail += 1
        elif bad is None:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
        else:
            mism = g[bad][~((g[bad].isna() & e[bad].isna()) | (g[bad] == e[bad]))]
            idx = mism.index[:3]
            print(f"FAIL {name}: col {bad} differs, e.g. got "
                  f"{list(g[bad][idx])} vs exp {list(e[bad][idx])} "
                  f"(dtypes {g[bad].dtype}/{e[bad].dtype})")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
