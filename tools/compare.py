#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over views on the
fixture parquet, sorts columns by name on both sides, and compares
values exactly (floats: exact equality after the queries' own rounding,
with a 1e-9 fallback report to distinguish ulp drift from real bugs).
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # date objects vs datetimes; bytes vs str
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures.append(name)
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            failures.append(name)
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            failures.append(name)
            n_fail += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa, bb = a.astype("float64"), b.astype("float64")
                eq = (aa.isna() & bb.isna()) | (aa == bb)
                if not eq.all():
                    close = np.isclose(aa, bb, rtol=0, atol=1e-9, equal_nan=True)
                    tag = "ULP" if close.all() else "REAL"
                    i = int((~eq).idxmax())
                    bad_cols.append(f"{c}[{tag}] row{i}: {aa[i]!r} vs {bb[i]!r}")
            else:
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad_cols.append(f"{c} row{i}: {a[i]!r} vs {b[i]!r}")
        if bad_cols:
            print(f"FAIL {name}: " + "; ".join(bad_cols[:4]))
            failures.append(name)
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail" + (": " + " ".join(failures) if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
