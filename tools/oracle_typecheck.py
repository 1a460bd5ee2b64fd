#!/usr/bin/env python3
"""DuckDB output-type lint for the oracle SQL corpus.

The recurring bug class across rounds (r1 q_tpch_12_late, r2
q_text_15_pack, r4 q_stat_2_abtest + q_win_9_gaps_islands): DuckDB
widens integer sum() to HUGEINT (int128). pyarrow materializes a
HUGEINT *output* column as float64, while the Spark side is int64 —
so the driver's hash compare fails even when every value agrees.
The leak only matters when the HUGEINT survives to a final SELECT
column; intermediate HUGEINTs that feed a CAST or a float expression
are harmless.

This lint runs every oracle query's DESCRIBE against DuckDB views on
a small fixture dir and flags any output column whose declared type
is HUGEINT / UHUGEINT / DECIMAL (decimal also round-trips through
pyarrow differently than Spark's double).

Usage: python3 tools/oracle_typecheck.py <oracle_sql.json> [sf_dir]
Exit 1 if any query leaks a widened type.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    oracle_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = n_err = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # non-view tables (e.g. filesystem globs)
            print(f"SKIP {name}: describe failed: {str(e).splitlines()[0][:120]}")
            n_err += 1
            continue
        leaks = [(c[0], c[1]) for c in cols if any(b in c[1].upper() for b in BAD)]
        if leaks:
            n_bad += 1
            print(f"LEAK {name}: " + ", ".join(f"{c} {t}" for c, t in leaks))
    print(f"typecheck: {len(oracle)} queries, {n_bad} leaking, {n_err} skipped")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
