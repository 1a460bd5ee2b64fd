#!/usr/bin/env python3
"""Spark-vs-DuckDB output-type lint for the oracle SQL corpus.

The recurring bug class across rounds (r1 q_tpch_12_late, r2
q_text_15_pack, r4 q_stat_2_abtest + q_win_9_gaps_islands, r5
q_graph_12_kcore): the DuckDB oracle's output column silently widens
to a type that pandas materializes differently than the Spark result
(HUGEINT -> float64, bare `/` -> DOUBLE vs Spark bigint), so the
driver's hash compare fails even when every value agrees.

The r5 lint only flagged HUGEINT/DECIMAL and was blind to the
int64-vs-DOUBLE drift that actually failed that round, because it
never saw the Spark-side schema. This version reads the
spark_schema.json that `graft.Verify --sql-only` (and every full
Verify run) dumps beside oracle_sql.json, canonicalizes both sides
to the pandas dtype class the driver's compare will materialize,
and fails on ANY mismatch:

  int   <- Spark {tinyint..bigint},  DuckDB {TINYINT..UBIGINT}
  float <- Spark {float,double},     DuckDB {REAL,FLOAT,DOUBLE}
  str   <- Spark {string,char,varchar}, DuckDB {VARCHAR,CHAR,...}
  bool / date / datetime / bytes / array<elem> / map / struct

DuckDB HUGEINT/UHUGEINT/DECIMAL outputs are flagged unconditionally
(they round-trip through pyarrow as float64/object, never matching
Spark), preserving the old lint's contract.

Usage: python3 tools/oracle_typecheck.py <oracle_sql.json> [sf_dir]
  (reads spark_schema.json from the same directory if present;
   without it, falls back to the DuckDB-only HUGEINT/DECIMAL check)
Exit 1 if any query leaks a widened type or mismatches Spark.
"""
import json
import os
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")

DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def canon_duck(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{canon_duck(t[:-2])}>"
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "bad"
    if t in DUCK_INT:
        return "int"
    if t in ("REAL", "FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("VARCHAR") or t.startswith("CHAR") or t == "TEXT":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        # duckdb fetchdf materializes DATE as datetime64, identical to
        # TIMESTAMP — the driver compare can't tell them apart, and the
        # house style pairs duck DATE with spark date_trunc timestamps
        return "datetime"
    if t in ("BLOB", "BYTEA", "BINARY"):
        return "bytes"
    if t.startswith("MAP"):
        return "map"
    if t.startswith("STRUCT"):
        return "struct"
    return f"other:{t}"


def canon_spark(t: str) -> str:
    t = t.strip().lower()
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return f"array<{canon_spark(m.group(1))}>"
    if t.startswith("decimal"):
        return "bad"
    if t in SPARK_INT:
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string" or t.startswith("char") or t.startswith("varchar"):
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        # spark parquet date -> pandas object(datetime.date) -> str on
        # the driver, which matches NO duckdb materialization (duck DATE
        # is datetime64) — a spark date output is itself a hazard, so
        # keep it a distinct class that flags against everything
        return "date"
    if t in ("timestamp", "timestamp_ntz", "timestamp_ltz"):
        return "datetime"
    if t == "binary":
        return "bytes"
    if t.startswith("map<"):
        return "map"
    if t.startswith("struct<"):
        return "struct"
    return f"other:{t}"


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    oracle_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    with open(oracle_path) as f:
        oracle = json.load(f)
    schema_path = os.path.join(os.path.dirname(oracle_path), "spark_schema.json")
    spark_schemas = {}
    if os.path.exists(schema_path):
        with open(schema_path) as f:
            spark_schemas = json.load(f)
    else:
        print(f"WARN no {schema_path}: DuckDB-only HUGEINT/DECIMAL check")
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
        duck = {c[0]: (c[1], canon_duck(c[1])) for c in cols}
        problems = [f"{c} {t}" for c, (t, k) in duck.items() if k == "bad"]
        spark_cols = spark_schemas.get(name)
        if spark_cols:
            spark = {c: (t, canon_spark(t)) for c, t in spark_cols}
            for c in sorted(set(duck) | set(spark)):
                if c not in duck:
                    problems.append(f"{c} only in Spark ({spark[c][0]})")
                elif c not in spark:
                    problems.append(f"{c} only in DuckDB ({duck[c][0]})")
                elif duck[c][1] != spark[c][1] and duck[c][1] != "bad":
                    problems.append(
                        f"{c} duckdb {duck[c][0]} vs spark {spark[c][0]}")
        elif spark_schemas and name in spark_schemas:
            # builder threw during schema dump — surface it, don't hide it
            print(f"SKIP {name}: no Spark schema captured")
            n_err += 1
        if problems:
            n_bad += 1
            print(f"LEAK {name}: " + ", ".join(problems))
    n_checked = sum(1 for n in oracle if spark_schemas.get(n))
    print(f"typecheck: {len(oracle)} queries ({n_checked} schema-checked), "
          f"{n_bad} leaking, {n_err} skipped")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
