#!/usr/bin/env python3
"""Vacuity lint over the golden corpus (round-8, generalizing the
q_text_51 lesson): a query whose sf0.001 golden is EMPTY or a single
row might be passing its oracle vacuously — the comparison proves
nothing about the interesting branch of the logic.

For every declared query whose committed sf0.001 golden has <= 1 rows,
the lint demands evidence, in one of three forms:

  1. GROWS — the same oracle SQL, re-run in DuckDB on the sf0.01
     fixture, returns more rows: the 1-row result is fixture thinness,
     not query degeneracy; the sf0.01 oracle gate exercises the real
     shape. Auto-accepted (the evidence is recomputed every run).
  2. CONTENT — the single sf0.01 row carries at least one NONZERO
     numeric cell: the oracle hash-compares those values exactly, so
     the check is substantive even at one row (a 0-row hash, by
     contrast, proves nothing — and a 1-row report whose numerics are
     all 0/NULL is the same trap wearing a row). Auto-accepted.
  3. WAIVED — the query appears in tools/vacuity_waivers.txt with a
     justification (legitimately empty/zero fixtures whose interesting
     branch a synthetic-frame unit test covers instead — the q_text_51
     precedent).
  4. otherwise → FAIL, exit 1.

Usage:
  python3 tools/vacuity_lint.py <oracle_sql.json> \
      [--golden src/test/resources/golden_sf0001.txt] \
      [--sf /root/testdata/sf0.01] [--waivers tools/vacuity_waivers.txt]

oracle_sql.json comes from `graft.Verify --sql-only` (round_gate.sh
step 2 already dumps it).
"""
import argparse
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("oracle_sql")
    ap.add_argument("--golden", default="src/test/resources/golden_sf0001.txt")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--waivers", default="tools/vacuity_waivers.txt")
    args = ap.parse_args()

    golden = {}
    for line in open(args.golden):
        line = line.strip()
        if line:
            name, n, _ = line.split(",")
            golden[name] = int(n)
    oracle = json.load(open(args.oracle_sql))

    waivers = {}
    try:
        for line in open(args.waivers):
            line = line.rstrip("\n")
            if line and not line.startswith("#"):
                name, _, reason = line.partition("\t")
                waivers[name.strip()] = reason.strip()
    except FileNotFoundError:
        pass

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    flagged = sorted((n, r) for n, r in golden.items() if r <= 1)
    n_grows = n_content = n_waived = 0
    fails = []
    unused = set(waivers) - {n for n, _ in flagged}
    for name, rows in flagged:
        sf01 = None
        cells = []
        if name in oracle:
            try:
                cells = con.execute(oracle[name]).fetchall()
                sf01 = len(cells)
            except Exception as e:  # noqa: BLE001 — report, don't crash the lint
                sf01 = f"oracle error: {e}"
        if isinstance(sf01, int) and sf01 > 1:
            n_grows += 1
            continue
        if isinstance(sf01, int) and sf01 == 1 and any(
                isinstance(v, (int, float)) and v not in (0, 0.0)
                for v in cells[0]):
            n_content += 1
            continue
        if name in waivers:
            n_waived += 1
            continue
        fails.append((name, rows, sf01))

    print(f"vacuity lint: {len(flagged)} flagged (<=1 golden rows) — "
          f"{n_grows} grow at sf0.01, {n_content} carry nonzero oracle-checked "
          f"content, {n_waived} waived, {len(fails)} FAIL")
    for name, rows, sf01 in fails:
        print(f"  FAIL {name}: sf0.001={rows} rows, sf0.01={sf01} — "
              "add a waiver with justification or a synthetic non-vacuity test")
    if unused:
        print(f"  note: {len(unused)} waivers no longer needed "
              f"(golden grew past 1 row): {sorted(unused)[:8]}...")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
