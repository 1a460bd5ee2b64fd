#!/usr/bin/env python3
"""Solo-recheck arbiter for suite-flagged bench regressions (r12).

The suite diff (bench_diff --gate) is a cheap detector with a known
false-positive tail: per-query floors are the LUCKIEST of 5 committed
sessions while any one cell can run 2-3x hot (PERF.md load-neighbor
measurements), so with 615 queries a handful of tail flags per session
is expected even on an idle machine. Noise does not REPRODUCE under
quiet solo conditions; a real plan regression does. This arbiter takes
the flagged queries, a fresh `ScaleBench3 --solo` output over them
(two passes per query -> per-query min), and rules:

  * entry in bench_floor.json (a prior SOLO minimum): REAL regression
    iff fresh solo min > 2.0x solo floor AND +0.5s. 2.0x, not 1.5x:
    repeated min-of-2 solo invocations of the SAME code on an idle
    machine spanned 2.34-4.06s for q_text_11 (r12) — driver-loop
    queries have ~1.7x invocation-level solo variance, so 1.5x would
    re-introduce the false-positive class this arbiter exists to kill;
  * no solo-floor entry yet: bootstrap against the SUITE floor with
    the same 2.0x allowance (driver-loop queries also pay up to ~2x
    cold-JIT solo penalty vs a suite-warm JVM) AND +1.0s;
  * the absolute guard is 1.0s in both branches — the cold-child-JVM
    noise floor (healthy sub-second queries measure 1.4-1.6s solo on a
    post-bench machine, 0.7-0.8s idle).

Queries that pass have their fresh solo min MERGED into
bench_floor.json (min with any existing entry — the floor stays
monotone), so the bootstrap rule self-retires per query.

Usage: python3 tools/solo_recheck.py <flagged.csv> <solo_output.txt>
       [--floor bench_floor.json]
flagged.csv = comma-separated names (bench_diff's FLAGGED line).
solo_output.txt = raw ScaleBench3 --solo output with two time columns.
Exit 0 = all flags adjudicated as noise (floor file updated);
exit 1 = at least one reproduces solo -> real regression.
"""
import json
import re
import sys


def suite_floor():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "bench_diff.py"))
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    # rebaselined queries exclude pre-cutoff records here too — a solo
    # recheck against a retired plan's floor would flag the documented
    # r13 conversions forever
    return bd.min_merge(bd._committed_records(bd.FLOOR_DEPTH),
                        bd._load_rebaselines())["queries"]


def main():
    flagged = [n for n in sys.argv[1].split(",") if n]
    solo_path = sys.argv[2]
    floor_path = "bench_floor.json"
    if "--floor" in sys.argv:
        floor_path = sys.argv[sys.argv.index("--floor") + 1]

    solo = {}
    row = re.compile(r"\|\s*(q_\w+)\s*\|((?:\s*[0-9.]+\s*\|)+)")
    with open(solo_path) as f:
        for line in f:
            m = row.search(line)
            if m:
                ts = [float(x) for x in re.findall(r"[0-9.]+", m.group(2))]
                solo[m.group(1)] = min(min(ts), solo.get(m.group(1), float("inf")))

    try:
        with open(floor_path) as f:
            floor_doc = json.load(f)
    except FileNotFoundError:
        floor_doc = {"queries": {}}
    solo_floors = floor_doc.setdefault("queries", {})
    suite = suite_floor()

    real = []
    for n in flagged:
        if n not in solo:
            print(f"SOLO_RECHECK FAIL {n}: no solo measurement in {solo_path}")
            real.append(n)
            continue
        t = solo[n]
        if n in solo_floors:
            base, mult, kind = solo_floors[n], 2.0, "solo floor"
        elif n in suite:
            base, mult, kind = suite[n], 2.0, "suite floor (bootstrap)"
        else:
            print(f"SOLO_RECHECK {n}: new query, solo {t:.2f}s recorded")
            solo_floors[n] = t
            continue
        # 1.0s absolute guard, not 0.5: the cold-child-JVM noise floor —
        # healthy sub-second queries measured 1.4-1.6s solo on a
        # post-bench machine and 0.7-0.8s idle (r12); a regression that
        # matters at scale clears +1s solo easily
        if t > base * mult and t - base > 1.0:
            print(f"SOLO_RECHECK FAIL {n}: solo {t:.2f}s > {mult}x {kind} {base:.2f}s — reproduces, REAL")
            real.append(n)
        else:
            print(f"SOLO_RECHECK pass {n}: solo {t:.2f}s within {mult}x {kind} {base:.2f}s — suite flag was noise")
            solo_floors[n] = min(t, solo_floors.get(n, t))
    with open(floor_path, "w") as f:
        json.dump(floor_doc, f, indent=2)
        f.write("\n")
    if real:
        print(f"SOLO_RECHECK: {len(real)} REAL regression(s): {','.join(real)}")
        sys.exit(1)
    print(f"SOLO_RECHECK: all {len(flagged)} suite flags adjudicated as noise; {floor_path} updated")


if __name__ == "__main__":
    main()
