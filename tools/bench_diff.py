#!/usr/bin/env python3
"""Compare two graft.Bench JSON records and flag per-query regressions.

Usage: python3 tools/bench_diff.py [--gate] <old.json> <new.json>
       python3 tools/bench_diff.py HEAD <new.json>   # old = bench_out.json at HEAD

Exits 2 with usage on bad invocation; exits 1 when --gate is passed
and any query regressed past the threshold (the round exit gate), else
0 (informational). Prints queries whose steady time
changed by >1.5x AND >0.5s absolute (filters JIT/VM noise on the
sub-second majority), plus added/removed queries and the total delta.
The per-round discipline: run after any operator rework, BEFORE
committing bench_out.json — a correct-but-slower plan shows up here
first, not in the judge's table.
"""
import json
import subprocess
import sys


def load(ref: str) -> dict:
    if ref == "HEAD":
        out = subprocess.run(["git", "show", "HEAD:bench_out.json"],
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out)
    with open(ref) as f:
        return json.load(f)


def main(old_ref: str, new_ref: str, gate: bool = False) -> int:
    old, new = load(old_ref), load(new_ref)
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s ({len(oq)} queries) -> "
          f"{new['value']:.1f}s ({len(nq)} queries)")
    for name in sorted(set(nq) - set(oq)):
        print(f"  ADDED   {name:34s} {nq[name]:6.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  REMOVED {name:34s} (was {oq[name]:.2f}s)")
    flagged = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * 1.5 and b - a > 0.5:
            flagged.append((b - a, name, a, b))
        elif a > b * 1.5 and a - b > 0.5:
            print(f"  faster  {name:34s} {a:6.2f}s -> {b:6.2f}s")
    for delta, name, a, b in sorted(flagged, reverse=True):
        print(f"  SLOWER  {name:34s} {a:6.2f}s -> {b:6.2f}s  (+{delta:.2f}s)")
    if not flagged:
        print("no regressions past the 1.5x/0.5s gate")
        return 0
    return 1 if gate else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--gate"]
    if len(argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(argv[0], argv[1], gate="--gate" in sys.argv))
