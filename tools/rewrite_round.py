#!/usr/bin/env python3
"""One-shot migration: inside triple-quoted (oracle SQL) strings of the
operator modules, rewrite round(EXPR, n) -> floor((EXPR) * 10^n + 0.5) / 10^n
with balanced-paren parsing. Scala code outside the strings is untouched
(Spark-side round is shadowed by graft.functions.Num.round instead)."""
import re
import sys


def rewrite_sql(sql: str) -> str:
    out = []
    i = 0
    while True:
        m = re.search(r"\bround\(", sql[i:])
        if not m:
            out.append(sql[i:])
            break
        start = i + m.start()
        out.append(sql[i:start])
        j = start + len("round(")
        depth = 1
        while depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[start + len("round("):j - 1]
        # split top-level comma
        depth = 0
        for k, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                expr, scale = inner[:k], inner[k + 1:].strip()
                break
        else:
            raise ValueError("round() without scale: " + inner)
        expr = rewrite_sql(expr)
        mult = 10 ** int(scale)
        out.append(f"floor(({expr}) * {mult} + 0.5) / {mult}")
        i = j
    return "".join(out)


def process(path: str) -> None:
    src = open(path).read()
    parts = src.split('"""')
    # odd indices are inside triple-quoted strings
    for i in range(1, len(parts), 2):
        parts[i] = rewrite_sql(parts[i])
    open(path, "w").write('"""'.join(parts))


for p in sys.argv[1:]:
    process(p)
print("done")
