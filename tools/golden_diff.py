#!/usr/bin/env python3
"""Compare two graft.Verify dump directories query by query.

Usage: python3 tools/golden_diff.py <goldenDir> <candidateDir> [query ...]

For each query present in the golden dir, reads both parquet dumps through
pyarrow/pandas, sorts rows by every column's string form (the driver's own
order-insensitive compare), and reports IDENTICAL / DIFFER / MISSING. This
is the optimization round's regression harness: any plan rewrite must leave
every dump byte-equivalent at the compared scale.
"""
import sys, glob, os
import pandas as pd
import numpy as np


def frame(d):
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def canon(df):
    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, (np.ndarray, list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    golden, cand = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{golden}/*") if os.path.isdir(p))
    n_ok = n_diff = 0
    for name in names:
        if only and name not in only:
            continue
        g = frame(f"{golden}/{name}")
        c = frame(f"{cand}/{name}")
        if g is None:
            continue
        if c is None:
            print(f"MISSING {name}")
            n_diff += 1
            continue
        if list(g.columns) != list(c.columns):
            print(f"DIFFER  {name}: columns {list(g.columns)} vs {list(c.columns)}")
            n_diff += 1
            continue
        cg, cc = canon(g), canon(c)
        if cg == cc:
            n_ok += 1
        else:
            n_diff += 1
            print(f"DIFFER  {name}: {len(cg)} vs {len(cc)} rows", end="")
            for i, (a, b) in enumerate(zip(cg, cc)):
                if a != b:
                    print(f"; first diff row {i}:\n  G {a[:200]}\n  C {b[:200]}", end="")
                    break
            print()
    print(f"== {n_ok} identical, {n_diff} differ ==")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
