#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Replicates the driver's comparison path as faithfully as we can infer it:
the Spark result is read through pandas/pyarrow (so parquet DECIMAL arrives
as decimal.Decimal objects, dates as datetime.date), while the oracle SQL
result comes back through DuckDB's `.df()` (DECIMAL -> float64). Cells are
compared via their string representation after column-name sort — exactly
the path where `Decimal('24851.00')` vs `24851.0` diverges. We also emulate
the driver's pandas row-sort, which CRASHES on array-typed cells
(unhashable numpy.ndarray), so array columns in any query output are
flagged here as failures too.
"""
import sys, json, glob, hashlib
import datetime
import duckdb
import numpy as np
import pandas as pd


def norm_cell(v):
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple)):
        raise TypeError(f"array-typed cell would crash the driver compare: {type(v)}")
    # Dates hash-matched in the real driver despite pandas(date32)=datetime.date
    # vs duckdb.df()=datetime64 — canonicalize them; everything else (notably
    # Decimal vs float, where the driver DOES mismatch) stays raw str().
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def df_digest(df):
    cols = sorted(df.columns)
    # driver-style sort: pandas sort_values over all columns (crashes on arrays)
    df = df[cols].sort_values(by=cols, kind="mergesort")
    hashes = sorted(
        hashlib.md5("\x1f".join(norm_cell(v) for v in row).encode()).hexdigest()
        for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(hashes).encode()).hexdigest()


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem events "
                 "documents embeddings").split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_files],
                            ignore_index=True)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        else:
            try:
                if df_digest(got) != df_digest(want):
                    problems.append("hash mismatch")
            except Exception as e:
                problems.append(f"compare crashed (driver would too): {e}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if len(got) <= 10 and len(want) <= 10:
                print(f"  spark: {got.to_dict('records')[:10]}")
                print(f"  duck : {want.to_dict('records')[:10]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    # rows-only queries (no oracle) still pass through the driver's pandas
    # sort — make sure none of them emit array-typed cells either. The
    # queries.txt manifest (written by Verify) catches queries whose dump is
    # MISSING entirely: without it a crashed rows-only query simply has no
    # directory and would vanish from the report.
    import os
    manifest = f"{out_dir}/queries.txt"
    if os.path.exists(manifest):
        names = [l.strip() for l in open(manifest) if l.strip()]
    else:
        # A stale Verify binary (pre-manifest) would silently reinstate the
        # blind spot where a crashed rows-only query has no dir and vanishes.
        # Fail loudly instead of quietly degrading the check.
        print("FAIL <harness>: queries.txt manifest missing — stale Verify? "
              "Falling back to dir glob CANNOT detect crashed rows-only queries")
        n_fail += 1
        names = [d.rstrip("/").split("/")[-1]
                 for d in sorted(glob.glob(f"{out_dir}/*/"))]
    for name in sorted(names):
        if name in oracle:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: rows-only query produced no output")
            n_fail += 1
            continue
        try:
            df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            df_digest(df)
            print(f"PASS {name} (rows-only, {len(df)} rows, sortable)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only output not driver-sortable: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
