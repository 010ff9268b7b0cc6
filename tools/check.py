#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> (Spark parquet dir) and runs the matching
SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, then compares
row count, sorted-by-name schema, and an order-insensitive row hash.
"""
import sys, json, glob, hashlib
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    hashes = sorted(
        hashlib.md5("\x1f".join(norm_cell(r[i]) for i in order).encode()).hexdigest()
        for r in rows)
    return hashlib.md5("\n".join(hashes).encode()).hexdigest()

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem events "
                 "documents embeddings").split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got_cols) != sorted(want_cols):
            problems.append(f"cols {sorted(got_cols)} != {sorted(want_cols)}")
        elif table_digest(got, got_cols) != table_digest(want, want_cols):
            problems.append("hash mismatch")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if len(got) <= 10 and len(want) <= 10:
                print(f"  spark: {sorted(got)[:10]}")
                print(f"  duck : {sorted(want)[:10]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
