#!/usr/bin/env python3
"""Local dev mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]

Registers each fixture parquet as a DuckDB view, runs every SQL in
oracle_sql.json (or only the trailing query names, when given — the
slow d6/d8/t9 sf0.1 replays run as their own capped-thread pass),
loads the corresponding Spark parquet result, sorts columns by name,
and compares shape + values (exact for non-floats, reporting max abs
diff for floats). GRAFT_DUCKDB_THREADS caps DuckDB's thread pool so a
long replay can share an otherwise-idle host with timed work. This is
dev tooling only — the shipped Scala library has no Python dependency.
"""
import os
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main(sf_dir, out_dir, names=()):
    con = duckdb.connect()
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if names:
        missing = [n for n in names if n not in oracle]
        assert not missing, f"not in oracle_sql.json: {missing}"
        oracle = {n: oracle[n] for n in names}
    n_ok = n_fail = 0
    import time
    for name in sorted(oracle):
        try:
            t0 = time.time()
            want = con.execute(oracle[name]).df()
            oracle_sec = time.time() - t0
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            n_fail += 1
            continue
        want, got = norm(want), norm(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            n_fail += 1
            continue
        if want.shape != got.shape:
            print(f"FAIL {name}: shape want={want.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = None
        max_f = 0.0
        dtype_bad = None
        for c in want.columns:
            w, g = want[c], got[c]
            # the driver hashes typed values, so a float64-vs-int64 column
            # (e.g. DuckDB HUGEINT from an integer sum() -> pandas float)
            # is a hash mismatch even when numerically equal — flag it
            if w.dtype.kind != g.dtype.kind and {w.dtype.kind,
                                                 g.dtype.kind} & {"f"}:
                dtype_bad = dtype_bad or (c, w.dtype, g.dtype)
            if w.dtype.kind == "f" or g.dtype.kind == "f":
                for i, (a, b) in enumerate(zip(w, g)):
                    an, bn = (isinstance(a, float) and math.isnan(a)), \
                             (isinstance(b, float) and math.isnan(b))
                    if an != bn:
                        bad = (c, i, a, b)
                        break
                    if not an and a != b:
                        max_f = max(max_f, abs(a - b))
                        if abs(a - b) > 0:
                            bad = bad or (c, i, a, b)
            else:
                neq = (w.astype(object) != g.astype(object)) & ~(
                    w.isna() & g.isna())
                if neq.any():
                    i = int(neq.idxmax())
                    bad = (c, i, w[i], g[i])
            if bad and max_f == 0:
                break
        if dtype_bad and not bad:
            print(f"FAIL {name}: dtype mismatch col={dtype_bad[0]} "
                  f"want={dtype_bad[1]} got={dtype_bad[2]} "
                  f"(values equal — driver hash would still differ)")
            n_fail += 1
        elif bad and max_f > 0:
            print(f"FAIL {name}: float diff col={bad[0]} row={bad[1]} "
                  f"want={bad[2]!r} got={bad[3]!r} maxabs={max_f:g}")
            n_fail += 1
        elif bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} "
                  f"want={bad[2]!r} got={bad[3]!r}")
            n_fail += 1
        else:
            print(f"OK   {name} ({want.shape[0]} rows, "
                  f"oracle {oracle_sec:.1f} s)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
