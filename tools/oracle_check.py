#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each parquet dump
written by graft.Verify, run the paired DuckDB oracle SQL over the same
source tables and compare (rows, schema-width, values).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [only_csv]
(only_csv: comma-separated query names — grade just those, for fast iteration)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pdir, "*.parquet")):
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # driver-style compare: sort columns by name, sort rows, exact values
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        mismatch = None
        for c in exp.columns:
            ev, gv = exp_s[c], got_s[c]
            if str(ev.dtype) != str(gv.dtype):
                mismatch = f"dtype[{c}] exp={ev.dtype} got={gv.dtype}"
                break
            if not ev.equals(gv):
                bad = (ev != gv) & ~(ev.isna() & gv.isna())
                i = bad[bad].index[0] if bad.any() else None
                if i is not None:
                    mismatch = f"value[{c}] row{i} exp={ev[i]!r} got={gv[i]!r}"
                    break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    # queries with spark output but no oracle (rows-only in the driver)
    for pdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(pdir)
        if os.path.isdir(pdir) and name not in oracle and (only is None or name in only):
            n = con.sql(f"SELECT count(*) FROM read_parquet('{pdir}/*.parquet')").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
