#!/usr/bin/env python3
"""Dev-time mirror of the driver's DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify"`,
run `python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify`.

NOT part of the library — development tooling only (the driver runs its own
equivalent per round).
"""
import sys, os, json, glob
import duckdb

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    no_oracle = []
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        if q not in oracle:
            no_oracle.append(q)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
            want = con.execute(oracle[q]).fetchdf()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {q}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {q}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            got_s = got.astype(str).values.tolist()
            want_s = want.astype(str).values.tolist()
            if got_s != want_s:
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(got_s, want_s)) if a != b]
                print(f"FAIL {q}: {len(bad)} mismatched rows; first: {bad[0]}")
                n_fail += 1
                continue
            print(f"PASS {q} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {q}: {type(e).__name__}: {e}")
            n_fail += 1
    if no_oracle:
        print(f"no-oracle (rows-only): {no_oracle}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
