#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB against the same sf tables and compare (columns sorted by name,
rows sorted, values compared exactly after normalization).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import time

import duckdb

# Oracle-side latency guard (round-13 ADVICE #8): the recursive-CTE
# replays (q_split_leakage, the dedup_cluster family) are the queries a
# fixture regen with inflated cluster sizes would silently turn into
# the bottleneck — the same shape as the 215 s sf1 verify blowup was
# for Spark. Per-query oracle wall times are recorded to
# <outDir>/oracle_times.json and any query above this many seconds at
# sf0.01 is flagged loudly in the summary.
ORACLE_WALL_WARN_SEC = 10.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # floats: exact text repr; None normalized; bytes -> hex
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(df):
    # df: pandas DataFrame -> sorted-rows/sorted-cols list of tuples
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    oracle_secs = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            t0 = time.monotonic()
            want = con.sql(sql).df()
            oracle_secs[name] = round(time.monotonic() - t0, 3)
            gc, gr = canon(got)
            wc, wr = canon(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_fail += 1
            elif gr != wr:
                ndiff = sum(1 for a, b in zip(gr, wr) if a != b) + abs(len(gr) - len(wr))
                print(f"FAIL {name}: rows differ (spark={len(gr)} duckdb={len(wr)}, {ndiff} mismatched)")
                for a, b in list(zip(gr, wr))[:200]:
                    if a != b:
                        print(f"   spark : {a}\n   duckdb: {b}")
                        break
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump(oracle_secs, f, indent=1, sort_keys=True)
    slow = sorted(((t, n) for n, t in oracle_secs.items()
                   if t > ORACLE_WALL_WARN_SEC), reverse=True)
    for t, n in slow:
        print(f"SLOW ORACLE {n}: {t:.1f} s (> {ORACLE_WALL_WARN_SEC:.0f} s "
              f"— a fixture regen may have inflated its replay)")
    top = sorted(((t, n) for n, t in oracle_secs.items()), reverse=True)[:5]
    print("\noracle wall top-5: " +
          ", ".join(f"{n}={t:.2f}s" for t, n in top))
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
