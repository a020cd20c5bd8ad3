#!/usr/bin/env python3
"""Time the full dumped oracle suite in DuckDB — the denominator of the
README's suite ratio, reproducible.

Usage: python3 tools/duck_suite.py [sfDir] [oracle_sql.json] [--runs N]
Defaults: /root/testdata/sf0.1, /tmp/verify_out/oracle_sql.json, 2.

Per query: fresh connection (no buffer-cache carryover), 32 threads,
40 GB spill cap, min-of-N. Prints per-query timings and the total;
failures are DNF rows (never silently dropped — bench_sf1's rule).
RUN ON A QUIET MACHINE.
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    path = args[1] if len(args) > 1 else "/tmp/verify_out/oracle_sql.json"
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1]) if "=" in a else 2
    sqls = json.load(open(path))
    total, dnf = 0.0, []
    for q in sorted(sqls):
        shots, failed = [], None
        for _ in range(runs):
            con = duckdb.connect()
            con.execute("SET threads TO 32")
            con.execute("SET max_temp_directory_size='40GB'")
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sf}/{t}.parquet')")
            t0 = time.time()
            try:
                con.execute(sqls[q]).fetchall()
            except Exception as e:
                failed = f"{type(e).__name__}: {e}"[:160]
                con.close()
                break
            shots.append(time.time() - t0)
            con.close()
        if failed:
            dnf.append(q)
            print(f"{q:34s} DNF ({failed})")
        else:
            total += min(shots)
            print(f"{q:34s} {min(shots):6.2f}s")
    print(f"\nTOTAL {total:.1f}s over {len(sqls) - len(dnf)} queries"
          + (f" ({len(dnf)} DNF: {dnf})" if dnf else ""))


if __name__ == "__main__":
    main()
