#!/usr/bin/env python3
"""Per-query oracle compare with a hard timeout — the sf1-tier runner.

Usage: python3 scripts/compare_timeout.py <sfDir> <outDir> [timeoutSec] [jobs]

Same canonicalized comparison as scripts/compare.py (columns sorted by
name, EXCEPT ALL both ways), but each query's oracle runs in its OWN
killable subprocess with a hard timeout. At sf1 a handful of DuckDB
oracle replays are orders of magnitude slower than the Spark side (the
oracle is a single-node semantic spec, not an engine); a TIMEOUT row
records "oracle too slow at this SF", which is a different statement
from a mismatch and must not wedge the whole gate. Requires Verify
output to exist at <outDir> (run graft.Verify first)."""
import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def run_one(name, sf, out):
    """Executed in the child: compare one query, print the verdict."""
    import duckdb
    con = duckdb.connect()
    con.sql("SET threads=8")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(f"{out}/oracle_sql.json"))[name]
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").arrow()
    except Exception as e:
        print(f"SPARK_READ_FAILED: {str(e)[:200]}")
        return
    try:
        want = con.sql(sql).arrow()
    except Exception as e:
        print(f"ORACLE_FAILED: {str(e)[:200]}")
        return
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols != wcols:
        print(f"COLS_MISMATCH spark={gcols} oracle={wcols}")
        return
    if got.num_rows != want.num_rows:
        print(f"ROWS_MISMATCH spark={got.num_rows} oracle={want.num_rows}")
        return
    order = ", ".join(f'"{c}"' for c in gcols)
    con.register("_got", got)
    con.register("_want", want)
    diff = con.sql(
        f"SELECT count(*) FROM ((SELECT {order} FROM _got EXCEPT ALL "
        f"SELECT {order} FROM _want) UNION ALL (SELECT {order} FROM _want "
        f"EXCEPT ALL SELECT {order} FROM _got))").fetchall()[0][0]
    print("OK" if diff == 0 else f"VALUES_MISMATCH {diff} diff rows")


def main():
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    argv = sys.argv[1:]
    only = None
    if argv and argv[0] == "--only":  # --only q1,q2: filtered runs
        only = set(argv[1].split(","))
        argv = argv[2:]
    sf = argv[0]
    out = argv[1]
    timeout = int(argv[2]) if len(argv) > 2 else 600
    jobs = int(argv[3]) if len(argv) > 3 else 4
    names = sorted(json.load(open(f"{out}/oracle_sql.json")))
    if only is not None:
        missing = only - set(names)
        if missing:
            sys.exit(f"--only names not in oracle_sql.json: {sorted(missing)}")
        names = [n for n in names if n in only]

    def child(name):
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", name, sf, out],
                capture_output=True, text=True, timeout=timeout)
            v = (r.stdout.strip().splitlines() or ["NO_OUTPUT"])[-1]
            if r.returncode != 0 and v == "NO_OUTPUT":
                v = f"CRASHED: {r.stderr[-150:]}"
            return name, v
        except subprocess.TimeoutExpired:
            return name, f"ORACLE_TIMEOUT >{timeout}s"

    with ThreadPoolExecutor(max_workers=jobs) as ex:
        results = dict(ex.map(child, names))
    npass = sum(1 for v in results.values() if v == "OK")
    for name in sorted(results):
        tag = "PASS" if results[name] == "OK" else "FAIL"
        print(f"{tag} {name}: {results[name]}")
    print(f"\n{npass}/{len(results)} queries match at {sf}")
    # a filtered run must not clobber a full-suite record
    rec = "compare_results.json" if only is None else "compare_results.partial.json"
    json.dump({"sf": sf, "pass": npass, "total": len(results),
               "results": results},
              open(f"{out}/{rec}", "w"), indent=1)
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
