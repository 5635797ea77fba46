#!/usr/bin/env python3
"""Linear-class bounds on the h01 bucket audit at the sf10 tier.

Usage: python3 scripts/check_sf10_audit.py [h01ParquetDir]
       (default /tmp/graft_verify_sf10/h01_lsh_bucket_audit)

The sf10 tier's instrument is h01's gen_pairs = Σ pop·(pop−1)/2 — the
exact candidate-pair mass each family's bucket join would emit. This
script turns the tier's scale claim into an executable gate:

  minhash    gen_pairs <= 8 * n_entries   (banded keys grow with corpus
  simhash64  gen_pairs <= 8 * n_entries    diversity; mass must stay
                                           linear-class — the r18 x05
                                           fix is what holds simhash64
                                           under this bound past 2^18)
  sign_lsh   gen_pairs <= 32 * n_entries  (target bucket population 32
                                           BY DESIGN: expected mass is
                                           ~(pop-1)/2 * entries ~ 15.5x,
                                           doubled for planted skew)
  winnow     reported, NOT bounded        (deliberately the PRE-maxDf
                                           detector: raw boilerplate
                                           mass going quadratic here
                                           while x34's wall stays flat
                                           is the instrument working)

Exit 1 on any violated bound.
"""
import sys

import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/graft_verify_sf10/h01_lsh_bucket_audit"
con = duckdb.connect()
rows = con.sql(
    f"SELECT family, n_entries, n_buckets, max_pop, gen_pairs "
    f"FROM read_parquet('{d}/*.parquet')").fetchall()
# winnow_capped's 32x is the cap's own arithmetic: pop <= 64 forces
# gen_pairs/entries <= (64-1)/2 = 31.5 — a violated bound means the
# df cap itself regressed
bounds = {"minhash": 8, "simhash64": 8, "sign_lsh": 32, "winnow_capped": 32}
fail = 0
for family, entries, buckets, max_pop, pairs in sorted(rows):
    if family in bounds:
        cap = bounds[family] * entries
        ok = pairs <= cap
        fail |= not ok
        print(f"{'PASS' if ok else 'FAIL'} {family}: gen_pairs {pairs:,} "
              f"{'<=' if ok else '>'} {bounds[family]}*entries {cap:,} "
              f"(buckets {buckets:,}, max_pop {max_pop})")
    else:
        print(f"INFO {family}: gen_pairs {pairs:,} (pre-cap detector, "
              f"unbounded by design; buckets {buckets:,}, max_pop {max_pop})")
# a bounded family that VANISHES (zero rows, or renamed) must fail too —
# otherwise a regression that empties e.g. winnow_capped passes silently
missing = sorted(set(bounds) - {r[0] for r in rows})
for family in missing:
    print(f"FAIL {family}: bounded family missing from the audit rows")
    fail = 1
sys.exit(1 if fail else 0)
