#!/usr/bin/env python3
"""Executable growth-exponent gate over the sf0.1/sf1/sf10 decades
(r18 verdict task 4: "the next quadratic costs a red gate, not 628 s
of judge wall-clock").

Usage: python3 scripts/check_growth.py sf10_results.jsonl
       python3 scripts/check_growth.py --selftest

The jsonl path is REQUIRED (r19 judge finding: the old default of
/tmp/sf10_results.jsonl silently produced verdicts from a stale file
left by a previous session). Gate coverage is two-sided: every query
in the jsonl must have lower-tier readings, and every family in
EXPECTED_GATED (the committed run_sf10.sh default list) must appear
in the jsonl — a rename, crash, or QUERIES-list edit cannot silently
ungate a family in either direction.

Reads the committed BENCH_LOCAL.json (sf0.1) and BENCH_SF1.json (sf1)
full-fidelity artifacts plus the sf10 spot-tier jsonl (one Bench JSON
line per query, short-code keys), fits the exponent b in t = a * n^b
by least squares over log-log across the three decades, and FAILS
(exit 1) any query whose fitted exponent exceeds its class bound:

  connected-components family (x23/x46/x92/x94):  b <= 1.00
    (pointer-jumping is linear work times ~log n rounds; the measured
    record is 5.0-6.6x per decade, b ~ 0.70-0.82)
  everything else:                                 b <= 1.15
    (linear-class designs; measured record b <= 0.64 — the slack
    covers log factors and cold-JVM constants while still rejecting
    n^1.5 (b = 1.5) and quadratics (b ~ 2))

Queries under 1 s at sf10 are reported but not gated (fixed overhead
dominates; their exponents are noise around 0). A query present in
the jsonl but missing a lower tier, or a {"failed": q} line, is a
hard failure — a rename or crash must not silently drop a family.

--selftest red-teams the gate itself with a fabricated quadratic
family (must be flagged) and a fabricated linear one (must pass).
"""
import json
import math
import sys

CC_FAMILY = {"x23", "x46", "x92", "x94"}
# the committed gated-family set — MUST match run_sf10.sh's default
# QUERIES list; a full-tier jsonl missing any of these is a hard FAIL
EXPECTED_GATED = {
    "x02", "x03", "x04", "x05", "x34", "x16", "x64",
    "x23", "x46", "x92", "x94", "h01",
    "j05", "w03", "a05", "s02",
    "f01", "f02", "f03", "f04", "f05", "f06", "f07",
    "x120", "x121",
}
CC_BOUND = 1.00
DEFAULT_BOUND = 1.15
MIN_SF10_SEC = 1.0


def fit_exponent(secs):
    xs = [math.log10(sf) for sf in (0.1, 1.0, 10.0)]
    ys = [math.log10(s) for s in secs]
    mx, my = sum(xs) / 3, sum(ys) / 3
    return (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs))


def gate(rows):
    """rows: [(code, sec01, sec1, sec10)] -> (exit_code, report lines)."""
    fail = 0
    lines = []
    for code, s01, s1, s10 in sorted(rows):
        bound = CC_BOUND if code in CC_FAMILY else DEFAULT_BOUND
        b = fit_exponent([s01, s1, s10])
        if s10 < MIN_SF10_SEC:
            lines.append(f"SKIP {code}: exp {b:5.2f} (sf10 {s10:.2f}s "
                         f"< {MIN_SF10_SEC}s, overhead-dominated)")
        elif b <= bound:
            lines.append(f"PASS {code}: exp {b:5.2f} <= {bound} "
                         f"({s01:.2f}/{s1:.2f}/{s10:.2f}s)")
        else:
            fail = 1
            lines.append(f"FAIL {code}: exp {b:5.2f} > {bound} "
                         f"({s01:.2f}/{s1:.2f}/{s10:.2f}s) — "
                         f"superlinear growth past the class bound")
    return fail, lines


def selftest():
    # quadratic family must be flagged, linear must pass, CC bound is
    # tighter than default, sub-second sf10 readings are skipped
    rows = [("toy_quad", 0.05, 5.0, 500.0),   # b = 2.0 -> FAIL
            ("toy_lin", 0.5, 5.0, 50.0),      # b = 1.0 -> PASS
            ("x23", 0.5, 6.0, 80.0),          # b ~ 1.10 > 1.00 -> FAIL
            ("toy_small", 0.3, 0.4, 0.5)]     # sf10 < 1 s -> SKIP
    fail, lines = gate(rows)
    for ln in lines:
        print("[selftest]", ln)
    ok = (fail == 1
          and any(ln.startswith("FAIL toy_quad") for ln in lines)
          and any(ln.startswith("PASS toy_lin") for ln in lines)
          and any(ln.startswith("FAIL x23") for ln in lines)
          and any(ln.startswith("SKIP toy_small") for ln in lines))
    print("[selftest]", "gate logic OK" if ok else "GATE LOGIC BROKEN")
    sys.exit(0 if ok else 1)


def main():
    if "--selftest" in sys.argv:
        selftest()
    partial = "--partial" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) != 1:
        print("usage: check_growth.py [--partial] sf10_results.jsonl\n"
              "(the path is required: a default would silently read a "
              "stale file from a previous session)", file=sys.stderr)
        sys.exit(2)
    path = paths[0]
    with open("BENCH_LOCAL.json") as fh:
        local = json.load(fh)["queries"]
    with open("BENCH_SF1.json") as fh:
        sf1 = json.load(fh)["queries"]
    # full-name lookup by unique short code (the jsonl carries codes)
    by_code = {}
    for name in local:
        by_code[name.split("_")[0]] = name
    rows = []
    fail = 0
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            doc = json.loads(line)
            if "failed" in doc and "queries" not in doc:
                print(f"FAIL {doc['failed']}: bench run failed at sf10")
                fail = 1
                continue
            for code, s10 in doc.get("queries", {}).items():
                name = by_code.get(code)
                if name is None or name not in sf1:
                    print(f"FAIL {code}: missing from a lower-tier "
                          f"artifact — renamed or never benched")
                    fail = 1
                    continue
                rows.append((code, local[name]["sec"], sf1[name]["sec"],
                             float(s10)))
    g, lines = gate(rows)
    fail |= g
    for ln in lines:
        print(ln)
    if not rows and not fail:
        print("FAIL: no sf10 readings found in", path)
        fail = 1
    if not partial:
        seen = {code for code, *_ in rows}
        for code in sorted(EXPECTED_GATED - seen):
            print(f"FAIL {code}: expected gated family has no sf10 "
                  f"reading in {path} — dropped from the QUERIES list, "
                  f"renamed, or crashed before its metric line")
            fail = 1
    sys.exit(fail)


if __name__ == "__main__":
    main()
