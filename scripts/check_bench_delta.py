#!/usr/bin/env python3
"""Probe-normalized round-over-round bench comparison (r19 verdict
task 2: make the reference-probe normalization LOAD-BEARING instead of
a number a human has to remember to divide by).

Usage: python3 scripts/check_bench_delta.py OLD.json NEW.json [--top N]
       python3 scripts/check_bench_delta.py --git-prev NEW.json

Both inputs are full-fidelity Bench artifacts (BENCH_LOCAL.json shape:
total_sec, probe_sec, queries{name:{sec, spread, ...}}). --git-prev
reads the committed version of NEW's path from git HEAD as OLD — the
one-command wiring for "did this round regress against what's
committed?".

Normalization: each artifact's totals and per-query seconds are
divided by ITS OWN probe_sec (the fixed 640M-row xxhash64 reference
workload), so ambient host-speed drift between the two runs divides
out — the exact failure mode of r18, where 89% of queries read ~1.22x
slower including untouched code. Artifacts predating the probe
(r18 and earlier) lack probe_sec; the comparison then falls back to
raw seconds and says so.

Verdicts:
  - TOTAL normalized ratio > 1.15           -> FAIL (exit 1)
  - any query normalized ratio > 2.0 with
    >= 1 s absolute growth and outside both
    artifacts' recorded rep spreads         -> FAIL (exit 1)
  - otherwise                               -> PASS (exit 0)

On FAIL the prescribed escalation is the PLANS.md r19 paired A/B:
check out the old bench HEAD in a worktree, interleave old/new runs
A/B/A/B x 4 on a steal-clean host, and attribute the delta to changed
queries' declared algorithmic cost vs host drift before accepting any
reading. A failed delta gate is a reason to MEASURE, not a reason to
re-run until it passes.
"""
import json
import subprocess
import sys


def load(path):
    with open(path) as fh:
        doc = json.load(fh)
    qs = {k: v["sec"] for k, v in doc.get("queries", {}).items()}
    spreads = {k: v.get("spread", 1.0) for k, v in doc.get("queries", {}).items()}
    return {
        "total": float(doc.get("total_sec", sum(qs.values()))),
        "probe": float(doc.get("probe_sec", -1)),
        "noisy": bool(doc.get("host_noisy", False)),
        "qs": qs,
        "spreads": spreads,
        "ts": doc.get("ts", "?"),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 8
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
        args = [a for a in args if a != str(top)]
    if "--git-prev" in sys.argv:
        if len(args) != 1:
            print("usage: check_bench_delta.py --git-prev NEW.json",
                  file=sys.stderr)
            sys.exit(2)
        new_path = args[0]
        blob = subprocess.run(
            ["git", "show", f"HEAD:{new_path}"],
            capture_output=True, text=True, check=True).stdout
        old = json.loads(blob)
        oldqs = {k: v["sec"] for k, v in old.get("queries", {}).items()}
        old = {"total": float(old.get("total_sec", sum(oldqs.values()))),
               "probe": float(old.get("probe_sec", -1)),
               "noisy": bool(old.get("host_noisy", False)),
               "qs": oldqs,
               "spreads": {k: v.get("spread", 1.0)
                           for k, v in old.get("queries", {}).items()},
               "ts": old.get("ts", "?")}
        new = load(new_path)
        old_name = f"HEAD:{new_path}"
        new_name = new_path
    else:
        if len(args) != 2:
            print("usage: check_bench_delta.py OLD.json NEW.json [--top N]\n"
                  "       check_bench_delta.py --git-prev NEW.json",
                  file=sys.stderr)
            sys.exit(2)
        old, new = load(args[0]), load(args[1])
        old_name, new_name = args[0], args[1]

    for name, art in ((old_name, old), (new_name, new)):
        if art["noisy"]:
            print(f"WARNING: {name} is marked host_noisy — its numbers "
                  "carry contamination; the verdict below is advisory")

    normalized = old["probe"] > 0 and new["probe"] > 0
    op = old["probe"] if normalized else 1.0
    np_ = new["probe"] if normalized else 1.0
    mode = ("probe-normalized" if normalized
            else "RAW (probe_sec missing in at least one artifact — "
                 "pre-r19 shape)")
    print(f"old: {old_name} ts={old['ts']} total={old['total']:.1f}s "
          f"probe={old['probe']:.3f}")
    print(f"new: {new_name} ts={new['ts']} total={new['total']:.1f}s "
          f"probe={new['probe']:.3f}")
    ratio = (new["total"] / np_) / (old["total"] / op)
    print(f"total ratio ({mode}): {ratio:.3f}  "
          f"[{old['total'] / op:.1f} -> {new['total'] / np_:.1f}]")

    fail = ratio > 1.15
    if fail:
        print(f"FAIL total: normalized ratio {ratio:.3f} > 1.15")

    shared = sorted(set(old["qs"]) & set(new["qs"]),
                    key=lambda q: (new["qs"][q] / np_)
                    / max(old["qs"][q] / op, 1e-9), reverse=True)
    missing = sorted(set(old["qs"]) ^ set(new["qs"]))
    if missing:
        print(f"note: {len(missing)} queries in only one artifact: "
              f"{', '.join(missing[:6])}{'...' if len(missing) > 6 else ''}")
    print(f"top {top} movers (normalized new/old):")
    for q in shared[:top]:
        o = old["qs"][q] / op
        n = new["qs"][q] / np_
        r = n / max(o, 1e-9)
        spread = max(old["spreads"].get(q, 1.0), new["spreads"].get(q, 1.0))
        # a >=2x move that grew by >=1s (normalized) and exceeds both
        # runs' recorded rep spreads is a per-query regression verdict
        bad = r > 2.0 and (n - o) * np_ >= 1.0 and r > spread
        print(f"  {'FAIL' if bad else '    '} {q}: {r:5.2f}x "
              f"({o:.2f} -> {n:.2f}, spread<={spread:.2f})")
        fail |= bad
    if fail:
        print("escalation: run the PLANS.md r19 paired A/B (old bench HEAD "
              "in a worktree, A/B/A/B x 4, steal-clean) before accepting "
              "either reading — do NOT just re-run until green")
    print("VERDICT:", "FAIL" if fail else "PASS")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
