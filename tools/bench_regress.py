#!/usr/bin/env python3
"""Standing per-query bench-regression gate.

The round driver compares bench TOTALS only, so a single-query 6x
regression (q_chunk_documents, r6->r7) can hide inside a faster total.
This tool diffs a fresh bench_full.json against the committed
bench_baseline.json and fails on any per-query slowdown above the
threshold.

Usage:
    python3 tools/bench_regress.py [bench_full.json] [bench_baseline.json]
    python3 tools/bench_regress.py --update   # accept current as baseline
    python3 tools/bench_regress.py --scaling bench_hi.json bench_lo.json

Policy:
  - ratio = current_median / baseline_median, per query.
  - FAIL if ratio > THRESHOLD (default 2.0) AND the absolute delta is
    over ABS_FLOOR seconds (0.4s) -- sub-half-second queries swing with
    box noise (mr_wordcount 0.26->0.70 across rounds at identical code;
    the Bench scaladoc's rationale for medians-of-three).
  - Queries new since the baseline PASS (no history) but are listed so
    the baseline gets refreshed.
  - After an accepted full run, refresh with --update and commit the
    new baseline alongside the code that changed the numbers.

Scaling gate (--scaling): compare a high-core run against a low-core
run of the SAME code (e.g. SPARK_GRAFT_CPUS=32 vs =8, back-to-back so
the box factor cancels). Per query, scaling = t_lo / t_hi: > 1 means
the extra cores helped, ~1 serial, < 1 the parallelism costs more than
it buys. FAIL when scaling < SCALING_MIN (default 0.9) AND the query is
over ABS_FLOOR at either core count -- the round-16 driver caught a
whole class of regressions no same-core comparison could see (the full
suite ran FASTER on 8 cores than 32 after over-eager read-side
fan-out), so anti-scaling is a first-class gate, not a curiosity.

Exit codes: 0 ok, 1 regression found, 2 usage/IO error.
"""
import json
import sys
import os

THRESHOLD = float(os.environ.get("BENCH_REGRESS_THRESHOLD", "2.0"))
ABS_FLOOR = float(os.environ.get("BENCH_REGRESS_ABS_FLOOR", "0.4"))
SCALING_MIN = float(os.environ.get("BENCH_REGRESS_SCALING_MIN", "0.9"))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CUR_DEFAULT = os.path.join(ROOT, "bench_full.json")
BASE_DEFAULT = os.path.join(ROOT, "bench_baseline.json")


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    return {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}


def main(argv):
    if argv and argv[0] == "--update":
        src = argv[1] if len(argv) > 1 else CUR_DEFAULT
        try:
            cur = load_queries(src)
        except (OSError, ValueError) as e:
            print(f"bench_regress --update: cannot load {src}: {e}\n"
                  f"run the full bench first (graft.Bench writes bench_full.json)",
                  file=sys.stderr)
            return 2
        if not cur:
            print(f"bench_regress --update: {src} has no per-query medians",
                  file=sys.stderr)
            return 2
        with open(BASE_DEFAULT, "w") as f:
            json.dump({"queries": dict(sorted(cur.items())),
                       "source": f"{os.path.basename(src)} medians under the "
                                 "per-query unpersist+GC harness; refresh with "
                                 "tools/bench_regress.py --update"},
                      f, indent=1)
        print(f"baseline refreshed: {len(cur)} queries -> {BASE_DEFAULT}")
        return 0

    if argv and argv[0] == "--scaling":
        if len(argv) != 3:
            print("usage: bench_regress.py --scaling <hi-core bench_full.json> "
                  "<lo-core bench_full.json>", file=sys.stderr)
            return 2
        try:
            hi = load_queries(argv[1])
            lo = load_queries(argv[2])
        except (OSError, ValueError) as e:
            print(f"bench_regress --scaling: cannot load inputs: {e}",
                  file=sys.stderr)
            return 2
        rows = []
        for q in sorted(set(hi) & set(lo)):
            if hi[q] > 0 and lo[q] > 0:
                rows.append((q, hi[q], lo[q], lo[q] / hi[q]))
        anti = [(q, h, l, s) for q, h, l, s in rows
                if s < SCALING_MIN and max(h, l) > ABS_FLOOR]
        print(f"{'query':40s} {'t_hi':>8s} {'t_lo':>8s} {'scaling':>8s}")
        for q, h, l, s in sorted(rows, key=lambda x: x[3]):
            mark = "  ANTI" if (q, h, l, s) in anti else ""
            print(f"{q:40s} {h:8.3f} {l:8.3f} {s:8.2f}{mark}")
        if anti:
            print(f"FAIL: {len(anti)} anti-scaling quer{'y' if len(anti) == 1 else 'ies'} "
                  f"(scaling < {SCALING_MIN} with > {ABS_FLOOR}s runtime): "
                  "the high-core run is slower than the low-core run of the "
                  "same code -- added parallelism with negative return")
            return 1
        print(f"ok: {len(rows)} queries, none anti-scaling below {SCALING_MIN}")
        return 0

    cur_path = argv[0] if len(argv) > 0 else CUR_DEFAULT
    base_path = argv[1] if len(argv) > 1 else BASE_DEFAULT
    try:
        cur = load_queries(cur_path)
        base = load_queries(base_path)
    except (OSError, ValueError) as e:
        print(f"bench_regress: cannot load inputs: {e}", file=sys.stderr)
        return 2

    regressions = []
    improvements = 0
    for q, t in sorted(cur.items()):
        b = base.get(q)
        if b is None or b <= 0:
            continue
        ratio = t / b
        if ratio > THRESHOLD and (t - b) > ABS_FLOOR:
            regressions.append((q, b, t, ratio))
        elif ratio < 1 / THRESHOLD:
            improvements += 1

    new = sorted(set(cur) - set(base))
    gone = sorted(set(base) - set(cur))
    if new:
        print(f"note: {len(new)} queries not in baseline (pass, refresh "
              f"with --update): {', '.join(new[:8])}{'...' if len(new) > 8 else ''}")
    if gone:
        print(f"note: {len(gone)} baseline queries missing from this run: "
              f"{', '.join(gone[:8])}{'...' if len(gone) > 8 else ''}")

    if regressions:
        print(f"FAIL: {len(regressions)} per-query regression(s) > "
              f"{THRESHOLD}x (+{ABS_FLOOR}s floor):")
        for q, b, t, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {q:40s} {b:7.3f}s -> {t:7.3f}s  ({r:.2f}x)")
        return 1
    print(f"ok: {len(cur)} queries vs baseline of {len(base)}; "
          f"0 regressions, {improvements} >2x improvements")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
