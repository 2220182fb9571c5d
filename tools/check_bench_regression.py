#!/usr/bin/env python3
"""Mechanical per-query bench regression check.

Builds the best (minimum) prior per-query time from every BENCH_r*.json
in the repo root — the driver stores the full per-query map only inside
the (possibly truncated) "tail" string, so pairs are harvested by regex,
which tolerates truncation at either end — then diffs a current bench
run against it and flags queries slower than FACTOR x their best prior.

Best-prior (not last-round) is the right baseline on a noisy shared
host: a query's minimum across rounds approximates its true plan cost,
so "current > 2 x best-ever" is signal, not noise (NEXT.md's measured
+-2x single-run noise stays under the default factor).

Usage:
  sbt -batch "runMain graft.Bench" | tee /tmp/bench.out
  python3 tools/check_bench_regression.py /tmp/bench.out [factor] \
      [--duckdb TIMING.json]

Input: any file (or - for stdin) containing Bench's stdout — the line
with the "queries" map is located automatically. Exit 1 iff regressions.

--duckdb takes the {"queries": {name: sec}} file that
check_oracle.py --timing/--time-only writes (measured at the SAME sf
dir as the bench run) and prints the summary spark/duckdb wall-time
ratio over the headline intersection — the cross-engine denominator
the per-round "within 2x of baseline" envelope is judged against.
"""
import glob
import json
import os
import re
import sys

PAIR = re.compile(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)')
META = {"value", "sf"}  # numeric non-query keys in the bench line

# Adjudicated intentional shape changes: the old best-prior measured a
# DIFFERENT (scale-unsafe) plan, so the comparison floor resets to the
# new form's isolated warm cost — otherwise the gate would flag the
# scale-safety trade forever. name -> (floor_sec, round, reason).
ADJUDICATED = {
    # r10: single-partition global-ntile sort -> q91-style range-rank
    # (sampled boundaries + per-range offsets); warm isolated 1.6 s.
    "q66_ntile_deciles": (1.6, "r10",
                          "exact ntile via range-exchange rank"),
    # r10: all-pairs cosine pair frame -> cluster-bucketed k-means
    # candidates (+in-query training cost); the quadratic truth moved to
    # bench-excluded m8b. Warm isolated 7.4 s.
    "m8_batch_negatives": (7.4, "r10",
                           "bucketed pair frame incl. k-means training"),
}


def query_times(text):
    return {k: float(v) for k, v in PAIR.findall(text) if k not in META}


def best_prior(root):
    best = {}
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            tail = json.load(open(path)).get("tail") or ""
        except (json.JSONDecodeError, OSError):
            continue
        for name, sec in query_times(tail).items():
            if name not in best or sec < best[name]:
                best[name] = sec
    return best


def duckdb_ratio(current, timing_path):
    """Summary spark/duckdb wall ratio over the query intersection."""
    try:
        tj = json.load(open(timing_path))
    except (json.JSONDecodeError, OSError) as e:
        print(f"duckdb timing file unreadable: {e}", file=sys.stderr)
        return
    duck = tj.get("queries", tj)
    both = sorted(set(current) & set(duck))
    if not both:
        print("duckdb ratio: no query intersection")
        return
    s_tot = sum(current[q] for q in both)
    d_tot = sum(duck[q] for q in both)
    per = sorted(((current[q] / duck[q] if duck[q] > 0 else float("inf"), q)
                  for q in both), reverse=True)
    med = per[len(per) // 2][0]
    # sub-0.1ms oracles round to 0.0 — an intersection of only trivial
    # queries would otherwise divide by zero on the total.
    ratio = f"{s_tot / d_tot:.2f}x" if d_tot > 0 else "n/a (duckdb 0.0s)"
    print(f"duckdb ratio: spark {s_tot:.1f}s / duckdb {d_tot:.1f}s = "
          f"{ratio} total over {len(both)} shared queries "
          f"(median per-query {med:.2f}x, sf_dir {tj.get('sf_dir', '?')})")
    worst = ", ".join(f"{q} {r:.1f}x" for r, q in per[:5])
    print(f"duckdb ratio worst-5: {worst}")


def main():
    argv = sys.argv[1:]
    duck_file = None
    if "--duckdb" in argv:
        i = argv.index("--duckdb")
        duck_file = argv[i + 1]
        del argv[i:i + 2]
    src = argv[0] if argv else "-"
    factor = float(argv[1]) if len(argv) > 1 else 2.0
    text = sys.stdin.read() if src == "-" else open(src).read()
    current = query_times(text)
    if not current:
        print("no per-query timings found in input", file=sys.stderr)
        return 2
    if duck_file:
        duckdb_ratio(current, duck_file)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = best_prior(root)
    if not best:
        print("no BENCH_r*.json priors found — nothing to compare")
        return 0
    for name, (floor, rnd, reason) in ADJUDICATED.items():
        if best.get(name, floor) < floor:
            print(f"ADJ  {name}: floor {best[name]:.3f}s -> {floor:.3f}s "
                  f"({rnd}: {reason})")
            best[name] = floor
    regressions = []
    fresh = []
    for name, sec in sorted(current.items()):
        if name not in best:
            fresh.append((name, sec))
        elif sec > factor * best[name]:
            regressions.append((name, sec, best[name]))
    for name, sec in fresh:
        print(f"NEW  {name}: {sec:.3f}s (no prior)")
    for name, sec, prior in sorted(regressions, key=lambda r: -r[1] / r[2]):
        print(f"REGR {name}: {sec:.3f}s vs best {prior:.3f}s "
              f"({sec / prior:.1f}x > {factor:.1f}x)")
    n_ok = len(current) - len(regressions) - len(fresh)
    print(f"== {n_ok} ok, {len(fresh)} new, {len(regressions)} regressions "
          f"(factor {factor:.1f}, {len(best)} priors) ==")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
