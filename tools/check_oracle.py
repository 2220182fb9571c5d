#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script
replays each oracle SQL in DuckDB over the same sf tables and diffs.

Each oracle execution is also WALL-TIMED (best of --reps runs, default 1)
so the round has a cross-engine performance denominator: pass
--timing FILE to dump {"query": duckdb_sec} next to the match flags, and
feed that file to check_bench_regression.py --duckdb for the summary
spark/duckdb ratio over the headline intersection. --time-only skips the
spark-output diff entirely (only oracle_sql.json is needed), which is how
the denominator is measured at sf0.1 where no Verify dump exists.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
           [--timing FILE] [--time-only] [--reps N] [--max-sec S]

--max-sec interrupts any single oracle execution after S seconds and
SKIPS that query from the timing file (logged loudly — no silent cap).
Only meaningful with --time-only at SFs above the correctness gate's:
a from-scratch closure oracle can be quadratic in DuckDB at sf0.1
(e.g. the DedupIndex consumers' recursive reach CTEs), and omitting it
from the denominator is conservative — it removes a case where the
Spark side wins by the largest margin.
"""
import argparse, json, math, sys, threading, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

import re

def norm_type(t):
    """Normalize arrow types the way the driver's hash effectively does.

    Integer and float WIDTHS collapse (int32 vs int64 hash-passed in r5:
    q40/t16), but KIND differences must fail: DuckDB's sum(BIGINT) widening
    to HUGEINT surfaces as decimal128(38,0), which the driver's typed hash
    rejected against Spark's int64 (s9, rounds 4-5) even though the Python
    values compare equal.
    """
    s = str(t)
    for a, b in (("large_string", "string"), ("large_binary", "binary"),
                 ("large_list", "list")):
        s = s.replace(a, b)
    s = re.sub(r"\buint(8|16|32|64)\b", "int", s)
    s = re.sub(r"\bint(8|16|32|64)\b", "int", s)
    s = re.sub(r"\b(halffloat|float|double)\b", "float", s)
    return s

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir, timing_file=None, time_only=False, reps=1,
         max_sec=None):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    timings = {}
    skipped = {}
    for name, sql in sorted(oracle.items()):
        timed_out = False
        try:
            best = None
            exp = None
            for _ in range(max(1, reps)):
                # Watchdog-race guard: the timer callback re-checks a
                # per-rep done flag before interrupting, so a timer that
                # fires in the window between query completion and
                # cancel() can no longer strand a pending interrupt that
                # would cancel the NEXT oracle on the shared connection.
                state = {"done": False, "fired": False}
                def fire(st=state):
                    if not st["done"]:
                        st["fired"] = True
                        con.interrupt()
                watchdog = None
                if max_sec:
                    watchdog = threading.Timer(max_sec, fire)
                    watchdog.start()
                t0 = time.monotonic()
                try:
                    exp = con.execute(sql).fetch_arrow_table()
                    state["done"] = True
                except duckdb.InterruptException:
                    timed_out = True
                    break
                finally:
                    if watchdog:
                        watchdog.cancel()
                if state["fired"]:
                    # The timer fired in the gap between fetch returning
                    # and done=True: con.interrupt() hit an idle connection
                    # without raising, so the interrupt may still be
                    # pending and would cancel the NEXT statement on this
                    # connection. Reconnect to clear it; the rep itself
                    # completed, so its timing stands.
                    con = connect(sf_dir)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            if timed_out:
                # belt-and-braces: a timed-out connection may still hold
                # interrupt state — reconnect so the next oracle starts
                # clean.
                con = connect(sf_dir)
                if best is not None and time_only:
                    # a prior rep DID complete — keep its measured time
                    # instead of discarding a valid observation. (Timing
                    # shortcut ONLY: in verify mode the completed rep's
                    # result still flows through the comparison below —
                    # a mismatch must never be masked by a later-rep
                    # timeout.)
                    timings[name] = round(best, 4)
                    print(f"TIME {name}: {timings[name]:.3f}s (rep "
                          f"{reps} exceeded --max-sec {max_sec}s; kept "
                          f"best completed rep)")
                    n_pass += 1
                    continue
                if best is None or exp is None:
                    print(f"SKIP {name}: oracle exceeded --max-sec {max_sec}s "
                          f"(recorded as skipped in timing file)")
                    skipped[name] = f"exceeded_max_sec_{max_sec}"
                    n_skip += 1
                    continue
                # verify mode with a completed earlier rep: record the
                # time and fall through to the result comparison.
                timings[name] = round(best, 4)
            else:
                timings[name] = round(best, 4)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if time_only:
            print(f"TIME {name}: {timings[name]:.3f}s ({exp.num_rows} rows)")
            n_pass += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        # driver hashes typed values: a type drift (e.g. DuckDB HUGEINT vs
        # Spark int64) fails there even when Python values are equal.
        etypes = {c: norm_type(exp.schema.field(c).type) for c in ecols}
        gtypes = {c: norm_type(got.schema.field(c).type) for c in gcols}
        badt = [c for c in ecols if etypes[c] != gtypes[c]]
        if badt:
            det = ", ".join(f"{c}: spark {gtypes[c]} != oracle {etypes[c]}"
                            for c in badt)
            print(f"FAIL {name}: column type drift: {det}")
            n_fail += 1
            continue
        erows = [tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()]
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
            n_fail += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; "
                  f"first at {i}:\n  spark : {g}\n  oracle: {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows, oracle {timings[name]:.3f}s)")
            n_pass += 1
    if timing_file:
        out = {"sf_dir": sf_dir, "engine": "duckdb",
               "reps": reps, "queries": timings}
        if skipped:
            # every headline query appears with either a time or an
            # explicit skip marker — the denominator set is exact, never
            # implied by absence.
            out["skipped"] = skipped
        with open(timing_file, "w") as f:
            json.dump(out, f, indent=0, sort_keys=True)
        print(f"== duckdb timings ({len(timings)} queries, "
              f"{len(skipped)} skipped) -> {timing_file}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skipped ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timing", metavar="FILE", default=None)
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--max-sec", type=float, default=None)
    a = ap.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, timing_file=a.timing,
                  time_only=a.time_only, reps=a.reps, max_sec=a.max_sec))
