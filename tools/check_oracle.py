#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script
replays each oracle SQL in DuckDB over the same sf tables and diffs.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
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
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
