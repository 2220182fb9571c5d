#!/usr/bin/env python3
"""Mechanical coverage-map drift check (round-8 verdict found two rows —
q27, t4 — silently lost in a SURVEY edit): every query the engine ships
(`SparkEntry.oracleSql` keys, dumped by graft.Verify as oracle_sql.json)
must be cited in SURVEY.md's coverage/scale sections, and every cited
query id must still exist in the engine.

Citations in the coverage map use short ids (q27, t4b, ...), so the diff
runs on short ids = the name segment before the first underscore.

Usage: python3 tools/check_survey.py [oracle_sql.json] [SURVEY.md]
With no dump argument the query-name set is parsed straight from the
src/main/scala/graft/queries registries — a Verify dump can be stale
(round 9's false STALE flags came from a 7-query-old default dump); the
source never is.
Exit 1 on any drift.
"""
import glob
import json
import re
import sys

survey_path = sys.argv[2] if len(sys.argv) > 2 else "SURVEY.md"

if len(sys.argv) > 1:
    names = set(json.load(open(sys.argv[1])).keys())
else:
    names = set()
    for f in glob.glob("src/main/scala/graft/queries/*.scala"):
        names |= set(re.findall(
            r'"([sqtdnmp]\d+[a-z]{0,2}_[a-z0-9_]+)" ->', open(f).read()))

# Sanity-gate the regex extraction itself: a query registered through a
# computed key, an unscanned file, or left commented-out would silently
# shrink `names` and weaken the drift gate. Bench.scala's headline list
# is an independently-maintained enumeration of (a subset of) the same
# registry — every headline name MUST appear in the extracted set, so a
# headline/extraction mismatch means the extraction (or Bench) is wrong.
bench_src = open("src/main/scala/graft/Bench.scala").read()
m_head = re.search(r"val headline: Seq\[String\] = Seq\((.*?)\)\n", bench_src, re.S)
if not m_head:
    print("FAIL: cannot parse Bench.scala headline list")
    sys.exit(1)
bench_names = set(re.findall(r'"([a-z0-9_]+)"', m_head.group(1)))
unextracted = sorted(bench_names - names)
if unextracted:
    for n in unextracted:
        print(f"FAIL: Bench headline query not found by source extraction: {n}")
    sys.exit(1)
short = {n.split("_", 1)[0] for n in names}

text = open(survey_path).read()
# restrict to the coverage map + scale analysis sections
m = re.search(r"### 2\.9 .*", text, re.S)
if not m:
    print("FAIL: SURVEY.md has no '### 2.9' section")
    sys.exit(1)
scope = m.group(0)

# citations appear both as full names (s3_base64_roundtrip) and bare
# short ids (q1,q8 in the Oracle column); collect both forms
cited_full = re.findall(r"\b([sqtdnmp]\d+[a-z]{0,2})_[a-z0-9_]+", scope)
cited_bare = re.findall(r"\b([sqtdnmp]\d+[a-z]{0,2})\b", scope)
cited = set(cited_full) | set(cited_bare)
# percentile vocabulary (p50 latency etc.) is prose, not a query id
PROSE = {"p50", "p75", "p90", "p95", "p99"}

missing = sorted(short - cited)
stale = sorted(c for c in cited - PROSE if c not in short)

for s in missing:
    full = sorted(n for n in names if n.split("_", 1)[0] == s)
    print(f"MISSING from SURVEY §2.9+: {', '.join(full)}")
for s in stale:
    print(f"STALE citation in SURVEY §2.9+ (no such query): {s}")
print(f"== {len(short) - len(missing)}/{len(short)} query ids cited, "
      f"{len(missing)} missing, {len(stale)} stale ==")
sys.exit(1 if (missing or stale) else 0)
