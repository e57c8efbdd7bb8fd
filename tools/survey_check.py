#!/usr/bin/env python3
"""Survey hygiene gate (r15, after three rounds of drift nits).

Checks, exiting nonzero on any failure:
  1. Every query key in the latest CORRECTNESS_r*.json is bracket-cited
     somewhere in SURVEY.md (the §2 coverage-contract discipline).
  2. The §6 headline "Current artifact (rN): X s total for M entries"
     matches BENCH_LAST.json's value and entry count.
  3. Row 39c's probe-speedup figure matches BENCH_SCALE_IMG.json.

Run before committing survey or artifact changes:
    python3 tools/survey_check.py
"""
import glob
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
survey = open(os.path.join(repo, "SURVEY.md")).read()
problems = []

# -- 1: every oracle-gated query key is bracket-cited ------------------
# keys = latest CORRECTNESS round, UNIONED with any oracle_sql.json
# passed as argv[1] (a fresh Verify dump) so queries added THIS round
# are checked before the next round's correctness artifact exists
rounds = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
if not rounds:
    problems.append("no CORRECTNESS_r*.json found")
else:
    keys = set(json.load(open(rounds[-1])).keys())
    if len(sys.argv) > 1:
        keys |= set(json.load(open(sys.argv[1])).keys())
    keys = sorted(keys)
    # bracket-cites look like "[q1_pricing_summary, q3_... ]" or prose
    # "[q_kmv_users — ...]"; collect every identifier inside brackets
    cited = set()
    for m in re.finditer(r"\[([^\[\]]+)\]", survey):
        for tok in re.findall(r"[A-Za-z0-9_]+", m.group(1)):
            cited.add(tok)
    missing = [k for k in keys if k not in cited]
    if missing:
        problems.append(
            f"{len(missing)} oracle-gated keys not bracket-cited in "
            f"SURVEY.md: {', '.join(missing)}")

# -- 2: §6 headline vs BENCH_LAST.json ---------------------------------
try:
    last = json.load(open(os.path.join(repo, "BENCH_LAST.json")))
    total = float(last["value"])
    entries = len(last["queries"])
    m = re.search(
        r"Current artifact \(r\d+\): ([0-9.]+) s total for (\d+) entries",
        survey)
    if not m:
        problems.append("SURVEY.md §6 'Current artifact' headline missing "
                        "or no longer matches the expected pattern")
    else:
        h_total, h_entries = float(m.group(1)), int(m.group(2))
        if abs(h_total - total) > 0.5:
            problems.append(
                f"§6 headline total {h_total} s != BENCH_LAST.json "
                f"{total} s — update the headline")
        if h_entries != entries:
            problems.append(
                f"§6 headline entry count {h_entries} != BENCH_LAST.json "
                f"{entries}")
except FileNotFoundError:
    problems.append("BENCH_LAST.json missing")

# -- 3: row 39c probe speedup vs BENCH_SCALE_IMG.json ------------------
try:
    img = json.load(open(os.path.join(repo, "BENCH_SCALE_IMG.json")))
    sp = float(img["probe_speedup"])
    m = re.search(r"probe ([0-9.]+) s vs full ImageIO decode ([0-9.]+) s"
                  r" = ([0-9.]+)x", survey)
    if not m:
        problems.append("row 39c probe-vs-decode figure missing")
    else:
        if abs(float(m.group(3)) - sp) > 0.5:
            problems.append(
                f"row 39c claims {m.group(3)}x but BENCH_SCALE_IMG.json "
                f"records {sp}x")
        if abs(float(m.group(1)) - float(img["dims_probe_sec"])) > 0.05:
            problems.append(
                f"row 39c probe {m.group(1)} s != artifact "
                f"{img['dims_probe_sec']} s")
except FileNotFoundError:
    problems.append("BENCH_SCALE_IMG.json missing")

# -- 4: §2 row ids unique (a duplicated id hides a row from audits) ----
ids = re.findall(r"^\| (\d+[a-z0-9]*) \|", survey, re.M)
dupes = sorted({i for i in ids if ids.count(i) > 1})
if dupes:
    problems.append(f"duplicated §2 row ids: {', '.join(dupes)}")

# -- 5: every artifact file the survey cites exists ---------------------
for art in sorted(set(re.findall(r"\b(BENCH_[A-Z0-9_]+\.json)\b", survey))):
    if not os.path.exists(os.path.join(repo, art)):
        problems.append(f"survey cites missing artifact {art}")

if problems:
    print("SURVEY CHECK FAILED:")
    for p in problems:
        print(" -", p)
    sys.exit(1)
print("SURVEY CHECK OK: all correctness keys cited; row ids unique; "
      "cited artifacts exist; artifact figures consistent")
