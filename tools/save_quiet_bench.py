#!/usr/bin/env python3
"""Save a quiet-machine bench line as committed round evidence.

Usage: save_quiet_bench.py <bench_line.json> <round>

Writes BENCH_QUIET_r{N}.json (the whole driver-contract line) and, when
tmp/bench_detail.json carries a tpch section from the same run, appends a
`r{N}@vm` per-query line to BENCH_TPCH_HISTORY.json — so the contention
story of every round is auditable from git alone (round-13 verdict item 5:
the quiet-run counter-evidence used to live only in driver-overwritable
tmp/ logs).
"""
import json
import sys

line_path, rnd = sys.argv[1], int(sys.argv[2])
line = json.load(open(line_path))
out = f"BENCH_QUIET_r{rnd:02d}.json"
with open(out, "w") as f:
    json.dump(line, f)
    f.write("\n")
print(f"wrote {out}: total={line['value']}s unstable={line.get('unstable')} "
      f"worst_bracket={line.get('cal_section_worst_ratio')}")

try:
    det = json.load(open("tmp/bench_detail.json"))
    tpch = det.get("tpch", {}).get("queries") or det.get("tpch_queries")
    if tpch:
        # Bench itself appends its run's line; re-appending the same run
        # here would duplicate it. Only append when the trailing line
        # differs (e.g. the detail file is from a run Bench couldn't
        # record, or the file was truncated).
        try:
            with open("BENCH_TPCH_HISTORY.json") as f:
                last = [ln for ln in f.read().splitlines() if ln.strip()][-1]
            dup = json.loads(last).get("queries") == tpch
        except (FileNotFoundError, IndexError, json.JSONDecodeError):
            dup = False
        if dup:
            print("trailing BENCH_TPCH_HISTORY.json line already carries "
                  "this run (Bench appended it); not re-appending")
        else:
            with open("BENCH_TPCH_HISTORY.json", "a") as f:
                f.write(json.dumps({"label": f"r{rnd}@vm", "queries": tpch})
                        + "\n")
            print(f"appended r{rnd}@vm to BENCH_TPCH_HISTORY.json "
                  f"({len(tpch)} queries)")
    else:
        print("no tpch per-query section found in tmp/bench_detail.json; "
              "history not appended")
except FileNotFoundError:
    print("tmp/bench_detail.json missing; history not appended")
