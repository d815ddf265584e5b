#!/usr/bin/env python3
"""One-line load adjudication for a BENCH_r{N}.json record.

Reads the bench JSON (arg 1, default newest BENCH_r*.json in repo root)
and prints a single line the driver and judge can both consume:

    load-clean  total=8.18s other_cpu=3.2% steal=0.0% median_spread=4.1%

Records written before the telemetry existed print "load-unknown".
A "load-skewed" record is NOT a citable measurement — rerun on a quiet
host instead of re-adjudicating by hand (see VERDICT r13 "What's wrong
#3": three rounds of judge cycles went to exactly that).

r16: understands both shapes of record (the bench's raw one-line JSON
and the driver's wrapper whose "parsed" field holds it) and prints the
r16 telemetry — trimmed spread and the single-core calibration ratios
— when present.
"""
import glob
import json
import os
import sys


def load_record(path):
    with open(path) as f:
        text = f.read().strip()
    try:
        rec = json.loads(text)  # whole file (driver wrapper or pretty JSON)
    except json.JSONDecodeError:
        rec = json.loads(text.splitlines()[-1])  # bench's one-line record
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        rec = rec["parsed"]
    return rec


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        if not cands:
            print("load-unknown  (no BENCH_r*.json found)")
            return 1
        path = cands[-1]
    rec = load_record(path)
    verdict = rec.get("load_verdict", "load-unknown")
    load = rec.get("load", {})
    parts = [f"total={rec.get('value', float('nan')):.2f}s"]
    if load:
        parts.append(f"other_cpu={load.get('other_cpu_pct', -1)}%")
        parts.append(f"steal={load.get('steal_pct', -1)}%")
        parts.append(f"median_spread={load.get('median_spread_pct', -1)}%")
        if "median_trim_spread_pct" in load:
            parts.append(f"trim_spread={load['median_trim_spread_pct']}%")
        calib = load.get("calibration")
        if calib:
            parts.append(
                f"calib={calib.get('pre_ratio', -1)}/{calib.get('post_ratio', -1)}x")
    print(f"{verdict}  " + " ".join(parts) + f"  ({os.path.basename(path)})")
    return 0 if verdict == "load-clean" else 1


if __name__ == "__main__":
    sys.exit(main())
