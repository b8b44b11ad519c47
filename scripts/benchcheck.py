#!/usr/bin/env python3
"""Mechanical per-query band check between two BENCH_full.json files.

Usage: benchcheck.py <baseline.json> <candidate.json> [factor]

Round-19 lesson: the close note claimed "no query exceeds 2x its prior
band" without checking it per-query, and the claim was false for the
streaming family. This script IS the check — run it before writing any
close-note band claim, and paste its summary line into BENCHLOG.

Queries whose meds are below the 0.3 s JVM-noise floor on BOTH sides
are skipped (sub-300 ms deltas are pure scheduler/GC jitter — the
bench's own min/med/max discipline). New queries (absent from the
baseline) are listed, not flagged.
"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))
    cand = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = 0.3
    violations = []
    for q, new in cand["queries"].items():
        old = base["queries"].get(q)
        if old is None:
            continue
        if max(old, new) < floor:
            continue
        if new > factor * old:
            # a zero/failed baseline med still reports, with an inf ratio
            ratio = new / old if old > 0 else float("inf")
            violations.append((q, old, new, ratio))
    for q, o, n, r in sorted(violations, key=lambda t: -t[3]):
        print(f"REGRESSION {q}: {o:.2f} -> {n:.2f} ({r:.1f}x)")
    new_qs = sorted(set(cand["queries"]) - set(base["queries"]))
    if new_qs:
        print(f"new queries (no baseline): {', '.join(new_qs)}")
    print(f"[benchcheck] {len(cand['queries'])} queries vs "
          f"{len(base['queries'])} baseline; "
          f"{len(violations)} exceed {factor}x their prior med "
          f"(floor {floor}s)")


if __name__ == "__main__":
    main()
