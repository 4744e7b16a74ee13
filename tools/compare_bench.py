#!/usr/bin/env python3
"""Compare two bench outputs (BENCH_rN.json driver files or raw
`{"metric":"per-query",...}` chunk lines) and print per-query deltas.

Usage: python3 tools/compare_bench.py <old> <new> [threshold_ratio]

Accepts either the driver's BENCH_r{N}.json (reads the chunked per-query
maps out of its captured tail) or a file of raw bench stdout lines.
Dev tool only — not part of the shipped library.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    queries = {}
    total = None
    # chunk lines are JSON objects with a "queries" map (possibly escaped
    # inside the driver's "tail" capture)
    for m in re.finditer(r'\{"metric":"per-query".*?\}\}', text.replace('\\"', '"')):
        try:
            queries.update(json.loads(m.group(0))["queries"])
        except (json.JSONDecodeError, KeyError):
            pass
    for m in re.finditer(r'\{"metric":"total".*?\}', text.replace('\\"', '"')):
        try:
            total = json.loads(m.group(0))["value"]
        except (json.JSONDecodeError, KeyError):
            pass
    return queries, total


def main():
    old_q, old_t = load(sys.argv[1])
    new_q, new_t = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    # Bench records failed queries as -1.0 — split them out BEFORE any
    # ratio math (a newly-broken query must never rank as a "win").
    broke = sorted(q for q in old_q if old_q[q] >= 0 and new_q.get(q, 0) < 0)
    fixed = sorted(q for q in new_q if new_q[q] >= 0 and old_q.get(q, 0) < 0)
    old_q = {q: v for q, v in old_q.items() if v >= 0}
    new_q = {q: v for q, v in new_q.items() if v >= 0}
    if broke:
        print(f"NEWLY FAILING (was ok, now -1.0): {', '.join(broke)}")
    if fixed:
        print(f"newly passing (was -1.0): {', '.join(fixed)}")
    common = sorted(set(old_q) & set(new_q))
    print(f"old: {len(old_q)} queries total={old_t}; "
          f"new: {len(new_q)} queries total={new_t}; common: {len(common)}")
    print(f"common-sum old={sum(old_q[q] for q in common):.1f} "
          f"new={sum(new_q[q] for q in common):.1f}")
    regress = [(new_q[q] / max(old_q[q], 1e-9), q) for q in common
               if new_q[q] > 0.5 and new_q[q] / max(old_q[q], 1e-9) >= thr]
    improve = [(old_q[q] / max(new_q[q], 1e-9), q) for q in common
               if old_q[q] > 0.5 and old_q[q] / max(new_q[q], 1e-9) >= thr]
    print(f"\nregressions (new >= {thr}x old, new > 0.5s):")
    for r, q in sorted(regress, reverse=True):
        print(f"  {q}: {old_q[q]:.2f} -> {new_q[q]:.2f}  ({r:.1f}x)")
    print(f"\nimprovements (old >= {thr}x new, old > 0.5s):")
    for r, q in sorted(improve, reverse=True):
        print(f"  {q}: {old_q[q]:.2f} -> {new_q[q]:.2f}  ({r:.1f}x)")
    only_new = sorted(set(new_q) - set(old_q))
    if only_new:
        print(f"\nnew-only: {', '.join(f'{q}={new_q[q]:.2f}' for q in only_new)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into `head`
        pass
