#!/usr/bin/env python3
"""Compare two bench outputs (BENCH_rN.json driver files or raw
`{"metric":"per-query",...}` chunk lines) and print per-query deltas.

Usage: python3 tools/compare_bench.py <old> <new> [threshold_ratio]

Accepts either the driver's BENCH_r{N}.json (reads the chunked per-query
maps out of its captured tail) or a file of raw bench stdout lines.

Box normalization: when both files carry the contract line's calibration
probes (`probe_start_s` / `probe_end_s`, emitted by Bench since r14),
per-query ratios are ALSO reported divided by the probe ratio
(new-box-speed / old-box-speed), so a uniformly slower box doesn't read
as a wall of regressions. A file whose end/start probe drift exceeds
1.3x is flagged CONTENTION-SUSPECT — the box's speed changed mid-suite
(another tenant's burst), so its per-query numbers are not trustworthy
without a re-run (this is exactly what happened to BENCH_r13).

Dev tool only — not part of the shipped library.
"""
import json
import re
import sys

DRIFT_LIMIT = 1.3

# Acceptance bar for the new artifact's normalized total (the r14/r15
# verdicts' "<= ~175 probe-0.44-box seconds" directive made executable).
NORM_TOTAL_LIMIT_S = 175.0


def load(path):
    text = open(path).read()
    queries = {}
    total = None
    probes = (None, None)
    # chunk lines are JSON objects with a "queries" map (possibly escaped
    # inside the driver's "tail" capture)
    for m in re.finditer(r'\{"metric":"per-query".*?\}\}', text.replace('\\"', '"')):
        try:
            queries.update(json.loads(m.group(0))["queries"])
        except (json.JSONDecodeError, KeyError):
            pass
    for m in re.finditer(r'\{"metric":"total".*?\}', text.replace('\\"', '"')):
        try:
            obj = json.loads(m.group(0))
            total = obj["value"]
            if "probe_start_s" in obj and "probe_end_s" in obj:
                probes = (obj["probe_start_s"], obj["probe_end_s"])
        except (json.JSONDecodeError, KeyError):
            pass
    return queries, total, probes


def probe_speed(path, probes):
    """Mean probe time (the file's box-speed estimate), with the drift
    check that makes a contended run self-incriminating."""
    start, end = probes
    if start is None or start <= 0 or end is None or end <= 0:
        print(f"{path}: no calibration probes (pre-r14 bench) — "
              "box-normalized deltas unavailable")
        return None
    drift = max(end / start, start / end)
    tag = ""
    if drift > DRIFT_LIMIT:
        tag = (f"  ** CONTENTION-SUSPECT: probe drift {drift:.2f}x exceeds "
               f"{DRIFT_LIMIT}x — box speed changed mid-suite, re-run **")
    print(f"{path}: probe start={start:.3f}s end={end:.3f}s "
          f"(drift {drift:.2f}x){tag}")
    return (start + end) / 2.0


def norm_total(path, total, probes, speed):
    """SURVEY's cross-round unit: total re-expressed on the probe-0.44
    reference box (the r12/r13 measurement-era speed). A drifted file's
    mean probe is not a box-speed estimate (the speed CHANGED mid-suite),
    so its normalized figure is labeled untrustworthy."""
    if total is None or not speed:
        return
    start, end = probes
    caveat = ""
    if max(end / start, start / end) > DRIFT_LIMIT:
        caveat = "  (UNTRUSTWORTHY: drifted probes — re-run this artifact)"
    print(f"{path}: total {total:.1f}s = "
          f"{total * 0.44 / speed:.1f} probe-0.44-box seconds{caveat}")


def main():
    old_q, old_t, old_p = load(sys.argv[1])
    new_q, new_t, new_p = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_speed = probe_speed(sys.argv[1], old_p)
    new_speed = probe_speed(sys.argv[2], new_p)
    norm_total(sys.argv[1], old_t, old_p, old_speed)
    norm_total(sys.argv[2], new_t, new_p, new_speed)
    # box factor >1 means the NEW run's box is slower; dividing new times
    # by it re-expresses them in old-box seconds.
    box = (new_speed / old_speed) if old_speed and new_speed else None
    if box:
        print(f"box factor (new probe / old probe): {box:.2f}x — "
              "normalized columns divide new times by this")
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
    com_old = sum(old_q[q] for q in common)
    com_new = sum(new_q[q] for q in common)
    norm = f" (box-normalized new: {com_new / box:.1f})" if box else ""
    print(f"common-sum old={com_old:.1f} new={com_new:.1f}{norm}")

    def adj(t):
        return t / box if box else t
    regress = [(adj(new_q[q]) / max(old_q[q], 1e-9), q) for q in common
               if new_q[q] > 0.5 and adj(new_q[q]) / max(old_q[q], 1e-9) >= thr]
    improve = [(old_q[q] / max(adj(new_q[q]), 1e-9), q) for q in common
               if old_q[q] > 0.5 and old_q[q] / max(adj(new_q[q]), 1e-9) >= thr]
    label = "box-normalized " if box else ""
    print(f"\nregressions ({label}new >= {thr}x old, new > 0.5s):")
    for r, q in sorted(regress, reverse=True):
        print(f"  {q}: {old_q[q]:.2f} -> {new_q[q]:.2f}"
              + (f" [norm {adj(new_q[q]):.2f}]" if box else "")
              + f"  ({r:.1f}x)")
    print(f"\nimprovements (old >= {thr}x {label}new, old > 0.5s):")
    for r, q in sorted(improve, reverse=True):
        print(f"  {q}: {old_q[q]:.2f} -> {new_q[q]:.2f}"
              + (f" [norm {adj(new_q[q]):.2f}]" if box else "")
              + f"  ({r:.1f}x)")
    only_new = sorted(set(new_q) - set(old_q))
    if only_new:
        print(f"\nnew-only: {', '.join(f'{q}={new_q[q]:.2f}' for q in only_new)}")

    # One-word acceptance verdict for the NEW artifact, encoding the rule
    # the r13-r15 adjudications applied by hand: probe drift <= 1.3x AND
    # normalized total <= 175 probe-0.44-box seconds AND no normalized
    # per-query regression >= 1.5x AND nothing newly failing.
    print()
    ns, ne = new_p
    if not new_speed or new_t is None:
        print("VERDICT: UNKNOWN (new artifact lacks calibration probes or a total)")
        return
    reasons = []
    drift = max(ne / ns, ns / ne)
    if drift > DRIFT_LIMIT:
        reasons.append(f"probe drift {drift:.2f}x > {DRIFT_LIMIT}x (contended run)")
    norm = new_t * 0.44 / new_speed
    if norm > NORM_TOTAL_LIMIT_S:
        reasons.append(
            f"normalized total {norm:.1f} > {NORM_TOTAL_LIMIT_S} probe-0.44-box seconds")
    # computed from scratch (not from `regress`) so a nonstandard CLI
    # threshold can't hide or inflate the acceptance rule's own 1.5x bar
    hard_regress = [(adj(new_q[q]) / max(old_q[q], 1e-9), q) for q in common
                    if new_q[q] > 0.5
                    and adj(new_q[q]) / max(old_q[q], 1e-9) >= 1.5]
    if hard_regress:
        worst = max(hard_regress)
        reasons.append(f"{len(hard_regress)} normalized regression(s) >= 1.5x "
                       f"(worst {worst[1]} {worst[0]:.1f}x)")
    if broke:
        reasons.append(f"{len(broke)} newly-failing query(ies)")
    if reasons:
        print(f"VERDICT: FAIL ({'; '.join(reasons)})")
    else:
        print(f"VERDICT: PASS (drift {drift:.2f}x <= {DRIFT_LIMIT}x, "
              f"normalized total {norm:.1f} <= {NORM_TOTAL_LIMIT_S}, "
              f"no normalized regression >= 1.5x, nothing newly failing)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into `head`
        pass
