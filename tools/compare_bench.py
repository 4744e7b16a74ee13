#!/usr/bin/env python3
"""Compare two bench outputs (BENCH_rN.json driver files or raw
`{"metric":"per-query",...}` chunk lines) and print per-query deltas.

Usage: python3 tools/compare_bench.py <old> <new> [threshold_ratio]

Accepts either the driver's BENCH_r{N}.json (reads the chunked per-query
maps out of its captured tail) or a file of raw bench stdout lines.

The r16 conventions, each replacing a measured failure mode of its
predecessor:

- TOTALS compare RAW (bar: TOTAL_LIMIT_S). Raw suite totals are
  box-insensitive — 167–186 s across artifacts whose probe means
  spanned 0.22–0.59 s (2.7x) — because the suite's cost is per-query
  latency floors the pure-CPU probe does not exercise; probe-dividing
  totals (the r14 convention) manufactured ~±60% swings out of box
  luck, and median-dividing them absorbs measurement-accuracy
  improvements (see TOTAL_LIMIT_S's comment).
- PER-QUERY deltas are displayed normalized by the SUITE-MEDIAN box
  factor — the median time ratio over common >= 0.5 s queries — and a
  verdict-level regression needs >= 1.5x in BOTH raw and normalized
  terms. The median conflates a uniform code slowdown with a slower
  box, so it is only a valid normalizer while most of the common set
  is code-unchanged (true under the frozen 231-query surface); genuine
  changes surface as outliers against it.
- DRIFT (the contention flag) runs on the spin_start_s/spin_end_s
  scalar-spin fields when the artifact carries them (r16 Bench), else
  the probes: the Spark-stack probe C2-matures ~1.7x over a 231-query
  suite, so probe drift flags every clean run on a quiet box (see
  drift_pair). A drifted run changed speed mid-suite and needs a
  re-run — this is what caught BENCH_r13/r14.

The probe-based factor is still printed for reference against older
adjudications.

Dev tool only — not part of the shipped library.
"""
import json
import os
import re
import statistics
import sys

DRIFT_LIMIT = 1.3

# Contended-start gate (r18): the r17 OFFICIAL artifact began at
# load1_start=8.49 on the 32-cpu box (its own env line) and read the
# slowest total in the series while same-code internal runs passed —
# Bench now sleeps until load1 <= this limit before the first query
# (see Bench.loadGate), so an artifact whose POST-GATE load1_start still
# exceeds it started into a sustained co-tenant load the gate could not
# outwait. Such an artifact is CONTENTION-SUSPECT (the probe-drift
# treatment): invalid and in need of a re-run, not merely slow. Quiet
# starts measure 1.3-2.3 with the bench JVM idle; contended ones 8+.
# This is the fallback for artifacts that don't record their gate's
# effective limit; artifacts carrying `load1_limit` (r18 Bench) are
# judged against the limit their own gate actually ran with.
LOAD1_LIMIT = 4.0


def load1_limit_of(env):
    v = (env or {}).get("load1_limit")
    return v if isinstance(v, (int, float)) and v > 0 else LOAD1_LIMIT

# Acceptance bar for the new artifact's RAW total. The r15 verdict's
# directive set the bar at "<= ~175 probe-0.44-box seconds"; raw suite
# totals are measured box-insensitive (167-186 s across probe means
# 0.22-0.59 — the suite's cost is per-query latency floors, not
# probe-shaped CPU throughput), and the 0.44-probe boxes of the r14/r15
# era satisfied normalized == raw within 4%, so the raw total IS the
# directive's unit. Burst resampling (Bench r16) removes the one
# mechanism that made raw totals incomparable across runs (transient
# co-tenant bursts landing on both samples of a query).
#
# The total gate is deliberately NOT normalized by the suite median:
# r16's methodology change (burst resampling) uniformly lowered the
# common heavies' minima, which the median reads as a faster box — a
# normalized-total gate can then never credit a measurement-accuracy
# improvement (run4: raw 158.9 vs a 0.82x median = 194 "normalized"
# against the SAME code's 185.6 anchor). Conversely, per-query
# regressions ARE judged with the median available (see the verdict
# rule): a genuinely slower box inflates raw ratios uniformly (median
# catches it), and a methodology change deflates the median (the raw
# ratio catches it), so a flag requires BOTH to agree.
TOTAL_LIMIT_S = 175.0

# Minimum common >=0.5s queries before the suite median is trusted as a
# box factor; below this, fall back to the probe ratio (old convention).
MIN_MEDIAN_SAMPLE = 8


def load(path):
    """Parse a bench artifact. When `path` is a driver BENCH_r{N}.json
    (whose captured tail truncates ~90% of the per-query map), prefer the
    sibling bench_full_r{N}.json that Bench tees every metric line into
    (r19) — accepted only when its total matches the artifact's, so a
    stale or internal-run full file can never masquerade as the official
    record."""
    parsed = _parse(open(path).read())
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if not m:
        return parsed
    full = os.path.join(os.path.dirname(path) or ".",
                        f"bench_full_r{int(m.group(1)):02d}.json")
    if not os.path.exists(full):
        return parsed
    fparsed = _parse(open(full).read())
    total, ftotal = parsed[1], fparsed[1]
    if ftotal is None or total is None or abs(ftotal - total) > 0.0005:
        # total is None = the artifact truncated past its own contract
        # line (the r03-r06 failure mode): the full record CANNOT be
        # verified against it, and silently adopting it would let a
        # stale or internal-run file masquerade as the official record —
        # the exact guarantee this check exists for. Report, don't adopt.
        print(f"note: {full} total {ftotal} vs {path} total {total} — "
              "unverifiable or different run, ignoring the full record")
        return parsed
    print(f"{path}: using full record {full} "
          f"({len(fparsed[0])} queries vs {len(parsed[0])} in the tail)")
    return fparsed


def _parse(text):
    queries = {}
    total = None
    probes = (None, None)
    spins = (None, None)
    # chunk lines are JSON objects with a "queries" map (possibly escaped
    # inside the driver's "tail" capture)
    for m in re.finditer(r'\{"metric":"per-query".*?\}\}', text.replace('\\"', '"')):
        try:
            queries.update(json.loads(m.group(0))["queries"])
        except (json.JSONDecodeError, KeyError):
            pass
    env = None
    for m in re.finditer(r'\{"metric":"env".*?\}', text.replace('\\"', '"')):
        try:
            env = json.loads(m.group(0))
            env.pop("metric", None)
        except json.JSONDecodeError:
            pass
    for m in re.finditer(r'\{"metric":"total".*?\}', text.replace('\\"', '"')):
        try:
            obj = json.loads(m.group(0))
            total = obj["value"]
            if "probe_start_s" in obj and "probe_end_s" in obj:
                probes = (obj["probe_start_s"], obj["probe_end_s"])
            if "spin_start_s" in obj and "spin_end_s" in obj:
                spins = (obj["spin_start_s"], obj["spin_end_s"])
        except (json.JSONDecodeError, KeyError):
            pass
    return queries, total, probes, spins, env


def drift_pair(probes, spins):
    """The (start, end) pair the drift check runs on: the r16 scalar-spin
    fields when the artifact carries them, else the Spark-stack probes.
    The probes measure the JVM as much as the box — C2 maturation over a
    231-query suite speeds the SAME probe 1.6-1.9x between suite ends
    (fresh-JVM control on a quiet box: 0.288/0.281 back-to-back), so on
    spin-carrying artifacts they are reported but not drift-checked."""
    s, e = spins
    if s and e:
        return s, e, "spin"
    return probes[0], probes[1], "probe"


def probe_speed(path, probes, spins):
    """Mean probe time plus the drift check that makes a contended run
    self-incriminating. The mean is NOT a suite-speed estimate (see
    module doc) — it feeds only the reference factor and the fallback."""
    start, end = probes
    if start is None or start <= 0 or end is None or end <= 0:
        print(f"{path}: no calibration probes (pre-r14 bench) — "
              "probe drift check unavailable")
        return None
    ds, de, kind = drift_pair(probes, spins)
    drift = max(de / ds, ds / de)
    tag = ""
    if drift > DRIFT_LIMIT:
        tag = (f"  ** CONTENTION-SUSPECT: {kind} drift {drift:.2f}x exceeds "
               f"{DRIFT_LIMIT}x — box speed changed mid-suite, re-run **")
    spin_txt = (f" spin {spins[0]:.3f}/{spins[1]:.3f}s"
                if spins[0] and spins[1] else "")
    print(f"{path}: probe start={start:.3f}s end={end:.3f}s{spin_txt} "
          f"({kind} drift {drift:.2f}x){tag}")
    return (start + end) / 2.0


def spin_thirds_report(path, env, spins, queries):
    """Mid-suite burst localization (r20, the r19 verdict's #4): Bench has
    recorded settled spin samples at the 1/3 and 2/3 query boundaries
    since r19, but they carried no adjudication weight — BENCH_r19's
    spin_third1 0.449 sat visibly above the quiet band while the verdict
    ran only on the endpoint drift (1.20x, quiet). A third that reads
    >DRIFT_LIMIT x the artifact's own best spin marks the query block it
    closed as burst-taxed: REPORTED with the block's name range so
    per-query flags inside it start as evidence, never verdict-gated
    (a burst that died inside the suite does not invalidate the total —
    the raw-total bar and the endpoint drift gate keep that role)."""
    if not env or not queries:
        return
    thirds = [(k, env.get(k)) for k in ("spin_third1_s", "spin_third2_s")]
    vals = [v for _, v in thirds if isinstance(v, (int, float)) and v > 0]
    ends = [v for v in (spins or (None, None)) if v]
    if not vals or not ends:
        return
    best = min(ends + vals)
    names = sorted(queries)
    n = len(names)
    # Block names are valid ONLY when the parsed map covers (close to)
    # the full suite Bench computed its boundaries over: a truncated
    # BENCH_r{N}.json tail (~23 slowest queries, full record missing or
    # total-mismatched) would yield boundaries of the slowest-queries
    # subset and attribute the burst to the WRONG block. 200 splits the
    # modes (full records carry 231; tails ~23).
    full = n >= 200
    blocks = {"spin_third1_s": (names[0], names[max(0, n // 3 - 1)]),
              "spin_third2_s": (names[min(n - 1, n // 3)],
                                names[max(0, 2 * n // 3 - 1)])} if full else {}
    for k, v in thirds:
        if isinstance(v, (int, float)) and v > 0 and v / best > DRIFT_LIMIT:
            where = ("the block it closed ({}..{})".format(*blocks[k])
                     if full else
                     f"the suite {k.replace('spin_', '').replace('_s', '')} "
                     "block (per-query map too truncated to name it)")
            print(f"note: {path} {k} {v:.3f}s is {v / best:.2f}x the "
                  f"artifact's best spin {best:.3f}s — a mid-suite burst "
                  f"taxed {where}; per-query "
                  "flags there are suspect (reported, not verdict-gated)")


def suite_median_factor(old_q, new_q):
    """Median per-query time ratio (new/old) over stable common queries —
    the box factor actually used for normalization. >1 means the new
    run's box is slower for suite-shaped work."""
    ratios = sorted(new_q[q] / old_q[q] for q in old_q
                    if q in new_q and old_q[q] >= 0.5 and new_q[q] >= 0)
    if len(ratios) < MIN_MEDIAN_SAMPLE:
        return None, len(ratios)
    return statistics.median(ratios), len(ratios)


def main():
    old_q, old_t, old_p, old_s, old_e = load(sys.argv[1])
    new_q, new_t, new_p, new_s, new_e = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_speed = probe_speed(sys.argv[1], old_p, old_s)
    new_speed = probe_speed(sys.argv[2], new_p, new_s)
    # Cross-artifact spin comparison (r18): a STEADY host-level steal is
    # invisible to guest loadavg AND to the within-run drift check (both
    # spin readings slow equally) — but the spin kernel is deterministic
    # CPU work, so against the SAME box's prior artifact a slow start is
    # visible. Reported, never verdict-gated (boxes can legitimately
    # change between rounds; the raw-total bar is the backstop).
    if old_s[0] and old_s[1] and new_s and new_s[0]:
        base = min(old_s[0], old_s[1])
        if base > 0 and new_s[0] / base > 1.3:
            print(f"note: new spin_start {new_s[0]:.3f}s is "
                  f"{new_s[0] / base:.2f}x the old artifact's best spin "
                  f"{base:.3f}s — steady host-steal suspect if the box is "
                  "unchanged (not verdict-gated)")
    # r17 env block (heap/local-dir/loadavg/MemAvailable brackets) — the
    # diagnostics for slow-probe runs; printed verbatim when present.
    for path, env in ((sys.argv[1], old_e), (sys.argv[2], new_e)):
        if env:
            tag = ""
            ls = env.get("load1_start")
            lim = load1_limit_of(env)
            if isinstance(ls, (int, float)) and ls > lim:
                tag = (f"  ** CONTENTION-SUSPECT: load1_start {ls:.2f} > "
                       f"{lim} — suite started into sustained "
                       "co-tenant load, re-run **")
            print(f"{path}: env "
                  + " ".join(f"{k}={v}" for k, v in env.items()) + tag)
    spin_thirds_report(sys.argv[1], old_e, old_s, old_q)
    spin_thirds_report(sys.argv[2], new_e, new_s, new_q)
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

    # box factor >1 means the NEW run's box is slower; dividing new times
    # by it re-expresses them in old-box seconds.
    box, nmed = suite_median_factor(old_q, new_q)
    probe_box = (new_speed / old_speed) if old_speed and new_speed else None
    if probe_box:
        print(f"probe-ratio factor (new probe / old probe): {probe_box:.2f}x"
              " — reference only (probes do not track suite speed across"
              " box states)")
    if box:
        print(f"suite-median box factor over {nmed} common >=0.5s queries: "
              f"{box:.2f}x — normalized columns divide new times by this")
    elif probe_box:
        box = probe_box
        print(f"suite median unavailable ({nmed} common >=0.5s queries "
              f"< {MIN_MEDIAN_SAMPLE}) — falling back to the probe ratio")

    common = sorted(set(old_q) & set(new_q))
    print(f"old: {len(old_q)} queries total={old_t}; "
          f"new: {len(new_q)} queries total={new_t}; common: {len(common)}")
    com_old = sum(old_q[q] for q in common)
    com_new = sum(new_q[q] for q in common)
    norm = f" (box-normalized new: {com_new / box:.1f})" if box else ""
    print(f"common-sum old={com_old:.1f} new={com_new:.1f}{norm}")
    if new_t is not None and box:
        print(f"{sys.argv[2]}: total {new_t:.1f}s = {new_t / box:.1f} "
              f"old-artifact-box seconds")

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
    # r16 ADVICE: on a genuinely faster box (median factor well under 1)
    # a real code regression can hide behind a deflated RAW ratio and
    # pass the both-ratios verdict rule undetected. These are REPORTED
    # (never verdict-gated — the median factor alone can't distinguish a
    # faster box from a uniformly-faster suite, so a hard gate here would
    # re-create the r16 normalized-total failure mode): normalized >=
    # 1.5x with raw below the bar, shown only when the box factor is
    # low enough (< 0.85) for the absorption mechanism to be plausible.
    if box and box < 0.85:
        absorbed = [(adj(new_q[q]) / max(old_q[q], 1e-9), q) for q in common
                    if new_q[q] > 0.5
                    and adj(new_q[q]) / max(old_q[q], 1e-9) >= 1.5
                    and new_q[q] / max(old_q[q], 1e-9) < 1.5]
        if absorbed:
            print(f"\nnormalized-only outliers (box factor {box:.2f}x could be"
                  " absorbing real slowdowns — investigate, not verdict-gated):")
            for r, q in sorted(absorbed, reverse=True):
                print(f"  {q}: {old_q[q]:.2f} -> {new_q[q]:.2f}"
                      f" [norm {adj(new_q[q]):.2f}]  ({r:.1f}x norm,"
                      f" {new_q[q] / max(old_q[q], 1e-9):.1f}x raw)")
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
    # raw total <= 175 (the directive's probe-0.44-box unit — see
    # TOTAL_LIMIT_S for why raw IS that unit) AND no per-query regression
    # that is >= 1.5x in BOTH raw and median-normalized terms AND nothing
    # newly failing. It reproduces the r13->r14 (FAIL: drift) and
    # r14->r15 (FAIL: total 185.6 > 175) adjudications.
    print()
    ns, ne, kind = drift_pair(new_p, new_s)
    if not (ns and ne) or new_t is None:
        print("VERDICT: UNKNOWN (new artifact lacks calibration probes or a total)")
        return
    reasons = []
    drift = max(ne / ns, ns / ne)
    if drift > DRIFT_LIMIT:
        reasons.append(f"{kind} drift {drift:.2f}x > {DRIFT_LIMIT}x (contended run)")
    new_ls = (new_e or {}).get("load1_start")
    new_lim = load1_limit_of(new_e)
    if isinstance(new_ls, (int, float)) and new_ls > new_lim:
        reasons.append(f"load1_start {new_ls:.2f} > {new_lim} "
                       "(contended start — re-run)")
    if new_t > TOTAL_LIMIT_S:
        reasons.append(f"total {new_t:.1f} > {TOTAL_LIMIT_S} seconds")
    # computed from scratch (not from `regress`) so a nonstandard CLI
    # threshold can't hide or inflate the acceptance rule's own 1.5x bar;
    # a flag needs BOTH the raw ratio and the median-normalized ratio at
    # >= 1.5x (see TOTAL_LIMIT_S's comment for the two failure modes the
    # conjunction guards against).
    hard_regress = [(new_q[q] / max(old_q[q], 1e-9), q) for q in common
                    if new_q[q] > 0.5
                    and new_q[q] / max(old_q[q], 1e-9) >= 1.5
                    and adj(new_q[q]) / max(old_q[q], 1e-9) >= 1.5]
    if hard_regress:
        worst = max(hard_regress)
        reasons.append(f"{len(hard_regress)} regression(s) >= 1.5x raw AND "
                       f"normalized (worst {worst[1]} {worst[0]:.1f}x raw)")
    if broke:
        reasons.append(f"{len(broke)} newly-failing query(ies)")
    if reasons:
        print(f"VERDICT: FAIL ({'; '.join(reasons)})")
    else:
        print(f"VERDICT: PASS (drift {drift:.2f}x <= {DRIFT_LIMIT}x, "
              f"total {new_t:.1f} <= {TOTAL_LIMIT_S}, no raw-and-normalized "
              f"regression >= 1.5x, nothing newly failing)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into `head`
        pass
