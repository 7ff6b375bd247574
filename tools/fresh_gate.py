#!/usr/bin/env python3
"""Dev-only mirror of the BASELINE.md cold-median perf gate (round-12
methodology — see "Round-12 RE-PIN" in BASELINE.md).

Two checks over a Bench artifact's `fresh_median_queries`:

  (a) absolute  — fresh cold median > its BASELINE.md bar (bar = 2x the
      round-11 cold median, floored at 0.02 s) is a BREACH;
  (b) relative  — fresh cold median >= 1.5x the previous round's committed
      fresh median (fresh_median_r{N}.json) is a REGRESSION to adjudicate,
      plans first (host-noise note in BASELINE.md: on sub-second absolute
      queries compare plan signatures before blaming code).

Queries registered after the previous snapshot have no relative reference —
reported as NEW (their first sf0.1 cold median becomes their bar, 2x).

Usage: python3 tools/fresh_gate.py <bench_out.json> <prev_fresh_median.json>
                                   [baseline_md]
Exit code 1 iff any absolute breach (the hard gate); relative regressions
are advisory (adjudicated, not auto-red) per BASELINE.md.
"""
import json
import re
import sys


def load_bars(baseline_md):
    bars = {}
    # Bar rows are `| q_name | sec |`; q1_agg starts with "q1" not "q_"
    # (BASELINE.md's own regex warning).
    for m in re.finditer(r"^\| (q[\w]+) \| ([0-9.]+) \|", open(baseline_md).read(), re.M):
        bars[m.group(1)] = float(m.group(2))
    return bars


def main():
    bench_path, prev_path = sys.argv[1], sys.argv[2]
    baseline_md = sys.argv[3] if len(sys.argv) > 3 else "BASELINE.md"
    bench = json.load(open(bench_path))
    fresh = bench.get("fresh_median_queries")
    if not fresh:
        print(f"ERROR: {bench_path} has no fresh_median_queries "
              f"(methodology={bench.get('methodology')!r})")
        sys.exit(2)
    prev = json.load(open(prev_path))
    if "fresh_median_queries" in prev:  # accept a full artifact too
        prev = prev["fresh_median_queries"]
    bars = load_bars(baseline_md)

    breaches, regressions, new, missing_bar = [], [], [], []
    for q, sec in sorted(fresh.items()):
        bar = bars.get(q)
        if bar is None:
            missing_bar.append(q)
        elif sec > bar:
            breaches.append((q, sec, bar))
        if q in prev:
            p = max(prev[q], 0.02)  # same floor as the bars
            if sec >= 1.5 * p:
                regressions.append((q, sec, prev[q]))
        else:
            new.append(q)

    for q, sec, bar in breaches:
        print(f"BREACH     {q}: median {sec:.2f}s > bar {bar:.2f}s")
    for q, sec, p in regressions:
        print(f"REGRESSION {q}: median {sec:.2f}s >= 1.5x prev {p:.2f}s "
              f"(adjudicate, plans first)")
    for q in missing_bar:
        print(f"NO-BAR     {q}: not in {baseline_md} (RegistryIntegrationSpec "
              f"should have caught this)")
    if new:
        print(f"NEW        {len(new)} queries without a previous median: "
              + ", ".join(new))
    gone = sorted(set(prev) - set(fresh))
    if gone:
        print(f"DROPPED    {len(gone)} queries in prev but not in this run: "
              + ", ".join(gone))
    print(f"\n== {len(breaches)} breach, {len(regressions)} regression, "
          f"{len(new)} new, {len(missing_bar)} no-bar over "
          f"{len(fresh)} queries ==")
    sys.exit(1 if breaches or missing_bar else 0)


if __name__ == "__main__":
    main()
