#!/usr/bin/env python3
"""Assemble SCALE.md from two graft.ScaleBench outputs (round-11 ask #1).

Usage: scale_report.py <small.json-lines> <big.json-lines> <multiplier> [out]

Each input is the SPARK_GRAFT_SCALE_OUT file of one ScaleBench run
(one {"query","sec","rows","sig"} JSON object per line). The report
lists per-query wall-clock at both scales, the ratio, whether the plan
signature is IDENTICAL across scales, and flags:
  - ratio > 1.5x the data multiplier  -> SUPERLINEAR (needs root cause)
  - plan-signature drift              -> PLAN FLIP (needs root cause)
"""
import json
import sys


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            out[d["query"]] = d
    return out


def main():
    small, big, mult = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else "/dev/stdout"
    names = sorted(set(small) & set(big))
    lines = []
    flags = []
    for n in names:
        s, b = small[n], big[n]
        ratio = b["sec"] / max(s["sec"], 1e-9)
        sig_ok = s["sig"] == b["sig"]
        flag = ""
        if not sig_ok:
            flag = "PLAN-FLIP"
            flags.append((n, f"sig {s['sig']} -> {b['sig']}"))
        elif ratio > 1.5 * mult:
            flag = "SUPERLINEAR"
            flags.append((n, f"ratio {ratio:.1f}x for {mult:.0f}x data"))
        lines.append(
            f"| {n} | {s['sec']:.2f} | {b['sec']:.2f} | {ratio:.2f}x "
            f"| {s['rows']} | {b['rows']} | {'=' if sig_ok else 'DRIFT'} "
            f"| {flag} |")
    body = "\n".join(lines)
    n_flag = len(flags)
    with open(out, "w") as f:
        f.write(
            f"| query | sec@1x | sec@{mult:.0f}x | ratio | rows@1x "
            f"| rows@{mult:.0f}x | plan | flag |\n|---|---|---|---|---|---|---|---|\n"
            + body + "\n")
    print(f"SCALE_REPORT queries={len(names)} flagged={n_flag}")
    for n, why in flags:
        print(f"  FLAG {n}: {why}")


if __name__ == "__main__":
    main()
