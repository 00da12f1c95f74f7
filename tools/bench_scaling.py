#!/usr/bin/env python3
"""Scale-sensitivity report over graft.Bench multi-SF output.

Usage:
    SPARK_GRAFT_SF_DIRS=/root/testdata/sf0.01,/root/testdata/sf0.1 \
        sbt "runMain graft.Bench" | grep '"metric"' > /tmp/bench_scaling.jsonl
    python3 tools/bench_scaling.py /tmp/bench_scaling.jsonl <data_ratio>

Reads one bench JSON line per SF (smallest first), prints per-query wall
ratios between the largest and smallest SF, and flags queries whose wall
time grew faster than the data (ratio > data_ratio), modulo a fixed-cost
floor: queries under FLOOR_SEC at the large SF are dominated by constant
session/stream/model overhead and cannot exhibit meaningful scaling.
"""
import json
import sys

FLOOR_SEC = 0.75  # below this at the LARGE SF, timing is fixed-cost noise

def main() -> int:
    path = sys.argv[1]
    data_ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    lines = []
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            raw = raw.strip()
            if raw.startswith("[info]"):
                raw = raw[len("[info]"):].strip()
            if raw.startswith("{"):
                lines.append(json.loads(raw))
    # r20: Bench prints a compact driver-tail summary line after each SF's
    # full line; keep the full lines (they carry the complete maps), drop
    # the summaries so line pairing by position stays correct
    lines = [l for l in lines if "cpu_sec" in l]
    if len(lines) < 2:
        print(f"need >=2 bench lines, got {len(lines)}", file=sys.stderr)
        return 1
    small, large = lines[0], lines[-1]
    qs_s, qs_l = small["queries"], large["queries"]
    common = sorted(set(qs_s) & set(qs_l))
    rows = []
    for q in common:
        ws, wl = qs_s[q], qs_l[q]
        ratio = wl / ws if ws > 0 else float("inf")
        rows.append((q, ws, wl, ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"== scaling {small['sf']} -> {large['sf']} (data x{data_ratio:g}) ==")
    print(f"{'query':34s} {'small_s':>8s} {'large_s':>8s} {'ratio':>7s}  verdict")
    flagged = 0
    for q, ws, wl, ratio in rows:
        if wl < FLOOR_SEC:
            verdict = "fixed-cost"
        elif ratio <= data_ratio:
            verdict = "sublinear" if ratio <= data_ratio / 2 else "~linear"
        else:
            verdict = "SUPER-LINEAR"
            flagged += 1
        print(f"{q:34s} {ws:8.3f} {wl:8.3f} {ratio:7.2f}  {verdict}")
    ts, tl = small["value"], large["value"]
    print(f"{'TOTAL':34s} {ts:8.3f} {tl:8.3f} {tl / ts:7.2f}")
    print(f"== {flagged} super-linear quer{'y' if flagged == 1 else 'ies'} ==")
    return 0 if flagged == 0 else 2

if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped through head
        sys.exit(0)
