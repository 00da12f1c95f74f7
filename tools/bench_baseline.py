#!/usr/bin/env python3
"""Gate a fresh graft.Bench run against the committed local baseline.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        sbt "runMain graft.Bench" | grep '"metric"' > /tmp/bench_now.jsonl
    python3 tools/bench_baseline.py /tmp/bench_now.jsonl [BASELINE_LOCAL.json]

BASELINE_LOCAL.json pins one clean driver-style bench at a declared HEAD
(per-query [wall, cpu] + totals + the measurement protocol). The GATE is on
the suite CPU total: cpu_sec_total <= 2.0 x baseline. CPU is the gated
metric because driver-to-driver WALL totals vary >=1.4x on identical
binaries (judge-calibrated in VERDICT r12) while process-CPU totals held
within ~1% across r12/r14; per-query walls are reported for triage only,
and any wall flag must be isolated-re-measured (SPARK_GRAFT_BENCH_ONLY=q)
before being believed — in-suite flags have proven unstable every round
(BENCH_SCALING.md appendices).

With --require-head (the round-closing invariant, r16 VERDICT item 2): the
pin's head must be an ancestor of the current HEAD and NO SOURCE file
(src/**, build.sbt, tools/**) may have changed since it — the pin commit
itself is doc-only, so a shipped HEAD whose code postdates the pinned bench
fails loudly instead of shipping unmeasured.

Exit status: 0 = inside the gate, 2 = gate exceeded, 3 = head invariant
violated, 1 = usage error.
"""
import json
import os
import subprocess
import sys

WALL_REPORT_RATIO = 3.0   # per-query wall triage threshold (report only)
CPU_GATE_RATIO = 2.0      # the gate: suite cpu-sec vs baseline
FLOOR_SEC = 0.75          # per-query fixed-cost floor (same as bench_scaling)


def load_line(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            raw = raw.strip()
            if raw.startswith("[info]"):
                raw = raw[len("[info]"):].strip()
            if raw.startswith("{"):
                return json.loads(raw)
    raise SystemExit(f"no bench JSON line in {path}")


def check_head_invariant(pin_head: str) -> list[str]:
    """Source paths changed between the pinned head and HEAD (empty = ok)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run = lambda *a: subprocess.run(  # noqa: E731
        ["git", *a], capture_output=True, text=True, cwd=repo)
    if run("merge-base", "--is-ancestor", pin_head, "HEAD").returncode != 0:
        return [f"pin head {pin_head} is not an ancestor of HEAD"]
    diff = run("diff", "--name-only", f"{pin_head}..HEAD")
    # src/test is excluded: specs cannot alter the measured runtime, so a
    # post-pin test addition does not invalidate the pinned bench — only
    # main source, the gate tooling itself, and the build definition do
    def runtime_path(p: str) -> bool:
        return ((p.startswith("src/") and not p.startswith("src/test/"))
                or p.startswith("tools/") or p == "build.sbt")

    committed = [p for p in diff.stdout.splitlines() if runtime_path(p)]
    # uncommitted edits count too (r17 ADVICE): a dirty working tree means
    # the running code no longer matches the pinned bench even when
    # pin_head..HEAD is clean
    status = run("status", "--porcelain")
    dirty = [f"{line[3:].split(' -> ')[-1]} (uncommitted)"
             for line in status.stdout.splitlines()
             if len(line) > 3 and runtime_path(line[3:].split(" -> ")[-1])]
    return committed + dirty


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--require-head"]
    require_head = "--require-head" in sys.argv[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    now = load_line(args[0])
    base_path = args[1] if len(args) > 1 else "BASELINE_LOCAL.json"
    with open(base_path, encoding="utf-8") as fh:
        base = json.load(fh)
    if now.get("sf") != base.get("sf"):
        print(f"WARNING: sf mismatch now={now.get('sf')} baseline={base.get('sf')}"
              " — the gate only means something at the baseline's SF",
              file=sys.stderr)
    b_wc = base["wc"]
    n_q, n_c = now["queries"], now["cpu_sec"]
    rows = []
    for q, (bw, bc) in b_wc.items():
        if q not in n_q:
            rows.append((q, bw, None, None, None, "MISSING"))
            continue
        w, ratio = n_q[q], (n_q[q] / bw if bw > 0 else float("inf"))
        # per-query CPU ratio (r15 ADVICE): CPU is the stable signal the
        # protocol trusts, so it leads the triage sort; walls stay
        # report-only with the isolate-before-believing rule
        c = n_c.get(q)
        cr = (c / bc) if (c is not None and bc > 0) else None
        verdict = ("fixed-cost" if w < FLOOR_SEC
                   else "CPU-FLAG (isolate before believing)"
                   if (cr or 0) > WALL_REPORT_RATIO and c >= FLOOR_SEC
                   else "WALL-FLAG (isolate before believing)"
                   if ratio > WALL_REPORT_RATIO else "ok")
        rows.append((q, bw, w, ratio, cr, verdict))
    new_qs = sorted(set(n_q) - set(b_wc))
    rows.sort(key=lambda r: -max(r[3] or 0, r[4] or 0))
    print(f"== bench vs baseline @ {base.get('head', '?')} (sf {base.get('sf')}) ==")
    print(f"{'query':34s} {'base_w':>8s} {'now_w':>8s} {'w_rat':>7s} {'c_rat':>7s}  verdict")
    for q, bw, w, ratio, cr, verdict in rows[:20]:
        ws = "-" if w is None else f"{w:8.3f}"
        rs = "-" if ratio is None else f"{ratio:7.2f}"
        cs = "-" if cr is None else f"{cr:7.2f}"
        print(f"{q:34s} {bw:8.3f} {ws:>8s} {rs:>7s} {cs:>7s}  {verdict}")
    if len(rows) > 20:
        print(f"  ... {len(rows) - 20} more (sorted by ratio; all reported rows above)")
    if new_qs:
        print(f"new queries (not in baseline, not gated): {', '.join(new_qs)}")
    b_cpu, n_cpu = base["cpu_sec_total"], now["cpu_sec_total"]
    cpu_ratio = n_cpu / b_cpu if b_cpu > 0 else float("inf")
    print(f"suite wall  {base['value']:8.1f} -> {now['value']:8.1f} s "
          f"(x{now['value'] / base['value']:.2f}; NOT gated — >=1.4x run noise)")
    print(f"suite cpu   {b_cpu:8.1f} -> {n_cpu:8.1f} s (x{cpu_ratio:.2f}; "
          f"gate <= x{CPU_GATE_RATIO:g})")
    if cpu_ratio > CPU_GATE_RATIO:
        print("== GATE EXCEEDED ==")
        return 2
    if require_head:
        changed = check_head_invariant(str(base.get("head", "")))
        if changed:
            print("== HEAD INVARIANT VIOLATED: source changed since the pin ==")
            for p in changed[:10]:
                print(f"  {p}")
            print("re-run the bench at the current HEAD and re-pin before shipping")
            return 3
        print(f"head invariant holds: no source change since pin {base.get('head')}")
    print("== inside the gate ==")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
