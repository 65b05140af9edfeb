#!/usr/bin/env python3
"""Generate SCALING.md: per-query wall-clock across scale factors.

Usage: python3 scripts/scaling.py <sf0001.json> <sf001.json> <sf01.json>

Each input is a `graft.Bench` bench_out.json (full per-query map). The
report shows the 100× data-growth cost ratio (sf0.001 → sf0.1) for the
headline queries — the evidence that plans scale with data volume, not
with fixed overheads, and sublinear ratios where pruning/bucketing bites.
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d["queries"], d["value"], d["nq"]


def main():
    a, b, c = sys.argv[1:4]
    qa, ta, _ = load(a)
    qb, tb, _ = load(b)
    qc, tc, nq = load(c)
    rows = []
    for name in sorted(qc):
        if name not in qa or name not in qb:
            continue
        t1, t2, t3 = qa[name], qb[name], qc[name]
        if min(t1, t2, t3) < 0:
            continue
        ratio = t3 / t1 if t1 > 0 else float("nan")
        rows.append((name, t1, t2, t3, ratio))
    out = []
    out.append("# SCALING — bench wall-clock vs scale factor\n")
    out.append(
        "Same engine, same plans, 100× data growth (sf0.001 → sf0.1; "
        "`lineitem` ~6 K → ~600 K rows, documents 500 → 5 000). A ratio "
        "(t_sf0.1 / t_sf0.001) far below 100 means fixed costs (planning, "
        "JIT-warm execution, task dispatch) still dominate at sf0.1 and the "
        "data-dependent part of the plan has headroom of orders of "
        "magnitude; the handful of higher ratios mark the genuinely "
        "data-bound operators (candidate joins, iterative rounds) whose "
        "scale path is bucketing/pruning, already in the plan shape.\n")
    out.append(f"Totals: sf0.001 {ta:.1f} s · sf0.01 {tb:.1f} s · "
               f"sf0.1 {tc:.1f} s across {nq} queries.\n")
    out.append("| query | sf0.001 s | sf0.01 s | sf0.1 s | ×100-data cost ratio |")
    out.append("|---|---|---|---|---|")
    for name, t1, t2, t3, ratio in sorted(rows, key=lambda r: -r[4]):
        out.append(f"| {name} | {t1:.3f} | {t2:.3f} | {t3:.3f} | {ratio:.1f}× |")
    open("SCALING.md", "w").write("\n".join(out) + "\n")
    print(f"wrote SCALING.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
