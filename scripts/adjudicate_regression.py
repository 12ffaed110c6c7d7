#!/usr/bin/env python3
"""Adjudicate a round-over-round bench move against the committed
quiet-host noise table (VERDICT r11 task #1).

For every query in two official per-query bench records, classifies the
move using BENCH_noise_rN.json:
  - WINDOW: both rounds' values lie inside (or within `slack` of) the
    quiet-host [min, max] spread for that query — the move is noise.
  - REAL-UP / REAL-DOWN: the older/newer value lies outside the spread
    by more than `slack` — a move the spread cannot explain.
Also prints family medians (tpch / ann / dedup / stream / golden /
other) for the r10→r11 shift and where the fresh quiet-host median
lands relative to both.

Usage: python3 scripts/adjudicate_regression.py \
          BENCH_local_r10.json BENCH_local_r11.json BENCH_noise_r12.json
"""
import json
import statistics
import sys


def family(q):
    if q.startswith("q_ann"):
        return "ann"
    if q.startswith("q_dedup") or q in ("q_setsim_join", "q_semdedup"):
        return "dedup"
    if q.startswith("q_stream"):
        return "stream"
    if q.endswith("_golden"):
        return "golden"
    if q[1].isdigit():
        return "tpch"
    return "other"


def main():
    a_path, b_path, noise_path = sys.argv[1:4]
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    noise = json.load(open(noise_path))["queries"]

    rows, fams = [], {}
    for q in sorted(set(a) & set(b) & set(noise)):
        va, vb = a[q], b[q]
        if va <= 0 or vb <= 0:
            continue
        lo, hi = noise[q]["min"], noise[q]["max"]
        span = hi - lo
        lo2, hi2 = lo - slack * span, hi + slack * span
        cls_a = "in" if lo2 <= va <= hi2 else ("above" if va > hi2 else "below")
        cls_b = "in" if lo2 <= vb <= hi2 else ("above" if vb > hi2 else "below")
        verdict = ("WINDOW" if cls_a == "in" and cls_b == "in" else
                   f"{a_path.split('_')[-1].split('.')[0]}:{cls_a} "
                   f"{b_path.split('_')[-1].split('.')[0]}:{cls_b}")
        move = 100 * (vb - va) / va
        rows.append((q, va, vb, move, lo, hi, verdict))
        fams.setdefault(family(q), []).append((move, cls_a, cls_b))

    print(f"{'query':32s} {'rA':>7s} {'rB':>7s} {'move%':>7s} "
          f"{'noise[min,max]':>17s}  verdict")
    n_window = 0
    for q, va, vb, move, lo, hi, verdict in rows:
        if verdict == "WINDOW":
            n_window += 1
        flag = "" if verdict == "WINDOW" else "  <<<"
        print(f"{q:32s} {va:7.3f} {vb:7.3f} {move:+7.1f} "
              f"[{lo:7.3f},{hi:7.3f}]  {verdict}{flag}")
    print(f"\n{n_window}/{len(rows)} moves fully inside the quiet-host spread")

    print(f"\n{'family':8s} {'n':>3s} {'median move%':>13s} "
          f"{'A outside':>10s} {'B outside':>10s}")
    for f in sorted(fams):
        moves = [m for m, _, _ in fams[f]]
        out_a = sum(1 for _, ca, _ in fams[f] if ca != "in")
        out_b = sum(1 for _, _, cb in fams[f] if cb != "in")
        print(f"{f:8s} {len(moves):3d} {statistics.median(moves):+13.1f} "
              f"{out_a:10d} {out_b:10d}")


if __name__ == "__main__":
    main()
