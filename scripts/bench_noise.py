#!/usr/bin/env python3
"""Empirical per-query noise bound for the bench sweep (VERDICT r10 task
#4, r11 task #1): run graft.Bench N times (default 5) on a QUIET host,
collect each run's per-query minimum, and commit the spread. The
committed table is the yardstick regression calls must cite: a
round-over-round move inside [min, max] of a quiet-host spread is noise,
not a regression — and the calibration intervals (single-thread AND
multi-core) each run carries show whether the host was quiet enough for
the table to apply.

Default mode is the FULL sweep — the same protocol as the official
driver run, because filtered runs lose the sweep's warm-JVM
amortization and are not comparable to sweep numbers (judge r11: a
filtered q1 solo reads 0.447 s vs 0.358/0.322 s in the r10/r11 sweeps).
Pass mode=headline for the quick 13-query variant when iterating.

Usage: python3 scripts/bench_noise.py [sfDir] [runs] [outJson] [mode]
Writes {query: {"runs": [...], "min": m, "median": md, "max": M,
"spread_pct": 100*(M-m)/md}, ...} plus per-run calibration numbers.
Dev-side tool; runs sequentially (never concurrently with DuckDB gates).
"""
import json
import os
import statistics
import subprocess
import sys

HEADLINE = [
    "q1_agg", "q6_filter_agg", "q19_join_filter", "q_pipeline_golden",
    "q_zillow_golden", "q_flights_golden", "q_corpus_golden",
    "q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed_lsh",
    "q_ann_bruteforce", "q_stream_window", "q_csv_roundtrip",
]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else \
        f"BENCH_noise_{_round_id(repo)}.json"
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"

    # Full mode rewrites bench.json and the round record per run (ADVICE
    # r12: a noise sweep silently left the official artifacts as the last
    # noise run's record) — snapshot both and restore on exit.
    backups = {}
    for art in ("bench.json", f"BENCH_local_{_round_id(repo)}.json"):
        p = f"{repo}/{art}"
        if os.path.exists(p):
            backups[p] = open(p).read()

    # Restoration must survive ANY exit path (ADVICE r13: a mid-sweep
    # exception — failed subprocess, bad-JSON parse — previously skipped
    # the restore and left the official artifacts clobbered by the last
    # noise run, the exact failure this backup exists to prevent).
    import atexit

    def _restore():
        for p, content in backups.items():
            with open(p, "w") as f:
                f.write(content)
        if backups:
            print(f"restored pre-sweep artifacts: "
                  f"{', '.join(os.path.basename(p) for p in backups)}")
    atexit.register(_restore)

    per_run, calibs, calibs_mc, totals = [], [], [], []
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    if mode == "headline":
        env["SPARK_GRAFT_ONLY"] = ",".join(HEADLINE)
    for i in range(runs):
        r = subprocess.run(
            [f"{repo}/scripts/run_main.sh", "graft.Bench"],
            capture_output=True, text=True, env=env, cwd=repo)
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith('{"metric"')), None)
        if line is None:
            print(f"run {i}: no metric line\n{r.stdout[-500:]}{r.stderr[-500:]}")
            sys.exit(1)
        rec = json.loads(line)
        # full-sweep stdout carries only the headline map; the FULL
        # per-query map is in bench.json (filtered: bench_partial.json)
        full_file = "bench_partial.json" if mode == "headline" else "bench.json"
        full = json.load(open(f"{repo}/{full_file}"))
        per_run.append(full["queries"])
        totals.append(full["value"])
        calibs.append(full.get("calibration_interval",
                               [full.get("calibration_sec")] * 3))
        calibs_mc.append(full.get("calibration_mc_interval"))
        print(f"run {i}: total={full['value']:.1f} calib={calibs[-1]} "
              f"mc={calibs_mc[-1]}", flush=True)

    names = sorted({q for pr in per_run for q in pr})
    table = {}
    for q in names:
        vals = [pr[q] for pr in per_run if pr.get(q, -1) >= 0]
        if not vals:
            continue
        m, md, M = min(vals), statistics.median(vals), max(vals)
        table[q] = {"runs": [round(v, 3) for v in vals],
                    "min": round(m, 3), "median": round(md, 3),
                    "max": round(M, 3),
                    "spread_pct": round(100 * (M - m) / md, 1) if md else 0.0}
    rec = {"sf": sfdir, "n_runs": runs, "mode": mode,
           "totals": [round(t, 3) for t in totals],
           "calibration_intervals": calibs,
           "calibration_mc_intervals": calibs_mc,
           "note": ("per-query minima of N independent Bench runs on a "
                    "quiet host; a cross-round move inside [min,max] is "
                    "noise, not a regression"),
           "queries": table}
    with open(out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    worst = max(table.items(), key=lambda kv: kv[1]["spread_pct"])
    print(f"\n{len(table)} queries -> {out}; worst spread: "
          f"{worst[0]} {worst[1]['spread_pct']}%")


def _round_id(repo):
    rid = os.environ.get("SPARK_GRAFT_ROUND") or os.environ.get("GRAFT_ROUND")
    if rid:
        return rid
    import re
    rounds = [int(m.group(1)) for f in os.listdir(repo)
              if (m := re.match(r"^(?:BENCH|CORRECTNESS)_r(\d+)\.json$", f))]
    return f"r{max(rounds) + 1}" if rounds else "r1"


if __name__ == "__main__":
    main()
