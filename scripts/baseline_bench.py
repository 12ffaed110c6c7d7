#!/usr/bin/env python3
"""Falsifiable baseline for the "within 2x of a single-node engine" claim.

Times the DuckDB oracle SQL (the exact queries scripts/check.py verifies
results against) for the bench HEADLINE queries on the same parquet
tables, then records engine-vs-oracle ratios alongside the engine's own
numbers in the round's bench artifact.

Usage: python3 scripts/baseline_bench.py [sfDir] [oracleJson] [benchRecord] [sf=benchfile ...]
    sfDir        parquet dir the engine was benched on (default sf0.1)
    oracleJson   oracle_sql.json from any Verify run (default /tmp/graft_verify)
    benchRecord  BENCH_local_<round>.json to merge ratios into
                 (default from SPARK_GRAFT_ROUND/GRAFT_ROUND, r8)
    sf=benchfile[@dir] additional scale points for the SCALING sweep: e.g.
                 "sf0.001=/tmp/b1.json sf0.01=/tmp/b2.json" where each
                 file is a Bench output (filtered runs fine) holding
                 engine timings for the sweep queries (TPC-H trio +
                 golden pipelines) at that SF; @dir overrides the
                 default /root/testdata/<sf> parquet dir.

Reading the ratios honestly: at sf0.1 the inputs are ~10 MB — DuckDB
answers in tens of milliseconds while a 32-thread Spark session pays
100-300 ms of fixed per-query cost (job scheduling, codegen, 32-way
exchanges), so single-point ratios at toy scale measure OVERHEAD, not
throughput. That is exactly why the sweep exists: if ratio(sf0.001) >>
ratio(sf0.01) > ratio(sf0.1), the gap is a fixed constant amortizing
away with data size — the regime this library targets (100 TB) is three
orders of magnitude past the crossover trend. The per-SF table lands in
the bench artifact so the claim is checkable, not asserted.

DuckDB is a state-of-the-art single-node vectorized OLAP engine running
the SAME declarative query on the SAME files with all cores — the
honest local stand-in for "a tuned native engine at this scale factor"
(the reference publishes methodology, not absolute numbers, in-tree;
its own TPC-H Q6 test is tuplex test/core/TPCH.cc:24 — q6_filter_agg
here). Methodology mirrors graft.Bench: one warmup run, then two timed
runs keeping the minimum. ratio = engine_sec / oracle_sec; < 1 means
the engine beat DuckDB on that query. Dev-side tool only (the driver
container has duckdb; the shipped library is pure Scala/Spark).

Caveat read honestly: the q_dedup_* headliners are EXCLUDED from the
ratio table — their oracle SQL is the deliberately-quadratic all-pairs
ground truth (a different algorithm entirely, intractable at sf0.1:
60k docs -> ~1.8e9 list_intersect pairs), so timing it would compare
the engine's sub-quadratic LSH path against a strawman. The remaining
headliners' oracles replay the SAME algorithm relationally, so their
ratios are like-for-like.
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def table_src(sfdir, t):
    """DuckDB source for a table: the driver testdata is one file per
    table, ScaleGen-staged scale points are a directory of part files."""
    p = f"{sfdir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

# BASELINE.md's headline workloads — keep in sync with Bench.scala
HEADLINE = [
    "q1_agg", "q6_filter_agg", "q19_join_filter", "q_pipeline_golden",
    "q_zillow_golden", "q_flights_golden", "q_corpus_golden",
    "q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed_lsh",
    "q_ann_bruteforce", "q_stream_window", "q_csv_roundtrip",
]

# Oracles that ARE the quadratic ground truth, not the operator — see
# module docstring. Recorded as -2.0 (excluded, not failed).
QUADRATIC_ORACLE = {"q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed_lsh"}


_REPLAY_DIR = None  # one temp dir per process, cleaned at exit


def _replay_dir():
    global _REPLAY_DIR
    if _REPLAY_DIR is None:
        import atexit
        import shutil
        import tempfile
        _REPLAY_DIR = tempfile.mkdtemp(prefix="duck_csv_rt_")
        atexit.register(shutil.rmtree, _REPLAY_DIR, ignore_errors=True)
    return _REPLAY_DIR


def fair_replay_sql(name):
    """Like-for-like TIMING replay where the correctness oracle's work is
    structurally lighter than the engine's. q_csv_roundtrip WRITES 3
    lineitem columns to csv and reads them back through the csv source
    before aggregating; its correctness oracle (rightly) checks only the
    final aggregate on parquet — timing THAT would charge the engine for
    an I/O round-trip DuckDB never pays (at the sf1 sweep point the
    'ratio' grew with data size purely because DuckDB's aggregate is
    sublinear while the engine's csv bytes are linear). DuckDB can replay
    the exact same shape: COPY out + read_csv back + aggregate. Timing
    only — correctness compares are untouched (scripts/check.py).
    The UDF-pipeline goldens (pipeline/flights) have no SQL replay of
    their throwing-UDF -> error-channel -> resolve semantics; their
    ratios stay net-semantics SQL and are read with that caveat."""
    if name == "q_csv_roundtrip":
        out = _replay_dir() + "/li.csv"
        return (
            f"COPY (SELECT l_orderkey, l_quantity, l_extendedprice "
            f"FROM lineitem) TO '{out}' (HEADER); "
            f"SELECT count(*) AS n, "
            f"sum(floor(l_quantity * 10000 + 0.5)) / 10000.0 AS sum_qty, "
            f"sum(floor(l_extendedprice * 10000 + 0.5)) / 10000.0 AS sum_price "
            f"FROM read_csv('{out}')")
    return None


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json"
    # round id from env, else derived like graft.Round: max round over the
    # committed official artifacts at the repo root + 1 (VERDICT r12 #1:
    # the hand-bumped constant was stale two rounds running)
    round_id = os.environ.get("SPARK_GRAFT_ROUND") or os.environ.get("GRAFT_ROUND")
    if not round_id:
        import re
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rounds = [int(m.group(1)) for f in os.listdir(repo)
                  if (m := re.match(r"^(?:BENCH|CORRECTNESS)_r(\d+)\.json$", f))]
        round_id = f"r{max(rounds) + 1}" if rounds else "r1"
    bench_record = sys.argv[3] if len(sys.argv) > 3 else f"BENCH_local_{round_id}.json"

    oracle = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_src(sfdir, t)}'")

    oracle_secs = {}
    for name in HEADLINE:
        sql = fair_replay_sql(name) or oracle.get(name)
        if sql is None:
            print(f"skip {name}: no oracle SQL")
            continue
        if name in QUADRATIC_ORACLE:
            print(f"skip {name}: oracle is the quadratic all-pairs ground "
                  f"truth, not a comparable algorithm")
            oracle_secs[name] = -2.0
            continue
        try:
            con.execute(sql).fetchall()  # warmup (buffer cache, plan)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            oracle_secs[name] = round(min(runs), 4)
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            oracle_secs[name] = -1.0

    bench = json.load(open(bench_record))
    engine = bench.get("queries", {})
    ratios = {}
    print(f"\n{'query':26s} {'engine':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name, osec in oracle_secs.items():
        esec = engine.get(name, -1.0)
        if osec > 0 and esec >= 0:
            ratios[name] = round(esec / osec, 3)
            print(f"{name:26s} {esec:8.3f} {osec:8.3f} {ratios[name]:7.2f}")
        else:
            print(f"{name:26s} {esec:8.3f} {osec:8.3f}     n/a")
    # Scaling sweep: engine-vs-DuckDB ratio per SF for the TPC-H trio AND
    # the golden string-ETL pipelines (their single-point ratios are the
    # worst — VERDICT r8 #2) — the trend that separates fixed overhead
    # from throughput. Each sweep point carries its own parquet dir: the
    # first point is the sfdir the engine was actually benched on (NOT a
    # reconstructed default path — ADVICE r8), later points are
    # "label=benchfile[@dir]" with dir defaulting to /root/testdata/label.
    sweep = {}
    sweep_queries = [
        "q1_agg", "q6_filter_agg", "q19_join_filter",
        "q_zillow_golden", "q_flights_golden", "q_pipeline_golden",
        "q_csv_roundtrip",
    ]
    points = [(sfdir.rstrip("/").split("/")[-1], sfdir, engine)]
    for arg in sys.argv[4:]:
        sf, _, path = arg.partition("=")
        path, _, pdir = path.partition("@")
        pt = json.load(open(path))
        # Default the sweep point's parquet dir to the dir the engine was
        # ACTUALLY benched on (Bench records it in the "sf" field) — a
        # reconstructed /root/testdata/<label> default could silently time
        # DuckDB on different data than the engine ran (ADVICE r9).
        points.append((sf, pdir or pt.get("sf") or f"/root/testdata/{sf}",
                       pt.get("queries", {})))
    if len(points) > 1:
        print(f"\nscaling sweep (ratio = engine/duckdb):")
        print(f"{'query':18s} " + " ".join(f"{sf:>10s}" for sf, _, _ in points))
        for name in sweep_queries:
            if name not in oracle:
                continue
            row = {}
            for sf, pdir, eng in points:
                # single-family staged points omit tables their sweep
                # queries never read; a query with no engine timing at
                # this point gets no oracle timing either (a DuckDB-only
                # number is not a ratio, and e.g. zillow at sf100 costs
                # ~10 min of oracle time)
                if eng.get(name, -1.0) < 0:
                    row[sf] = None
                    continue
                c2 = duckdb.connect()
                for t in TABLES:
                    if os.path.exists(f"{pdir}/{t}.parquet"):
                        c2.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                                   f"'{table_src(pdir, t)}'")
                sql2 = fair_replay_sql(name) or oracle[name]
                c2.execute(sql2).fetchall()
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    c2.execute(sql2).fetchall()
                    runs.append(time.perf_counter() - t0)
                osec = min(runs)
                esec = eng.get(name, -1.0)
                row[sf] = round(esec / osec, 2) if esec >= 0 and osec > 0 else None
            sweep[name] = row
            print(f"{name:18s} " + " ".join(
                f"{row[sf]:>10.2f}" if row[sf] is not None else f"{'n/a':>10s}"
                for sf, _, _ in points))
    bench["oracle_secs"] = oracle_secs
    bench["oracle_ratio"] = ratios
    if sweep:
        bench["oracle_scaling"] = sweep
    # Machine-detectable staleness (ADVICE r9): stamp the engine timings
    # these ratios were computed against as STRUCTURED fields. A later
    # Bench rerun rewrites value/calibration_sec but merge-preserves
    # oracle_*, so record-is-stale iff value != oracle_engine_value.
    bench["oracle_engine_value"] = bench.get("value")
    bench["oracle_engine_calibration"] = bench.get("calibration_sec")
    # Code-identity stamp (ADVICE r12): Bench's merge guard keeps these
    # blocks across same-head reruns (timing windows are ±13% at fixed
    # code) and drops them the moment the head changes. ADVICE r13: HEAD
    # alone misses (a) uncommitted working-tree changes — the normal dev
    # loop edits engine code and reruns Bench before committing — and
    # (b) a same-head rerun against a DIFFERENT SF data dir. So the stamp
    # appends "-dirty" when the tree differs from HEAD (a dirty stamp
    # never matches in the merge guard) and the SF dir is stamped
    # separately (compared against the fresh run's "sf" field).
    try:
        import subprocess
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        head = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=repo_root, text=True).strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=repo_root, text=True, capture_output=True).stdout.strip()
        bench["oracle_engine_head"] = head + ("-dirty" if dirty else "")
    except Exception:
        pass
    bench["oracle_engine_sf"] = bench.get("sf") or sfdir
    # Core-count stamp (VERDICT r14 #5): a rerun at a different cpus count
    # (the driver's post-snapshot c8 scaling sweep) must not silently keep
    # ratios measured at another machine width; Bench's merge guard treats
    # a cpus mismatch like an SF mismatch.
    if bench.get("cpus") is not None:
        bench["oracle_engine_cpus"] = bench.get("cpus")
    bench["oracle_note"] = (
        "DuckDB timing of the verified oracle SQL on the same parquet, "
        "warmup + min of 2, all cores; ratio = engine/duckdb. Single-point "
        "ratios at ~10MB inputs measure Spark's fixed per-query overhead, "
        "not throughput — oracle_scaling shows the ratio trend vs data "
        "size (amortizing constant vs real gap); quadratic ground-truth "
        "oracles are excluded (-2.0). Ratios computed against the engine "
        f"run with total={bench.get('value')} calibration="
        f"{bench.get('calibration_sec')} — if the record's current "
        "total/calibration differ, a Bench rerun happened after this "
        "merge (merge-preserved ratios are snapshots of THAT run)")
    with open(bench_record, "w") as f:
        json.dump(bench, f)
        f.write("\n")
    worst = max(ratios.values()) if ratios else float("nan")
    print(f"\nmerged into {bench_record}; worst single-point ratio "
          f"{worst:.2f} (see oracle_note for how to read this at toy SF)")


if __name__ == "__main__":
    main()
