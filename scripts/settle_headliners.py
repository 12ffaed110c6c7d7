#!/usr/bin/env python3
"""Multi-draw settlement of the borderline 2x headliners (VERDICT r12
task 3): q1_agg read 2.33x and q19_join_filter 2.05x in ONE committed
sf10 draw, while the two-draw geomean spread (1.41 vs 1.68) shows
single-draw ratios wobble ~+/-19% on this host. Protocol here:

  engine side: min over N independent filtered-headline Bench runs
    (each run is itself warmup + min-of-2 passes per query). Filtered
    runs LOSE the full sweep's warm-JVM amortization, so these engine
    numbers are CONSERVATIVE (biased against the engine) relative to the
    sweep-protocol numbers the r12 table used.
  oracle side: DuckDB warmup + min-of-3 timed runs, same parquet,
    all cores, quiet host, run strictly AFTER the engine draws.

Usage: settle_headliners.py <out.json> <sf_label=dir=drawglob> ...
  e.g. settle_headliners.py BENCH_headliner_settle_r13.json \
       sf10=/root/repo/testdata_sf10=/tmp/sf10_draw*.json \
       sf100=/root/repo/testdata_sf100=/tmp/sf100_draw*.json
"""
import glob
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ORACLE_JSON = "/tmp/graft_verify/oracle_sql.json"


def table_src(sfdir, t):
    p = f"{sfdir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def fair_replay_sql(name, tmp):
    # q_csv_roundtrip: like-for-like I/O replay (see baseline_bench.py)
    if name == "q_csv_roundtrip":
        out = tmp + "/li.csv"
        return (
            f"COPY (SELECT l_orderkey, l_quantity, l_extendedprice "
            f"FROM lineitem) TO '{out}' (HEADER); "
            f"SELECT count(*) AS n, "
            f"sum(floor(l_quantity * 10000 + 0.5)) / 10000.0 AS sum_qty, "
            f"sum(floor(l_extendedprice * 10000 + 0.5)) / 10000.0 AS sum_price "
            f"FROM read_csv('{out}')")
    return None


def main():
    out_path = sys.argv[1]
    oracle = json.load(open(ORACLE_JSON))
    import tempfile
    tmp = tempfile.mkdtemp(prefix="settle_")
    result = {"protocol": __doc__.strip().split("Usage:")[0].strip(),
              "points": {}}
    for arg in sys.argv[2:]:
        label, sfdir, drawglob = arg.split("=")
        draws = sorted(glob.glob(drawglob))
        engine = {}
        for p in draws:
            q = json.load(open(p)).get("queries", {})
            for name, sec in q.items():
                if sec >= 0:
                    engine.setdefault(name, []).append(round(sec, 3))
        con = duckdb.connect()
        for t in TABLES:
            src = f"{sfdir}/{t}.parquet"
            if os.path.exists(src):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"'{table_src(sfdir, t)}'")
        point = {}
        for name, esecs in sorted(engine.items()):
            sql = fair_replay_sql(name, tmp) or oracle.get(name)
            if sql is None:
                continue
            try:
                con.execute(sql).fetchall()  # warmup
                osecs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    osecs.append(round(time.perf_counter() - t0, 4))
            except Exception as e:
                print(f"{label} {name}: oracle FAIL {str(e)[:120]}")
                continue
            ratio = round(min(esecs) / min(osecs), 3)
            point[name] = {
                "engine_draws": esecs, "engine_min": min(esecs),
                "oracle_draws": osecs, "oracle_min": min(osecs),
                "ratio_min_over_min": ratio,
                "verdict": "inside 2x" if ratio <= 2.0 else "outside 2x",
            }
            print(f"{label:6s} {name:22s} engine {min(esecs):8.3f} "
                  f"oracle {min(osecs):8.3f} ratio {ratio:7.2f} "
                  f"{point[name]['verdict']}")
        result["points"][label] = {"dir": sfdir, "n_engine_draws": len(draws),
                                   "queries": point}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
