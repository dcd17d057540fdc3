#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB wall-clock comparison (the BASELINE.md gate:
spark ≤ 2× duckdb at the same scale factor, same machine).

Usage:
    python tools/perfcmp.py [SF_DIR] [query ...]     # default all oracle queries
    PERFCMP_REPS=1 python tools/perfcmp.py           # override rep count

The number of record per query is the MEDIAN OF 3 WARM REPS (round-6
decision, VERDICT r5 #4): single in-suite reps measured 1.3-1.8x their
isolated warm time purely from neighboring queries' cache/GC pressure, so
the recorded number now matches what an isolated re-measure reproduces.
A System.gc() between entries drops the previous query's garbage before
the next is timed, and the JSON tail stamps os.getloadavg() at start and
end — any ambient-load contamination (the recurring confounder on this
host) is visible in the artifact itself.

Prints a markdown table sorted by ratio (worst first) plus a JSON tail line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.session import TABLE_NAMES, get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PERFCMP_REPS", "3"))
    specs = all_queries()
    names = args[1:] or sorted(n for n, s in specs.items() if s.oracle)

    spark = get_spark("perfcmp")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    load_start = os.getloadavg()
    rows = []
    for name in names:
        spec = specs[name]
        # drop the PREVIOUS query's garbage before timing this one —
        # in-suite single reps measured 1.3-1.8x isolated warm time from
        # neighbors' heap pressure alone (VERDICT r5 #4)
        spark._jvm.System.gc()  # type: ignore[attr-defined]
        # warm: run once to trigger JIT/codegen caches & file listing
        spec.fn(spark, sf_dir).count()
        st = []
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            st.append(time.perf_counter() - t0)
        dt = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(spec.oracle).fetchall()
            dt.append(time.perf_counter() - t0)
        s, d = statistics.median(st), statistics.median(dt)
        rows.append((name, s, d, s / d if d > 0 else float("inf")))
        print(f"# {name}: spark={s:.3f}s duckdb={d:.3f}s ratio={s/d:.2f}", flush=True)

    rows.sort(key=lambda r: -r[3])
    print("\n| query | spark_s | duckdb_s | ratio |")
    print("|---|---|---|---|")
    for name, s, d, r in rows:
        flag = " ⚠" if r > 2.0 else ""
        print(f"| {name} | {s:.3f} | {d:.3f} | {r:.2f}{flag} |")
    over = [r[0] for r in rows if r[3] > 2.0]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n": len(rows),
                "reps": reps,
                "load_start": [round(x, 2) for x in load_start],
                "load_end": [round(x, 2) for x in os.getloadavg()],
                "over_2x": over,
                "spark_total": round(sum(r[1] for r in rows), 3),
                "duckdb_total": round(sum(r[2] for r in rows), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
