#!/usr/bin/env python
"""Run any registered query by name against a dataset directory.

The user-facing entry point for ad-hoc work (bench.py and parity.py are
harnesses; this is the "just run it" tool):

    python tools/run_query.py q1_pricing_summary                # sf0.1
    python tools/run_query.py q_dedup_minhash /root/testdata/sf0.01
    python tools/run_query.py q_triangle_count --explain        # plan only
    python tools/run_query.py q_knn_join --json                 # JSON lines
    python tools/run_query.py --list dedup                      # discovery
    python tools/run_query.py --oracle q_semdedup               # show SQL twin

Exit code 2 on an unknown name (with close-match suggestions).
"""

from __future__ import annotations

import difflib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    as_json = "--json" in args
    show_oracle = "--oracle" in args
    list_mode = "--list" in args
    args = [a for a in args if not a.startswith("--")]

    from pulsar_lunar_spark.queries import all_queries

    specs = all_queries()

    if list_mode:
        needle = (args[0] if args else "").lower()
        for name, spec in sorted(specs.items()):
            hay = f"{name} {' '.join(spec.tags)}".lower()
            if needle in hay:
                tags = ", ".join(spec.tags)
                print(f"{name:36s} [{tags}]")
        return 0

    if not args:
        print(__doc__)
        return 2
    name = args[0]
    if name not in specs:
        close = difflib.get_close_matches(name, specs, n=5, cutoff=0.4)
        print(f"unknown query {name!r}", file=sys.stderr)
        if close:
            print("did you mean: " + ", ".join(close), file=sys.stderr)
        return 2
    spec = specs[name]

    if show_oracle:
        print(spec.oracle or "-- rows-only query: no SQL oracle registered")
        return 0

    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pulsar_lunar_spark.session import get_spark

    spark = get_spark("pl-run")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, sf_dir)
    if explain:
        df.explain("formatted")
        return 0
    if as_json:
        for row in df.toJSON().toLocalIterator():
            print(row)
        return 0
    df.show(100, truncate=False)
    n = df.count()
    print(f"-- {name}: {n} rows from {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
