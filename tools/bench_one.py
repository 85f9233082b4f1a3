"""Time individual catalog queries in isolation (guide §1.1/§1.4).

Usage: python tools/bench_one.py [--iters N] [--noop] name [name...]

Runs each named query against the same re-split lake layout bench.py
uses and reports min/median wall seconds. ``--noop`` times
``df.write.format("noop")`` (computes every column, guide §1.4)
alongside the bench's ``count()`` action so the two methodologies can
be compared; the bench contract itself keeps ``count()``.

Prints per-query lines to stderr and one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from aws_sql_server_to_s3_datalake_etl_migration_spark import (  # noqa: E402
    workloads,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = sys.argv[1:]
    iters = 5
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--iters":
            iters = int(args[i + 1])
            i += 2
        elif args[i] == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    spark = get_spark(app_name="bench-one")
    bench_dir, _ = bench.prepare_bench_lake(spark, bench.SF_DIR)
    qs = workloads.queries()
    # Warm-up: JVM + parquet footers (untimed, same as bench.py).
    qs["global_watermark_max"](spark, bench_dir).collect()
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"# {name}: not in catalog", file=sys.stderr)
            continue
        samples, noops = [], []
        rows = 0
        for _ in range(iters):
            spark.sparkContext.setJobDescription(f"bench_one: {name}")
            t0 = time.time()
            df = qs[name](spark, bench_dir)
            rows = df.count()
            samples.append(time.time() - t0)
            # consumption boundary (untimed), mirroring bench.py:
            # release persisted results so every iteration recomputes
            spark.catalog.clearCache()
            if use_noop:
                t0 = time.time()
                df = qs[name](spark, bench_dir)
                df.write.format("noop").mode("overwrite").save()
                noops.append(time.time() - t0)
                spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        rec = {
            "min": round(min(samples), 3),
            "med": round(statistics.median(samples), 3),
            "rows": rows,
            "load_1m": round(os.getloadavg()[0], 2),
        }
        if noops:
            rec["noop_min"] = round(min(noops), 3)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
