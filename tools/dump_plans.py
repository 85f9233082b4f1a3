"""Dump ``explain("formatted")`` for catalog queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [names...]

Writes ``plans/<tag>/<name>_<suffix>.txt`` for each query (default: the
bench HEADLINE+EXTENDED sets) against the same re-split lake layout the
bench times, so the captured plans are the plans the bench runs.
Explain is driver-side only — no job executes — so this is safe to run
alongside other work without disturbing timings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from aws_sql_server_to_s3_datalake_etl_migration_spark import (  # noqa: E402
    workloads,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark(app_name="dump-plans")
    bench_dir, _ = bench.prepare_bench_lake(spark, bench.SF_DIR)
    qs = workloads.queries()
    if not names:
        names = [n for n in bench.HEADLINE + bench.EXTENDED if n in qs]
    out_dir = os.path.join(bench.REPO_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"# {name}: not in catalog", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, bench_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
            print(f"# {name}: {plan.strip()}", file=sys.stderr)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
