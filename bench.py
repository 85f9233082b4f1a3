"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed as a full action (count of the result) after a
warm-up of the session; per-query wall time is measured around the
action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_sql_server_to_s3_datalake_etl_migration_spark import workloads
from aws_sql_server_to_s3_datalake_etl_migration_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_policies_ingest",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_item_losses",
    "small_quantity_part_revenue",
    "nation_market_share",
    "disjunctive_filter_revenue",
    "outer_join_nation_order_stats",
    "window_top_orders_per_segment",
    "running_customer_spend",
    "topk_orders",
    "set_ops_customer_cohorts",
    "group_distinct_counts",
    "part_type_margins",
    "merge_upsert_preview",
    "incremental_new_rows",
    "events_scalar_functions",
    "recon_row_counts",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    qs = workloads.queries()
    # Warm up the JVM + parquet footers once, untimed.
    qs["global_watermark_max"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
