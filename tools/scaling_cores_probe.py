"""Core-count scaling probe at a scaled-up SF (r14 verdict item 6).

At bench SF (sf0.1) the headline queries are sub-second and
scheduling-bound, so the 8-core bench BEATS the 32-core one and the
core-count sweep says nothing about the 100 TB parallelism story.
This probe builds the K×-scaled lake (``bench_scaling.build_scaled_dir``
— sf0.1 × 10 ≈ sf1 for the scaled tables), then times the heaviest
catalog entries at 8 and at 32 cores IN SEPARATE PROCESSES (the
master is fixed per JVM) against the SAME pre-split file layout, and
prints per-query t8/t32 ratios. A query doing real parallel work
should land well above 1 (ideal 4.0 at 4x the cores); a ratio pinned
near 1 means the query is serial/barrier-bound at this scale.

Usage: python tools/scaling_cores_probe.py [K] [query ...]
Output: one JSON line {"scale": K, "cores": [8, 32],
"queries": {name: {"t8": s, "t32": s, "ratio": r}}}; also written to
SCALING_CORES_PROBE.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the heaviest bench entries by the r14/r15 driver readings, spanning
# the iterative-graph, LSH/dedup, BPE, label-prop, bloom and
# ordered-prefix families
HEAVY = [
    "customer_entity_resolution",
    "doc_link_components",
    "doc_link_coreness",
    "doc_link_kcore",
    "emb_label_prop_cells",
    "doc_bpe_learn_merges",
    "doc_bloom_prefilter",
    "doc_minhash_exact_dup_pairs",
    "doc_ngram_jaccard_pairs",
    "customer_blocking_quality",
    "doc_source_gini",
    "customer_name_neardup_pairs",
]


def main() -> None:
    argv = sys.argv[1:]
    k = int(argv[0]) if argv and argv[0].isdigit() else 10
    names = [a for a in argv if not a.isdigit()] or HEAVY

    # 1. build the scaled dir once (32 cores; cached by tag) and
    #    pre-split the bench lake for it so BOTH core counts read the
    #    exact same files
    build = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r)\n"
            "from tools import bench_scaling as bs\n"
            "import bench\n"
            "from aws_sql_server_to_s3_datalake_etl_migration_spark."
            "session import get_spark\n"
            "spark = get_spark(app_name='scale-prep')\n"
            "d = bs.build_scaled_dir(spark, %d)\n"
            "import os; os.environ['SPARK_GRAFT_SF_DIR'] = d\n"
            "bench.SF_DIR = d\n"
            "bd, _ = bench.prepare_bench_lake(spark, d)\n"
            "print(d)"
        ) % (REPO_ROOT, k)],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    )
    scaled_dir = build.stdout.strip().splitlines()[-1]
    print(f"# scaled dir: {scaled_dir}", file=sys.stderr)

    results: dict[int, dict] = {}
    for cores in (32, 8):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cores)
        env["SPARK_GRAFT_SF_DIR"] = scaled_dir
        env.setdefault("SPARK_GRAFT_BENCH_ITERS", "3")
        run = subprocess.run(
            [sys.executable, "tools/bench_one.py", "--iters",
             env["SPARK_GRAFT_BENCH_ITERS"], *names],
            cwd=REPO_ROOT,
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(run.stderr)
        if run.returncode != 0:
            raise SystemExit(f"bench_one at {cores} cores failed")
        results[cores] = json.loads(run.stdout.strip().splitlines()[-1])

    out = {
        "scale": k,
        "cores": [8, 32],
        "queries": {
            n: {
                "t8": results[8][n]["min"],
                "t32": results[32][n]["min"],
                "ratio": round(
                    results[8][n]["min"] / results[32][n]["min"], 2
                )
                if results[32][n]["min"]
                else None,
            }
            for n in names
            if n in results[8] and n in results[32]
        },
    }
    line = json.dumps(out)
    with open(os.path.join(REPO_ROOT, "SCALING_CORES_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(line)


if __name__ == "__main__":
    main()
