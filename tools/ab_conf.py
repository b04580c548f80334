"""Session-config A/B: run a fixed op sample under several
SPARK_GRAFT_CONF variants, each in a FRESH process (startup-bound
confs), alternating variants across reps so host drift cancels.

    python tools/ab_conf.py [reps]

Variants are defined in VARIANTS below; per-op numbers are best across
reps (each rep is itself best-of-2 adjacent, bench pass-2 convention).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPS = [
    "scan_projection",
    "q1_pricing_summary",
    "tpch_q5",
    "agg_percentiles",
    "agg_weighted_median",
    "agg_decile_report",
    "window_sessionize",
    "window_rolling_corr",
    "window_hurst_exponent",
    "join_spatial_grid_radius",
    "text_bigram_surprisal",
    "text_langid_ngram_profile",
    "text_textrank_keywords",
    "table_stats_profile_approx",
    "decontam_bloom_filter",
    "ann_ivfpq_topk",
    "embedding_geometric_median",
    "ml_kmeans_lloyd",
    "sample_facility_location",
    "graph_kcore",
    "graph_pagerank",
    "graph_hits_bipartite",
    "sql_recursive_hierarchy",
    "dedup_simhash",
]

VARIANTS: dict[str, str] = {
    "base": "",
    "pfirst": "spark.sql.adaptive.coalescePartitions.parallelismFirst=false",
    "pfirst+adv256": (
        "spark.sql.adaptive.coalescePartitions.parallelismFirst=false;"
        "spark.sql.adaptive.advisoryPartitionSizeInBytes=256m"
    ),
    "pfirst+arrow": (
        "spark.sql.adaptive.coalescePartitions.parallelismFirst=false;"
        "spark.sql.execution.pythonUDF.arrow.enabled=true"
    ),
}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators import all_queries
from parquet_batch_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab_conf")
qs = all_queries()

def mat(df):
    df.write.format("noop").mode("overwrite").save()

for t in ("lineitem", "documents", "embeddings", "events", "orders"):
    mat(load(spark, SF, t).select(F.count(F.lit(1))))
mat(spark.range(spark.sparkContext.defaultParallelism).mapInArrow(lambda it: it, "id long"))
cal = float("inf")
for _ in range(3):
    t0 = time.monotonic()
    mat(spark.range(1 << 31).selectExpr("sum(id) AS s"))
    cal = min(cal, time.monotonic() - t0)
out = {"_cal": round(cal, 3)}
for name in %(ops)r:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        mat(qs[name](spark, SF))
        best = min(best, time.monotonic() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
"""


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, list[dict]] = {k: [] for k in VARIANTS}
    for rep in range(reps):
        for vname, conf in VARIANTS.items():
            env = dict(os.environ)
            env["SPARK_GRAFT_CONF"] = conf
            code = WORKER % {"repo": REPO, "ops": OPS}
            p = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                env=env,
                timeout=1800,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")),
                None,
            )
            if line is None:
                print(f"rep{rep} {vname}: FAILED\n{p.stderr[-800:]}", flush=True)
                continue
            doc = json.loads(line[len("ABRESULT "):])
            results[vname].append(doc)
            print(
                f"rep{rep} {vname}: cal {doc['_cal']:.3f} "
                f"total {sum(v for k, v in doc.items() if k != '_cal'):.1f}",
                flush=True,
            )
    # per-op best across reps, per variant
    summary: dict[str, dict[str, float]] = {}
    for vname, docs in results.items():
        if not docs:
            continue
        summary[vname] = {
            op: min(d[op] for d in docs if op in d) for op in OPS
        }
        summary[vname]["_cal"] = min(d["_cal"] for d in docs)
        summary[vname]["_total"] = round(
            sum(v for k, v in summary[vname].items() if not k.startswith("_")), 2
        )
    with open("/tmp/ab_conf_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    base = summary.get("base", {})
    print(f"\n{'op':34s} " + " ".join(f"{v:>14s}" for v in summary))
    for op in OPS + ["_total"]:
        row = f"{op:34s} "
        for vname in summary:
            val = summary[vname].get(op)
            mark = ""
            if vname != "base" and base.get(op):
                r = val / base[op]
                mark = f"({r:.2f})"
            row += f"{val:7.2f}{mark:>7s} "
        print(row)


if __name__ == "__main__":
    main()
