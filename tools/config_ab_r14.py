"""Round-14 session-config A/B (guide §1.2 step 3, §2.2, §3.1, §9).

Runs a representative registry slice under several Spark conf variants,
each in a fresh SparkSession (same JVM, restarted context), warm-up +
median-of-3 noop-sink timings per query. Variants are the guide's own
recommendations, all scale-principled (nothing local[32]-only):

  base   — get_spark() as shipped
  shj    — preferSortMergeJoin=false + AQE SMJ->SHJ local-map threshold
           (guide §3.1: hash join without sort when a partition fits)
  coal   — AQE coalescePartitions.parallelismFirst=false +
           advisoryPartitionSizeInBytes=64m (guide §2.2: size-targeted
           post-shuffle partitions instead of parallelism-first)
  both   — shj + coal

Usage: python tools/config_ab_r14.py [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # board top (pair-join family + trainers)
    "kmeans_train",
    "dedup_semantic_clusters",
    "corpus_tfidf_pairs",
    "dedup_clusters",
    "dedup_jaccard_prefix",
    "dedup_threshold_curve",
    "pipeline_dedup_account",
    "dedup_keep_best",
    "dedup_minhash_eval",
    "dedup_minhash_lsh",
    "emb_threshold_curve",
    "dedup_embedding",
    "dedup_ngram_jaccard",
    "dedup_text_knn",
    "kmeans_update_step",
    "emb_pca_power_train",
    "text_ccnet_bucket",
    "dedup_containment",
    "graph_triangle_count",
    "basket_rules",
    # mid-board representatives (relational / window / text / ann)
    "q61_waiting_suppliers",
    "emb_knn_consistency",
    "ann_knn_graph",
    "text_heaps_law",
    "q21_top_urls",
    "ann_cosine_topk",
    "corpus_mix_temperature",
    "events_burst_detection",
]

VARIANTS = {
    "base": {},
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
    },
    "coal": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    "both": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    # guide §4.2: larger Arrow batches amortize the per-batch transpose
    # for narrow numeric payloads (the 64-dim embedding pandas_udfs)
    "arrow64k": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    },
    # drift sentinel: re-run the stock config last — if base2 deviates
    # from base the host moved under us and the block comparison is void
    "base2": {},
}

N_RUNS = 3


def main() -> None:
    names = sys.argv[1:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from pyspark.sql import SparkSession

    from duckdb_httpd_log_spark import get_spark
    import duckdb_httpd_log_spark.operators  # noqa: F401
    from duckdb_httpd_log_spark.plans.registry import REGISTRY

    all_results: dict[str, dict[str, float]] = {}
    for vname, confs in VARIANTS.items():
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        os.environ["SPARK_GRAFT_AB_VARIANT"] = vname
        builder_spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
        # get_spark caches via getOrCreate; apply variant confs on a
        # fresh context so join-strategy/AQE settings actually take
        builder_spark.stop()
        b = SparkSession.builder.appName(f"r14-ab-{vname}").master(f"local[{cpus}]")
        base_confs = {
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.ansi.enabled": "false",
            "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
            "spark.sql.shuffle.partitions": str(cpus),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "134217728",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        }
        for k, v in {**base_confs, **confs}.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")

        vres: dict[str, float] = {}
        for name in names:
            qd = REGISTRY.get(name)
            if qd is None:
                continue
            spark.sparkContext.setJobDescription(f"ab {vname} warm: {name}")
            qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for i in range(N_RUNS):
                spark.sparkContext.setJobDescription(f"ab {vname} {i}: {name}")
                t0 = time.perf_counter()
                qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            vres[name] = round(statistics.median(runs), 4)
            print(f"{vname} {name}: {vres[name]}", flush=True)
        all_results[vname] = {"total": round(sum(vres.values()), 3), **vres}
        print(f"== {vname} total: {all_results[vname]['total']}", flush=True)
        spark.stop()

    with open("/tmp/config_ab_r14.json", "w") as fh:
        json.dump(all_results, fh, indent=1)
        fh.write("\n")
    base_t = all_results.get("base", {}).get("total")
    for vname, res in all_results.items():
        print(f"{vname}: total={res['total']} vs base {base_t}")


if __name__ == "__main__":
    main()
