"""Round-14 optimization profiler: per-query plan capture + isolated timing.

For each named registry query (default: the board's slowest ones):
  - captures .explain("formatted") into plans/r15/<name>_<tag>.txt
  - times the computation against the noop sink (guide section 1.4) so
    the measurement excludes driver-side result pull, median of N
  - labels jobs via setJobDescription (guide section 1.5)

Usage: python tools/profile_r15.py <tag> [query ...]
  tag is 'before' or 'after' (the plans/r15 filename suffix).
  With no queries given, profiles the TOP set below.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = [
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
    "dedup_cross_split_near",
    "kmeans_update_step",
    "emb_pca_power_train",
    "text_ccnet_bucket",
    "dedup_containment",
    "graph_triangle_count",
    "basket_rules",
    "bpe_train",
    "bpe_vocab_stats",
]

N_RUNS = 5


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from duckdb_httpd_log_spark import get_spark
    import duckdb_httpd_log_spark.operators  # noqa: F401
    from duckdb_httpd_log_spark.plans.registry import REGISTRY

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)

    results: dict[str, dict] = {}
    import gc

    for name in names:
        qd = REGISTRY.get(name)
        if qd is None:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        df = qd.spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())

        # warm-up (codegen/JIT/broadcast), then noop-sink timed loop
        spark.sparkContext.setJobDescription(f"r15 {tag} warmup: {name}")
        qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(N_RUNS):
            spark.sparkContext.setJobDescription(f"r15 {tag} run{i}: {name}")
            t0 = time.perf_counter()
            qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        if med > 1.5 * min(runs):  # same spike guard as bench.py
            runs2 = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs2.append(time.perf_counter() - t0)
            med = min(med, statistics.median(runs2))
        plan = buf.getvalue()
        results[name] = {
            "noop_median_s": round(med, 4),
            "min_s": round(min(runs), 4),
            "exchanges": plan.count("Exchange"),
            "scans": plan.count("Scan parquet"),
            "arrow_eval": plan.count("ArrowEvalPython"),
            "batch_eval": plan.count("BatchEvalPython"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)
        gc.collect()

    with open(os.path.join(out_dir, f"profile_{tag}.json"), "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
