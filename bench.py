"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf", ...}.

The headline figure is validated-triples-emitted/sec through the full
SHACL validation spine (unpivot → targets → paths → constraints →
violations → anti-join emission), the BASELINE.json metric. Individual
query timings are reported per query.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shacl-rust-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers so per-query numbers are comparable
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    for name, fn in qs.items():
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # headline: the full KG pipeline (pages → extract → link → CC →
    # SHACL-validate → partitioned emit), triples emitted per second —
    # the BASELINE.json metric.
    import shutil
    import tempfile

    from shacl_rust_spark.pipeline.run import run_pipeline

    out_dir = tempfile.mkdtemp(prefix="kg_bench_")
    try:
        t0 = time.time()
        commit = run_pipeline(spark, sf_dir, out_dir)
        emit_secs = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    n_emitted = commit["metrics"]["emitted_triples"]
    timings["kg_pipeline"] = round(emit_secs, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "validated_triples_per_sec",
        "value": round(n_emitted / emit_secs, 1),
        "unit": "triples/sec",
        "total_sec": total,
        "emitted_triples": n_emitted,
        "pipeline_metrics": commit["metrics"],
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
