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

    # headline: validated-emission throughput — total triples of the full
    # graph pushed through validation + violation anti-join, per second.
    from pyspark.sql import functions as F
    from shacl_rust_spark import tabular as T
    from shacl_rust_spark import queries_shacl as Q

    t0 = time.time()
    triples = T.full_graph(spark, sf_dir)
    shapes = """
    ex:CustShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] ;
      sh:property [ sh:path ex:mktsegment ; sh:maxLength 8 ] ;
      sh:property [ sh:path ex:nation ; sh:class ex:Nation ] .
    ex:OrderShape a sh:NodeShape ;
      sh:targetClass ex:Order ;
      sh:property [ sh:path ex:status ; sh:hasValue "O" ] .
    ex:LineShape a sh:NodeShape ;
      sh:targetClass ex:Line ;
      sh:property [ sh:path ex:discount ; sh:lessThan ex:tax ] .
    """
    violations = Q._validate(spark, triples, shapes)
    bad_focus = violations.select("focus").dropDuplicates(["focus"])
    emitted = triples.join(
        bad_focus, triples["s"] == bad_focus["focus"], "left_anti"
    )
    n_emitted = emitted.count()
    emit_secs = time.time() - t0
    timings["validated_emission"] = round(emit_secs, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "validated_triples_per_sec",
        "value": round(n_emitted / emit_secs, 1),
        "unit": "triples/sec",
        "total_sec": total,
        "emitted_triples": n_emitted,
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
