"""End-to-end KG-construction driver (the spark-submit entry point).

    python -m shacl_rust_spark.pipeline.run \
        --sf-dir /root/testdata/sf0.01 --out /tmp/kg_out [--cpus 8]

Phases (north_rule): pages → extract → mentions → link → sameAs CC →
canonicalize → SHACL-validate → partitioned emit with manifest resume.
Prints one JSON line of stage metrics; exit code 0 on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run_pipeline(spark, sf_dir: str, out_dir: str, replicas: int = 1) -> dict:
    from pyspark.sql import functions as F

    from . import assemble, cc, emit, extract, link, pages

    t0 = time.time()
    metrics: dict = {}
    phases: dict = {}
    _last = [t0]

    def mark(name: str) -> None:
        now = time.time()
        phases[name] = round(now - _last[0], 2)
        _last[0] = now

    pg = pages.pages(spark, sf_dir, replicas)
    # page count from parquet footer metadata (driver-side, no Spark
    # job) — an exact count without materializing the synthesized pages
    import pyarrow.parquet as pq

    n_pages = (
        pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows * replicas
        + pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    )
    fingerprint = emit._fingerprint(sf_dir, n_pages)
    prior = emit.read_committed(out_dir, fingerprint)
    if prior is not None:
        prior["resumed"] = True
        return prior

    metrics["pages"] = n_pages
    mark("setup")

    extracted = extract.extract_text(pg)
    mentions = extract.detect_mentions(extracted).localCheckpoint(eager=True)
    metrics["mentions"] = mentions.count()
    mark("extract_mentions")

    edict = pages.entity_dict(spark, sf_dir)
    linked = link.link_mentions(mentions, edict).localCheckpoint(eager=True)
    by_method = {
        r["link_method"]: r["n"]
        for r in linked.where(F.col("kind") == "lives_in")
        .groupBy("link_method").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metrics["links"] = by_method
    mark("link")

    # head-entity mention histogram via the salted two-stage aggregate
    top = (
        link.salted_count(
            linked.where(F.col("entity_id").isNotNull()), "entity_id"
        )
        .orderBy(F.col("n_mentions").desc())
        .limit(1)
        .collect()
    )
    if top:
        metrics["head_entity"] = {
            "entity": top[0]["entity_id"], "mentions": top[0]["n_mentions"]
        }
    mark("head_entity")

    cand = assemble.assemble_triples(linked)
    edges = assemble.sameas_edges(cand)
    labels = cc.connected_components(edges)
    metrics["cc_nodes"] = labels.count()
    metrics["cc_components"] = labels.select("component").distinct().count()
    mark("cc")

    canon = cc.canonicalize(
        cand.where(F.col("p") != assemble.P_SAME_AS).select(
            "s", "p", "o", "o_is_iri"
        ),
        labels,
    ).dropDuplicates(["s", "p", "o"])

    valid, violations = emit.validate_candidates(spark, canon, edict)
    valid = valid.localCheckpoint(eager=True)
    metrics["violations"] = violations.count()
    mark("validate")
    metrics["emitted_triples"] = valid.count()

    # single scan of `valid`: explode (s, o-if-iri) instead of a two-
    # branch union that would read the checkpointed frame twice
    nodes = (
        valid.select(
            F.explode(
                F.array_compact(
                    F.array(F.col("s"),
                            F.when(F.col("o_is_iri"), F.col("o")))
                )
            ).alias("node")
        )
        .dropDuplicates(["node"])
    )
    metrics["nodes"] = nodes.count()
    mark("emit_counts")
    metrics["phases"] = phases
    metrics["wall_secs"] = round(time.time() - t0, 3)
    metrics["triples_per_sec"] = round(
        metrics["emitted_triples"] / max(metrics["wall_secs"], 1e-9), 1
    )

    commit = emit.write_triples(
        valid.select("s", "p", "o", "o_is_iri"), nodes, out_dir, fingerprint, metrics
    )
    mark("write")
    metrics["phases"] = phases
    commit["resumed"] = False
    return commit


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1,
                    help="input scale-up factor (disjoint key spaces)")
    ap.add_argument("--master", default=None,
                    help="Spark master (default local[--cpus]); e.g. "
                         "local-cluster[4,2,6144] for multi-executor runs")
    ap.add_argument("--executor-mem", default=None,
                    help="spark.executor.memory for cluster masters (the "
                         "local-cluster[] mem field only sizes the WORKER; "
                         "executors default to 1g without this)")
    ap.add_argument("--shuffle-partitions", type=int, default=0,
                    help="fixed shuffle partitions (0 = max(cpus, 8)); the "
                         "scaling harness pins this so the job is identical "
                         "at both cluster sizes")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    master = args.master or f"local[{args.cpus}]"
    shuffle = args.shuffle_partitions or max(args.cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName("kg-construct")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g" if "cluster" in master else "28g")
        .config("spark.sql.adaptive.enabled", "true")
        # checkpointed blocks pin to the executor that wrote them; the
        # default 3 s locality wait then stalls EVERY stage wave that
        # reads them from another executor — on a multi-executor run
        # this serializes tens of seconds of pure waiting
        .config("spark.locality.wait", "0s")
    )
    if args.executor_mem:
        builder = builder.config("spark.executor.memory", args.executor_mem)
    evdir = os.environ.get("KG_EVENTLOG_DIR")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evdir)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if "cluster" in master:
        # multi-executor run: ship the package to executors the same way
        # spark-submit --py-files would
        import shutil
        import tempfile

        import shacl_rust_spark

        pkg_dir = os.path.dirname(os.path.dirname(
            os.path.abspath(shacl_rust_spark.__file__)))
        zip_base = os.path.join(tempfile.gettempdir(), "shacl_rust_spark_pkg")
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=pkg_dir, base_dir="shacl_rust_spark")
        spark.sparkContext.addPyFile(zip_path)

    commit = run_pipeline(spark, args.sf_dir, args.out, args.replicate)
    print(json.dumps(commit))
    return 0


if __name__ == "__main__":
    sys.exit(main())
