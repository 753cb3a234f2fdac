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
import sys
import time


def run_pipeline(spark, sf_dir: str, out_dir: str, replicas: int = 1) -> dict:
    from pyspark.sql import functions as F

    from . import assemble, cc, emit, extract, link, pages

    t0 = time.time()
    metrics: dict = {}

    pg = pages.pages(spark, sf_dir, replicas)
    n_pages = pg.count()
    fingerprint = emit._fingerprint(sf_dir, n_pages)
    prior = emit.read_committed(out_dir, fingerprint)
    if prior is not None:
        prior["resumed"] = True
        return prior

    metrics["pages"] = n_pages

    extracted = extract.extract_text(pg)
    mentions = extract.detect_mentions(extracted).localCheckpoint(eager=True)
    metrics["mentions"] = mentions.count()

    edict = pages.entity_dict(spark, sf_dir)
    linked = link.link_mentions(mentions, edict).localCheckpoint(eager=True)
    by_method = {
        r["link_method"]: r["n"]
        for r in linked.where(F.col("kind") == "lives_in")
        .groupBy("link_method").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metrics["links"] = by_method

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

    cand = assemble.assemble_triples(linked)
    edges = assemble.sameas_edges(cand)
    labels = cc.connected_components(edges)
    metrics["cc_nodes"] = labels.count()
    metrics["cc_components"] = labels.select("component").distinct().count()

    canon = cc.canonicalize(
        cand.where(F.col("p") != assemble.P_SAME_AS).select(
            "s", "p", "o", "o_is_iri"
        ),
        labels,
    ).dropDuplicates(["s", "p", "o"])

    valid, violations = emit.validate_candidates(spark, canon, edict)
    valid = valid.localCheckpoint(eager=True)
    metrics["violations"] = violations.count()
    metrics["emitted_triples"] = valid.count()

    nodes = (
        valid.select(F.col("s").alias("node"))
        .unionByName(valid.where(F.col("o_is_iri")).select(F.col("o").alias("node")))
        .dropDuplicates(["node"])
    )
    metrics["nodes"] = nodes.count()
    metrics["wall_secs"] = round(time.time() - t0, 3)
    metrics["triples_per_sec"] = round(
        metrics["emitted_triples"] / max(metrics["wall_secs"], 1e-9), 1
    )

    commit = emit.write_triples(
        valid.select("s", "p", "o", "o_is_iri"), nodes, out_dir, fingerprint, metrics
    )
    commit["resumed"] = False
    return commit


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1,
                    help="input scale-up factor (disjoint key spaces)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("kg-construct")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "28g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    commit = run_pipeline(spark, args.sf_dir, args.out, args.replicate)
    print(json.dumps(commit))
    return 0


if __name__ == "__main__":
    sys.exit(main())
