"""Live-Iceberg integration check for the pipeline sink.

This container ships no iceberg-spark runtime jars and has no network
(verified: no jar on disk, repo1.maven.org unreachable), so
`tests/test_pipeline.py::test_iceberg_backend_roundtrip` skips here. On
any deployment that has the runtime jar, THIS script exercises the
primary sink branch end-to-end against a real local (hadoop) catalog:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.6.1 \
      scripts/iceberg_integration.py /tmp/iceberg_warehouse

    # or with a pre-downloaded jar:
    spark-submit --jars iceberg-spark-runtime-*.jar \
      scripts/iceberg_integration.py /tmp/iceberg_warehouse

    # or plain python (the script adds the jar itself):
    python scripts/iceberg_integration.py /tmp/iceberg_warehouse \
      --jar /path/to/iceberg-spark-runtime.jar

Checks (each prints PASS/FAIL; nonzero exit on any failure):
  1. catalog detection   — emit.iceberg_catalog() resolves the catalog
  2. partitioned write   — write_triples(backend="iceberg") creates
                           triples/nodes tables partitioned by `p`,
                           returns a live snapshot id
  3. resume hit          — read_committed_iceberg() finds the matching
                           fingerprint
  4. resume miss         — a different fingerprint returns None
  5. snapshot advance    — a second write produces a NEW snapshot id
                           and time travel (VERSION AS OF) still reads
                           the first one
  6. snapshot gone       — dropping the table makes resume return None
  7. partition pruning   — a single-predicate read plans an Iceberg
                           scan with a partition filter (no full scan)
"""

from __future__ import annotations

import argparse
import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

FAILED = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'} {name}" + (f": {detail}" if detail else ""))
    if not ok:
        FAILED.append(name)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("warehouse", nargs="?", default="/tmp/iceberg_warehouse")
    ap.add_argument("--jar", default=None,
                    help="path to iceberg-spark-runtime jar (when not "
                         "launched via spark-submit --packages/--jars)")
    ap.add_argument("--catalog", default="local")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("iceberg-integration")
        .config(f"spark.sql.catalog.{args.catalog}",
                "org.apache.iceberg.spark.SparkCatalog")
        .config(f"spark.sql.catalog.{args.catalog}.type", "hadoop")
        .config(f"spark.sql.catalog.{args.catalog}.warehouse",
                args.warehouse)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
    )
    if args.jar:
        b = b.config("spark.jars", args.jar)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from shacl_rust_spark.pipeline import emit

    # 1. detection
    spark.conf.set("spark.shacl.iceberg.catalog", args.catalog)
    cat = emit.iceberg_catalog(spark)
    check("catalog detection", cat == args.catalog, f"resolved {cat!r}")
    if cat is None:
        print("Iceberg classes not on the classpath — pass --jar or use "
              "spark-submit --packages (see module docstring).")
        return 2

    t = spark.createDataFrame(
        [("s1", "p1", "o1", True), ("s2", "p2", "o2", True),
         ("s3", "p1", "o3", False)],
        ["s", "p", "o", "o_is_iri"],
    )
    n = spark.createDataFrame([("s1",), ("s2",), ("s3",)], ["node"])

    # 2. partitioned write
    c1 = emit.write_triples(t, n, args.warehouse, "fp:a", {"k": 1},
                            backend="iceberg")
    check("partitioned write",
          c1["backend"] == "iceberg" and bool(c1["snapshot_id"])
          and c1["partitions"] == 2,
          f"snapshot {c1['snapshot_id']}, {c1['partitions']} partitions")
    got = spark.table(f"{cat}.kg.triples").count()
    check("readback row count", got == 3, f"{got} rows")

    # 3/4. resume hit / miss
    check("resume hit", emit.read_committed_iceberg(spark, cat, "fp:a")
          is not None)
    check("resume miss on fingerprint",
          emit.read_committed_iceberg(spark, cat, "fp:OTHER") is None)

    # 5. snapshot advance + time travel
    t2 = t.unionByName(spark.createDataFrame(
        [("s4", "p3", "o4", True)], ["s", "p", "o", "o_is_iri"]))
    c2 = emit.write_triples(t2, n, args.warehouse, "fp:b", {"k": 2},
                            backend="iceberg")
    check("snapshot advance", c2["snapshot_id"] != c1["snapshot_id"],
          f"{c1['snapshot_id']} -> {c2['snapshot_id']}")
    old = spark.sql(
        f"SELECT count(*) FROM {cat}.kg.triples "
        f"VERSION AS OF {c1['snapshot_id']}"
    ).collect()[0][0]
    check("time travel to first snapshot", old == 3, f"{old} rows")

    # 6. snapshot gone
    spark.sql(f"DROP TABLE IF EXISTS {cat}.kg.triples")
    check("resume none after table drop",
          emit.read_committed_iceberg(spark, cat, "fp:b") is None)

    # re-create for the pruning check
    emit.write_triples(t2, n, args.warehouse, "fp:c", {}, backend="iceberg")
    # 7. partition pruning on the predicate column
    q = spark.table(f"{cat}.kg.triples").where("p = 'p1'")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    check("partition filter in scan",
          "p1" in plan and ("filters=" in plan or "Filter" in plan),
          "predicate reached the Iceberg scan")

    print(f"\n{len(FAILED)} failures" + (f": {FAILED}" if FAILED else ""))
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
