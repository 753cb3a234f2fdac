"""Self-check mirroring the driver's CORRECTNESS gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir, compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    # --artifact PATH writes the per-query results as JSON (the
    # committed full-oracle evidence, e.g. CORRECTNESS_full_r3.json) in
    # the driver's CORRECTNESS_r{N}.json row shape
    argv = list(sys.argv[1:])
    artifact = None
    if "--artifact" in argv:
        i = argv.index("--artifact")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--artifact PATH] [sf_dir] "
                  "[query ...]", file=sys.stderr)
            return 2
        artifact = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": str(exc)[:300]}
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            results[name] = {"rows_match": len(srows) > 0,
                             "schema_match": None, "hash_match": None,
                             "spark_rows": len(srows), "oracle_rows": None,
                             "err": None, "rows_only": True}
            print(f"ok?  {name}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if not srows:
                print(f"     WARNING {name}: empty result")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None,
                             "err": f"oracle: {str(exc)[:300]}"}
            print(f"FAIL {name}: oracle error: {exc}")
            continue
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False)]
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": sh == oh,
            "spark_rows": len(srows), "oracle_rows": len(orows),
            "err": None,
        }
        status = "PASS" if (len(srows) == len(orows)
                            and sorted(scols) == sorted(ocols)
                            and sh == oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: spark {len(srows)} rows, oracle {len(orows)} "
              f"rows, hash {'==' if sh == oh else sh + ' != ' + oh} "
              f"[{time.time()-t0:.1f}s]")
        if status == "FAIL" and srows and orows:
            print(f"     spark sample: {srows[:2]}\n     oracle sample: {orows[:2]}")
        if status == "PASS" and not srows:
            print(f"     WARNING {name}: empty-vs-empty match (weak)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if artifact:
        import json

        with open(artifact, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                       "failures": failures, "queries": results}, f, indent=1)
        print(f"artifact written: {artifact}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
