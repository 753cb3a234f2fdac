"""Driver contract for the spark-graft builder (PySpark target).

queries() entries run the REAL shacl_rust_spark validator engine over
triples unpivoted from the star-schema parquet tables; oracle_sql()
gives each one an equivalent ANSI-SQL twin DuckDB can check at sf=0.01.
Column names are aligned pairwise; outputs are strings/longs only so the
value-hash can never drift on floating-point formatting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-graph SHACL validation report summary at sf0.001."""
    from shacl_rust_spark import queries_shacl as Q

    return Q.shacl_report_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from shacl_rust_spark import queries_shacl as Q

    return {
        "shacl_min_count": Q.shacl_min_count,
        "shacl_max_count": Q.shacl_max_count,
        "shacl_class": Q.shacl_class,
        "shacl_min_inclusive": Q.shacl_min_inclusive,
        "shacl_pattern": Q.shacl_pattern,
        "shacl_max_length": Q.shacl_max_length,
        "shacl_in": Q.shacl_in,
        "shacl_has_value": Q.shacl_has_value,
        "shacl_unique_lang": Q.shacl_unique_lang,
        "shacl_closed": Q.shacl_closed,
        "shacl_less_than": Q.shacl_less_than,
        "shacl_logical_or": Q.shacl_logical_or,
        "shacl_qualified_min": Q.shacl_qualified_min,
        "shacl_path_kleene": Q.shacl_path_kleene,
        "shacl_report_summary": Q.shacl_report_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "shacl_min_count": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey HAVING count(o_orderkey) < 5
        """,
        "shacl_max_count": f"""
            SELECT '{EX}nation/' || n_nationkey AS focus
            FROM nation JOIN customer ON c_nationkey = n_nationkey
            WHERE n_regionkey <> 0
            GROUP BY n_nationkey HAVING count(*) > 50
        """,
        "shacl_class": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   '{EX}nation/' || c_nationkey AS bad_nation
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE n_regionkey = 0
        """,
        "shacl_min_inclusive": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_acctbal < 0
        """,
        "shacl_pattern": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE NOT regexp_matches(c_name, '^Customer#[0-9]*[02468]$')
        """,
        "shacl_max_length": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   c_mktsegment AS segment
            FROM customer WHERE octet_length(encode(c_mktsegment)) > 8
        """,
        "shacl_in": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   c_mktsegment AS segment
            FROM customer
            WHERE c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
        """,
        "shacl_has_value": f"""
            SELECT '{EX}order/' || o_orderkey AS focus
            FROM orders WHERE o_orderstatus <> 'O'
        """,
        "shacl_unique_lang": f"""
            SELECT '{EX}src/' || source AS focus, lang
            FROM (SELECT source, lang,
                         row_number() OVER (PARTITION BY source, lang ORDER BY text) AS rn
                  FROM documents) d
            WHERE rn > 1
        """,
        "shacl_closed": f"""
            SELECT '{EX}order/' || o_orderkey AS focus,
                   'clerk#' || (o_orderkey % 1000) AS clerk
            FROM orders WHERE o_orderkey % 10 = 0
        """,
        "shacl_less_than": f"""
            -- graph = SET of triples: (orderkey, linenumber) collides in the
            -- synthetic data, so values/taxes are DISTINCT sets per subject;
            -- ANY-semantics: value violates iff it is < no tax value.
            WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln,
                              l_discount AS v FROM lineitem),
                 t AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              max(l_tax) AS mt
                       FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_tax
                             FROM lineitem) x GROUP BY 1, 2)
            SELECT '{EX}line/' || ok || '-' || ln AS focus
            FROM d JOIN t USING (ok, ln) WHERE NOT (v < mt)
        """,
        "shacl_logical_or": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE NOT (c_acctbal >= 0) AND c_mktsegment <> 'BUILDING'
        """,
        "shacl_qualified_min": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer LEFT JOIN orders
              ON o_custkey = c_custkey AND o_totalprice >= 250000
            GROUP BY c_custkey HAVING count(o_orderkey) < 3
        """,
        "shacl_path_kleene": f"""
            SELECT '{EX}nation/' || n_nationkey AS focus
            FROM nation JOIN region ON r_regionkey = n_regionkey
            WHERE n_regionkey <> 0 AND r_regionkey % 2 = 0
        """,
        "shacl_report_summary": f"""
            SELECT component, count(*) AS n_violations FROM (
              SELECT '{SH}MinInclusiveConstraintComponent' AS component
                FROM customer WHERE c_acctbal < 0
              UNION ALL
              SELECT '{SH}MaxLengthConstraintComponent'
                FROM customer WHERE octet_length(encode(c_mktsegment)) > 8
              UNION ALL
              SELECT '{SH}ClassConstraintComponent'
                FROM customer JOIN nation ON n_nationkey = c_nationkey
                WHERE n_regionkey = 0
              UNION ALL
              SELECT '{SH}HasValueConstraintComponent'
                FROM orders WHERE o_orderstatus <> 'O'
            ) v GROUP BY component
        """,
    }
