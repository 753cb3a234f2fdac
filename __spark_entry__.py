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
    from shacl_rust_spark import queries_kg as K
    from shacl_rust_spark import queries_shacl as Q

    return {
        "kg_pages": K.kg_pages,
        "kg_extract_text": K.kg_extract_text,
        "kg_mentions": K.kg_mentions,
        "kg_entity_link": K.kg_entity_link,
        "kg_link_stats": K.kg_link_stats,
        "kg_connected_components": K.kg_connected_components,
        "kg_validated_triples": K.kg_validated_triples,
        "kg_triple_counts": K.kg_triple_counts,
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


# Shared closed-form derivations of the pages.py sentence grammar —
# every pipeline-stage oracle builds on these (key-modulo seeds).
_KG_CTE = f"""
WITH osurf AS (
  SELECT o_orderkey AS o, o_custkey AS k,
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE o_orderkey % 25 END AS nk,
         (o_orderkey % 5 = 0) AS is_alias,
         o_totalprice,
         CASE WHEN o_orderkey % 11 = 0 THEN 'XYZZY_' || (o_orderkey % 3)
              WHEN o_orderkey % 7 = 0
                THEN 'NATION_' || (CASE WHEN o_orderkey % 2 = 0 THEN 1
                                        ELSE o_orderkey % 25 END) || 'X'
              ELSE 'NATION_' || (CASE WHEN o_orderkey % 2 = 0 THEN 1
                                      ELSE o_orderkey % 25 END) END AS nation_surface,
         CASE WHEN o_orderkey % 5 = 0 THEN 'Client-' || o_custkey
              ELSE 'Customer#' || o_custkey END AS subj_surface
  FROM orders
),
opage AS (
  SELECT *,
         'http://ex' || (k % 100) || '.test/o' || o AS url,
         'Order ' || o || ' was placed by ' || subj_surface || '. '
           || subj_surface || ' lives in ' || nation_surface
           || '. Total value ' || CAST(floor(o_totalprice) AS BIGINT) || ' USD.'
           || CASE WHEN o % 25 = 0
                THEN ' Client-' || k || ' is also known as Customer#' || k
                  || '. Client2-' || k || ' is also known as Client-' || k || '.'
              WHEN o % 5 = 0
                THEN ' Client-' || k || ' is also known as Customer#' || k || '.'
              ELSE '' END AS text
  FROM osurf
),
dpage AS (
  SELECT 'http://docs.test/d' || doc_id AS url, lang, text,
         'Doc ' || doc_id AS title
  FROM documents
),
canon AS (
  SELECT c_custkey AS k,
         CASE WHEN EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c_custkey
                             AND o2.o_orderkey % 5 = 0)
              THEN '{EX}alt/' || c_custkey
              ELSE '{EX}cust/' || c_custkey END AS subj
  FROM customer
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "kg_pages": _KG_CTE + """
            SELECT url, 'en' AS lang, text,
                   octet_length(encode('<html><head><title>Order ' || o
                     || '</title></head><body><p>' || text
                     || '</p></body></html>')) AS html_bytes
            FROM opage
            UNION ALL
            SELECT url, lang, text,
                   octet_length(encode('<html><head><title>' || title
                     || '</title></head><body><p>' || text
                     || '</p></body></html>')) AS html_bytes
            FROM dpage
        """,
        "kg_extract_text": _KG_CTE + """
            SELECT url, text FROM opage
            UNION ALL SELECT url, text FROM dpage
        """,
        "kg_mentions": _KG_CTE + """
            SELECT url, 'placed_by' AS kind, 'Order-' || o AS subj_surface,
                   subj_surface AS obj_surface FROM opage
            UNION ALL
            SELECT url, 'lives_in', subj_surface, nation_surface FROM opage
            UNION ALL
            SELECT url, 'same_as', 'Client-' || k, 'Customer#' || k
            FROM opage WHERE o % 5 = 0
            UNION ALL
            SELECT url, 'same_as', 'Client2-' || k, 'Client-' || k
            FROM opage WHERE o % 25 = 0
        """,
        "kg_entity_link": f"""{_KG_CTE}
            SELECT url, nation_surface AS obj_surface,
                   CASE WHEN o % 11 = 0 THEN NULL
                        ELSE '{EX}nation/' || nk END AS entity_id,
                   CASE WHEN o % 11 = 0 THEN 'unlinked'
                        WHEN o % 7 = 0 THEN 'fuzzy'
                        ELSE 'exact' END AS link_method
            FROM opage
        """,
        "kg_link_stats": f"""{_KG_CTE}
            SELECT '{EX}nation/' || nk AS entity_id,
                   count(*) AS n_mentions
            FROM osurf WHERE o % 11 <> 0 GROUP BY nk
        """,
        "kg_connected_components": f"""{_KG_CTE},
            ks AS (SELECT o_custkey AS k,
                          bool_or(o_orderkey % 25 = 0) AS has25
                   FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1)
            SELECT '{EX}alt/' || k AS node, '{EX}alt/' || k AS component FROM ks
            UNION ALL
            SELECT '{EX}cust/' || k, '{EX}alt/' || k FROM ks
            UNION ALL
            SELECT '{EX}alt2/' || k, '{EX}alt/' || k FROM ks WHERE has25
        """,
        "kg_validated_triples": f"""{_KG_CTE}
            SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                   '{EX}nation/' || nk AS o
            FROM osurf JOIN canon ON canon.k = osurf.k
            WHERE o % 11 <> 0
            UNION ALL
            SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
            FROM osurf JOIN canon ON canon.k = osurf.k
        """,
        "kg_triple_counts": f"""{_KG_CTE}
            SELECT '{EX}locatedIn' AS p,
                   count(DISTINCT (canon.subj, nk)) AS n_triples
            FROM osurf JOIN canon ON canon.k = osurf.k WHERE o % 11 <> 0
            UNION ALL
            SELECT '{EX}placedBy', count(*) FROM osurf
        """,
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
