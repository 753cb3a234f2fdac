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
    from shacl_rust_spark import queries_ops as O
    from shacl_rust_spark import queries_shacl as Q

    return {
        "dedup_exact": O.dedup_exact,
        "dedup_jaccard": O.dedup_jaccard,
        "dedup_minhash_lsh": O.dedup_minhash_lsh,
        "dedup_components": O.dedup_components,
        "dedup_simhash": O.dedup_simhash,
        "dedup_spans": O.dedup_spans,
        "corpus_select": O.corpus_select,
        "dedup_embedding": O.dedup_embedding,
        "dedup_embedding_lsh": O.dedup_embedding_lsh,
        "ann_cosine_topk": O.ann_cosine_topk,
        "ann_ivf_topk": O.ann_ivf_topk,
        "text_tokens": O.text_tokens,
        "text_quality": O.text_quality,
        "text_langid": O.text_langid,
        "text_fingerprint": O.text_fingerprint,
        "text_vocab": O.text_vocab,
        "text_quantiles": O.text_quantiles,
        "rank_tfidf": O.rank_tfidf,
        "rank_bm25": O.rank_bm25,
        "text_unigram_nll": O.text_unigram_nll,
        "text_bigram_nll": O.text_bigram_nll,
        "text_entropy": O.text_entropy,
        "text_sentences": O.text_sentences,
        "text_classifier": O.text_classifier,
        "rank_postings": O.rank_postings,
        "events_funnel": O.events_funnel,
        "events_retention": O.events_retention,
        "events_rollup": O.events_rollup,
        "events_anomaly": O.events_anomaly,
        "graph_triangles": O.graph_triangles,
        "events_attribution_stream": O.events_attribution_stream,
        "events_attribution_stream_outer":
            O.events_attribution_stream_outer,
        "events_transitions": O.events_transitions,
        "graph_kcore": O.graph_kcore,
        "graph_common_neighbors": O.graph_common_neighbors,
        "sketch_length_quantiles": O.sketch_length_quantiles,
        "events_json_stats": O.events_json_stats,
        "events_pivot": O.events_pivot,
        "graph_copurchase": O.graph_copurchase,
        "curation_profile": O.curation_profile,
        "curation_profile_approx": O.curation_profile_approx,
        "olap_revenue_by_region": O.olap_revenue_by_region,
        "dedup_snapshot_diff": O.dedup_snapshot_diff,
        "sketch_bloom_prefilter": O.sketch_bloom_prefilter,
        "rank_dsir": O.rank_dsir,
        "text_bpe_pairs": O.text_bpe_pairs,
        "cluster_kmeans": O.cluster_kmeans,
        "graph_pagerank": O.graph_pagerank,
        "graph_degrees": O.graph_degrees,
        "dedup_semantic": O.dedup_semantic,
        "dedup_containment": O.dedup_containment,
        "dedup_incremental": O.dedup_incremental,
        "curation_weighted": O.curation_weighted,
        "curation_normalize": O.curation_normalize,
        "sketch_distinct_words": O.sketch_distinct_words,
        "sketch_word_counts": O.sketch_word_counts,
        "pack_sequences": O.pack_sequences,
        "curation_stratified": O.curation_stratified,
        "curation_sample": O.curation_sample,
        "curation_mix": O.curation_mix,
        "curation_pii": O.curation_pii,
        "curation_repetition": O.curation_repetition,
        "curation_domain_stats": O.curation_domain_stats,
        "curation_domain_cap": O.curation_domain_cap,
        "curation_decontaminate": O.curation_decontaminate,
        "pack_chunks": O.pack_chunks,
        "pack_shards": O.pack_shards,
        "multimodal_sniff": O.multimodal_sniff,
        "multimodal_decode": O.multimodal_decode,
        "multimodal_resize": O.multimodal_resize,
        "multimodal_audio_features": O.multimodal_audio_features,
        "multimodal_frames": O.multimodal_frames,
        "events_windowed": O.events_windowed,
        "events_sessionize": O.events_sessionize,
        "events_sessionize_stream": O.events_sessionize_stream,
        "events_asof": O.events_asof,
        "events_gapfill": O.events_gapfill,
        "graph_lpa": O.graph_lpa,
        "graph_bfs": O.graph_bfs,
        "graph_modularity": O.graph_modularity,
        "rank_rrf": O.rank_rrf,
        "text_collocations": O.text_collocations,
        "olap_bucketed_join": O.olap_bucketed_join,
        "curation_winsorize": O.curation_winsorize,
        "olap_zorder_pruning": O.olap_zorder_pruning,
        "olap_scd2": O.olap_scd2,
        "olap_cdc_merge": O.olap_cdc_merge,
        "olap_zorder": O.olap_zorder,
        "olap_pit_join": O.olap_pit_join,
        "olap_cdc_merge_stream": O.olap_cdc_merge_stream,
        "olap_cdc_merge_ooo": O.olap_cdc_merge_ooo,
        "olap_cube": O.olap_cube,
        "olap_mv_incremental": O.olap_mv_incremental,
        "curation_gopher": O.curation_gopher,
        "events_heavy_hitters": O.events_heavy_hitters,
        "rank_eval": O.rank_eval,
        "text_bpe_train": O.text_bpe_train,
        "kg_link_graph": O.kg_link_graph,
        "kg_host_pagerank": O.kg_host_pagerank,
        "curation_url_canonical": O.curation_url_canonical,
        "multimodal_ahash": O.multimodal_ahash,
        "text_bpe_encode": O.text_bpe_encode,
        "text_readability": O.text_readability,
        "graph_hits": O.graph_hits,
        "kg_anchor_text": O.kg_anchor_text,
        "crawl_schedule": O.crawl_schedule,
        "crawl_robots": O.crawl_robots,
        "graph_scc": O.graph_scc,
        "olap_compaction": O.olap_compaction,
        "kg_microdata": O.kg_microdata,
        "crawl_sitemap": O.crawl_sitemap,
        "graph_assortativity": O.graph_assortativity,
        "text_stem": O.text_stem,
        "dedup_sentences": O.dedup_sentences,
        "text_skipgrams": O.text_skipgrams,
        "rank_precision": O.rank_precision,
        "multimodal_scenes": O.multimodal_scenes,
        "olap_pricing_summary": O.olap_pricing_summary,
        "kg_cooccurrence": O.kg_cooccurrence,
        "kg_redirects": O.kg_redirects,
        "kg_rdfs_entailment": O.kg_rdfs_entailment,
        "kg_truth_discovery": O.kg_truth_discovery,
        "events_dedup_stream": O.events_dedup_stream,
        "kg_warc": O.kg_warc,
        "crawl_cdx": O.crawl_cdx,
        "events_windowed_stream": O.events_windowed_stream,
        "events_enrich_stream": O.events_enrich_stream,
        "graph_walks": O.graph_walks,
        "olap_forecast_revenue": O.olap_forecast_revenue,
        "curation_budget": O.curation_budget,
        "olap_shipping_priority": O.olap_shipping_priority,
        "kg_nodes": O.kg_nodes,
        "multimodal_ahash_pairs": O.multimodal_ahash_pairs,
        "text_hashed_features": O.text_hashed_features,
        "text_kn_bigram": O.text_kn_bigram,
        "graph_closeness": O.graph_closeness,
        "olap_salted_join": O.olap_salted_join,
        "olap_grouping_sets": O.olap_grouping_sets,
        "events_active_users": O.events_active_users,
        "curation_url_dedup": O.curation_url_dedup,
        "multimodal_vad": O.multimodal_vad,
        "curation_split": O.curation_split,
        "dedup_simhash_pairs": O.dedup_simhash_pairs,
        "kg_pages": K.kg_pages,
        "kg_extract_text": K.kg_extract_text,
        "kg_mentions": K.kg_mentions,
        "kg_entity_link": K.kg_entity_link,
        "kg_link_stats": K.kg_link_stats,
        "kg_connected_components": K.kg_connected_components,
        "kg_validated_triples": K.kg_validated_triples,
        "kg_entity_salience": K.kg_entity_salience,
        "kg_triple_counts": K.kg_triple_counts,
        "kg_ingest_stream": K.kg_ingest_stream,
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
        "shacl_path_kleene_dist": Q.shacl_path_kleene_dist,
        "shacl_report_summary": Q.shacl_report_summary,
        "shacl_sparql": Q.shacl_sparql,
        "shacl_sparql_optional": Q.shacl_sparql_optional,
        "shacl_sparql_agg": Q.shacl_sparql_agg,
        "shacl_sparql_path": Q.shacl_sparql_path,
        "shacl_sparql_nps": Q.shacl_sparql_nps,
        "shacl_sparql_message": Q.shacl_sparql_message,
        "shacl_sparql_shapes_path": Q.shacl_sparql_shapes_path,
        "shacl_sparql_exists_agg": Q.shacl_sparql_exists_agg,
        "shacl_equals": Q.shacl_equals,
        "shacl_disjoint": Q.shacl_disjoint,
        "shacl_not": Q.shacl_not,
        "shacl_xone": Q.shacl_xone,
        "shacl_and": Q.shacl_and,
        "shacl_node": Q.shacl_node,
        "shacl_node_kind": Q.shacl_node_kind,
        "shacl_min_length": Q.shacl_min_length,
        "shacl_language_in": Q.shacl_language_in,
        "shacl_less_than_or_equals": Q.shacl_less_than_or_equals,
        "shacl_max_exclusive": Q.shacl_max_exclusive,
        "shacl_min_exclusive": Q.shacl_min_exclusive,
        "shacl_max_inclusive": Q.shacl_max_inclusive,
        "shacl_target_subjects_of": Q.shacl_target_subjects_of,
        "shacl_target_objects_of": Q.shacl_target_objects_of,
        "shacl_target_node": Q.shacl_target_node,
        "shacl_path_sequence": Q.shacl_path_sequence,
        "shacl_path_alternative": Q.shacl_path_alternative,
        "shacl_path_zero_or_one": Q.shacl_path_zero_or_one,
        "shacl_severity_message": Q.shacl_severity_message,
        "shacl_datatype": Q.shacl_datatype,
        "graph_ra_linkpred": O.graph_ra_linkpred,
        "dedup_editdist": O.dedup_editdist,
        "kg_void_stats": K.kg_void_stats,
        "kg_negative_sampling": K.kg_negative_sampling,
        "olap_local_supplier": O.olap_local_supplier,
        "olap_returned_items": O.olap_returned_items,
        "olap_promo_effect": O.olap_promo_effect,
        "olap_top_customers": O.olap_top_customers,
        "multimodal_header_dims": O.multimodal_header_dims,
        "kg_shape_induction": K.kg_shape_induction,
        "graph_ktruss": O.graph_ktruss,
        "olap_nation_trade": O.olap_nation_trade,
        "olap_disjunctive_revenue": O.olap_disjunctive_revenue,
        "text_textrank": O.text_textrank,
        "olap_customer_distribution": O.olap_customer_distribution,
        "graph_ppr": O.graph_ppr,
        "ann_pq_topk": O.ann_pq_topk,
        "dedup_prefix_join": O.dedup_prefix_join,
        "olap_order_priority": O.olap_order_priority,
        "olap_running_revenue": O.olap_running_revenue,
        "graph_component_sizes": O.graph_component_sizes,
        "dedup_eval_recall": O.dedup_eval_recall,
        "dedup_banding_recall": O.dedup_banding_recall,
        "events_reciprocal_transitions": O.events_reciprocal_transitions,
        "olap_market_share": O.olap_market_share,
        "olap_shipmode": O.olap_shipmode,
        "olap_top_supplier": O.olap_top_supplier,
        "olap_small_qty_revenue": O.olap_small_qty_revenue,
        "olap_waiting_suppliers": O.olap_waiting_suppliers,
        "olap_sales_opportunity": O.olap_sales_opportunity,
        "olap_min_cost_supplier": O.olap_min_cost_supplier,
        "olap_product_profit": O.olap_product_profit,
        "olap_important_stock": O.olap_important_stock,
        "olap_parts_supplier": O.olap_parts_supplier,
        "olap_part_promotion": O.olap_part_promotion,
        "graph_clustering_coeff": O.graph_clustering_coeff,
        "events_cohort_ltv": O.events_cohort_ltv,
        "curation_kanonymity": O.curation_kanonymity,
        "multimodal_jpeg": O.multimodal_jpeg,
        "events_paths": O.events_paths,
        "text_ttr": O.text_ttr,
        "kg_ifp_sameas": O.kg_ifp_sameas,
        "kg_disambiguate": O.kg_disambiguate,
        "events_markov_stationary": O.events_markov_stationary,
        "graph_squares": O.graph_squares,
        "kg_ntriples": O.kg_ntriples,
        "kg_skolemize": O.kg_skolemize,
        "kg_disjoint_classes": O.kg_disjoint_classes,
        "events_session_window_stream": O.events_session_window_stream,
        "sketch_hll_merge": O.sketch_hll_merge,
        "graph_conductance": O.graph_conductance,
        "kg_datatype_inference": O.kg_datatype_inference,
        "kg_acronym_link": O.kg_acronym_link,
        "curation_mad": O.curation_mad,
        "events_concurrency": O.events_concurrency,
        "events_cusum": O.events_cusum,
        "dedup_canonical": O.dedup_canonical,
        "events_late_data_stream": O.events_late_data_stream,
        "rank_mrr": O.rank_mrr,
        "events_abtest": O.events_abtest,
        "sketch_cms_merge": O.sketch_cms_merge,
        "olap_time_travel": O.olap_time_travel,
        "graph_bowtie": O.graph_bowtie,
        "kg_schema_alignment": O.kg_schema_alignment,
        "rank_ndcg": O.rank_ndcg,
        "sketch_kmv": O.sketch_kmv,
        "text_chi2_keywords": O.text_chi2_keywords,
        "dedup_cdc_chunks": O.dedup_cdc_chunks,
        "multimodal_dhash": O.multimodal_dhash,
        "graph_eccentricity": O.graph_eccentricity,
        "events_cuped": O.events_cuped,
        "kg_path_features": K.kg_path_features,
        "text_rake": O.text_rake,
        "sketch_kmv_jaccard": O.sketch_kmv_jaccard,
        "graph_harmonic": O.graph_harmonic,
        "kg_asof_triples": K.kg_asof_triples,
        "kg_numeric_fusion": K.kg_numeric_fusion,
        "kg_key_discovery": K.kg_key_discovery,
        "events_attribution_multi": O.events_attribution_multi,
        "events_survival": O.events_survival,
        "graph_cc_incremental": O.graph_cc_incremental,
        "graph_mst": O.graph_mst,
        "text_oov": O.text_oov,
        "multimodal_audio_landmarks": O.multimodal_audio_landmarks,
        "pack_curriculum": O.pack_curriculum,
        "events_rate_burst": O.events_rate_burst,
        "graph_reciprocity": O.graph_reciprocity,
        "ann_eval_recall": O.ann_eval_recall,
        "rank_ap": O.rank_ap,
        "dedup_chunk_store": O.dedup_chunk_store,
        "graph_tree_betweenness": O.graph_tree_betweenness,
        "text_boilerplate": O.text_boilerplate,
        "rank_kendall": O.rank_kendall,
        "pii_luhn": O.pii_luhn,
    }


# The derived partsupp relation (the lake has no partsupp table):
# distinct fact pairs + closed-form cost/availqty — must stay
# textually in lockstep with ops/olap.partsupp().
_PS_CTE = """
WITH partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 90000 + 10000
              AS BIGINT) AS ps_supplycost_cc,
         CAST((ps_partkey * 11 + ps_suppkey * 5) % 9999 + 1
              AS BIGINT) AS ps_availqty
  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
               l_suppkey AS ps_suppkey FROM lineitem) d)
"""


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


# word-set CTE shared by the dedup oracles
_WORDS_CTE = r"""
WITH w AS (
  SELECT doc_id, source, word FROM (
    SELECT doc_id, source,
           unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS word
    FROM documents) u
  WHERE word <> ''
),
sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1)
"""

# the minhash-LSH pair graph (a < b) — identical to
# dedup_minhash_lsh's pair set: banded candidates with stop-bucket
# removal, exact cross-source Jaccard>=0.8 rescore. Feeds the k-core
# gate so one graph family runs end-to-end on the production (LSH)
# candidate topology rather than the quadratic verify twin.
_LSH_PAIR_GRAPH_CTE = """
, h AS (
  SELECT doc_id, gs.s AS s,
         min(md5('s' || gs.s || ':' || word)) AS m
  FROM w CROSS JOIN generate_series(0, 7) gs(s) GROUP BY 1, 2),
bk0 AS (
  SELECT doc_id,
         (s // 2) || '|' || string_agg(m, '|' ORDER BY s) AS band_key
  FROM h GROUP BY doc_id, s // 2),
keep AS (SELECT band_key FROM bk0 GROUP BY 1 HAVING count(*) <= 50),
bk AS (SELECT bk0.* FROM bk0 JOIN keep USING (band_key)),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bk x JOIN bk y
    ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
i AS (
  SELECT c.a, c.b, count(*) AS ni
  FROM cand c
  JOIN w wa ON wa.doc_id = c.a
  JOIN w wb ON wb.doc_id = c.b AND wa.word = wb.word
  GROUP BY 1, 2),
p AS MATERIALIZED (
  SELECT a, b FROM i
  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000)
"""


# the Jaccard>=0.8 canonical pair graph (a < b), shared by the
# triangle / k-core oracles — identical to dedup_jaccard's pair set
_PAIR_GRAPH_CTE = """
, i AS (
  SELECT wa.doc_id AS a, wb.doc_id AS b, count(*) AS ni
  FROM w wa JOIN w wb
    ON wa.word = wb.word AND wa.source = wb.source
   AND wa.doc_id < wb.doc_id
  GROUP BY 1, 2),
p AS MATERIALIZED (
  SELECT a, b FROM i
  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000)
"""


_PROFILE_NUM = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PROFILE_STR = ("l_returnflag", "l_linestatus", "l_shipdate")


def _profile_sql(table: str) -> str:
    """Per-column UNION ALL restating ops/profile.profile_table's
    one-pass aggregate — numeric min/max as DOUBLE, the rest as
    engine-cast strings (see that module's typing note)."""
    branches = []
    for c in _PROFILE_NUM:
        branches.append(f"""
            SELECT '{c}' AS col_name, 1 AS is_numeric, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   COALESCE(CAST(MIN({c}) AS DOUBLE), 0.0) AS min_num,
                   COALESCE(CAST(MAX({c}) AS DOUBLE), 0.0) AS max_num,
                   '' AS min_str, '' AS max_str
            FROM {table}""")
    for c in _PROFILE_STR:
        branches.append(f"""
            SELECT '{c}' AS col_name, 0 AS is_numeric, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   0.0 AS min_num, 0.0 AS max_num,
                   COALESCE(CAST(MIN({c}) AS VARCHAR), '') AS min_str,
                   COALESCE(CAST(MAX({c}) AS VARCHAR), '') AS max_str
            FROM {table}""")
    return " UNION ALL ".join(branches)


def _kcore_ctes(k: int, rounds: int) -> str:
    """Unroll `rounds` synchronous k-core peel rounds over the pair
    graph CTE `p` — the DuckDB twin of ops/graph.k_core (bounded-round
    contract, all-integer, so the hash compare is exact). Every stage
    is MATERIALIZED: DuckDB inlines plain CTEs at each reference, and
    each round references its predecessor three times, so an inlined
    unroll would expand ~3^rounds scans of the corpus (it manifests as
    'Too many open files', not just slowness)."""
    parts, prev = [], "p"
    for r in range(1, rounds + 1):
        parts.append(f"""
  d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
      SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) u
    GROUP BY 1),
  k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
  e{r} AS MATERIALIZED (SELECT a, b FROM {prev}
           JOIN k{r} ka ON ka.node = a
           JOIN k{r} kb ON kb.node = b)""")
        prev = f"e{r}"
    return ("," + ",".join(parts) + f"""
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) u
  GROUP BY 1""")


def _ktruss_ctes(k: int, rounds: int) -> str:
    """Unroll `rounds` k-truss peel rounds over the pair graph CTE
    `p` — the DuckDB twin of ops/graph.k_truss: triangle enumeration
    (same a<b<c two-join closure as the triangles oracle), 3-edge
    unnest, support count, filter at k-2. MATERIALIZED for the same
    3^rounds-inlining reason as _kcore_ctes."""
    parts, prev = [], "p"
    for r in range(1, rounds + 1):
        parts.append(f"""
  t{r} AS MATERIALIZED (
    SELECT e1.a, e1.b, e2.c
    FROM {prev} e1
    JOIN (SELECT a AS b, b AS c FROM {prev}) e2 USING (b)
    JOIN (SELECT a, b AS c FROM {prev}) e3
      ON e3.a = e1.a AND e3.c = e2.c),
  e{r} AS MATERIALIZED (
    SELECT x AS a, y AS b, count(*) AS support FROM (
      SELECT a AS x, b AS y FROM t{r}
      UNION ALL SELECT b, c FROM t{r}
      UNION ALL SELECT a, c FROM t{r}) u
    GROUP BY 1, 2 HAVING count(*) >= {k - 2})""")
        prev = f"e{r}"
    return ("," + ",".join(parts)
            + f" SELECT a, b, support FROM {prev}")


_NB_CTE = """
, nb AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM p
  UNION ALL SELECT b AS node, a AS nbr FROM p)"""

# simhash signature CTE chain (ends in `sig(doc_id, simhash)`) —
# shared by the signature gate and the banded-pairs gate
# average-hash from the synthetic BMP pixel formula, factored so the
# signature gate and the banded near-dup pairs gate share it
_AHASH_CTES = """
            WITH b AS (SELECT doc_id, 1 + doc_id % 7 AS w,
                              1 + doc_id % 5 AS h
                       FROM documents),
            s AS (
              SELECT b.doc_id, b.w, b.h,
                     SUM((b.doc_id + gx.x + 2 * gy.y) % 251) AS psum
              FROM b
              CROSS JOIN generate_series(0, 6) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gx.x < b.w AND gy.y < b.h
              GROUP BY 1, 2, 3),
            bits AS (
              SELECT s.doc_id, s.w, s.h,
                     gy.y * s.w + gx.x AS i,
                     CASE WHEN ((s.doc_id + gx.x + 2 * gy.y) % 251)
                               * (s.w * s.h) >= s.psum
                          THEN 1 ELSE 0 END AS bit
              FROM s
              CROSS JOIN generate_series(0, 6) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gx.x < s.w AND gy.y < s.h),
            ah AS MATERIALIZED (
              SELECT doc_id, w, h,
                     CAST(SUM(bit) AS BIGINT) AS n_ones,
                     CAST(SUM(bit * (CAST(1 AS BIGINT)
                                     << (w * h - 1 - i))) AS BIGINT)
                       AS ahash
              FROM bits GROUP BY 1, 2, 3)
"""

_SIMHASH_CTES = _WORDS_CTE + """
            , h AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT) AS hi,
                     CAST(('0x' || substr(md5(word), 9, 8)) AS BIGINT) AS lo
              FROM w),
            bits AS (
              SELECT doc_id, gs.b AS b,
                     SUM(CASE WHEN (CASE WHEN gs.b < 32
                                         THEN (lo >> gs.b) & 1
                                         ELSE (hi >> (gs.b - 32)) & 1 END) = 1
                              THEN 1 ELSE -1 END) AS sb
              FROM h CROSS JOIN generate_series(0, 63) gs(b) GROUP BY 1, 2),
            sig AS (
              SELECT doc_id,
                   SUM(CASE WHEN sb <= 0 THEN 0
                            WHEN b = 63 THEN -9223372036854775808
                            ELSE (CAST(1 AS BIGINT) << b)
                            END)::BIGINT AS simhash
              FROM bits GROUP BY doc_id)
"""

# the CDC MERGE semantics: latest (ts, event_id) changelog row per
# key wins, 'D' deletes, I/U upsert, untouched base passes through —
# shared by the batch gate and its streaming-fold twin
_CDC_MERGE_SQL = """
            WITH base AS (
              SELECT c_custkey AS key,
                     CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bval
              FROM customer),
            chg AS (
              SELECT user_id + 1 AS key,
                     CAST(ROUND(COALESCE(value, 0) * 100, 0)
                          AS BIGINT) AS cval,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I'
                          ELSE 'U' END AS op,
                     ts, event_id
              FROM events
              WHERE event_type IN ('signup', 'purchase', 'error')),
            latest AS (
              SELECT key, cval, op FROM (
                SELECT *, row_number()
                         OVER (PARTITION BY key
                               ORDER BY ts DESC, event_id DESC) AS rn
                FROM chg) WHERE rn = 1)
            SELECT COALESCE(b.key, l.key) AS key,
                   COALESCE(l.cval, b.bval) AS val,
                   CASE WHEN l.op IS NULL THEN 'base'
                        ELSE 'cdc' END AS src
            FROM base b FULL OUTER JOIN latest l ON b.key = l.key
            WHERE l.op IS NULL OR l.op <> 'D'
"""

# SCD2 CTE chain (ends in `dim(key, attr, version, valid_from,
# valid_to, is_current, n_rows)`) — shared by the dimension-build
# gate and the point-in-time join gate
_SCD2_CTES = """
            WITH s AS (
              SELECT o_custkey AS key, o_orderstatus AS attr,
                     o_orderdate AS ts, o_orderkey AS tb
              FROM orders
              WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
            v AS (
              SELECT key, attr, ts,
                     SUM(CASE WHEN prev IS NULL OR prev <> attr
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY key ORDER BY ts, tb
                             ROWS UNBOUNDED PRECEDING) AS version
              FROM (SELECT *, lag(attr) OVER (PARTITION BY key
                                              ORDER BY ts, tb) AS prev
                    FROM s)),
            g AS (
              SELECT key, version, MIN(attr) AS attr,
                     MIN(ts) AS valid_from, count(*) AS n_rows
              FROM v GROUP BY 1, 2),
            dim AS (
              SELECT key, attr, CAST(version AS BIGINT) AS version,
                     valid_from,
                     COALESCE(lead(valid_from)
                                OVER (PARTITION BY key ORDER BY version),
                              TIMESTAMP '9999-01-01') AS valid_to,
                     CASE WHEN lead(valid_from)
                                OVER (PARTITION BY key ORDER BY version)
                          IS NULL THEN 1 ELSE 0 END AS is_current,
                     CAST(n_rows AS BIGINT) AS n_rows
              FROM g)
"""


def _lpa_ctes(rounds: int, final: bool = True) -> str:
    """Unroll `rounds` synchronous label-propagation rounds over the
    pair graph — the DuckDB twin of ops/graph.label_propagation
    (mode of neighbor labels, ties to the smallest label). MATERIALIZED
    per stage (DuckDB inlines plain CTEs at every reference)."""
    parts = ["""
  l0 AS MATERIALIZED (
    SELECT DISTINCT node, node AS community FROM nb)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""
  c{r} AS MATERIALIZED (
    SELECT nb.node, l.community, count(*) AS cnt
    FROM nb JOIN l{r - 1} l ON l.node = nb.nbr
    GROUP BY 1, 2),
  l{r} AS MATERIALIZED (
    SELECT node, community FROM (
      SELECT node, community,
             row_number() OVER (PARTITION BY node
                                ORDER BY cnt DESC, community) AS rn
      FROM c{r}) WHERE rn = 1)""")
    ctes = _NB_CTE + "," + ",".join(parts)
    if not final:
        return ctes
    return ctes + f" SELECT node, community FROM l{rounds}"


def _bfs_ctes(max_hops: int) -> str:
    """Unroll `max_hops` min-relaxation rounds from the
    doc_id %% 7 = 0 seed set — the DuckDB twin of
    ops/graph.bfs_distances (frontier BFS ≡ bounded min-relaxation
    because BFS discovers each node at its minimal hop count).
    Mod-7 seeds, NOT mod-10: the synthetic near-dup families stride
    doc_id by 10, so a mod-10 seed set never expands."""
    parts = ["""
  b0 AS MATERIALIZED (
    SELECT doc_id AS node, 0 AS dist FROM documents
    WHERE doc_id % 7 = 0)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""
  b{r} AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
      SELECT node, dist FROM b{r - 1}
      UNION ALL
      SELECT nb.nbr AS node, b.dist + 1 AS dist
      FROM b{r - 1} b JOIN nb ON nb.node = b.node) u
    GROUP BY 1)""")
    return (_NB_CTE + "," + ",".join(parts)
            + f" SELECT node, dist FROM b{max_hops}")


def _closeness_ctes(max_hops: int) -> str:
    """Per-seed lift of _bfs_ctes: unrolled min-relaxation keyed by
    (seed, node) from the doc_id %% 31 = 0 seed sample, aggregated to
    integer closeness terms — the DuckDB twin of
    ops/graph.closeness_terms."""
    parts = ["""
  c0 AS MATERIALIZED (
    SELECT doc_id AS seed, doc_id AS node, 0 AS dist FROM documents
    WHERE doc_id % 31 = 0)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""
  c{r} AS MATERIALIZED (
    SELECT seed, node, MIN(dist) AS dist FROM (
      SELECT seed, node, dist FROM c{r - 1}
      UNION ALL
      SELECT b.seed, nb.nbr AS node, b.dist + 1 AS dist
      FROM c{r - 1} b JOIN nb ON nb.node = b.node) u
    GROUP BY 1, 2)""")
    return (_NB_CTE + "," + ",".join(parts) + f"""
  SELECT seed, count(*) AS n_reached,
         CAST(sum(dist) AS BIGINT) AS dist_sum
  FROM c{max_hops} WHERE dist > 0 GROUP BY 1""")


def _zinterleave_sql(col: str, offset: int, bits: int = 16) -> str:
    """SQL twin of ops/olap._interleave_bits: spread `bits` low bits
    of `col` across even/odd positions (pure integer arithmetic, so
    DuckDB and Spark agree bit-for-bit)."""
    return " + ".join(
        f"((({col} >> {i}) & 1) << {2 * i + offset})"
        for i in range(bits)
    )


def _kmeans_ctes(k: int, iters: int, dims: int = 64,
                 pref: str = "", vec_expr: str = "embedding") -> tuple:
    """Unrolled DuckDB twin of ops/cluster.kmeans: the same
    k-smallest-id init, argmin assignment (ties → lowest cluster), and
    round(avg, 6) centroid update, one CTE block per Lloyd's
    iteration. Returns (ctes, final_dist_table). `pref` namespaces the
    CTEs so several trainings coexist in one query (PQ sub-codebooks);
    `vec_expr` selects the trained vector (e.g. a list slice)."""
    e, c, d, a, u = (pref + n for n in ("e", "c", "d", "a", "u"))

    def dist(cc: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, "
                f"len({e}.v)), "
                f"i -> ({e}.v[i] - {cc}.v[i]) * ({e}.v[i] - {cc}.v[i])))")

    ctes = [
        (f"{e} AS (SELECT vec_id, list_transform({vec_expr}, "
         "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"),
        (f"{c}0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
         f"AS INT) AS j, v FROM (SELECT vec_id, v FROM {e} "
         f"ORDER BY vec_id LIMIT {k}))"),
    ]
    for it in range(1, iters + 1):
        prev = f"{c}{it - 1}"
        ctes += [
            (f"{d}{it} AS (SELECT {e}.vec_id, {prev}.j, {dist(prev)} AS "
             f"dist FROM {e} CROSS JOIN {prev})"),
            (f"{a}{it} AS (SELECT vec_id, j AS cluster FROM ("
             f"SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id "
             f"ORDER BY dist, j) AS rn FROM {d}{it}) WHERE rn = 1)"),
            (f"{u}{it} AS (SELECT {a}{it}.cluster AS j, t.d, "
             f"round(avg({e}.v[t.d]), 6) AS c FROM {e} JOIN {a}{it} "
             f"USING (vec_id) CROSS JOIN generate_series(1, {dims}) "
             f"AS t(d) GROUP BY 1, 2)"),
            (f"{c}{it} AS (SELECT {prev}.j, coalesce(uu.v, {prev}.v) AS v "
             f"FROM {prev} LEFT JOIN (SELECT j, list(c ORDER BY d) AS v "
             f"FROM {u}{it} GROUP BY 1) uu USING (j))"),
        ]
    fin = iters + 1
    ctes.append(
        f"{d}{fin} AS (SELECT {e}.vec_id, {c}{iters}.j, "
        f"{dist(f'{c}{iters}')} AS dist FROM {e} CROSS JOIN {c}{iters})"
    )
    return ctes, f"{d}{fin}"


def _pq_oracle(k: int = 5, m: int = 4, n_codes: int = 4,
               iters: int = 2, dims: int = 64,
               query_max_id: int = 10) -> str:
    """ops/ann.pq_topk twin: m namespaced kmeans unrolls train the
    sub-codebooks, per-vector codes come from the final-assignment
    argmin, the query→centroid distance table is computed per
    (query, subspace, code), and ADC sums the m looked-up terms —
    every float is the same fixed-order double fold the Spark side
    computes, and the output is integer-only (qid, rank, nid)."""
    sub = dims // m
    ctes: list[str] = []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        sctes, fin = _kmeans_ctes(
            n_codes, iters, dims=sub, pref=f"s{s}",
            vec_expr=f"embedding[{lo}:{hi}]")
        ctes += sctes
        ctes.append(
            f"s{s}code AS (SELECT vec_id, j AS code FROM ("
            f"SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY dist, j) AS rn FROM {fin}) WHERE rn = 1)")
        ctes.append(
            f"s{s}qd AS (SELECT qe.vec_id AS qid, cb.j, "
            f"list_sum(list_transform(generate_series(1, {sub}), "
            f"i -> (qe.v[i] - cb.v[i]) * (qe.v[i] - cb.v[i]))) AS dist "
            f"FROM (SELECT vec_id, list_transform(embedding[{lo}:{hi}], "
            f"x -> CAST(x AS DOUBLE)) AS v FROM embeddings "
            f"WHERE vec_id < {query_max_id}) qe "
            f"CROSS JOIN s{s}c{iters} cb)")
    code_joins = " ".join(
        f"JOIN s{s}code c{s} USING (vec_id)" for s in range(m))
    code_cols = ", ".join(f"c{s}.code AS k{s}" for s in range(m))
    ctes.append(
        f"codes AS (SELECT vec_id, {code_cols} FROM embeddings "
        f"{code_joins})")
    qd_joins = " ".join(
        f"JOIN s{s}qd d{s} ON d{s}.qid = qs.qid AND d{s}.j = c.k{s}"
        for s in range(m))
    adc_sum = " + ".join(f"d{s}.dist" for s in range(m))
    ctes.append(
        f"adc AS (SELECT qs.qid, c.vec_id AS nid, {adc_sum} AS adc "
        f"FROM (SELECT DISTINCT qid FROM s0qd) qs "
        f"CROSS JOIN codes c {qd_joins} "
        f"WHERE c.vec_id <> qs.qid)")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT qid, CAST(rank AS BIGINT) AS rank, nid FROM ("
        "SELECT qid, nid, row_number() OVER (PARTITION BY qid "
        "ORDER BY adc, nid) AS rank FROM adc) "
        f"WHERE rank <= {k}"
    )


def _kmeans_oracle(k: int, iters: int, dims: int = 64) -> str:
    ctes, fin = _kmeans_ctes(k, iters, dims)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, j AS cluster, dist FROM ("
        "SELECT vec_id, j, dist, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY dist, j) AS rn FROM {fin}) "
        "WHERE rn = 1"
    )


def _semantic_dedup_oracle(k: int, iters: int, thr: float,
                           dims: int = 64) -> str:
    """ops/cluster.semantic_dedup twin: the kmeans CTEs produce the
    assignment, then a within-cluster pair join keeps round(cos,6) >=
    thr and min-aggregates the dominating lower id."""
    ctes, fin = _kmeans_ctes(k, iters, dims)
    ctes.append(
        "asg AS (SELECT vec_id, j AS cluster FROM ("
        "SELECT vec_id, j, dist, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY dist, j) AS rn FROM {fin}) "
        "WHERE rn = 1)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT pb.vec_id AS vec_id, pb.cluster AS cluster, "
        "CAST(min(pa.vec_id) AS BIGINT) AS dup_of\n"
        "FROM (embeddings a JOIN asg pa ON a.vec_id = pa.vec_id)\n"
        "JOIN (embeddings b JOIN asg pb ON b.vec_id = pb.vec_id)\n"
        "  ON pa.cluster = pb.cluster AND pa.vec_id < pb.vec_id\n"
        "WHERE round(list_cosine_similarity(a.embedding, b.embedding), "
        f"6) >= {thr}\n"
        "GROUP BY 1, 2"
    )


_ENTITY_EDGES_SQL = """
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT 'o' || o_orderkey AS src, 'c' || o_custkey AS dst
        FROM orders
        UNION ALL
        SELECT 'c' || c_custkey, 'n' || c_nationkey FROM customer
        UNION ALL
        SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
        UNION ALL
        SELECT 'o' || l_orderkey, 'p' || l_partkey FROM lineitem
        UNION ALL
        SELECT 'o' || l_orderkey, 's' || l_suppkey FROM lineitem
        UNION ALL
        SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
      )
    )
"""


def _pagerank_oracle(iterations: int = 6, damping_pct: int = 85,
                     scale: int = 10**12,
                     edges_cte: str | None = None,
                     prefix: str = "", limit: int = 100) -> str:
    """Chained-CTE unroll of the fixed-point-integer PageRank
    (ops/graph.pagerank): every step is BIGINT arithmetic, so the
    unrolled SQL is bit-identical to the Spark fixpoint loop.
    ``edges_cte`` is the ``edges AS (...)`` definition (defaults to the
    typed TPC-H entity graph); ``prefix`` is an existing WITH chain
    (e.g. _KG_CTE) the edges definition references."""
    d, t = damping_pct, 100 - damping_pct
    ctes = [
        edges_cte if edges_cte is not None else _ENTITY_EDGES_SQL,
        """nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        )""",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        f"""params AS (
          SELECT CAST({scale} // count(*) AS BIGINT) AS base,
                 CAST(({t} * ({scale} // count(*))) // 100 AS BIGINT)
                   AS teleport
          FROM nodes
        )""",
        """r0 AS (
          SELECT node, (SELECT base FROM params) AS rank FROM nodes
        )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""r{k} AS (
          SELECT n.node,
                 CAST((SELECT teleport FROM params)
                      + ({d} * COALESCE(c.inflow, 0)) // 100
                      AS BIGINT) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank // od.outdeg) AS BIGINT) AS inflow
            FROM edges e
            JOIN r{k - 1} r ON e.src = r.node
            JOIN outdeg od ON e.src = od.src
            GROUP BY 1
          ) c ON n.node = c.node
        )""")
    head = prefix.rstrip() + "," if prefix else "WITH"
    return (
        head + "\n" + ",\n".join(ctes)
        + f"\nSELECT node, rank AS rank_scaled FROM r{iterations}"
        + f"\nORDER BY rank DESC, node LIMIT {limit}"
    )


def _ppr_oracle(iterations: int, damping_pct: int = 85,
                scale: int = 10**12, seeds_pred: str = "node % 50 = 0",
                edges_cte: str = "", prefix: str = "",
                limit: int = 100) -> str:
    """Unrolled personalized PageRank (ops/graph.
    personalized_pagerank): rank0 = scale DIV s on seeds only, the
    teleport term conditional on seed membership, every step BIGINT —
    the seed-restricted twin of _pagerank_oracle."""
    d, t = damping_pct, 100 - damping_pct
    ctes = [
        edges_cte,
        """nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        )""",
        f"seeds AS (SELECT node FROM nodes WHERE {seeds_pred})",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        f"""params AS (
          SELECT CAST({scale} // count(*) AS BIGINT) AS sbase,
                 CAST(({t} * ({scale} // count(*))) // 100 AS BIGINT)
                   AS steleport
          FROM seeds
        )""",
        """r0 AS (
          SELECT n.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN (SELECT sbase FROM params)
                      ELSE 0 END AS rank
          FROM nodes n LEFT JOIN seeds s ON n.node = s.node
        )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""r{k} AS (
          SELECT n.node,
                 CAST(CASE WHEN s.node IS NOT NULL
                           THEN (SELECT steleport FROM params)
                           ELSE 0 END
                      + ({d} * COALESCE(c.inflow, 0)) // 100
                      AS BIGINT) AS rank
          FROM nodes n
          LEFT JOIN seeds s ON n.node = s.node
          LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank // od.outdeg) AS BIGINT) AS inflow
            FROM edges e
            JOIN r{k - 1} r ON e.src = r.node
            JOIN outdeg od ON e.src = od.src
            GROUP BY 1
          ) c ON n.node = c.node
        )""")
    head = prefix.rstrip() + "," if prefix else "WITH"
    return (
        head + "\n" + ",\n".join(ctes)
        + f"\nSELECT node, rank AS rank_scaled FROM r{iterations}"
        + f"\nWHERE rank > 0 ORDER BY rank DESC, node LIMIT {limit}"
    )


# deterministic link-bearing crawl (kg_link_graph's fixture) rebuilt
# in SQL: p = pages with the identical HTML strings, l = the same
# href-regex + host extraction the Spark operator runs
_LINK_CTES = r"""
            WITH p AS (
              SELECT 'http://ex' || (o_custkey % 100) || '.test/o'
                       || o_orderkey AS url,
                     '<html><body><p>x</p><a href="http://ex'
                     || ((o_custkey + 1) % 100) || '.test/x"></a>'
                     || '<a href="http://ex' || ((o_custkey + 7) % 100)
                     || '.test/y"></a>'
                     || CASE WHEN o_orderkey % 3 = 0
                             THEN '<a href="http://docs.test/z"></a>'
                             ELSE '' END
                     || '<a href="/rel"></a>'
                     || '<a href="mailto:a@b.test"></a></body></html>'
                       AS html
              FROM orders),
            l AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     lower(regexp_extract(unnest(
                       regexp_extract_all(html, 'href="([^"]*)"', 1)),
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host
              FROM p)
"""


def _bpe_ctes(rounds: int, carry_word: bool) -> str:
    """Shared unrolled-BPE CTE chain: w0 = wrapped (word, freq)
    vocabulary; each round r materializes pair counts p{r}, the argmax
    b{r} (ties to the lexicographically smaller chr(1)-joined pair —
    the identical composite key the Spark side orders by), and the
    merged vocabulary w{r}. With carry_word the raw word rides through
    every merge stage (the encode oracle reads it back out). Every
    stage is AS MATERIALIZED: DuckDB inlines plain CTEs at every
    reference and an unrolled loop explodes exponentially without
    it."""
    wsel = "w, " if carry_word else ""
    ctes = [rf"""
            w0 AS MATERIALIZED (
              SELECT {wsel}regexp_replace(w, '(.)', '(\1)', 'g') AS s,
                     count(*) AS freq
              FROM (SELECT unnest(string_split_regex(trim(text), ' +'))
                      AS w FROM documents) u
              WHERE w <> '' GROUP BY w)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""
            p{r} AS MATERIALIZED (
              SELECT pr, SUM(freq) AS cnt FROM (
                SELECT freq,
                       unnest(list_transform(
                         generate_series(1, len(l) - 1),
                         i -> l[i] || chr(1) || l[i + 1])) AS pr
                FROM (SELECT freq,
                             string_split(substr(s, 2, length(s) - 2),
                                          ')(') AS l
                      FROM w{r - 1}) q
                WHERE len(l) > 1) x
              GROUP BY pr),
            b{r} AS MATERIALIZED (
              SELECT pr, cnt FROM p{r}
              ORDER BY cnt DESC, pr ASC LIMIT 1),
            w{r} AS MATERIALIZED (
              SELECT {wsel}CASE WHEN b.pr IS NULL THEN s
                       ELSE replace(s,
                         '(' || replace(b.pr, chr(1), ')(') || ')',
                         '(' || replace(b.pr, chr(1), '') || ')')
                       END AS s,
                     freq
              FROM w{r - 1} LEFT JOIN b{r} b ON TRUE)""")
        # LEFT JOIN against the 1-row argmax (not a cross join): a
        # corpus that exhausts its mergeable pairs before `rounds`
        # leaves b{r} empty, and the vocabulary must carry through
        # unchanged — a cross join would empty every later stage,
        # diverging from the Spark encoder, which just stops merging
    return ",".join(ctes)


def _bpe_train_sql(rounds: int = 5) -> str:
    """Unrolled BPE trainer (see _bpe_ctes): emits the per-round
    argmax merges."""
    finals = [
        f"""SELECT {r} AS round,
                   split_part(pr, chr(1), 1) AS left_sym,
                   split_part(pr, chr(1), 2) AS right_sym,
                   replace(pr, chr(1), '') AS merged,
                   CAST(cnt AS BIGINT) AS pair_count FROM b{r}"""
        for r in range(1, rounds + 1)
    ]
    return ("WITH " + _bpe_ctes(rounds, carry_word=False) + "\n"
            + "\nUNION ALL ".join(finals))


def _bpe_encode_sql(rounds: int = 5) -> str:
    """Unrolled BPE ENCODE oracle: the trainer CTE chain with the raw
    word carried through, read out of the final vocabulary w{rounds}
    as the space-joined symbol sequence."""
    toks = r"regexp_extract_all(s, '\(([^)]*)\)', 1)"
    return (
        "WITH " + _bpe_ctes(rounds, carry_word=True) + f"""
        SELECT w AS word, CAST(freq AS BIGINT) AS freq,
               array_to_string({toks}, ' ') AS tokens,
               CAST(len({toks}) AS BIGINT) AS n_tokens
        FROM w{rounds}"""
    )


def _hits_oracle(iterations: int = 3) -> str:
    """Unrolled integer HITS over the link-fixture host graph:
    h0 = 1 everywhere; each round materializes the authority
    half-step (sum of in-neighbor hubs) then the hub half-step (sum
    of out-neighbor authorities), both COALESCEd to 0 over the full
    node set — the exact frames the Spark loop checkpoints."""
    ctes = [
        """edges AS MATERIALIZED (
             SELECT DISTINCT src_host AS src, dst_host AS dst
             FROM l WHERE dst_host <> '')""",
        """nodes AS MATERIALIZED (
             SELECT src AS node FROM edges
             UNION SELECT dst FROM edges)""",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""a{k} AS MATERIALIZED (
             SELECT n.node,
                    CAST(COALESCE(x.a, 0) AS BIGINT) AS a
             FROM nodes n LEFT JOIN (
               SELECT e.dst AS node, SUM(h.h) AS a
               FROM edges e JOIN h{k - 1} h ON e.src = h.node
               GROUP BY 1) x ON n.node = x.node)""")
        ctes.append(f"""h{k} AS MATERIALIZED (
             SELECT n.node,
                    CAST(COALESCE(x.h, 0) AS BIGINT) AS h
             FROM nodes n LEFT JOIN (
               SELECT e.src AS node, SUM(a.a) AS h
               FROM edges e JOIN a{k} a ON e.dst = a.node
               GROUP BY 1) x ON n.node = x.node)""")
    return (
        _LINK_CTES.rstrip() + ",\n" + ",\n".join(ctes)
        + f"""
        SELECT a.node, a.a AS authority, h.h AS hub
        FROM a{iterations} a JOIN h{iterations} h ON a.node = h.node
        ORDER BY authority DESC, hub DESC, a.node LIMIT 100"""
    )


def _sent_thr() -> str:
    """The md5 hex threshold of text_sentences' 2% page sample —
    identical expression to ops/sample.rate_threshold(0.02)."""
    from shacl_rust_spark.ops.sample import rate_threshold

    return rate_threshold(0.02)


def _hll_oracle() -> str:
    """Per-lang deterministic-HLL distinct-word estimate + exact count
    (ops/sketch.hll_distinct): same md5 registers, same integer-scaled
    harmonic sum, same single float division."""
    from shacl_rust_spark.ops.sketch import scaled_alpha

    return f"""
        WITH w2 AS (
          SELECT lang, word FROM (
            SELECT lang,
                   unnest(string_split_regex(trim(text), ' +')) AS word
            FROM documents
          ) WHERE word <> ''
        ),
        r AS (
          SELECT lang, substr(md5(word), 1, 3) AS bucket,
                 CASE WHEN v = 0 THEN 61
                      ELSE 61 - length(bin(v)) END AS rho
          FROM (
            SELECT lang, word,
                   ('0x' || substr(md5(word), 4, 15))::BIGINT AS v
            FROM w2
          )
        ),
        regs AS (
          SELECT lang, bucket, max(rho) AS m FROM r GROUP BY 1, 2
        ),
        pg AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_registers_used,
                 CAST(sum(CASE WHEN m <= 50
                               THEN (1::BIGINT << (50 - m))
                               ELSE 0 END) AS BIGINT) AS s_used
          FROM regs GROUP BY 1
        ),
        ex AS (
          SELECT lang, CAST(count(DISTINCT word) AS BIGINT)
                         AS exact_distinct
          FROM w2 GROUP BY 1
        ),
        est AS (
          SELECT lang, n_registers_used,
                 {scaled_alpha()!r}
                   / (s_used
                      + (4096 - n_registers_used) * (1::BIGINT << 50))
                   AS raw,
                 4096 - n_registers_used AS empty
          FROM pg
        )
        SELECT est.lang, est.n_registers_used,
               CASE WHEN est.raw <= {2.5 * 4096!r} AND est.empty > 0
                    THEN 4096.0 * ln(4096.0 / est.empty)
                    ELSE est.raw END AS est_distinct,
               ex.exact_distinct
        FROM est JOIN ex USING (lang)
    """


def _cdc_chunks_sql(pred: str, pfx: str,
                    text_sql: str = "COALESCE(text, '')") -> str:
    """CTE chain (no WITH) computing content-defined chunks for the
    documents matching ``pred`` — tables prefixed ``pfx`` so two
    snapshots can ride in one query; final table {pfx}ch holds
    (doc_id, chunk_md5, chunk_len). ``text_sql`` lets a caller chunk
    a DERIVED text (e.g. the boilerplate gate's appended footer).
    Textually the same boundary rule as the dedup_cdc_chunks oracle
    (window 8, base 31, mod 2^30, mask 2^6)."""
    return f"""
            {pfx}d AS (
              SELECT doc_id, {text_sql} AS text,
                     length({text_sql}) AS n
              FROM documents WHERE {pred}),
            {pfx}lim AS (
              SELECT unnest(range(8, 1 + GREATEST(
                (SELECT COALESCE(max(n), 0) FROM {pfx}d), 8))) AS i),
            {pfx}pos AS (
              SELECT d.doc_id, d.text, d.n, r.i
              FROM {pfx}d d CROSS JOIN {pfx}lim r
              WHERE r.i <= d.n),
            {pfx}b AS (
              SELECT doc_id, i FROM {pfx}pos
              WHERE ((unicode(substr(text, i - 7, 1))::BIGINT
                      * 27512614111
                    + unicode(substr(text, i - 6, 1))::BIGINT
                      * 887503681
                    + unicode(substr(text, i - 5, 1))::BIGINT
                      * 28629151
                    + unicode(substr(text, i - 4, 1))::BIGINT * 923521
                    + unicode(substr(text, i - 3, 1))::BIGINT * 29791
                    + unicode(substr(text, i - 2, 1))::BIGINT * 961
                    + unicode(substr(text, i - 1, 1))::BIGINT * 31
                    + unicode(substr(text, i, 1))::BIGINT)
                    % 1073741824) % 64 = 0),
            {pfx}seg AS (
              SELECT doc_id, i AS e,
                     COALESCE(lag(i) OVER (PARTITION BY doc_id
                                           ORDER BY i), 0) AS sp
              FROM {pfx}b),
            {pfx}chunks AS (
              SELECT s.doc_id,
                     substr(d.text, s.sp + 1, s.e - s.sp) AS chunk
              FROM {pfx}seg s JOIN {pfx}d d USING (doc_id)
              UNION ALL
              SELECT d.doc_id,
                     substr(d.text, COALESCE(mx.m, 0) + 1) AS chunk
              FROM {pfx}d d
              LEFT JOIN (SELECT doc_id, max(i) AS m
                         FROM {pfx}b GROUP BY 1) mx USING (doc_id)
              WHERE COALESCE(mx.m, 0) < d.n OR d.n = 0),
            {pfx}ch AS (SELECT doc_id, md5(chunk) AS chunk_md5,
                               length(chunk) AS chunk_len
                        FROM {pfx}chunks)"""


def _ndcg_case(col: str, k: int = 10, weight_bits: int = 20) -> str:
    """The FIXED integer DCG discount table as a SQL CASE over the
    rank column — generated by the same ops/rank.ndcg_weight_table
    call the Spark plan embeds, so both engines use identical
    literals and neither evaluates log2."""
    from shacl_rust_spark.ops.rank import ndcg_weight_table

    wt = ndcg_weight_table(k, weight_bits)
    return ("CASE " + col + " "
            + " ".join(f"WHEN {r + 1} THEN {w}"
                       for r, w in enumerate(wt))
            + " ELSE 0 END")



def oracle_sql() -> dict[str, str]:
    o = {
        "dedup_exact": """
            WITH k AS (SELECT doc_id, substr(text, 1, 40) AS kk FROM documents),
                 c AS (SELECT kk, min(doc_id) AS canonical_id FROM k GROUP BY 1)
            SELECT doc_id, canonical_id FROM k JOIN c USING (kk)
            WHERE doc_id <> canonical_id
        """,
        "dedup_jaccard": _WORDS_CTE + """
            , i AS (
              SELECT wa.doc_id AS a, wb.doc_id AS b, count(*) AS ni
              FROM w wa JOIN w wb
                ON wa.word = wb.word AND wa.source = wb.source
               AND wa.doc_id < wb.doc_id
              GROUP BY 1, 2)
            SELECT a, b, ni AS n_common, (sa.n + sb.n - ni) AS n_union
            FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000
        """,
        # triangles over the Jaccard>=0.8 pair graph: pairs (a<b) are
        # re-derived with the dedup_jaccard CTE, then the canonical
        # two-join closure counts each triangle once and unnests the
        # three corners for per-node counts
        "graph_triangles": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , t AS (
              SELECT e1.a, e1.b, e2.c
              FROM p e1
              JOIN (SELECT a AS b, b AS c FROM p) e2 USING (b)
              JOIN (SELECT a, b AS c FROM p) e3
                ON e3.a = e1.a AND e3.c = e2.c),
            x AS (SELECT unnest([a, b, c]) AS node FROM t)
            SELECT node, count(*) AS n_triangles FROM x GROUP BY 1
        """,
        "graph_kcore": _WORDS_CTE + _LSH_PAIR_GRAPH_CTE + _kcore_ctes(3, 6),
        "graph_lpa": _WORDS_CTE + _PAIR_GRAPH_CTE + _lpa_ctes(4),
        # integer-exact Newman modularity of the LPA-4 partition:
        # q_num = 4*m*e_in - deg_sum^2, Q = sum(q_num)/(4m^2)
        "graph_modularity": _WORDS_CTE + _PAIR_GRAPH_CTE
        + _lpa_ctes(4, final=False) + """
            , deg AS MATERIALIZED (
              SELECT node, count(*) AS deg FROM nb GROUP BY 1),
            mm AS (SELECT count(*) AS m FROM p),
            ein AS (
              SELECT la.community, count(*) AS e_in
              FROM p JOIN l4 la ON la.node = p.a
                     JOIN l4 lb ON lb.node = p.b
                     AND lb.community = la.community
              GROUP BY 1),
            dsum AS (
              SELECT community, count(*) AS n_nodes,
                     CAST(SUM(deg) AS BIGINT) AS deg_sum
              FROM l4 JOIN deg USING (node) GROUP BY 1)
            SELECT d.community, d.n_nodes,
                   COALESCE(e.e_in, 0) AS e_in, d.deg_sum,
                   4 * mm.m * COALESCE(e.e_in, 0)
                   - d.deg_sum * d.deg_sum AS q_num
            FROM dsum d LEFT JOIN ein e USING (community)
            CROSS JOIN mm
        """,
        # order-statistic clip bounds: value at row ceil(p*n/100) in
        # the per-language sort — integer selection end to end
        "curation_winsorize": """
            WITH r AS (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars, doc_id)
                       AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents),
            b AS (
              SELECT lang,
                     MAX(CASE WHEN rn = (5 * n + 99) // 100
                              THEN n_chars END) AS lo,
                     MAX(CASE WHEN rn = (95 * n + 99) // 100
                              THEN n_chars END) AS hi
              FROM r GROUP BY 1)
            SELECT d.doc_id, d.lang, d.n_chars,
                   GREATEST(LEAST(d.n_chars, b.hi), b.lo) AS clipped,
                   CASE WHEN d.n_chars < b.lo OR d.n_chars > b.hi
                        THEN 1 ELSE 0 END AS was_clipped
            FROM documents d JOIN b USING (lang)
        """,
        # the bucketing changes the PLAN, never the result — the plain
        # join is the oracle
        "olap_bucketed_join": """
            SELECT c_nationkey, count(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0)
                                 AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY 1
        """,
        # PMI from exact integer counts; the float expression mirrors
        # the Spark association order term-for-term, so the doubles
        # and the top-k order are engine-identical
        "text_collocations": r"""
            WITH t AS (
              SELECT string_split_regex(trim(text), ' +') AS l
              FROM documents),
            bg AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i + 1])) AS bigram
              FROM t WHERE len(l) >= 2),
            pair AS (SELECT bigram, count(*) AS n_ab FROM bg
                     GROUP BY 1),
            uni AS (
              SELECT w AS u, count(*) AS uc FROM (
                SELECT unnest(string_split_regex(trim(text), ' +'))
                  AS w
                FROM documents) WHERE w <> '' GROUP BY 1),
            tot AS (SELECT CAST(SUM(uc) AS DOUBLE) AS wt FROM uni),
            btot AS (SELECT CAST(SUM(n_ab) AS DOUBLE) AS bt
                     FROM pair)
            SELECT p.bigram, CAST(p.n_ab AS BIGINT) AS n_ab,
                   CAST(a.uc AS BIGINT) AS u_a,
                   CAST(b.uc AS BIGINT) AS u_b,
                   ln(((CAST(p.n_ab AS DOUBLE) * tot.wt) * tot.wt)
                      / ((btot.bt * CAST(a.uc AS DOUBLE))
                         * CAST(b.uc AS DOUBLE))) AS pmi
            FROM pair p
            JOIN uni a ON a.u = string_split(p.bigram, ' ')[1]
            JOIN uni b ON b.u = string_split(p.bigram, ' ')[2]
            CROSS JOIN tot CROSS JOIN btot
            WHERE p.n_ab >= 3
            ORDER BY pmi DESC, p.bigram LIMIT 100
        """,
        # RRF of two integer-deterministic retrievers; fusion kept as
        # the exact rational (num, den) — no float ordering anywhere
        "rank_rrf": r"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            tfq AS (
              SELECT doc_id, w, count(*) AS tf FROM words
              WHERE w IN ('join', 'data', 'spark') GROUP BY 1, 2
            ),
            a AS (
              SELECT doc_id, row_number()
                       OVER (ORDER BY s DESC, doc_id) AS rank
              FROM (SELECT doc_id, SUM(tf) AS s FROM tfq GROUP BY 1)
            ),
            lens AS (
              SELECT d.doc_id, coalesce(w.c, 0) AS dl
              FROM documents d LEFT JOIN (
                SELECT doc_id, count(*) AS c FROM words GROUP BY 1
              ) w USING (doc_id)
            ),
            b AS (
              SELECT doc_id, row_number()
                       OVER (ORDER BY nm DESC, dl ASC, doc_id) AS rank
              FROM (SELECT doc_id, count(*) AS nm FROM tfq GROUP BY 1) t
              JOIN lens USING (doc_id) WHERE nm >= 2
            ),
            f AS (
              SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                     COALESCE(a.rank, -1) AS rank_a,
                     COALESCE(b.rank, -1) AS rank_b,
                     CASE WHEN a.rank IS NOT NULL
                               AND b.rank IS NOT NULL
                          THEN (60 + a.rank) + (60 + b.rank)
                          ELSE 1 END AS rrf_num,
                     CASE WHEN a.rank IS NOT NULL
                               AND b.rank IS NOT NULL
                          THEN (60 + a.rank) * (60 + b.rank)
                          WHEN a.rank IS NOT NULL THEN 60 + a.rank
                          ELSE 60 + b.rank END AS rrf_den
              FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            )
            SELECT doc_id, rank_a, rank_b, rrf_num, rrf_den,
                   CAST(rrf_num AS DOUBLE) / rrf_den AS rrf
            FROM f
        """,
        "graph_bfs": _WORDS_CTE + _PAIR_GRAPH_CTE + _bfs_ctes(4),
        # Kimball SCD2 from the per-customer status changelog; the
        # open interval carries a sentinel (not NULL) so the
        # cross-engine hash never meets NULL-vs-NaT stringification
        "olap_scd2": _SCD2_CTES + """
            SELECT key, attr, version, valid_from, valid_to,
                   is_current, n_rows
            FROM dim
        """,
        # temporal-correctness join: the intervals partition each
        # key's history, so every order hits exactly one dim row
        "olap_pit_join": _SCD2_CTES + """
            SELECT o.o_orderkey, o.o_custkey AS key,
                   d.attr AS status_at, d.version
            FROM orders o JOIN dim d
              ON d.key = o.o_custkey
             AND o.o_orderdate >= d.valid_from
             AND o.o_orderdate < d.valid_to
        """,
        # MERGE-apply: latest (ts, event_id) changelog row per key
        # wins; 'D' deletes, I/U upsert, untouched base passes through
        "olap_cdc_merge": _CDC_MERGE_SQL,
        # the streaming twin folds ts-ordered micro-batches into a
        # versioned snapshot; with in-order replay the fold equals the
        # one-shot batch MERGE — the identical SQL is the oracle
        "olap_cdc_merge_stream": _CDC_MERGE_SQL,
        "olap_cdc_merge_ooo": _CDC_MERGE_SQL,
        # native CUBE: all four grouping sets in one pass, integer
        # centi-cent revenue; DuckDB SUM(BIGINT) is HUGEINT → cast
        "olap_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                     AS gid,
                   count(*) AS n_rows,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS rev_cents
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        # incremental MV fold == one-shot recompute because the sums
        # accumulate in exact DECIMAL (order-independent addition)
        "olap_mv_incremental": """
            SELECT event_type,
                   CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value
            FROM events GROUP BY 1, 2
        """,
        # Gopher rules: every threshold cross-multiplied to integers;
        # '...' runs counted by non-overlapping replace-shrinkage, so
        # both engines count greedily left-to-right
        "curation_gopher": r"""
            WITH c AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '')) AS n_words,
                     length(regexp_replace(text, '\s+', '', 'g'))
                       AS n_word_chars,
                     (length(text) - length(replace(text, '#', '')))
                     + (length(text) - length(replace(text, '...', '')))
                       / 3 AS n_sym,
                     (CASE WHEN len(regexp_extract_all(text, '\bthe\b'))
                           > 0 THEN 1 ELSE 0 END
                      + CASE WHEN len(regexp_extract_all(text, '\ba\b'))
                           > 0 THEN 1 ELSE 0 END
                      + CASE WHEN len(regexp_extract_all(text, '\bof\b'))
                           > 0 THEN 1 ELSE 0 END
                      + CASE WHEN len(regexp_extract_all(text, '\band\b'))
                           > 0 THEN 1 ELSE 0 END
                      + CASE WHEN len(regexp_extract_all(text, '\bto\b'))
                           > 0 THEN 1 ELSE 0 END
                      + CASE WHEN len(regexp_extract_all(text, '\bin\b'))
                           > 0 THEN 1 ELSE 0 END) AS n_stop
              FROM documents)
            SELECT doc_id, n_words,
                   (n_words >= 20 AND n_words <= 80) AS r_words,
                   (3 * n_words <= n_word_chars
                    AND n_word_chars <= 10 * n_words) AS r_mwl,
                   (100 * n_sym <= 10 * n_words) AS r_symbol,
                   (n_stop >= 2) AS r_stop,
                   ((n_words >= 20 AND n_words <= 80)
                    AND (3 * n_words <= n_word_chars
                         AND n_word_chars <= 10 * n_words)
                    AND (100 * n_sym <= 10 * n_words)
                    AND (n_stop >= 2)) AS keep
            FROM c
        """,
        # exact top-k per group: rank ties broken by the smaller
        # user_id, so the row set is engine-deterministic
        "events_heavy_hitters": """
            WITH c AS (SELECT event_type, user_id, count(*) AS n_events
                       FROM events GROUP BY 1, 2),
            r AS (SELECT *, row_number()
                         OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, user_id ASC)
                         AS rank
                  FROM c)
            SELECT event_type, user_id, n_events, rank
            FROM r WHERE rank <= 3
        """,
        # rank-of-first-relevant: every ordering key is an integer
        # (tf desc, doc_id asc), so the rank is engine-exact
        "rank_eval": """
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word IN ('join', 'data', 'spark') GROUP BY 1, 2),
            r AS (SELECT word, tf, doc_id, (doc_id % 13 = 0) AS rel,
                         row_number()
                           OVER (PARTITION BY word
                                 ORDER BY tf DESC, doc_id ASC) AS rank
                  FROM tf)
            SELECT word AS term, count(*) AS n_ranked,
                   min(CASE WHEN rel THEN rank END) AS first_rel_rank
            FROM r GROUP BY 1
        """,
        # group-keyed split: thresholds are rate_threshold(0.8) and
        # rate_threshold(0.8 + 0.1) — the identical md5-hex compare
        # the Spark op evaluates, so every row agrees
        "curation_split": """
            SELECT doc_id, source,
                   CASE WHEN substr(md5('split' || CAST(source AS
                                   VARCHAR)), 1, 8) < 'cccccccc'
                        THEN 'train'
                        WHEN substr(md5('split' || CAST(source AS
                                   VARCHAR)), 1, 8) < 'e6666666'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        # Morton interleave as pure integer arithmetic + ntile over
        # the exact (zkey, event_id) total order
        # quantile-coded interleave (raw widths are unequal — see the
        # gate docstring), reduced to per-file min/max and
        # probe-containment flags — the pruning ratio is hash-checked
        "olap_zorder_pruning": f"""
            WITH e AS (
              SELECT event_id, user_id,
                     CAST(EXTRACT(hour FROM ts) * 60
                          + EXTRACT(minute FROM ts) AS BIGINT)
                       AS minute_of_day
              FROM events),
            c AS (
              SELECT event_id, user_id, minute_of_day,
                     ntile(64) OVER (ORDER BY user_id, event_id) - 1
                       AS a_code,
                     ntile(64) OVER (ORDER BY minute_of_day,
                                     event_id) - 1 AS b_code
              FROM e),
            z AS (
              SELECT event_id, user_id, minute_of_day,
                     CAST({_zinterleave_sql('a_code', 0, 6)}
                          + {_zinterleave_sql('b_code', 1, 6)}
                          AS BIGINT) AS zkey
              FROM c),
            f AS (
              SELECT event_id, user_id, minute_of_day,
                     ntile(16) OVER (ORDER BY zkey, event_id)
                       AS file_id
              FROM z)
            SELECT file_id, count(*) AS n_rows,
                   MIN(user_id) AS a_min, MAX(user_id) AS a_max,
                   MIN(minute_of_day) AS b_min,
                   MAX(minute_of_day) AS b_max,
                   CASE WHEN MIN(user_id) <= 42
                             AND MAX(user_id) >= 42
                        THEN 1 ELSE 0 END AS hit_a,
                   CASE WHEN MIN(minute_of_day) <= 600
                             AND MAX(minute_of_day) >= 600
                        THEN 1 ELSE 0 END AS hit_b
            FROM f GROUP BY 1
        """,
        "olap_zorder": f"""
            WITH e AS (
              SELECT event_id, user_id,
                     CAST(EXTRACT(hour FROM ts) * 60
                          + EXTRACT(minute FROM ts) AS BIGINT)
                       AS minute_of_day
              FROM events),
            z AS (
              SELECT event_id,
                     CAST({_zinterleave_sql('user_id', 0)}
                          + {_zinterleave_sql('minute_of_day', 1)}
                          AS BIGINT) AS zkey
              FROM e)
            SELECT event_id, zkey,
                   ntile(16) OVER (ORDER BY zkey, event_id) AS file_id
            FROM z
        """,
        # per-user calendar spine + forward fill; day emits as
        # TIMESTAMP (non-null by construction) for string parity
        "events_gapfill": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     count(*) AS n_events,
                     CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0)
                                   AS BIGINT)) AS BIGINT) AS day_cents
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
              GROUP BY 1, 2),
            spine AS (
              SELECT user_id,
                     unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                       AS day
              FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                    FROM daily GROUP BY 1))
            SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
                   CASE WHEN d.n_events IS NOT NULL
                        THEN 1 ELSE 0 END AS obs,
                   COALESCE(d.n_events, 0) AS n_events,
                   last_value(d.day_cents IGNORE NULLS)
                     OVER (PARTITION BY s.user_id ORDER BY s.day
                           ROWS UNBOUNDED PRECEDING) AS filled_cents
            FROM spine s LEFT JOIN daily d
              ON d.user_id = s.user_id AND d.day = s.day
        """,
        "graph_common_neighbors": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , adj AS MATERIALIZED (
                SELECT a AS node, b AS nb FROM p
                UNION ALL SELECT b, a FROM p),
            deg AS MATERIALIZED (
                SELECT node, count(*) AS deg FROM adj GROUP BY 1),
            cn AS (
              SELECT a1.node AS u, a2.node AS v, count(*) AS n_common
              FROM adj a1 JOIN adj a2
                ON a1.nb = a2.nb AND a1.node < a2.node
              GROUP BY 1, 2
              HAVING count(*) >= 2),
            topk AS (
              SELECT u, v, n_common,
                     row_number() OVER (PARTITION BY u
                       ORDER BY n_common DESC, v ASC) AS rn
              FROM cn)
            SELECT u, v, n_common, du.deg AS deg_u, dv.deg AS deg_v
            FROM topk JOIN deg du ON du.node = u
                      JOIN deg dv ON dv.node = v
            WHERE rn <= 3
        """,
        # bin from the binary-string length, same as the Spark side —
        # never floor(log2()) (libm exactness at powers of two is not
        # guaranteed and one ulp flips the bucket)
        "sketch_length_quantiles": """
            WITH c AS (
              SELECT lang,
                     length(bin(greatest(CAST(n_chars AS BIGINT), 1)))
                       - 1 AS bin
              FROM documents),
            counts AS (
              SELECT lang, bin, count(*) AS n FROM c GROUP BY 1, 2),
            cum AS (
              SELECT lang, bin, n,
                     SUM(n) OVER (PARTITION BY lang ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(n) OVER (PARTITION BY lang) AS total
              FROM counts),
            q AS (
              SELECT lang, CAST(SUM(n) AS BIGINT) AS n,
                     MIN(CASE WHEN cum * 100 >= 50 * total
                         THEN bin END) AS p50_bin,
                     MIN(CASE WHEN cum * 100 >= 90 * total
                         THEN bin END) AS p90_bin,
                     MIN(CASE WHEN cum * 100 >= 99 * total
                         THEN bin END) AS p99_bin
              FROM cum GROUP BY 1)
            SELECT lang, n, p50_bin, p90_bin, p99_bin,
                   (CAST(1 AS BIGINT) << (p50_bin + 1)) - 1 AS p50_est,
                   (CAST(1 AS BIGINT) << (p90_bin + 1)) - 1 AS p90_est,
                   (CAST(1 AS BIGINT) << (p99_bin + 1)) - 1 AS p99_est
            FROM q
        """,
        "events_transitions": """
            WITH t AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events)
            SELECT prev AS from_type, event_type AS to_type,
                   count(*) AS n
            FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
        "dedup_containment": _WORDS_CTE + """
            , i AS (
              SELECT wa.doc_id AS contained, wb.doc_id AS container,
                     count(*) AS ni
              FROM w wa JOIN w wb
                ON wa.word = wb.word AND wa.source = wb.source
               AND wa.doc_id <> wb.doc_id
              GROUP BY 1, 2)
            SELECT contained, container, ni AS n_common,
                   sa.n AS n_contained_words
            FROM i JOIN sz sa ON sa.doc_id = contained
            WHERE ni * 10000 >= sa.n * 9000
        """,
        "dedup_incremental": """
            WITH k AS (
              SELECT doc_id, lang, n_chars,
                     substr(text, 1, 40) AS kk
              FROM documents
            ),
            seen AS (
              SELECT DISTINCT kk FROM k WHERE doc_id % 2 = 0
            ),
            fresh AS (
              SELECT k.doc_id, k.lang, k.n_chars, k.kk
              FROM k LEFT JOIN seen USING (kk)
              WHERE k.doc_id % 2 = 1 AND seen.kk IS NULL
            )
            SELECT doc_id, lang, n_chars FROM fresh f
            WHERE doc_id = (SELECT min(doc_id) FROM fresh f2
                            WHERE f2.kk = f.kk)
        """,
        # pigeonhole recall gate: the banded pair set equals the
        # all-pairs hamming<=7 truth — DuckDB recomputes the truth
        # side independently; missing/extra are 0 by the theorem
        "dedup_banding_recall": _SIMHASH_CTES + """
            , ap AS (
              SELECT sa.doc_id AS a, sb.doc_id AS b
              FROM sig sa JOIN sig sb ON sa.doc_id < sb.doc_id
              WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 7)
            SELECT (SELECT count(*) FROM ap)::BIGINT AS n_banded,
                   (SELECT count(*) FROM ap)::BIGINT AS n_allpairs,
                   0::BIGINT AS n_missing, 0::BIGINT AS n_extra
        """,
        "dedup_minhash_lsh": _WORDS_CTE + """
            , h AS (
              SELECT doc_id, gs.s AS s,
                     min(md5('s' || gs.s || ':' || word)) AS m
              FROM w CROSS JOIN generate_series(0, 7) gs(s) GROUP BY 1, 2),
            bk0 AS (
              SELECT doc_id,
                     (s // 2) || '|' || string_agg(m, '|' ORDER BY s) AS band_key
              FROM h GROUP BY doc_id, s // 2),
            -- stop-bucket removal mirrors MAX_BUCKET in ops/dedup.py
            keep AS (SELECT band_key FROM bk0 GROUP BY 1 HAVING count(*) <= 50),
            bk AS (SELECT bk0.* FROM bk0 JOIN keep USING (band_key)),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM bk x JOIN bk y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
            i AS (
              SELECT c.a, c.b, count(*) AS ni
              FROM cand c
              JOIN w wa ON wa.doc_id = c.a
              JOIN w wb ON wb.doc_id = c.b AND wa.word = wb.word
              GROUP BY 1, 2)
            SELECT a, b
            FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000
        """,
        # connected components over the LSH pair set via recursive CTE
        # (semi-naive reachability; clusters are tiny so the walk is
        # bounded by sum of squared component sizes)
        "dedup_components": _WORDS_CTE.replace(
            "WITH ", "WITH RECURSIVE ", 1
        ) + """
            , h AS (
              SELECT doc_id, gs.s AS s,
                     min(md5('s' || gs.s || ':' || word)) AS m
              FROM w CROSS JOIN generate_series(0, 7) gs(s) GROUP BY 1, 2),
            bk0 AS (
              SELECT doc_id,
                     (s // 2) || '|' || string_agg(m, '|' ORDER BY s) AS band_key
              FROM h GROUP BY doc_id, s // 2),
            keep AS (SELECT band_key FROM bk0 GROUP BY 1 HAVING count(*) <= 50),
            bk AS (SELECT bk0.* FROM bk0 JOIN keep USING (band_key)),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM bk x JOIN bk y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
            i AS (
              SELECT c.a, c.b, count(*) AS ni
              FROM cand c
              JOIN w wa ON wa.doc_id = c.a
              JOIN w wb ON wb.doc_id = c.b AND wa.word = wb.word
              GROUP BY 1, 2),
            pairs AS (
              SELECT a, b
              FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
              WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000),
            und AS (
              SELECT a AS x, b AS y FROM pairs
              UNION SELECT b, a FROM pairs),
            walk AS (
              SELECT x AS node, x AS reach FROM und
              UNION
              SELECT wk.node, u.y FROM walk wk JOIN und u ON u.x = wk.reach)
            SELECT node AS doc_id, MIN(reach) AS component
            FROM walk GROUP BY 1
        """,
        "dedup_simhash": _SIMHASH_CTES + """
            SELECT doc_id, simhash FROM sig
        """,
        # banding is pigeonhole-COMPLETE at hamming <= 3 with 4 bands
        # (two signatures within 3 bits must share a full band), so
        # the all-pairs Hamming filter is the exact oracle
        "dedup_simhash_pairs": _SIMHASH_CTES + """
            SELECT sa.doc_id AS a, sb.doc_id AS b,
                   bit_count(xor(sa.simhash, sb.simhash)) AS hamming
            FROM sig sa JOIN sig sb ON sa.doc_id < sb.doc_id
            WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        # the banded variant has identical semantics (LSH banding is a
        # recall filter, rescoring is exact) — same all-pairs oracle
        "dedup_embedding_lsh": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
                 s AS (SELECT qid, vec_id AS nid,
                              round(list_cosine_similarity(
                                qv, embedding::DOUBLE[]), 6) AS c
                       FROM q JOIN embeddings ON vec_id <> qid),
                 r AS (SELECT qid AS query_id, nid AS neighbor_id,
                              row_number() OVER (PARTITION BY qid
                                ORDER BY c DESC, nid ASC) AS rank
                       FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
                 cent AS (SELECT label, gs.p AS p,
                                 avg(embedding[gs.p]::DOUBLE) AS a
                          FROM embeddings CROSS JOIN generate_series(1, 64) gs(p)
                          GROUP BY 1, 2),
                 centl AS (SELECT label, list(a ORDER BY p) AS cvec
                           FROM cent GROUP BY label),
                 qr AS (SELECT qid, qv, label,
                               round(list_cosine_similarity(qv, cvec), 6) AS cc
                        FROM q CROSS JOIN centl),
                 probe AS (SELECT qid, qv, label FROM (
                             SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cc DESC, label ASC) AS rn FROM qr) x
                           WHERE rn = 1),
                 s AS (SELECT p.qid, e.vec_id AS nid,
                              round(list_cosine_similarity(
                                p.qv, e.embedding::DOUBLE[]), 6) AS c
                       FROM probe p JOIN embeddings e
                         ON e.label = p.label AND e.vec_id <> p.qid),
                 r AS (SELECT qid AS query_id, nid AS neighbor_id,
                              row_number() OVER (PARTITION BY qid
                                ORDER BY c DESC, nid ASC) AS rank
                       FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
        """,
        "text_tokens": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '')) AS n_ws_tokens,
                   len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_ish
            FROM documents
        """,
        # the curation composite: each stage is the standalone oracle's
        # expression verbatim, chained over the shrinking survivor set
        "corpus_select": r"""
            WITH RECURSIVE qf AS (
              SELECT doc_id, text, source,
                     len(list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '')) AS n_words,
                     len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\ba\b'))
                     + len(regexp_extract_all(text, '\bof\b'))
                     + len(regexp_extract_all(text, '\band\b'))
                     + len(regexp_extract_all(text, '\bto\b'))
                     + len(regexp_extract_all(text, '\bin\b')) AS n_stopwords
              FROM documents),
            q AS (SELECT doc_id, text, source FROM qf
                  WHERE n_words >= 20 AND n_stopwords * 100 >= n_words * 5),
            lc AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\ba\b'))
                     + len(regexp_extract_all(text, '\bof\b')) AS c_en,
                     len(regexp_extract_all(text, '\bel\b'))
                     + len(regexp_extract_all(text, '\bla\b'))
                     + len(regexp_extract_all(text, '\bde\b')) AS c_es,
                     len(regexp_extract_all(text, '\bder\b'))
                     + len(regexp_extract_all(text, '\bdie\b'))
                     + len(regexp_extract_all(text, '\bdas\b')) AS c_de,
                     len(regexp_extract_all(text, '\ble\b'))
                     + len(regexp_extract_all(text, '\bla\b'))
                     + len(regexp_extract_all(text, '\bet\b')) AS c_fr,
                     len(regexp_extract_all(text, '\b的\b'))
                     + len(regexp_extract_all(text, '\b是\b'))
                     + len(regexp_extract_all(text, '\b了\b')) AS c_zh
              FROM q),
            lg AS (SELECT *, greatest(c_en, c_es, c_de, c_fr, c_zh) AS best,
                          (c_en = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                        + (c_es = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                        + (c_de = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                        + (c_fr = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                        + (c_zh = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                          AS nbest
                   FROM lc),
            s1 AS (
              SELECT q.doc_id, q.text, q.source
              FROM q JOIN lg USING (doc_id)
              WHERE NOT (lg.best = 0 OR lg.nbest > 1) AND lg.c_en = lg.best),
            kk AS (SELECT doc_id, substr(text, 1, 40) AS k FROM s1),
            canon AS (SELECT min(doc_id) AS doc_id FROM kk GROUP BY k),
            s2 AS (SELECT s1.* FROM s1 JOIN canon USING (doc_id)),
            w AS (
              SELECT doc_id, source, word FROM (
                SELECT doc_id, source,
                       unnest(list_distinct(regexp_split_to_array(text, '\s+')))
                       AS word
                FROM s2) u
              WHERE word <> ''),
            sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1),
            h AS (
              SELECT doc_id, gs.s AS s,
                     min(md5('s' || gs.s || ':' || word)) AS m
              FROM w CROSS JOIN generate_series(0, 7) gs(s) GROUP BY 1, 2),
            bk0 AS (
              SELECT doc_id,
                     (s // 2) || '|' || string_agg(m, '|' ORDER BY s) AS band_key
              FROM h GROUP BY doc_id, s // 2),
            keep AS (SELECT band_key FROM bk0 GROUP BY 1 HAVING count(*) <= 50),
            bk AS (SELECT bk0.* FROM bk0 JOIN keep USING (band_key)),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM bk x JOIN bk y
                ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
            i AS (
              SELECT c.a, c.b, count(*) AS ni
              FROM cand c
              JOIN w wa ON wa.doc_id = c.a
              JOIN w wb ON wb.doc_id = c.b AND wa.word = wb.word
              GROUP BY 1, 2),
            pairs AS (
              SELECT a, b
              FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
              WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000),
            und AS (
              SELECT a AS x, b AS y FROM pairs
              UNION SELECT b, a FROM pairs),
            walk AS (
              SELECT x AS node, x AS reach FROM und
              UNION
              SELECT wk.node, u.y FROM walk wk JOIN und u ON u.x = wk.reach),
            comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY 1)
            SELECT doc_id FROM s2
            WHERE doc_id NOT IN
              (SELECT node FROM comp WHERE node <> component)
        """,
        "text_quality": r"""
            WITH c AS (
              SELECT doc_id, length(text) AS n_chars,
                     len(list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '')) AS n_words,
                     len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\ba\b'))
                     + len(regexp_extract_all(text, '\bof\b'))
                     + len(regexp_extract_all(text, '\band\b'))
                     + len(regexp_extract_all(text, '\bto\b'))
                     + len(regexp_extract_all(text, '\bin\b')) AS n_stopwords,
                     len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
              FROM documents)
            SELECT doc_id, n_chars, n_words, n_stopwords, n_punct,
                   (n_words >= 20 AND n_stopwords * 100 >= n_words * 5)
                   AS is_quality
            FROM c
        """,
        # same feature CTE as text_quality; z is the identical
        # left-associated double expression as the Spark side, so the
        # sigmoid and the z>=0 label agree bit-for-bit
        "text_classifier": r"""
            WITH c AS (
              SELECT doc_id, length(text) AS n_chars,
                     len(list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '')) AS n_words,
                     len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\ba\b'))
                     + len(regexp_extract_all(text, '\bof\b'))
                     + len(regexp_extract_all(text, '\band\b'))
                     + len(regexp_extract_all(text, '\bto\b'))
                     + len(regexp_extract_all(text, '\bin\b')) AS n_stopwords,
                     len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
              FROM documents),
            f AS (
              SELECT doc_id,
                     -3.2 + 0.6 * ln(1.0 + n_words)
                     + 8.0 * (CASE WHEN n_words > 0
                              THEN CAST(n_stopwords AS DOUBLE) / n_words
                              ELSE 0.0 END)
                     + (-2.0) * (CASE WHEN n_chars > 0
                              THEN CAST(n_punct AS DOUBLE) / n_chars
                              ELSE 0.0 END) AS z
              FROM c)
            SELECT doc_id, z, 1.0 / (1.0 + exp(-z)) AS score,
                   CAST(z >= 0 AS INTEGER) AS label
            FROM f
        """,
        "rank_postings": r"""
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> '' GROUP BY 1, 2)
            SELECT word, count(*) AS df,
                   string_agg(doc_id || ':' || tf, ','
                              ORDER BY doc_id) AS postings
            FROM tf GROUP BY word HAVING count(*) >= 2
        """,
        "text_langid": r"""
            WITH c AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\ba\b'))
                     + len(regexp_extract_all(text, '\bof\b')) AS c_en,
                     len(regexp_extract_all(text, '\bel\b'))
                     + len(regexp_extract_all(text, '\bla\b'))
                     + len(regexp_extract_all(text, '\bde\b')) AS c_es,
                     len(regexp_extract_all(text, '\bder\b'))
                     + len(regexp_extract_all(text, '\bdie\b'))
                     + len(regexp_extract_all(text, '\bdas\b')) AS c_de,
                     len(regexp_extract_all(text, '\ble\b'))
                     + len(regexp_extract_all(text, '\bla\b'))
                     + len(regexp_extract_all(text, '\bet\b')) AS c_fr,
                     len(regexp_extract_all(text, '\b的\b'))
                     + len(regexp_extract_all(text, '\b是\b'))
                     + len(regexp_extract_all(text, '\b了\b')) AS c_zh
              FROM documents),
            g AS (SELECT *, greatest(c_en, c_es, c_de, c_fr, c_zh) AS best,
                         (c_en = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                       + (c_es = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                       + (c_de = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                       + (c_fr = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                       + (c_zh = greatest(c_en, c_es, c_de, c_fr, c_zh))::INT
                         AS nbest
                  FROM c)
            SELECT doc_id,
                   CASE WHEN best = 0 OR nbest > 1 THEN 'und'
                        WHEN c_en = best THEN 'en'
                        WHEN c_es = best THEN 'es'
                        WHEN c_de = best THEN 'de'
                        WHEN c_fr = best THEN 'fr'
                        ELSE 'zh' END AS predicted_lang
            FROM g
        """,
        # remove-duplicated-spans: 4-word grams appearing in >=2
        # distinct docs are hot; every word position covered by a hot
        # gram occurrence is dropped, survivors reassembled in order.
        # Parallel unnests in one SELECT zip (equal-length lists).
        "dedup_spans": r"""
            WITH arr AS (
              SELECT doc_id, string_split_regex(trim(text), ' +') AS l
              FROM documents
            ),
            w AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(l))) AS pos,
                     unnest(l) AS w
              FROM arr
            ),
            g AS (
              SELECT doc_id,
                     unnest(generate_series(1, greatest(len(l) - 3, 0)))
                       AS pos,
                     unnest(list_transform(
                       generate_series(1, greatest(len(l) - 3, 0)),
                       i -> array_to_string(l[i : i + 3], ' '))) AS gram
              FROM arr
            ),
            hot AS (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1
              ) WHERE nd >= 2
            ),
            cov AS (
              SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
              FROM g JOIN hot USING (gram)
              CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS o) o
            ),
            kept AS (
              SELECT w.doc_id, w.pos, w.w FROM w
              ANTI JOIN cov ON w.doc_id = cov.doc_id AND w.pos = cov.pos
              WHERE w.w <> ''
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(w, ' ' ORDER BY pos) AS cleaned_text
              FROM kept GROUP BY 1
            )
            SELECT arr.doc_id,
                   CAST(len(list_filter(l, x -> x <> '')) AS BIGINT)
                     AS n_words,
                   CAST(len(list_filter(l, x -> x <> ''))
                        - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
                   coalesce(cleaned_text, '') AS cleaned_text
            FROM arr LEFT JOIN agg ON arr.doc_id = agg.doc_id
        """,
        "text_fingerprint": r"""
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> ''))), ' ')) AS fp
            FROM documents
        """,
        "text_vocab": r"""
            SELECT w AS word,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), ' +')) AS w
              FROM documents
            ) WHERE w <> ''
            GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        """,
        # exact quantiles: DuckDB quantile_cont implements the same
        # rank = p*(n-1) linear interpolation as Spark's percentile;
        # the mean divides an exact integer sum
        "text_quantiles": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_len,
                   quantile_cont(n_chars, 0.25) AS q25,
                   quantile_cont(n_chars, 0.50) AS q50,
                   quantile_cont(n_chars, 0.75) AS q75,
                   quantile_cont(n_chars, 0.95) AS q95
            FROM documents GROUP BY 1
        """,
        # tf-idf: every float is a pure function of integer (tf, df, N)
        "rank_tfidf": r"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            tf AS (
              SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
              FROM words GROUP BY 1, 2
            ),
            df AS (
              SELECT w, count(*) AS df FROM tf
              GROUP BY 1 HAVING count(*) >= 2
            ),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.w AS word, tf.tf,
                     tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
              FROM tf JOIN df USING (w) CROSS JOIN n
            )
            SELECT doc_id, word, tf, score, CAST(rank AS INT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, word ASC
              ) AS rank FROM scored
            ) WHERE rank <= 3
        """,
        # BM25 with k1=1.2, b=0.75 over query terms (join, data, spark);
        # dl counts the same non-empty word_array tokens, avgdl stays
        # the exact integer pair total_len/n until the one division
        "rank_bm25": r"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            lens AS (
              SELECT d.doc_id, coalesce(w.c, 0) AS dl
              FROM documents d LEFT JOIN (
                SELECT doc_id, count(*) AS c FROM words GROUP BY 1
              ) w USING (doc_id)
            ),
            tot AS (
              SELECT CAST(sum(dl) AS DOUBLE) AS total_len,
                     CAST(count(*) AS DOUBLE) AS n
              FROM lens
            ),
            tfq AS (
              SELECT doc_id, w, count(*) AS tf FROM words
              WHERE w IN ('join', 'data', 'spark') GROUP BY 1, 2
            ),
            dfq AS (SELECT w, count(*) AS df FROM tfq GROUP BY 1),
            per AS (
              SELECT tfq.doc_id,
                     ln(1.0 + (tot.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tfq.tf * (1.2 + 1.0))
                     / (tfq.tf + 1.2 * (0.25 + 0.75 * lens.dl
                                        / (tot.total_len / tot.n))) AS s
              FROM tfq JOIN dfq USING (w) JOIN lens USING (doc_id)
              CROSS JOIN tot
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
                   sum(s) AS score
            FROM per GROUP BY 1
        """,
        # corpus unigram LM with add-1 smoothing; p(w) inputs are all
        # exact integers, the per-doc log-sum compares after the hash's
        # 6-decimal rounding
        "text_unigram_nll": r"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            tf AS (
              SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
              FROM words GROUP BY 1, 2
            ),
            lm AS (
              SELECT w, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
            ),
            tot AS (
              SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                     CAST(count(*) AS DOUBLE) AS v
              FROM lm
            ),
            per AS (
              SELECT tf.doc_id, tf.tf,
                     tf.tf * ln((lm.cnt + 1.0)
                                / (tot.total + 1.0 * (tot.v + 1.0)))
                       AS lp
              FROM tf JOIN lm USING (w) CROSS JOIN tot
            )
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
                   -sum(lp) / sum(tf) AS nll
            FROM per GROUP BY 1
        """,
        # corpus bigram LM, add-1 over (V+1) with V = unigram vocab;
        # heads derive from the LM table by splitting on the space
        "text_bigram_nll": r"""
            WITH wa AS (
              SELECT doc_id, string_split_regex(trim(text), ' +') AS l
              FROM documents
            ),
            bgs AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i + 1])) AS bg
              FROM wa
            ),
            tf AS (
              SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf
              FROM bgs GROUP BY 1, 2
            ),
            lm AS (
              SELECT bg, CAST(sum(tf) AS BIGINT) AS cnt
              FROM tf GROUP BY 1
            ),
            heads AS (
              SELECT split_part(bg, ' ', 1) AS w1,
                     CAST(sum(cnt) AS BIGINT) AS head_cnt
              FROM lm GROUP BY 1
            ),
            voc AS (
              SELECT CAST(count(DISTINCT u) AS DOUBLE) AS v FROM (
                SELECT unnest(string_split_regex(trim(text), ' +')) AS u
                FROM documents
              ) WHERE u <> ''
            ),
            per AS (
              SELECT tf.doc_id, tf.tf,
                     tf.tf * ln((lm.cnt + 1.0)
                                / (heads.head_cnt
                                   + 1.0 * (voc.v + 1.0))) AS lp
              FROM tf
              JOIN lm USING (bg)
              JOIN heads ON split_part(tf.bg, ' ', 1) = heads.w1
              CROSS JOIN voc
            )
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
                   -sum(lp) / sum(tf) AS nll
            FROM per GROUP BY 1
        """,
        # character-histogram entropy + type-token ratio; all-integer
        # inputs -> engine-identical floats
        "text_entropy": r"""
            WITH ch AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, length(text)),
                       i -> substr(text, i, 1))) AS ch
              FROM documents
            ),
            hist AS (
              SELECT doc_id, ch, count(*) AS n FROM ch GROUP BY 1, 2
            ),
            ent AS (
              SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars_counted,
                     -sum(n * log2(n)) / sum(n) + log2(sum(n))
                       AS char_entropy
              FROM hist GROUP BY 1
            ),
            w2 AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            ws AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                     CAST(count(DISTINCT w) AS DOUBLE) / count(*) AS ttr
              FROM w2 GROUP BY 1
            )
            SELECT ent.doc_id, ent.n_chars_counted, ent.char_entropy,
                   COALESCE(ws.n_words, 0) AS n_words,
                   COALESCE(ws.ttr, 0.0) AS ttr
            FROM ent LEFT JOIN ws USING (doc_id)
        """,
        # sentence segmentation on terminal-punctuation runs over the
        # md5-sampled synthesized pages; sent_id is the raw-split
        # position (empties dropped)
        "text_sentences": _KG_CTE + f"""
            , pg AS (
              SELECT url, text FROM opage
              UNION ALL
              SELECT url, text FROM dpage
            ),
            sampled AS (
              SELECT url, text FROM pg
              WHERE substr(md5('sent' || url), 1, 8)
                      < '{_sent_thr()}'
            ),
            segs AS (
              SELECT url,
                     regexp_split_to_array(text,
                       '[.!?]+(\\s+|$)') AS a
              FROM sampled
            ),
            ex AS (
              SELECT url,
                     unnest(generate_series(1, len(a))) AS i, a
              FROM segs
            ),
            s AS (
              SELECT url, CAST(i - 1 AS INT) AS sent_id,
                     trim(a[i]) AS sentence
              FROM ex
            )
            SELECT url, sent_id, sentence,
                   len(string_split_regex(sentence, ' +')) AS n_words
            FROM s WHERE sentence <> ''
        """,
        # same sentence split + sample as text_sentences, grouped on
        # the sentence hash; boilerplate = present in ≥2 distinct urls
        "dedup_sentences": _KG_CTE + f"""
            , pg AS (
              SELECT url, text FROM opage
              UNION ALL
              SELECT url, text FROM dpage
            ),
            sampled AS (
              SELECT url, text FROM pg
              WHERE substr(md5('sent' || url), 1, 8)
                      < '{_sent_thr()}'
            ),
            segs AS (
              SELECT url,
                     regexp_split_to_array(text,
                       '[.!?]+(\\s+|$)') AS a
              FROM sampled
            ),
            ex AS (
              SELECT url,
                     unnest(generate_series(1, len(a))) AS i, a
              FROM segs
            ),
            s AS (
              SELECT url, trim(a[i]) AS sentence FROM ex
            )
            SELECT md5(sentence) AS sent_hash,
                   CAST(count(DISTINCT url) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   min(url) AS canonical_doc,
                   min(sentence) AS sentence
            FROM s WHERE sentence <> ''
            GROUP BY 1 HAVING count(DISTINCT url) >= 2
        """,
        # identical pair multiset, stated as a per-document
        # list-comprehension flatten instead of the banded self-join
        "text_skipgrams": """
            WITH d AS (
              SELECT string_split_regex(trim(text), ' +') AS l
              FROM documents WHERE trim(text) <> ''),
            p AS (
              SELECT unnest(flatten(list_transform(
                       generate_series(1, len(l)), i ->
                       list_transform(
                         list_filter(
                           generate_series(greatest(1, i - 2),
                                           least(len(l), i + 2)),
                           j -> j != i),
                         j -> l[i] || chr(1) || l[j])))) AS pr
              FROM d)
            SELECT split_part(pr, chr(1), 1) AS center,
                   split_part(pr, chr(1), 2) AS context,
                   CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # per-pixel |Δ| between consecutive frames is 3, or 248 at the
        # mod-251 wrap; cut = above-mean pair diff, cross-multiplied
        "multimodal_scenes": """
            WITH b AS (
              SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
                     4 + doc_id % 5 AS nf
              FROM documents),
            pd AS (
              SELECT b.doc_id, gf.f,
                     3 * SUM(CASE WHEN (b.doc_id + 3 * gf.f + gx.x
                                        + 2 * gy.y) % 251 < 3
                                  THEN 248 ELSE 3 END) AS diff
              FROM b
              CROSS JOIN generate_series(1, 7) gf(f)
              CROSS JOIN generate_series(0, 6) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gf.f < b.nf AND gx.x < b.w AND gy.y < b.h
              GROUP BY 1, 2),
            t AS (
              SELECT doc_id, SUM(diff) AS tot, COUNT(*) AS np
              FROM pd GROUP BY 1),
            c AS (
              SELECT pd.doc_id, pd.f,
                     CASE WHEN t.tot > 0
                               AND pd.diff * t.np >= t.tot
                          THEN 1 ELSE 0 END AS cut
              FROM pd JOIN t ON pd.doc_id = t.doc_id),
            sc AS (
              SELECT doc_id, f AS frame,
                     SUM(cut) OVER (PARTITION BY doc_id
                                    ORDER BY f) AS scene_id
              FROM c),
            pf AS (
              SELECT doc_id, 0 AS frame, 0 AS scene_id FROM b
              UNION ALL
              SELECT doc_id, frame, scene_id FROM sc)
            SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
                   CAST(MIN(frame) AS BIGINT) AS start_frame,
                   CAST(MAX(frame) AS BIGINT) AS end_frame,
                   CAST(COUNT(*) AS BIGINT) AS n_frames
            FROM pf GROUP BY doc_id, scene_id
        """,
        # TPC-H Q1 with every money value in integer centi-cents
        "olap_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
                     AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                     AS BIGINT)) AS BIGINT) AS sum_base_cc,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                       AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0)
                       AS BIGINT))) AS BIGINT) AS sum_disc_cc,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                       AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0)
                       AS BIGINT))
                     * (100 + CAST(ROUND(l_tax * 100, 0)
                       AS BIGINT))) AS BIGINT) AS sum_charge_cc,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY 1, 2
        """,
        # same-page surface pairing over the mention oracle's rows
        "kg_cooccurrence": _KG_CTE + """
            , m AS (
              SELECT url, 'Order-' || o AS subj_surface,
                     subj_surface AS obj_surface FROM opage
              UNION ALL
              SELECT url, subj_surface, nation_surface FROM opage
              UNION ALL
              SELECT url, 'Client-' || k, 'Customer#' || k
              FROM opage WHERE o % 5 = 0
              UNION ALL
              SELECT url, 'Client2-' || k, 'Client-' || k
              FROM opage WHERE o % 25 = 0),
            s AS (
              SELECT DISTINCT url, surface FROM (
                SELECT url, subj_surface AS surface FROM m
                UNION ALL
                SELECT url, obj_surface FROM m) q)
            SELECT a.surface AS ent_a, b.surface AS ent_b,
                   count(*) AS n_pages
            FROM s a JOIN s b
              ON a.url = b.url AND a.surface < b.surface
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "rank_precision": """
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word IN ('join', 'data', 'spark') GROUP BY 1, 2),
            r AS (
              SELECT word, doc_id,
                     row_number() OVER (PARTITION BY word
                       ORDER BY tf DESC, doc_id ASC) AS rn
              FROM tf)
            SELECT word AS term, CAST(5 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_ranked,
                   CAST(SUM(CASE WHEN rn <= 5 AND doc_id % 13 = 0
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_rel_at_k
            FROM r GROUP BY 1
        """,
        # DSIR importance weights: string md5-prefix buckets (no int
        # conversion), integer counts in, closed-form floats out
        "rank_dsir": r"""
            WITH wa AS (
              SELECT doc_id, lang,
                     string_split_regex(trim(text), ' +') AS l
              FROM documents
            ),
            feats AS (
              SELECT doc_id, lang, feat FROM (
                SELECT doc_id, lang, unnest(l) AS feat FROM wa
              ) WHERE feat <> ''
              UNION ALL
              SELECT doc_id, lang,
                     unnest(list_transform(
                       generate_series(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i + 1])) AS feat
              FROM wa
            ),
            fb AS (
              SELECT doc_id, lang = 'en' AS is_t,
                     substr(md5(feat), 1, 3) AS bucket
              FROM feats
            ),
            pd AS (
              SELECT doc_id, is_t, bucket, count(*) AS n
              FROM fb GROUP BY 1, 2, 3
            ),
            raw AS (
              SELECT bucket, CAST(sum(n) AS BIGINT) AS r
              FROM pd GROUP BY 1
            ),
            tgt AS (
              SELECT bucket, CAST(sum(n) AS BIGINT) AS t
              FROM pd WHERE is_t GROUP BY 1
            ),
            tot AS (
              SELECT CAST(sum(n) AS DOUBLE) AS r_total,
                     CAST(sum(CASE WHEN is_t THEN n ELSE 0 END)
                          AS DOUBLE) AS t_total
              FROM pd
            ),
            lr AS (
              SELECT raw.bucket,
                     ln((COALESCE(tgt.t, 0) + 1.0)
                        / (tot.t_total + 4096.0))
                   - ln((raw.r + 1.0) / (tot.r_total + 4096.0)) AS lr
              FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
            )
            SELECT pd.doc_id, CAST(sum(pd.n) AS BIGINT) AS n_features,
                   sum(pd.n * lr.lr) / sum(pd.n) AS logweight
            FROM pd JOIN lr USING (bucket) GROUP BY 1
        """,
        # BPE merge-step pair counts over the vocabulary, word-weighted
        "text_bpe_pairs": r"""
            WITH w AS (
              SELECT unnest(string_split_regex(trim(text), ' +'))
                       AS word
              FROM documents
            ),
            v AS (
              SELECT word, count(*) AS wc FROM w
              WHERE word <> '' GROUP BY 1
            ),
            p AS (
              SELECT wc,
                     unnest(list_transform(
                       generate_series(1, length(word) - 1),
                       i -> substr(word, i, 2))) AS pair
              FROM v WHERE length(word) >= 2
            )
            SELECT pair, CAST(sum(wc) AS BIGINT) AS n
            FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 50
        """,
        # canonical text cleaning; regexp semantics shared (\s, hex
        # classes), boolean pre-cast to int for the hash compare
        "curation_normalize": r"""
            WITH n AS (
              SELECT doc_id, text,
                     lower(trim(regexp_replace(regexp_replace(
                       text, '[\x00-\x1f\x7f]', ' ', 'g'),
                       '\s+', ' ', 'g'))) AS text_norm
              FROM documents
            )
            SELECT doc_id,
                   CAST(length(text_norm) AS INTEGER) AS n_chars_norm,
                   CAST(text_norm <> text AS INTEGER) AS changed,
                   substr(text_norm, 1, 32) AS norm_prefix
            FROM n
        """,
        # deterministic HLL: identical register table on both engines
        # (md5 buckets + bin() leading-zeros), harmonic sum in EXACT
        # integer arithmetic, one final division of agreed numbers
        "sketch_distinct_words": _hll_oracle(),
        # Efraimidis–Spirakis weighted sample: the oracle states the
        # semantics as ONE direct window over the exponential keys;
        # the engine's two-phase shard windows must pick the same rows
        "curation_weighted": r"""
            WITH keyed AS (
              SELECT doc_id, n_chars,
                     -ln((('0x' || substr(md5('ws' ||
                              CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                           + 1) / 281474976710657.0)
                       / CAST(n_chars AS DOUBLE) AS e
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, n_chars,
                   CAST(ROW_NUMBER() OVER (ORDER BY e, doc_id)
                        AS INTEGER) AS sample_rank
            FROM keyed
            QUALIFY sample_rank <= 100
        """,
        # exact per-stratum top-n by sampling hash — the oracle states
        # the semantics as ONE direct window; the engine's two-phase
        # shard windows must select the identical rows
        "curation_stratified": """
            SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
            FROM (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY lang ORDER BY
                  substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 8),
                  doc_id
              ) AS sample_rank
              FROM documents
            ) WHERE sample_rank <= 20
        """,
        "cluster_kmeans": _kmeans_oracle(k=4, iters=2),
        # integer fixed-point PageRank: the unrolled-CTE oracle is
        # bit-identical to the Spark fixpoint (all-BIGINT arithmetic)
        "graph_pagerank": _pagerank_oracle(iterations=6),
        "graph_degrees": "WITH " + _ENTITY_EDGES_SQL + """,
            outd AS (SELECT src AS node, count(*) AS d FROM edges
                     GROUP BY 1),
            ind AS (SELECT dst AS node, count(*) AS d FROM edges
                    GROUP BY 1),
            deg AS (
              SELECT COALESCE(o.node, i.node) AS node,
                     CAST(COALESCE(o.d, 0) AS BIGINT) AS out_degree,
                     CAST(COALESCE(i.d, 0) AS BIGINT) AS in_degree
              FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
            )
            SELECT out_degree, in_degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY 1, 2
        """,
        "dedup_semantic": _semantic_dedup_oracle(k=4, iters=2, thr=0.35),
        # deterministic md5-hash sampling: identical expression in both
        # engines; thresholds are rate_threshold() values (0.1 →
        # int(0.1 * 16^8) = 0x19999999, 0.5 → 80000000, 0.25 →
        # 40000000, 1.0 → 'g' which every hex digit sorts below)
        "curation_sample": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5('r3' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '19999999'
        """,
        "curation_mix": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < CASE lang WHEN 'en' THEN '80000000'
                              WHEN 'zh' THEN 'g'
                              ELSE '40000000' END
        """,
        # closed form: the base corpus text is digit- and @-free
        # (verified), so every PII hit is a plant indicator and the
        # redacted text is base || typed placeholders — the oracle never
        # runs a regex, pinning the engine's patterns to derived truth
        "curation_pii": """
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
                     AS n_emails,
                   CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT)
                     AS n_phones,
                   CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT)
                     AS n_ips,
                   CAST(CASE WHEN doc_id % 3 = 0 OR doc_id % 5 = 0
                             OR doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT)
                     AS has_pii,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN ' contact <EMAIL>'
                           ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN ' call <PHONE>'
                           ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN ' ip <IP>'
                           ELSE '' END AS redacted
            FROM documents
        """,
        "curation_repetition": r"""
            WITH arr AS (
              SELECT doc_id, string_split_regex(trim(text), ' +') AS l
              FROM documents
            ),
            w AS (SELECT doc_id, unnest(l) AS w FROM arr),
            pw AS (SELECT doc_id, w, count(*) AS c FROM w
                   WHERE w <> '' GROUP BY 1, 2),
            ws AS (
              SELECT doc_id, SUM(c) AS n_words,
                     COUNT(*) AS n_distinct_words, MAX(c) AS top_word_count
              FROM pw GROUP BY 1
            ),
            bg AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(l) - 1),
                                           i -> l[i] || ' ' || l[i + 1])) AS b
              FROM arr
            ),
            pb AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
            bs AS (
              SELECT doc_id, SUM(c) AS n_bigrams,
                     COUNT(*) AS n_distinct_bigrams,
                     MAX(c) AS top_bigram_count
              FROM pb GROUP BY 1
            )
            SELECT ws.doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
                   CAST(top_word_count AS BIGINT) AS top_word_count,
                   CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(n_distinct_bigrams, 0) AS BIGINT)
                     AS n_distinct_bigrams,
                   CAST(COALESCE(top_bigram_count, 0) AS BIGINT)
                     AS top_bigram_count
            FROM ws LEFT JOIN bs USING (doc_id)
        """,
        # closed-form URL reconstruction (pages.py formulas): hosts are
        # exN.test (orders) + docs.test (documents); 2-label hosts make
        # host == registrable domain
        "curation_domain_stats": """
            WITH u AS (
              SELECT 'ex' || (o_custkey % 100) || '.test' AS domain
              FROM orders
              UNION ALL SELECT 'docs.test' FROM documents
            )
            SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(1 AS BIGINT) AS n_hosts
            FROM u GROUP BY domain
        """,
        "curation_domain_cap": """
            WITH u AS (
              SELECT 'http://ex' || (o_custkey % 100) || '.test/o'
                       || o_orderkey AS url,
                     'ex' || (o_custkey % 100) || '.test' AS domain
              FROM orders
              UNION ALL
              SELECT 'http://docs.test/d' || doc_id, 'docs.test'
              FROM documents
            )
            SELECT url, domain FROM (
              SELECT url, domain,
                     row_number() OVER (PARTITION BY domain ORDER BY url)
                       AS rn
              FROM u
            ) WHERE rn <= 5
        """,
        # benchmark decontamination: distinct 4-word-grams per doc,
        # benchmark = doc_id % 97 == 0, corpus docs sharing any gram
        # with the benchmark are flagged with (total, contaminated)
        # gram counts
        "curation_decontaminate": r"""
            WITH arr AS (
              SELECT doc_id, string_split_regex(trim(text), ' +') AS l
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(l) - 3, 0)),
                         i -> array_to_string(l[i : i + 3], ' '))) AS gram
                FROM arr)
            ),
            bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            tot AS (SELECT doc_id, count(*) AS n_grams FROM g
                    WHERE doc_id % 97 <> 0 GROUP BY 1),
            hit AS (SELECT g.doc_id, count(*) AS n_contaminated
                    FROM g JOIN bench USING (gram)
                    WHERE g.doc_id % 97 <> 0 GROUP BY 1)
            SELECT hit.doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                   CAST(n_contaminated AS BIGINT) AS n_contaminated
            FROM hit JOIN tot ON hit.doc_id = tot.doc_id
        """,
        # 64-token chunks, 16 overlap → stride 48; n_chunks =
        # 1 + max(0, ceil((n - 64) / 48)); chunk k covers tokens
        # [48k+1, min(48k+64, n)] (1-based inclusive, DuckDB slicing)
        "pack_chunks": r"""
            WITH arr AS (
              SELECT doc_id, string_split_regex(trim(text), ' +') AS l,
                     len(string_split_regex(trim(text), ' +')) AS n
              FROM documents
            ),
            c AS (
              SELECT doc_id, l, n,
                     unnest(generate_series(0,
                       greatest(0, CAST(ceil((n - 64) / 48.0) AS INT))))
                       AS chunk_id
              FROM arr
            )
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   CAST(least(48 * chunk_id + 64, n)
                        - (48 * chunk_id + 1) + 1 AS INT)
                     AS n_chunk_tokens,
                   array_to_string(
                     l[48 * chunk_id + 1 : least(48 * chunk_id + 64, n)],
                     ' ') AS chunk
            FROM c
        """,
        # contiguous packing: shard = floor(starting token offset /
        # 5000) under one global prefix sum in doc_id order — the
        # single-window formulation the distributed two-phase prefix
        # sum must reproduce exactly
        "pack_shards": r"""
            WITH t AS (
              SELECT doc_id,
                     len(string_split_regex(trim(text), ' +')) AS n_tokens
              FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                   CAST(floor(
                     (SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) / 5000.0
                   ) AS BIGINT) AS shard
            FROM t
        """,
        # count-min: identical md5-salted counter table both engines;
        # integer mins, one-sided error visible as cms_n >= exact_n
        "sketch_word_counts": r"""
            WITH w AS (
              SELECT word FROM (
                SELECT unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents
              ) WHERE word <> ''
            ),
            ex AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
            top AS (
              SELECT word, n FROM ex ORDER BY n DESC, word LIMIT 20
            ),
            cnt AS (
              SELECT r.r AS row,
                     substr(md5('cm' || r.r || ':' || word), 1, 3)
                       AS bucket,
                     count(*) AS c
              FROM w CROSS JOIN generate_series(0, 3) r(r)
              GROUP BY 1, 2
            ),
            est AS (
              SELECT t.word, min(c.c) AS cms_n
              FROM top t
              CROSS JOIN generate_series(0, 3) r(r)
              JOIN cnt c ON c.row = r.r
               AND c.bucket = substr(md5('cm' || r.r || ':' || t.word),
                                     1, 3)
              GROUP BY 1
            )
            SELECT top.word, top.n AS exact_n, est.cms_n
            FROM top JOIN est USING (word)
        """,
        # sequence-packing manifest: oracle = one global window prefix
        # sum + generate_series over the doc's sequence span
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     len(string_split_regex(trim(text), ' +')) + 1
                       AS l
              FROM documents
            ),
            s AS (
              SELECT doc_id, l,
                     CAST(SUM(l) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - l AS BIGINT) AS st
              FROM t
            ),
            ex AS (
              SELECT doc_id, st, l,
                     unnest(generate_series(st // 128,
                                            (st + l - 1) // 128))
                       AS seq_id
              FROM s
            )
            SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                   CAST(greatest(st, seq_id * 128) - seq_id * 128
                        AS INTEGER) AS offset_in_seq,
                   CAST(least(st + l, (seq_id + 1) * 128)
                        - greatest(st, seq_id * 128)
                        AS INTEGER) AS n_tokens_in_seq
            FROM ex
        """,
        "multimodal_sniff": _KG_CTE + """
            SELECT url,
                   octet_length(encode('<html><head><title>Order ' || o
                     || '</title></head><body><p>' || text
                     || '</p></body></html>')) AS n_bytes,
                   'text/html' AS sniffed_type
            FROM opage
            UNION ALL
            SELECT url,
                   octet_length(encode('<html><head><title>' || title
                     || '</title></head><body><p>' || text
                     || '</p></body></html>')) AS n_bytes,
                   'text/html' AS sniffed_type
            FROM dpage
        """,
        "multimodal_decode": """
            WITH b AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
                       FROM documents),
            px AS (
              SELECT b.doc_id,
                     3 * SUM((b.doc_id + gx.x + 2 * gy.y) % 251) AS pixel_sum
              FROM b
              CROSS JOIN generate_series(0, 6) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gx.x < b.w AND gy.y < b.h
              GROUP BY 1),
            png AS (SELECT doc_id, 1 + doc_id % 6 AS w, 1 + doc_id % 4 AS h
                    FROM documents),
            ppx AS (
              SELECT png.doc_id,
                     3 * SUM((png.doc_id + 5 * gx.x + 3 * gy.y) % 251)
                     AS pixel_sum
              FROM png
              CROSS JOIN generate_series(0, 5) gx(x)
              CROSS JOIN generate_series(0, 3) gy(y)
              WHERE gx.x < png.w AND gy.y < png.h
              GROUP BY 1),
            gif AS (SELECT doc_id, 1 + doc_id % 8 AS w, 1 + doc_id % 3 AS h
                    FROM documents),
            gpx AS (
              SELECT gif.doc_id,
                     3 * SUM((gif.doc_id + 2 * gx.x + 7 * gy.y) % 251)
                     AS pixel_sum
              FROM gif
              CROSS JOIN generate_series(0, 7) gx(x)
              CROSS JOIN generate_series(0, 2) gy(y)
              WHERE gx.x < gif.w AND gy.y < gif.h
              GROUP BY 1),
            wv AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
            ws AS (
              SELECT w.doc_id,
                     SUM(((w.doc_id * 7 + gi.i) % 65536) - 32768) AS sample_sum
              FROM wv w CROSS JOIN generate_series(0, 95) gi(i)
              WHERE gi.i < w.n
              GROUP BY 1)
            SELECT b.doc_id, 'bmp' AS kind,
                   CAST(b.w AS BIGINT) AS width, CAST(b.h AS BIGINT) AS height,
                   CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
                   CAST(b.doc_id % 251 AS BIGINT) AS first_px,
                   CAST(-1 AS BIGINT) AS sample_rate,
                   CAST(-1 AS BIGINT) AS n_samples,
                   CAST(-1 AS BIGINT) AS sample_sum,
                   CAST(-1 AS BIGINT) AS first_sample,
                   CAST(-1 AS BIGINT) AS duration_us
            FROM b JOIN px USING (doc_id)
            UNION ALL
            SELECT png.doc_id, 'png',
                   CAST(png.w AS BIGINT), CAST(png.h AS BIGINT),
                   CAST(ppx.pixel_sum AS BIGINT),
                   CAST(png.doc_id % 251 AS BIGINT),
                   -1, -1, -1, -1, -1
            FROM png JOIN ppx USING (doc_id)
            UNION ALL
            SELECT gif.doc_id, 'gif',
                   CAST(gif.w AS BIGINT), CAST(gif.h AS BIGINT),
                   CAST(gpx.pixel_sum AS BIGINT),
                   CAST(gif.doc_id % 251 AS BIGINT),
                   -1, -1, -1, -1, -1
            FROM gif JOIN gpx USING (doc_id)
            UNION ALL
            SELECT w.doc_id, 'wav', -1, -1, -1, -1,
                   8000, w.n, CAST(ws.sample_sum AS BIGINT),
                   ((w.doc_id * 7) % 65536) - 32768, w.n * 125
            FROM wv w JOIN ws USING (doc_id)
        """,
        # resize: nearest-neighbor 2x downsample of the synthetic BMPs —
        # sampled pixel (x', y') carries (d + 2x' + 4y') % 251; out_bytes
        # = BMP header + 4-byte-padded stride x rows of the re-encode
        # audio features: closed-form recompute of the WAV sample
        # formula v(d,i) = ((d*7+i) % 65536) - 32768, n = 64 + d%32;
        # peak_window over FULL 16-sample windows only, ties -> lowest
        "multimodal_audio_features": """
            WITH b AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
            s AS (
              SELECT b.doc_id, gi.i AS i, b.n,
                     ((b.doc_id * 7 + gi.i) % 65536) - 32768 AS v
              FROM b CROSS JOIN generate_series(0, 95) gi(i)
              WHERE gi.i < b.n),
            agg AS (
              SELECT doc_id, max(n) AS n_samples,
                     SUM(v * v) AS energy_sum, MAX(abs(v)) AS max_abs
              FROM s GROUP BY 1),
            zc AS (
              SELECT doc_id,
                     SUM(CASE WHEN (prev < 0) <> (v < 0) THEN 1 ELSE 0 END)
                     AS zero_crossings
              FROM (SELECT doc_id, v,
                           lag(v) OVER (PARTITION BY doc_id ORDER BY i)
                           AS prev
                    FROM s)
              WHERE prev IS NOT NULL GROUP BY 1),
            wins AS (
              SELECT doc_id, i // 16 AS w, SUM(v * v) AS e
              FROM s WHERE i < 16 * (n // 16)
              GROUP BY 1, 2),
            peak AS (
              SELECT doc_id, w AS peak_window
              FROM (SELECT doc_id, w,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY e DESC, w ASC) AS rn
                    FROM wins)
              WHERE rn = 1)
            SELECT a.doc_id, CAST(a.n_samples AS BIGINT) AS n_samples,
                   CAST(a.energy_sum AS BIGINT) AS energy_sum,
                   CAST(a.max_abs AS BIGINT) AS max_abs,
                   CAST(zc.zero_crossings AS BIGINT) AS zero_crossings,
                   CAST(peak.peak_window AS BIGINT) AS peak_window
            FROM agg a JOIN zc USING (doc_id) JOIN peak USING (doc_id)
        """,
        "multimodal_resize": """
            WITH b AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
                       FROM documents),
            d AS (SELECT doc_id, w, h,
                         (w + 1) // 2 AS nw, (h + 1) // 2 AS nh
                  FROM b),
            px AS (
              SELECT d.doc_id,
                     3 * SUM((d.doc_id + 2 * gx.x + 4 * gy.y) % 251)
                       AS pixel_sum
              FROM d
              CROSS JOIN generate_series(0, 3) gx(x)
              CROSS JOIN generate_series(0, 2) gy(y)
              WHERE gx.x < d.nw AND gy.y < d.nh
              GROUP BY 1)
            SELECT d.doc_id,
                   CAST(d.w AS BIGINT) AS width,
                   CAST(d.h AS BIGINT) AS height,
                   CAST(d.nw AS BIGINT) AS new_width,
                   CAST(d.nh AS BIGINT) AS new_height,
                   CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
                   CAST(54 + ((d.nw * 3 + 3) - ((d.nw * 3 + 3) % 4)) * d.nh
                        AS BIGINT) AS out_bytes
            FROM d JOIN px USING (doc_id)
        """,
        # frame-sample: every 2nd frame of the 4 + d%5 FVID frames;
        # frame f pixel (x, y) carries (d + 3f + x + 2y) % 251
        "multimodal_frames": """
            WITH b AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
                              4 + doc_id % 5 AS nf
                       FROM documents),
            fr AS (SELECT b.doc_id, b.w, b.h, gf.f
                   FROM b CROSS JOIN generate_series(0, 7) gf(f)
                   WHERE gf.f < b.nf AND gf.f % 2 = 0),
            px AS (
              SELECT fr.doc_id, fr.f,
                     3 * SUM((fr.doc_id + 3 * fr.f + gx.x + 2 * gy.y) % 251)
                       AS pixel_sum
              FROM fr
              CROSS JOIN generate_series(0, 6) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gx.x < fr.w AND gy.y < fr.h
              GROUP BY 1, 2)
            SELECT fr.doc_id,
                   CAST(fr.f AS BIGINT) AS frame_idx,
                   CAST(fr.w AS BIGINT) AS width,
                   CAST(fr.h AS BIGINT) AS height,
                   CAST(px.pixel_sum AS BIGINT) AS pixel_sum
            FROM fr JOIN px ON px.doc_id = fr.doc_id AND px.f = fr.f
        """,
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL THEN 1
                          WHEN floor(epoch(ts))::BIGINT
                             - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                          THEN 1 ELSE 0 END AS newf
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, ts,
                         CAST(SUM(newf) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                  FROM g)
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        # streaming twin: batch sessions restricted to the set the
        # stream's final real watermark (max ts - 30 min delay) proves
        # closed (session_end + 30 min gap <= watermark, ms floor)
        "events_sessionize_stream": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL THEN 1
                          WHEN floor(epoch(ts))::BIGINT
                             - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                          THEN 1 ELSE 0 END AS newf
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, ts,
                         CAST(SUM(newf) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                  FROM g),
            sess AS (SELECT user_id, session_seq,
                            min(ts) AS session_start,
                            max(ts) AS session_end,
                            count(*) AS n_events
                     FROM s GROUP BY 1, 2),
            m AS (SELECT epoch_ms(max(ts)) AS mx FROM events)
            SELECT sess.user_id, sess.session_seq, sess.session_start,
                   sess.session_end, sess.n_events
            FROM sess, m
            WHERE epoch_ms(session_end) + 1800000 <= mx - 1800000
        """,
        # as-of join: each click to the same user's latest view with
        # view_ts <= click_ts; ties on ts break to the highest view id
        # — the range-join + row_number formulation states the ASOF
        # semantics independently of the engine's union+window plan
        "events_asof": """
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'view'),
            c AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click'),
            p AS (
              SELECT c.event_id AS probe_id, c.user_id,
                     c.ts AS probe_ts, v.event_id AS ref_id,
                     v.ts AS ref_ts, v.value AS ref_value,
                     row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY v.ts DESC, v.event_id DESC) AS rn
              FROM c JOIN v
                ON v.user_id = c.user_id AND v.ts <= c.ts)
            SELECT probe_id, user_id, probe_ts, ref_id, ref_ts,
                   ref_value,
                   CAST(date_diff('microsecond', ref_ts, probe_ts)
                        AS BIGINT) AS gap_us
            FROM p WHERE rn = 1
        """,
        # funnel: the oracle states the semantics as the min-ts join
        # chain (min t1; min t2 > t1; min t3 > t2) — an independent
        # formulation of the Spark side's single-pass greedy HOF scan
        "events_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                   GROUP BY 1),
            c AS (
              SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
                     count(*) AS n_users FROM s1
              UNION ALL
              SELECT 2, 'click', count(*) FROM s2
              UNION ALL
              SELECT 3, 'purchase', count(*) FROM s3)
            SELECT step_idx, step, n_users FROM c WHERE n_users > 0
        """,
        "events_retention": """
            WITH f AS (SELECT user_id,
                              CAST(min(date_trunc('week', ts))
                                   AS TIMESTAMP) AS cohort_week
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
                  FROM events)
            SELECT cohort_week,
                   CAST(floor(date_diff('day', cohort_week, w) / 7)
                        AS BIGINT) AS week_offset,
                   count(DISTINCT a.user_id) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "events_rollup": """
            WITH e AS (SELECT event_type,
                              CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                              value FROM events)
            SELECT event_type, day,
                   CAST(GROUPING(event_type, day) AS BIGINT) AS gid,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value
            FROM e GROUP BY ROLLUP(event_type, day)
        """,
        "events_anomaly": """
            WITH s AS (SELECT event_type, count(*) AS n,
                              CAST(SUM(CAST(value AS DECIMAL(18,6)))
                                   AS DOUBLE) AS sm
                       FROM events GROUP BY 1)
            SELECT event_id, user_id, e.event_type, value
            FROM events e JOIN s USING (event_type)
            WHERE value * CAST(n AS DOUBLE) > 4.0 * sm
        """,
        "graph_copurchase": """
            WITH g AS (
              SELECT DISTINCT l_orderkey AS gk, l_partkey AS item
              FROM lineitem)
            SELECT a.item AS item_a, b.item AS item_b,
                   count(*) AS support
            FROM g a JOIN g b ON a.gk = b.gk AND a.item < b.item
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "text_bpe_train": _bpe_train_sql(5),
        "text_bpe_encode": _bpe_encode_sql(5),
        # exact-rational Flesch: the same min-1 clamps, the same
        # sentence/vowel-group regexes, and the integer cross-multiplied
        # score formula — no float crosses the engine boundary
        "text_readability": r"""
            WITH f AS (
              SELECT doc_id,
                     CAST(greatest(1, CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), ' +'))
                       END) AS BIGINT) AS w,
                     CAST(greatest(1, len(regexp_extract_all(text,
                       '[.!?]+(\s+|$)'))) AS BIGINT) AS s,
                     CAST(COALESCE(list_sum(list_transform(
                       string_split_regex(trim(text), ' +'),
                       x -> CASE WHEN x = '' THEN 0
                            ELSE greatest(1, len(regexp_extract_all(
                                   lower(x), '[aeiouy]+'))) END)), 0)
                       AS BIGINT) AS syl
              FROM documents)
            SELECT doc_id, s AS n_sentences, w AS n_words,
                   syl AS n_syllables,
                   CAST(206835 * s * w - 1015 * w * w
                        - 84600 * syl * s AS BIGINT) AS fre_num,
                   CAST(1000 * s * w AS BIGINT) AS fre_den
            FROM f
        """,
        "graph_hits": _hits_oracle(3),
        # the oracle rebuilds the identical anchor-bearing HTML and
        # runs the same tag/href/anchor regexes + the same top-k window
        "kg_anchor_text": """
            WITH p AS (
              SELECT '<html><body><a href="http://ex'
                     || ((o_custkey + 1) % 100)
                     || '.test/x">buy widget ' || (o_orderkey % 5)
                     || '</a><a href="http://ex'
                     || ((o_custkey + 7) % 100)
                     || '.test/y">cheap widget</a>'
                     || CASE WHEN o_orderkey % 3 = 0
                             THEN '<a href="http://docs.test/z">'
                                  || 'read the docs</a>'
                             ELSE '' END
                     || '<a href="/rel">skip me</a>'
                     || '<a href="mailto:a@b.test">mail me</a>'
                     || '</body></html>' AS html
              FROM orders),
            t AS (
              SELECT unnest(regexp_extract_all(html,
                       '<a href="[^"]*"[^>]*>[^<]*</a>')) AS tag
              FROM p),
            a AS (
              SELECT lower(regexp_extract(
                       regexp_extract(tag, 'href="([^"]*)"', 1),
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host,
                     regexp_extract(tag, '>([^<]*)</a>', 1) AS anchor
              FROM t),
            c AS (
              SELECT dst_host, term, count(*) AS n_anchors FROM (
                SELECT dst_host,
                       unnest(string_split_regex(
                         trim(lower(anchor)), ' +')) AS term
                FROM a WHERE dst_host <> '') x
              WHERE term <> '' GROUP BY 1, 2)
            SELECT dst_host, term, n_anchors, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY dst_host
                ORDER BY n_anchors DESC, term ASC) AS rank
              FROM c) r
            WHERE rank <= 5
        """,
        # same <loc> regex + NOT EXISTS against the frontier; the
        # relative loc drops on the empty-host filter both sides
        "crawl_sitemap": """
            WITH p AS (
              SELECT 'http://ex' || (o_custkey % 100) || '.test'
                       AS base,
                     o_orderkey AS ok
              FROM orders),
            x AS (
              SELECT '<urlset><url><loc>' || base || '/o' || ok
                     || '</loc></url><url><loc>' || base || '/n' || ok
                     || '</loc></url>'
                     || CASE WHEN ok % 4 = 0
                             THEN '<url><loc>/rel</loc></url>'
                             ELSE '' END
                     || '</urlset>' AS xml
              FROM p),
            locs AS (
              SELECT DISTINCT unnest(regexp_extract_all(xml,
                       '<loc>([^<]*)</loc>', 1)) AS loc
              FROM x),
            f AS (SELECT base || '/o' || ok AS url FROM p)
            SELECT lower(regexp_extract(loc,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                     AS host,
                   loc
            FROM locs l
            WHERE lower(regexp_extract(loc,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) <> ''
              AND NOT EXISTS (SELECT 1 FROM f WHERE f.url = l.loc)
        """,
        # identical integer Pearson components over the same degrees
        "graph_assortativity": _LINK_CTES + """
            , edges AS (
              SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM l WHERE dst_host <> ''),
            od AS (SELECT src, count(*) AS x FROM edges GROUP BY 1),
            id_ AS (SELECT dst, count(*) AS y FROM edges GROUP BY 1),
            xy AS (
              SELECT od.x, id_.y FROM edges e
              JOIN od ON e.src = od.src
              JOIN id_ ON e.dst = id_.dst)
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(count(*) * SUM(x * y) - SUM(x) * SUM(y)
                     AS BIGINT) AS num,
                   CAST(count(*) * SUM(x * x) - SUM(x) * SUM(x)
                     AS BIGINT) AS den_x,
                   CAST(count(*) * SUM(y * y) - SUM(y) * SUM(y)
                     AS BIGINT) AS den_y
            FROM xy
        """,
        # the CASE chain mirrors s_stem rule-for-rule
        "text_stem": """
            WITH v AS (
              SELECT word, count(*) AS n FROM (
                SELECT unnest(string_split_regex(trim(text), ' +'))
                  AS word FROM documents) u
              WHERE word <> '' GROUP BY 1),
            s AS (
              -- suffix selects the branch; the exception list means
              -- 'unchanged', never 'fall through' (see ops/text.s_stem)
              SELECT CASE
                WHEN regexp_matches(word, 'ies$') THEN
                  CASE WHEN NOT regexp_matches(word, '(aies|eies)$')
                       THEN regexp_replace(word, 'ies$', 'y')
                       ELSE word END
                WHEN regexp_matches(word, 'es$') THEN
                  CASE WHEN NOT regexp_matches(word,
                                               '(aes|ees|oes)$')
                       THEN regexp_replace(word, 's$', '')
                       ELSE word END
                WHEN regexp_matches(word, 's$') THEN
                  CASE WHEN NOT regexp_matches(word, '(us|ss)$')
                       THEN regexp_replace(word, 's$', '')
                       ELSE word END
                ELSE word END AS stem, n
              FROM v)
            SELECT stem, CAST(SUM(n) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_forms
            FROM s GROUP BY 1
        """,
        # size-desc start-offset bucketing: the same prefix-sum window
        "olap_compaction": """
            WITH fl AS (
              SELECT l_linestatus AS part,
                     l_orderkey % 500 AS file_id,
                     CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
                       AS BIGINT) AS bytes
              FROM lineitem GROUP BY 1, 2),
            s AS (
              SELECT part, file_id, bytes,
                     CAST(COALESCE(SUM(bytes) OVER (
                       PARTITION BY part
                       ORDER BY bytes DESC, file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS strt
              FROM fl)
            SELECT part, file_id, bytes, strt // 2500 AS bucket
            FROM s
        """,
        # identical JSON text rebuilt, read back via JSON paths; the
        # block-less fourth page must drop out on both engines
        "kg_microdata": """
            WITH p AS (
              SELECT 'http://ex' || (p_partkey % 100) || '.test/p'
                       || p_partkey AS url,
                     CASE WHEN p_partkey % 4 != 0 THEN
                       '{"@type": "Product", "name": "part '
                       || p_partkey || '", "offers": {"price": '
                       || CAST(ROUND(p_retailprice * 100, 0)
                               AS BIGINT) || '}}'
                     ELSE '' END AS j
              FROM part)
            SELECT url,
                   json_extract_string(j, '$."@type"') AS item_type,
                   json_extract_string(j, '$.name') AS item_name,
                   CAST(json_extract_string(j, '$.offers.price')
                     AS BIGINT) AS price
            FROM p WHERE j <> ''
        """,
        # recursive closure + mutual-pair min — the exact semantics
        # the Spark doubling loop computes
        "graph_scc": _LINK_CTES.replace(
            "WITH p", "WITH RECURSIVE p", 1).rstrip() + """,
            edges AS MATERIALIZED (
              SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM l WHERE dst_host <> ''),
            nodes AS MATERIALIZED (
              -- DISTINCT over UNION ALL: under WITH RECURSIVE,
              -- DuckDB treats a bare UNION CTE body as a recursive
              -- anchor/step pair and skips the dedup
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges) q),
            reach AS (
              SELECT src AS u, dst AS v FROM edges
              UNION
              SELECT r.u, e.dst AS v
              FROM reach r JOIN edges e ON r.v = e.src),
            m AS MATERIALIZED (
              SELECT r1.u AS node, MIN(r1.v) AS mn
              FROM reach r1
              JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
              GROUP BY 1)
            SELECT n.node,
                   LEAST(n.node, COALESCE(m.mn, n.node)) AS scc_id
            FROM nodes n LEFT JOIN m ON n.node = m.node
        """,
        # trailing-window distinct stated as the range join the
        # contribution-explode plan is equivalent to
        "events_active_users": """
            WITH du AS (
              SELECT DISTINCT date_trunc('day', ts) AS day, user_id
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            obs AS (SELECT DISTINCT day FROM du),
            dau AS (
              SELECT day, count(DISTINCT user_id) AS dau
              FROM du GROUP BY 1),
            wau AS (
              SELECT o.day, count(DISTINCT du.user_id) AS wau
              FROM du JOIN obs o
                ON o.day >= du.day
               AND o.day < du.day + INTERVAL 7 DAY
              GROUP BY 1)
            SELECT day, dau, wau FROM dau JOIN wau USING (day)
        """,
        "curation_url_dedup": """
            WITH u AS (
              SELECT CASE WHEN o_orderkey % 4 = 0
                          THEN 'HTTP://' ELSE 'http://' END
                  || CASE WHEN o_orderkey % 2 = 0
                          THEN 'EX' ELSE 'ex' END
                  || (o_custkey % 100) || '.test'
                  || CASE WHEN o_orderkey % 5 = 0
                          THEN ':80' ELSE '' END
                  || '/p' || (o_orderkey % 40)
                  || CASE WHEN o_orderkey % 3 = 0
                          THEN '?utm_source=feed&b=2&a=1'
                          WHEN o_orderkey % 3 = 1 THEN '?a=1&b=2'
                          ELSE '' END
                  || CASE WHEN o_orderkey % 7 = 0
                          THEN '#sec' ELSE '' END AS url,
                     'http://ex' || (o_custkey % 100) || '.test/p'
                  || (o_orderkey % 40)
                  || CASE WHEN o_orderkey % 3 IN (0, 1)
                          THEN '?a=1&b=2' ELSE '' END
                     AS canonical_url
              FROM orders)
            SELECT canonical_url, count(*) AS n_variants,
                   min(url) AS kept_url
            FROM u GROUP BY 1 HAVING count(*) > 1
        """,
        # every frame energy recomputed in closed form from the PCM
        # sample formula; activity is the cross-multiplied integer
        # mean compare; segments are the same run-length key
        "multimodal_vad": """
            WITH d AS (
              SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
            s AS (
              -- fixed-bound series + WHERE i < n (DuckDB's
              -- generate_series takes no lateral column args;
              -- n is at most 64 + 31 = 95)
              SELECT doc_id, i,
                     ((doc_id * 7 + i) % 65536) - 32768 AS v
              FROM d CROSS JOIN generate_series(0, 95) g(i)
              WHERE i < n),
            f AS (
              SELECT doc_id, i // 16 AS frame, SUM(v * v) AS energy
              FROM s GROUP BY 1, 2 HAVING count(*) = 16),
            t AS (
              SELECT doc_id, SUM(energy) AS tot, COUNT(*) AS nf
              FROM f GROUP BY 1),
            a AS (
              SELECT f.doc_id, f.frame, f.energy
              FROM f JOIN t ON f.doc_id = t.doc_id
              WHERE f.energy * t.nf >= t.tot),
            g AS (
              SELECT doc_id, frame, energy,
                     frame - row_number() OVER (
                       PARTITION BY doc_id ORDER BY frame) AS grp
              FROM a)
            SELECT doc_id,
                   CAST(MIN(frame) AS BIGINT) AS seg_start,
                   CAST(MAX(frame) AS BIGINT) AS seg_end,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(energy) AS BIGINT) AS seg_energy
            FROM g GROUP BY doc_id, grp
        """,
        "crawl_schedule": """
            WITH u AS (
              SELECT 'http://ex' || (o_custkey % 100) || '.test/o'
                       || o_orderkey AS url,
                     'ex' || (o_custkey % 100) || '.test' AS host
              FROM orders)
            SELECT host, url,
                   CAST(row_number() OVER (
                     PARTITION BY host ORDER BY url) - 1
                     AS BIGINT) AS wave,
                   CAST((row_number() OVER (
                     PARTITION BY host ORDER BY url) - 1) * 500
                     AS BIGINT) AS scheduled_ms
            FROM u
        """,
        # longest-prefix robots matching with the identical
        # deterministic tiebreak chain; unmatched urls default-allow
        "crawl_robots": """
            WITH u AS (
              SELECT 'http://ex' || (o_custkey % 100) || '.test/o'
                       || o_orderkey AS url,
                     'ex' || (o_custkey % 100) || '.test' AS host,
                     '/o' || o_orderkey AS path
              FROM orders),
            r AS (
              SELECT 'ex' || i || '.test' AS host,
                     '/o1' AS path_prefix, 0 AS allow
              FROM range(100) t(i)
              UNION ALL
              SELECT 'ex' || i || '.test', '/o12', 1
              FROM range(100) t(i) WHERE i % 3 = 0
              UNION ALL
              SELECT 'ex' || i || '.test', '/', 0
              FROM range(100) t(i) WHERE i % 5 = 0),
            m AS (
              SELECT u.url, u.host, r.path_prefix, r.allow,
                     (r.path_prefix IS NOT NULL
                      AND starts_with(u.path, r.path_prefix))
                       AS matched
              FROM u LEFT JOIN r ON u.host = r.host)
            SELECT url, host,
                   CASE WHEN matched THEN path_prefix END
                     AS matched_prefix,
                   CAST(CASE WHEN matched THEN allow ELSE 1 END
                     AS BIGINT) AS allowed
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY url ORDER BY matched DESC,
                  length(COALESCE(path_prefix, '')) DESC,
                  COALESCE(allow, 0) DESC, path_prefix ASC) AS rn
              FROM m) x
            WHERE rn = 1
        """,
        # the oracle rebuilds the identical link-bearing HTML from
        # orders and runs the same href-regex + host extraction; hosts
        # are lowercased on both sides (already lowercase here)
        "kg_link_graph": _LINK_CTES + """
            SELECT src_host, dst_host, count(*) AS n_links
            FROM l WHERE dst_host <> '' GROUP BY 1, 2
        """,
        # reciprocal transition pairs: self-join of the bounded
        # transition table on the swapped key, canonical orientation
        "events_reciprocal_transitions": """
            WITH t AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events),
            g AS (
              SELECT prev AS from_type, event_type AS to_type,
                     count(*) AS n
              FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
            SELECT ga.from_type AS type_a, ga.to_type AS type_b,
                   ga.n AS n_ab, gb.n AS n_ba
            FROM g ga JOIN g gb
              ON ga.from_type = gb.to_type
             AND ga.to_type = gb.from_type
            WHERE ga.from_type < ga.to_type
        """,
        # fixed-point-integer PageRank over the DISTINCT host pairs of
        # the extracted hyperlink graph — link extraction chained into
        # host-level ranking, both halves already oracle-checked alone
        "kg_host_pagerank": _pagerank_oracle(
            edges_cte=(
                "edges AS (SELECT DISTINCT src_host AS src, "
                "dst_host AS dst FROM l WHERE dst_host <> '')"
            ),
            prefix=_LINK_CTES,
        ),
        # every hash bit recomputed in closed form from the pixel
        # formula; the mean compare is the cross-multiplied integer
        # px·n ≥ Σpx on both sides
        "multimodal_ahash": _AHASH_CTES + """
            SELECT doc_id, CAST(w AS BIGINT) AS width,
                   CAST(h AS BIGINT) AS height, n_ones, ahash
            FROM ah
        """,
        # same-geometry pairs, band condition stated arithmetically
        # (some ⌈n/4⌉-bit xor band is all-zero), exact Hamming ≤ 5
        "multimodal_ahash_pairs": _AHASH_CTES + """
            , g AS (
              SELECT x.doc_id AS a, y.doc_id AS b,
                     xor(x.ahash, y.ahash) AS d,
                     x.w * x.h AS n,
                     (x.w * x.h + 3) // 4 AS bw
              FROM ah x JOIN ah y
                ON x.w = y.w AND x.h = y.h AND x.doc_id < y.doc_id)
            SELECT a, b, CAST(bit_count(d) AS BIGINT) AS hamming
            FROM g
            WHERE bit_count(d) <= 5
              AND ((d >> (0 * bw)) & ((CAST(1 AS BIGINT) << bw) - 1) = 0
                OR (d >> (1 * bw)) & ((CAST(1 AS BIGINT) << bw) - 1) = 0
                OR (d >> (2 * bw)) & ((CAST(1 AS BIGINT) << bw) - 1) = 0
                OR (d >> (3 * bw)) & ((CAST(1 AS BIGINT) << bw) - 1) = 0)
        """,
        # the canonical side is a CLOSED-FORM derivation, verifying the
        # canonicalizer's semantics independently of its implementation
        "curation_url_canonical": """
            SELECT CASE WHEN o_orderkey % 4 = 0
                        THEN 'HTTP://' ELSE 'http://' END
                || CASE WHEN o_orderkey % 2 = 0 THEN 'EX' ELSE 'ex' END
                || (o_custkey % 100) || '.test'
                || CASE WHEN o_orderkey % 5 = 0 THEN ':80' ELSE '' END
                || '/o' || o_orderkey
                || CASE WHEN o_orderkey % 3 = 0
                        THEN '?utm_source=feed&b=2&a=1'
                        WHEN o_orderkey % 3 = 1 THEN '?a=1&b=2'
                        ELSE '' END
                || CASE WHEN o_orderkey % 7 = 0 THEN '#sec' ELSE '' END
                   AS url,
                   'http://ex' || (o_custkey % 100) || '.test/o'
                || o_orderkey
                || CASE WHEN o_orderkey % 3 IN (0, 1)
                        THEN '?a=1&b=2' ELSE '' END AS canonical_url
            FROM orders
        """,
        "curation_profile": _profile_sql("lineitem"),
        # the approx twin's oracle states the EXPECTATION (every
        # column's HLL++ estimate within the 5-sigma rsd bound), not
        # the estimate itself — approx sketches differ across engines
        "curation_profile_approx": " UNION ALL ".join(
            f"SELECT '{c}' AS col_name, 1 AS within_bound"
            for c in (*_PROFILE_NUM, *_PROFILE_STR)
        ),
        # integer centi-cents: ROUND(x*100) of the identical input
        # double is the identical integer on both engines; revenue
        # then sums as BIGINT (order-independent)
        "olap_revenue_by_region": """
            SELECT r_name, count(*) AS n_items,
                   CAST(SUM(
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0)
                                   AS BIGINT))
                   ) AS BIGINT) AS revenue_cc
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation   ON n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            GROUP BY 1
        """,
        # bloom accept set incl. deterministic false positives — md5
        # bit positions, so both engines compute the identical filter
        "sketch_bloom_prefilter": """
            WITH dk AS (
              SELECT doc_id, substr(text, 1, 40) AS k1 FROM documents),
            kb AS (
              SELECT DISTINCT
                     ('0x' || substr(md5('bf' || k1), 1 + 8*i, 8))
                       ::BIGINT % 4096 AS bit
              FROM dk, generate_series(0, 2) gs(i)
              WHERE doc_id % 2 = 0),
            pb AS (
              SELECT DISTINCT doc_id,
                     ('0x' || substr(md5('bf' || k1), 1 + 8*i, 8))
                       ::BIGINT % 4096 AS bit
              FROM dk, generate_series(0, 2) gs(i)
              WHERE doc_id % 2 = 1),
            miss AS (
              SELECT DISTINCT pb.doc_id
              FROM pb LEFT JOIN kb ON pb.bit = kb.bit
              WHERE kb.bit IS NULL)
            SELECT doc_id FROM dk
            WHERE doc_id % 2 = 1
              AND doc_id NOT IN (SELECT doc_id FROM miss)
        """,
        "dedup_snapshot_diff": """
            WITH v1 AS (
              SELECT doc_id, md5(text) AS f FROM documents
              WHERE doc_id % 3 <> 0),
            v2 AS (
              SELECT doc_id,
                     md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                              ELSE text END) AS f
              FROM documents WHERE doc_id % 5 <> 0)
            SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN v1.f IS NULL THEN 'added'
                        WHEN v2.f IS NULL THEN 'removed'
                        WHEN v1.f <> v2.f THEN 'changed' END AS status
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
            WHERE (CASE WHEN v1.f IS NULL THEN 'added'
                        WHEN v2.f IS NULL THEN 'removed'
                        WHEN v1.f <> v2.f THEN 'changed' END)
                  IS NOT NULL
        """,
        "events_json_stats": """
            WITH e AS (
              SELECT event_type,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events)
            SELECT event_type, count(*) AS n_with_k,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   MIN(k) AS min_k, MAX(k) AS max_k
            FROM e WHERE k IS NOT NULL GROUP BY 1
        """,
        # conditional aggregation restates the PIVOT with the same
        # explicit value list
        "events_pivot": """
            WITH e AS (
              SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                     event_type
              FROM events)
            SELECT day,
                   count(*) FILTER (event_type = 'view') AS "view",
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup') AS signup,
                   count(*) FILTER (event_type = 'error') AS error
            FROM e GROUP BY 1
        """,
        # stream-stream interval join: inner-join completeness over a
        # full in-order replay ⇒ exactly the batch range join
        "events_attribution_stream": """
            SELECT c.event_id AS click_id, c.user_id,
                   c.ts AS click_ts, v.event_id AS view_id,
                   v.ts AS view_ts, v.value AS view_value
            FROM events c JOIN events v
              ON v.user_id = c.user_id
             AND c.event_type = 'click' AND v.event_type = 'view'
             AND c.ts >= v.ts
             AND c.ts <= v.ts + INTERVAL 30 MINUTE
        """,
        # the batch LEFT range join the flushed replay must equal;
        # nullable click columns cross as VARCHAR (NULL-safe through
        # the pandas bridge, unlike BIGINT→NaN / TIMESTAMP→NaT)
        "events_attribution_stream_outer": """
            SELECT v.event_id AS view_id, v.user_id,
                   v.ts AS view_ts, v.value AS view_value,
                   CAST(c.event_id AS VARCHAR) AS click_id_s,
                   CAST(c.ts AS VARCHAR) AS click_ts_s
            FROM events v LEFT JOIN events c
              ON v.user_id = c.user_id
             AND c.event_type = 'click'
             AND c.ts >= v.ts
             AND c.ts <= v.ts + INTERVAL 30 MINUTE
            WHERE v.event_type = 'view'
        """,
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
        # the node sink table: distinct subjects ∪ IRI objects of the
        # validated emission (pipeline/run.py finalize rule)
        "kg_nodes": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k)
            SELECT DISTINCT node FROM (
              SELECT s AS node FROM vt
              UNION ALL
              SELECT o FROM vt WHERE o LIKE 'http%') q
        """,
        # VoID property partitions over the same closed-form golden set
        "kg_void_stats": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k)
            SELECT p, count(*) AS n_triples,
                   count(DISTINCT s) AS n_subjects,
                   count(DISTINCT o) AS n_objects
            FROM vt GROUP BY 1
        """,
        # filtered corrupt-tail negatives: md5-uniform index draw over
        # the lexicographically indexed node vocabulary, true facts and
        # self-collisions removed — deterministic per (triple, j)
        "kg_negative_sampling": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k),
            vocab AS (
              SELECT DISTINCT node FROM (
                SELECT s AS node FROM vt
                UNION ALL SELECT o FROM vt) q),
            vidx AS (
              SELECT node,
                     row_number() OVER (ORDER BY node) - 1 AS idx
              FROM vocab),
            nn AS (SELECT count(*) AS n FROM vidx),
            draws AS (
              SELECT s, p, o, CAST(j AS BIGINT) AS j,
                     CAST(('0x' || substr(md5(
                       'neg' || '|' || s || '|' || p || '|' || o
                       || '|' || '#' || CAST(j AS VARCHAR)), 1, 12))
                       AS BIGINT) AS coord
              FROM vt CROSS JOIN (SELECT unnest([0, 1]) AS j)),
            drawn AS (
              SELECT d.s, d.p, d.o, d.j, i.node AS neg_o
              FROM draws d CROSS JOIN nn
              JOIN vidx i ON i.idx = d.coord % nn.n
              WHERE i.node <> d.o)
            SELECT dr.s, dr.p, dr.o, dr.j, dr.neg_o
            FROM drawn dr
            LEFT JOIN (SELECT DISTINCT s, p, o FROM vt) t
              ON t.s = dr.s AND t.p = dr.p AND t.o = dr.neg_o
            WHERE t.s IS NULL
        """,
        # PageRank over the validated emission's closed-form golden
        # set — the same unrolled BIGINT CTEs, edges from _KG_CTE
        "kg_entity_salience": _pagerank_oracle(
            iterations=6,
            prefix=_KG_CTE,
            edges_cte=f"""edges AS (
              SELECT DISTINCT src, dst FROM (
                SELECT canon.subj AS src,
                       '{EX}nation/' || nk AS dst
                FROM osurf JOIN canon ON canon.k = osurf.k
                WHERE o % 11 <> 0
                UNION ALL
                SELECT '{EX}order/' || o, canon.subj
                FROM osurf JOIN canon ON canon.k = osurf.k
              )
            )""",
        ),
        "kg_triple_counts": f"""{_KG_CTE}
            SELECT '{EX}locatedIn' AS p,
                   count(DISTINCT (canon.subj, nk)) AS n_triples
            FROM osurf JOIN canon ON canon.k = osurf.k WHERE o % 11 <> 0
            UNION ALL
            SELECT '{EX}placedBy', count(*) FROM osurf
        """,
        # incremental-sink contents: validated candidates BEFORE
        # canonicalization — subjects are raw surfaces (alt/k when the
        # order seeded an alias, cust/k otherwise), unlinked locatedIn
        # (o % 11 = 0 → literal object) dropped by sh:nodeKind, and the
        # sameAs edges retained for the consolidation CC
        "kg_ingest_stream": f"""{_KG_CTE}
            SELECT DISTINCT
                   CASE WHEN is_alias THEN '{EX}alt/' || k
                        ELSE '{EX}cust/' || k END AS s,
                   '{EX}locatedIn' AS p, '{EX}nation/' || nk AS o
            FROM osurf WHERE o % 11 <> 0
            UNION ALL
            SELECT '{EX}order/' || o, '{EX}placedBy',
                   CASE WHEN is_alias THEN '{EX}alt/' || k
                        ELSE '{EX}cust/' || k END
            FROM osurf
            UNION
            SELECT DISTINCT '{EX}alt/' || k, '{EX}sameAs', '{EX}cust/' || k
            FROM osurf WHERE o % 5 = 0
            UNION
            SELECT DISTINCT '{EX}alt2/' || k, '{EX}sameAs', '{EX}alt/' || k
            FROM osurf WHERE o % 25 = 0
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
        "shacl_path_kleene_dist": f"""
            WITH edges AS (
              SELECT '{EX}chain/L' || l_orderkey || ':' || l_linenumber AS src,
                     '{EX}chain/L' || l_orderkey || ':' || (l_linenumber + 1) AS dst
              FROM lineitem
            ),
            heads AS (
              SELECT DISTINCT '{EX}chain/L' || l_orderkey || ':1' AS node
              FROM lineitem WHERE l_linenumber = 1
            ),
            reach AS (
              WITH RECURSIVE r AS (
                SELECT e.src AS start, e.dst AS node
                FROM edges e JOIN heads h ON e.src = h.node
                UNION
                SELECT r.start, e.dst FROM r JOIN edges e ON e.src = r.node
              ) SELECT * FROM r
            )
            SELECT start AS focus FROM reach
            GROUP BY start HAVING count(DISTINCT node) > 4
        """,
        "shacl_sparql": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_acctbal < 0
        """,
        "shacl_sparql_agg": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer JOIN orders ON o_custkey = c_custkey
            WHERE o_orderstatus = 'O'
            GROUP BY c_custkey HAVING count(*) >= 5
        """,
        "shacl_sparql_optional": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderkey % 10 = 0)
        """,
        "shacl_sparql_path": f"""
            SELECT '{EX}nation/' || n_nationkey AS focus
            FROM nation WHERE n_regionkey % 2 = 1
        """,
        "shacl_sparql_nps": f"""
            SELECT '{EX}nation/' || n_nationkey AS focus
            FROM nation JOIN region ON n_regionkey = r_regionkey
            WHERE n_regionkey != 0 AND r_name LIKE 'A%'
        """,
        "shacl_sparql_message": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   'segment "BUILDING" of {EX}cust/' || c_custkey
                   || ' flagged ({{?nope}})' AS message
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        # shapes-graph path introspection: declared predicates are the
        # literal set {{rdf:type, ex:name, ex:motto}} (walked via
        # sh:property/sh:path over the shapes graph by the engine);
        # focus = subjects of ex:partOf = all nations + odd regions;
        # motto is absent everywhere, type is absent for region-0
        # nations (and all odd regions are typed)
        "shacl_sparql_shapes_path": f"""
            WITH focus AS (
              SELECT '{EX}nation/' || n_nationkey AS f,
                     CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS untyped
              FROM nation
              UNION ALL
              SELECT '{EX}region/' || r_regionkey, 0
              FROM region WHERE r_regionkey % 2 = 1
            )
            SELECT f AS focus, 'missing {EX}motto' AS message FROM focus
            UNION ALL
            SELECT f,
                   'missing http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
            FROM focus WHERE untyped = 1
        """,
        # EXISTS in HAVING + projection: >=4 "F" orders, segment not
        # MACHINERY (each customer has exactly one segment, so
        # max(c_mktsegment) IS the segment); message renders COUNT as
        # an xsd:integer N3 literal and the projected EXISTS boolean
        # as an xsd:boolean N3 literal
        "shacl_sparql_exists_agg": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   'n="' || count(*)
                   || '"^^<http://www.w3.org/2001/XMLSchema#integer> building="'
                   || CASE WHEN max(c_mktsegment) = 'BUILDING'
                           THEN 'true' ELSE 'false' END
                   || '"^^<http://www.w3.org/2001/XMLSchema#boolean>' AS message
            FROM customer JOIN orders ON o_custkey = c_custkey
            WHERE o_orderstatus = 'F'
            GROUP BY c_custkey
            HAVING count(*) >= 4 AND max(c_mktsegment) != 'MACHINERY'
        """,
        "shacl_equals": f"""
            WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln,
                              l_discount AS v FROM lineitem),
                 t AS (SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln,
                              l_tax AS v FROM lineitem),
                 unequal AS (
                   SELECT DISTINCT ok, ln FROM (
                     (SELECT * FROM d EXCEPT SELECT * FROM t)
                     UNION ALL
                     (SELECT * FROM t EXCEPT SELECT * FROM d)) x)
            SELECT '{EX}line/' || ok || '-' || ln AS focus,
                   'Values do not equal values of sh:equals path' AS message
            FROM unequal
            UNION ALL
            SELECT '{EX}line/' || ok || '-' || ln,
                   'Focus node does not equal value of sh:equals path'
            FROM t
        """,
        "shacl_disjoint": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   c_mktsegment AS segment
            FROM customer WHERE c_custkey % 3 = 0
        """,
        "shacl_not": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "shacl_xone": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE (c_acctbal >= 5000) = (c_mktsegment = 'BUILDING')
        """,
        "shacl_and": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE c_acctbal < 0
               OR NOT regexp_matches(c_name, '^Customer#[0-9]*[02468]$')
        """,
        "shacl_node": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   '{EX}nation/' || c_nationkey AS bad_nation
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE n_regionkey = 2
        """,
        "shacl_node_kind": f"""
            SELECT '{EX}cust/' || c_custkey AS focus FROM customer
        """,
        "shacl_min_length": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   c_mktsegment AS segment
            FROM customer WHERE octet_length(encode(c_mktsegment)) < 9
        """,
        "shacl_language_in": f"""
            SELECT '{EX}src/' || source AS focus, lang
            FROM documents WHERE lower(lang) NOT IN ('en', 'de')
        """,
        "shacl_less_than_or_equals": f"""
            WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln,
                              l_discount AS v FROM lineitem),
                 t AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              max(l_tax) AS mt
                       FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_tax
                             FROM lineitem) x GROUP BY 1, 2)
            SELECT '{EX}line/' || ok || '-' || ln AS focus
            FROM d JOIN t USING (ok, ln) WHERE NOT (v <= mt)
        """,
        "shacl_max_exclusive": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_acctbal >= 9900
        """,
        "shacl_min_exclusive": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_acctbal <= 0
        """,
        "shacl_max_inclusive": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_acctbal > 5000
        """,
        "shacl_target_subjects_of": f"""
            SELECT '{EX}order/' || o_orderkey AS focus
            FROM orders WHERE o_orderkey % 10 = 0 AND o_orderstatus <> 'O'
        """,
        "shacl_target_objects_of": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer
            WHERE c_acctbal < 0
              AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "shacl_target_node": f"""
            SELECT '{EX}cust/1' AS focus
        """,
        "shacl_path_sequence": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   '{EX}region/' || n_regionkey AS bad_region
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE n_regionkey = 2
        """,
        "shacl_path_alternative": f"""
            SELECT '{EX}cust/' || c_custkey AS focus, c_name AS value
            FROM customer
        """,
        "shacl_path_zero_or_one": f"""
            SELECT '{EX}nation/' || n_nationkey AS focus,
                   '{EX}region/' || n_regionkey AS value
            FROM nation WHERE n_regionkey <> 0
        """,
        "shacl_severity_message": f"""
            SELECT '{EX}cust/' || c_custkey AS focus,
                   '{SH}Warning' AS severity,
                   'Value out of range (sh:minInclusive "0"^^<http://www.w3.org/2001/XMLSchema#integer>); negative balance'
                     AS message
            FROM customer WHERE c_acctbal < 0
        """,
        "shacl_datatype": f"""
            SELECT '{EX}cust/' || c_custkey AS focus
            FROM customer WHERE c_custkey % 7 = 0
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
        # independent chain walk (per-hop recursion) vs the Spark
        # side's pointer doubling
        "kg_redirects": """
            WITH RECURSIVE e AS (
              SELECT 'http://r.test/p' || p_partkey AS url,
                     'http://r.test/p' || (p_partkey - 1) AS target
              FROM part WHERE p_partkey % 8 != 0),
            walk AS (
              SELECT url, target AS cur, 1 AS hops FROM e
              UNION ALL
              SELECT w.url, e.target, w.hops + 1
              FROM walk w JOIN e ON w.cur = e.url)
            SELECT w.url, w.cur AS final_url, CAST(w.hops AS BIGINT)
                     AS hops, 'true' AS resolved
            FROM walk w LEFT JOIN e t ON w.cur = t.url
            WHERE t.url IS NULL
        """,
        # the six RDFS rules, stratified exactly like ops/ontology.py:
        # recursive CTEs for the two schema closures, joins for the
        # instance rules, one big UNION dedup at the end
        "kg_rdfs_entailment": """
            WITH RECURSIVE base AS (
              SELECT 'C' || i AS s, 'sco' AS p, 'C' || (i - 1) AS o
              FROM range(1, 10) t(i)
              UNION ALL
              SELECT 'q' || i, 'spo', 'q' || (i - 1)
              FROM range(1, 5) t(i)
              UNION ALL SELECT 'q0', 'domain', 'C5'
              UNION ALL SELECT 'q0', 'range', 'C7'
              UNION ALL
              SELECT 'e' || p_partkey, 'type', 'C' || (p_partkey % 10)
              FROM part
              UNION ALL
              SELECT 'x' || (l_orderkey % 200),
                     'q' || (l_suppkey % 5),
                     'y' || (l_partkey % 100)
              FROM lineitem),
            t AS MATERIALIZED (SELECT DISTINCT s, p, o FROM base),
            sco AS (
              SELECT s AS child, o AS parent FROM t WHERE p = 'sco'
              UNION
              SELECT c.child, e.o
              FROM sco c JOIN t e ON e.p = 'sco' AND c.parent = e.s),
            spo AS (
              SELECT s AS child, o AS parent FROM t WHERE p = 'spo'
              UNION
              SELECT c.child, e.o
              FROM spo c JOIN t e ON e.p = 'spo' AND c.parent = e.s),
            facts AS (
              SELECT s, p, o FROM t
              WHERE p NOT IN ('type','sco','spo','domain','range')),
            facts_all AS MATERIALIZED (
              SELECT DISTINCT s, p, o FROM (
                SELECT s, p, o FROM facts
                UNION ALL
                SELECT f.s, sp.parent, f.o
                FROM facts f JOIN spo sp ON f.p = sp.child) q),
            types_all AS MATERIALIZED (
              SELECT DISTINCT s, 'type' AS p, o FROM (
                SELECT s, o FROM t WHERE p = 'type'
                UNION ALL
                SELECT f.s, d.o
                FROM facts_all f
                JOIN t d ON d.p = 'domain' AND f.p = d.s
                UNION ALL
                SELECT f.o AS s, r.o
                FROM facts_all f
                JOIN t r ON r.p = 'range' AND f.p = r.s) q)
            SELECT DISTINCT s, p, o FROM (
              SELECT s, p, o FROM t
              UNION ALL SELECT s, p, o FROM facts_all
              UNION ALL SELECT child, 'spo', parent FROM spo
              UNION ALL SELECT child, 'sco', parent FROM sco
              UNION ALL SELECT s, p, o FROM types_all
              UNION ALL
              SELECT ty.s, 'type', sc.parent
              FROM types_all ty JOIN sco sc ON ty.o = sc.child) q
        """,
        "kg_truth_discovery": """
            WITH claims AS (
              SELECT DISTINCT 'e' || (l_orderkey % 300) AS s,
                     'attr' || (l_linenumber % 3) AS p,
                     'v' || (l_partkey % 7) AS o,
                     'src' || (l_suppkey % 11) AS source
              FROM lineitem),
            votes AS (
              SELECT s, p, o, count(*) AS votes
              FROM claims GROUP BY 1, 2, 3),
            r AS (
              SELECT s, p, o, votes,
                     count(*) OVER (PARTITION BY s, p)
                       AS n_candidates,
                     row_number() OVER (PARTITION BY s, p
                       ORDER BY votes DESC, o ASC) AS rn
              FROM votes)
            SELECT s, p, o, votes, n_candidates FROM r WHERE rn = 1
        """,
        # the stream's exactly-once output == the batch DISTINCT ==
        # the original table (event_ids are unique in the fixture)
        "events_dedup_stream": """
            SELECT event_id, user_id, event_type FROM events
        """,
        # closed-form record fields from the fixture HTML: a walker
        # misalignment corrupts every later record's md5
        "kg_warc": _LINK_CTES + """
            SELECT url, 'response' AS rec_type,
                   CAST(octet_length(encode(html)) AS BIGINT)
                     AS content_length,
                   md5(html) AS payload_md5
            FROM p
        """,
        # closed-form per-host record offsets: rec_length from the
        # header grammar, offset = running sum in url order
        "crawl_cdx": _LINK_CTES + """
            , r AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     octet_length(encode(html)) AS n
              FROM p),
            spans AS (
              SELECT url, host,
                     74 + length(url) + length(CAST(n AS VARCHAR)) + n
                       AS rec_length
              FROM r)
            SELECT array_to_string(
                     list_reverse(string_split(host, '.')), ',')
                     || ')' || regexp_replace(regexp_replace(url,
                          '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', ''),
                          '#.*$', '') AS surt,
                   url, host,
                   CAST(SUM(rec_length) OVER (PARTITION BY host
                          ORDER BY url ROWS UNBOUNDED PRECEDING)
                        - rec_length AS BIGINT) AS offset,
                   CAST(rec_length AS BIGINT) AS rec_length
            FROM spans
        """,
        # append mode must emit each closed window exactly once ==
        # the batch tumbling-window group-by
        "events_windowed_stream": """
            SELECT date_trunc('hour', ts) AS win_start, event_type,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        # stateless stream-static join: replayed union == batch join
        "events_enrich_stream": """
            SELECT event_id, event_type,
                   'seg' || ((user_id % 25) % 5) AS segment
            FROM events
        """,
        # three unrolled md5-argmin steps — the derandomized walk
        "graph_walks": _WORDS_CTE + _PAIR_GRAPH_CTE + _NB_CTE + """
            , w0 AS MATERIALIZED (
              SELECT doc_id AS seed, doc_id AS node FROM documents
              WHERE doc_id % 31 = 0),
            s1 AS MATERIALIZED (
              SELECT seed, nbr AS node FROM (
                SELECT w.seed, nb.nbr,
                       row_number() OVER (PARTITION BY w.seed
                         ORDER BY md5(w.node || '|1|' || nb.nbr),
                                  nb.nbr) AS rn
                FROM w0 w JOIN nb ON nb.node = w.node) q
              WHERE rn = 1),
            s2 AS MATERIALIZED (
              SELECT seed, nbr AS node FROM (
                SELECT w.seed, nb.nbr,
                       row_number() OVER (PARTITION BY w.seed
                         ORDER BY md5(w.node || '|2|' || nb.nbr),
                                  nb.nbr) AS rn
                FROM s1 w JOIN nb ON nb.node = w.node) q
              WHERE rn = 1),
            s3 AS MATERIALIZED (
              SELECT seed, nbr AS node FROM (
                SELECT w.seed, nb.nbr,
                       row_number() OVER (PARTITION BY w.seed
                         ORDER BY md5(w.node || '|3|' || nb.nbr),
                                  nb.nbr) AS rn
                FROM s2 w JOIN nb ON nb.node = w.node) q
              WHERE rn = 1)
            SELECT seed, 0 AS step, node FROM w0
            UNION ALL SELECT seed, 1, node FROM s1
            UNION ALL SELECT seed, 2, node FROM s2
            UNION ALL SELECT seed, 3, node FROM s3
        """,
        # the two-phase per-score prefix sum must equal the one
        # global ordered window
        "curation_budget": r"""
            WITH d AS (
              SELECT doc_id, n_chars % 97 AS score,
                     len(string_split_regex(trim(text), ' +'))
                       AS n_tokens
              FROM documents),
            tot AS (SELECT sum(n_tokens) AS t FROM d),
            s AS (
              SELECT doc_id, score, n_tokens,
                     sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM d)
            SELECT doc_id, CAST(score AS BIGINT) AS score,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(cum AS BIGINT) AS cum_tokens
            FROM s, tot WHERE cum <= t // 5
        """,
        # deterministic top-10: unique orderkey makes the order total
        "olap_shipping_priority": """
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(sum(CAST(ROUND(l.l_extendedprice * 100, 0)
                                 AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100, 0)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_cc
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey % 2 = 0
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue_cc DESC, o.o_orderdate ASC,
                     l.l_orderkey ASC
            LIMIT 10
        """,
        # TPC-H Q6: every predicate in the scan, one global aggregate
        "olap_forecast_revenue": """
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(ROUND(l_extendedprice * 100, 0)
                                 AS BIGINT)
                            * CAST(ROUND(l_discount * 100, 0)
                                   AS BIGINT)) AS BIGINT)
                     AS revenue_cent_pct
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                    BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        # the md5 bucket recomputed in closed form (hex-prefix cast)
        "text_hashed_features": r"""
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT)
                        % 64 AS BIGINT) AS bucket,
                   count(*) AS tf
            FROM (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), ' +')) AS w
              FROM documents) u
            WHERE w <> ''
            GROUP BY 1, 2
        """,
        # the same integer-rational KN formula over independently
        # derived bigram/continuation counts
        "text_kn_bigram": r"""
            WITH t AS (
              SELECT string_split_regex(trim(text), ' +') AS a
              FROM documents),
            bg AS (
              SELECT a[i] AS w1, a[i + 1] AS w2
              FROM t, unnest(generate_series(1, len(a) - 1)) u(i)),
            lm AS MATERIALIZED (
              SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            nbt AS (SELECT count(*) AS nb FROM lm),
            heads AS (
              SELECT w1, sum(c12) AS c1, count(*) AS n1_fwd
              FROM lm GROUP BY 1),
            tails AS (
              SELECT w2, count(*) AS n1_bwd FROM lm GROUP BY 1)
            SELECT l.w1, l.w2, l.c12,
                   CAST((4 * l.c12 - 3) * nbt.nb
                        + 3 * h.n1_fwd * tl.n1_bwd AS BIGINT)
                     AS kn_num,
                   CAST(4 * h.c1 * nbt.nb AS BIGINT) AS kn_den
            FROM lm l
            CROSS JOIN nbt
            JOIN heads h ON h.w1 = l.w1
            JOIN tails tl ON tl.w2 = l.w2
            WHERE l.c12 >= 4
        """,
        "graph_closeness":
            _WORDS_CTE + _PAIR_GRAPH_CTE + _closeness_ctes(4),
        # the UNSALTED join: the salt explode + (k, salt) join +
        # salt-dropping re-aggregate must be value-identical to it
        "olap_salted_join": """
            WITH fact AS (
              SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
                          ELSE l_orderkey % 97 END AS k,
                     CAST(l_quantity AS BIGINT) AS v
              FROM lineitem),
            dim AS (
              SELECT i AS k, 'grp' || (i % 5) AS attr
              FROM range(0, 100) t(i))
            SELECT attr, count(*) AS n_rows,
                   CAST(sum(v) AS BIGINT) AS total_v
            FROM fact JOIN dim USING (k)
            GROUP BY attr
        """,
        "olap_grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                     AS gid,
                   count(*) AS n_rows,
                   CAST(sum(CAST(ROUND(l_extendedprice * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        # Resource-Allocation link prediction: integer floor-division
        # shares (1e12 // deg z) summed over common neighbors — the
        # exact-form member of the Adamic-Adar family
        "graph_ra_linkpred": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , adj AS (
              SELECT a AS node, b AS nbx FROM p
              UNION ALL SELECT b, a FROM p),
            dg AS (SELECT nbx, count(*) AS degz
                   FROM (SELECT node AS nbx FROM adj) GROUP BY 1),
            ad AS (
              SELECT adj.node, adj.nbx,
                     CAST(1000000000000 // dg.degz AS BIGINT) AS share
              FROM adj JOIN dg USING (nbx)),
            pr AS (
              SELECT au.node AS u, av.node AS v,
                     count(*) AS n_common,
                     CAST(SUM(au.share) AS BIGINT) AS ra_num
              FROM ad au JOIN ad av
                ON au.nbx = av.nbx AND au.node < av.node
              GROUP BY 1, 2 HAVING count(*) >= 2),
            rk AS (
              SELECT *, row_number() OVER (
                PARTITION BY u ORDER BY ra_num DESC, v) AS rn
              FROM pr)
            SELECT u, v, n_common, ra_num FROM rk WHERE rn <= 3
        """,
        # banding is pigeonhole-exact at hamming<=7, so the oracle is
        # the all-pairs hamming filter + the same prefix-Levenshtein
        # rescore (10% relative, integer cross-multiplied)
        "dedup_editdist": _SIMHASH_CTES + """
            , cand AS (
              SELECT sa.doc_id AS a, sb.doc_id AS b
              FROM sig sa JOIN sig sb ON sa.doc_id < sb.doc_id
              WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 7),
            tx AS (SELECT doc_id, substr(text, 1, 120) AS t
                   FROM documents)
            SELECT a, b,
                   CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS lev
            FROM cand JOIN tx ta ON ta.doc_id = a
                      JOIN tx tb ON tb.doc_id = b
            WHERE levenshtein(ta.t, tb.t) * 100
                  <= 10 * greatest(length(ta.t), length(tb.t))
        """,
        # TPC-H Q5: customer and supplier nation keys must MATCH —
        # the equi-condition that distinguishes Q5 from a plain chain
        "olap_local_supplier": """
            SELECT n_name, count(*) AS n_items,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                              AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT)
                     AS revenue_cc
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                          AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= '1996-01-01'
              AND o_orderdate < '1997-01-01'
            GROUP BY 1
        """,
        # TPC-H Q10: returned-revenue top-20 for 1996Q1, ties broken
        # by custkey so the 20th place is deterministic
        "olap_returned_items": """
            SELECT c_custkey, c_name,
                   CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
                     AS acctbal_cents,
                   n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                              AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT)
                     AS revenue_cc
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= '1996-01-01'
              AND o_orderdate < '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue_cc DESC, c_custkey LIMIT 20
        """,
        # TPC-H Q14: exact integer (promo_cc, total_cc) pair — the
        # percentage is the consumer's one division
        "olap_promo_effect": """
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice * 100, 0)
                               AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS promo_cc,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                              AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT)
                     AS total_cc
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= '1996-03-01'
              AND l_shipdate < '1996-04-01'
        """,
        # TPC-H Q18: HAVING-filtered per-order quantity aggregate
        # joined back — quantities cast BIGINT before the sum
        "olap_top_customers": """
            WITH big AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
                          AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY 1
              HAVING SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) > 180)
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                     AS totalprice_cents,
                   sum_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100
        """,
        # header-only dims: the synthesis formulas in closed form —
        # bmp (1+d%7, 1+d%5), png (1+d%6, 1+d%4), gif (1+d%8, 1+d%3),
        # wav (8000 Hz, 64+d%32 samples)
        "multimodal_header_dims": """
            SELECT doc_id, x.kind,
                   CAST(CASE x.kind
                     WHEN 'bmp' THEN 1 + doc_id % 7
                     WHEN 'png' THEN 1 + doc_id % 6
                     WHEN 'gif' THEN 1 + doc_id % 8
                     ELSE 8000 END AS BIGINT) AS dim1,
                   CAST(CASE x.kind
                     WHEN 'bmp' THEN 1 + doc_id % 5
                     WHEN 'png' THEN 1 + doc_id % 4
                     WHEN 'gif' THEN 1 + doc_id % 3
                     ELSE 64 + doc_id % 32 END AS BIGINT) AS dim2
            FROM documents
            CROSS JOIN (SELECT unnest(['bmp', 'png', 'gif', 'wav'])
                        AS kind) x
        """,
        # shape induction: per-predicate cardinality + object-kind
        # profile over the closed-form golden triple set
        "kg_shape_induction": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k),
            per_subj AS (
              SELECT p, s, count(*) AS card FROM vt GROUP BY 1, 2),
            card AS (
              SELECT p, count(*) AS n_subjects,
                     CAST(SUM(card) AS BIGINT) AS n_triples,
                     CAST(MIN(card) AS BIGINT) AS min_card,
                     CAST(MAX(card) AS BIGINT) AS max_card
              FROM per_subj GROUP BY 1),
            objs AS (
              SELECT p,
                     CAST(SUM(CASE WHEN o LIKE 'http%' THEN 1
                              ELSE 0 END) AS BIGINT) AS n_iri_objects,
                     count(DISTINCT o) AS n_distinct_objects
              FROM vt GROUP BY 1)
            SELECT p, n_subjects, n_triples, min_card, max_card,
                   n_iri_objects, n_distinct_objects,
                   CAST(CASE WHEN max_card = 1 THEN 1 ELSE -1 END
                        AS BIGINT) AS suggested_max_count,
                   CAST(CASE WHEN n_iri_objects = n_triples THEN 1
                        ELSE 0 END AS BIGINT) AS nodekind_iri,
                   CAST(CASE WHEN n_distinct_objects <= 10 THEN 1
                        ELSE 0 END AS BIGINT) AS suggest_in
            FROM card JOIN objs USING (p)
        """,
        "graph_ktruss": _WORDS_CTE + _PAIR_GRAPH_CTE
        + _ktruss_ctes(4, 3),
        # TPC-H Q7: bilateral nation-pair volume, either direction
        "olap_nation_trade": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS INT)
                     AS l_year,
                   count(*) AS n_items,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                              AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT)
                     AS revenue_cc
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            WHERE l_shipdate >= '1995-01-01'
              AND l_shipdate < '1997-01-01'
              AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        # TPC-H Q19: OR-of-conjunctions brand/size/quantity branches
        "olap_disjunctive_revenue": """
            SELECT count(*) AS n_items,
                   CAST(COALESCE(SUM(
                        CAST(ROUND(l_extendedprice * 100, 0)
                              AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0)
                                      AS BIGINT))), 0) AS BIGINT)
                     AS revenue_cc
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size <= 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size <= 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size <= 15
                   AND l_quantity BETWEEN 20 AND 36)
        """,
        # TextRank: the skip-gram pair CTE chained into the unrolled
        # BIGINT PageRank — the whole composite is bit-exact
        "text_textrank": _pagerank_oracle(
            iterations=4, limit=50,
            prefix="""WITH d AS (
              SELECT string_split_regex(trim(text), ' +') AS l
              FROM documents WHERE trim(text) <> ''),
            sgp AS (
              SELECT unnest(flatten(list_transform(
                       generate_series(1, len(l)), i ->
                       list_transform(
                         list_filter(
                           generate_series(greatest(1, i - 2),
                                           least(len(l), i + 2)),
                           j -> j != i),
                         j -> l[i] || chr(1) || l[j])))) AS pr
              FROM d),
            sg AS (
              SELECT split_part(pr, chr(1), 1) AS center,
                     split_part(pr, chr(1), 2) AS context
              FROM sgp GROUP BY 1, 2 HAVING count(*) >= 2)""",
            edges_cte="""edges AS (
              SELECT center AS src, context AS dst FROM sg)""",
        ),
        # TPC-H Q13: count-of-counts with the zero-order bucket kept
        "olap_customer_distribution": """
            WITH per_cust AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY 1)
            SELECT c_count, count(*) AS custdist
            FROM per_cust GROUP BY 1
        """,
        # personalized PageRank over the symmetric near-dup pair graph
        "graph_ppr": _ppr_oracle(
            iterations=4, seeds_pred="node % 50 = 0", limit=100,
            prefix=_WORDS_CTE + _PAIR_GRAPH_CTE,
            edges_cte="""edges AS (
              SELECT a AS src, b AS dst FROM p
              UNION ALL SELECT b, a FROM p)""",
        ),
        "ann_pq_topk": _pq_oracle(),
        # prefix filtering has recall AND precision 1.0, so the oracle
        # is the all-pairs jaccard formulation verbatim — hash equality
        # proves the pigeonhole claim
        "dedup_prefix_join": _WORDS_CTE + """
            , i AS (
              SELECT wa.doc_id AS a, wb.doc_id AS b, count(*) AS ni
              FROM w wa JOIN w wb
                ON wa.word = wb.word AND wa.source = wb.source
               AND wa.doc_id < wb.doc_id
              GROUP BY 1, 2)
            SELECT a, b, ni AS n_common, (sa.n + sb.n - ni) AS n_union
            FROM i JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE ni * 10000 >= (sa.n + sb.n - ni) * 8000
        """,
        # TPC-H Q4 adapted: EXISTS(late line) per quarter order
        "olap_order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE o_orderdate >= '1996-01-01'
              AND o_orderdate < '1996-04-01'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate)
            GROUP BY 1
        """,
        # running monthly revenue per nation: window over the
        # nation-month aggregate, BIGINT end to end
        "olap_running_revenue": """
            WITH monthly AS (
              SELECT n_name,
                     date_trunc('month', o_orderdate) AS month,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                                AS BIGINT)
                          * (100 - CAST(ROUND(l_discount * 100, 0)
                                        AS BIGINT))) AS BIGINT)
                       AS revenue_cc
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1, 2)
            SELECT n_name, month, revenue_cc,
                   CAST(SUM(revenue_cc) OVER (
                     PARTITION BY n_name ORDER BY month
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS running_cc
            FROM monthly
        """,
        # TPC-H Q8: per-year market share as an exact BIGINT rational
        "olap_market_share": """
            WITH f AS (
              SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100, 0)
                                     AS BIGINT)) AS rev,
                     sn.n_name AS sn_name
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
                        AND p_type = 'ECONOMY'
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
                          AND r_name = 'AMERICA'
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey)
            SELECT o_year,
                   CAST(SUM(CASE WHEN sn_name = 'NATION_3'
                                 THEN rev ELSE 0 END) AS BIGINT)
                     AS share_num_cc,
                   CAST(SUM(rev) AS BIGINT) AS share_den_cc
            FROM f GROUP BY 1
        """,
        # TPC-H Q12 adapted: synthetic shipmode
        # MODES[(orderkey+linenumber) % 4], late = ship > order+60d
        "olap_shipmode": """
            SELECT (['MAIL','SHIP','AIR','TRUCK'])[
                     CAST((l_orderkey + l_linenumber) % 4 + 1 AS INT)]
                     AS shipmode,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                              ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                              ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= '1996-01-01'
              AND l_shipdate < '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
        """,
        # TPC-H Q15: quarterly top supplier(s) = per-supplier revenue
        # equal to its own max (ties all surface)
        "olap_top_supplier": """
            WITH ps AS (
              SELECT l_suppkey,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                                AS BIGINT)
                          * (100 - CAST(ROUND(l_discount * 100, 0)
                                        AS BIGINT))) AS BIGINT)
                       AS total_revenue_cc
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01'
                AND l_shipdate < '1996-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue_cc
            FROM ps JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue_cc =
              (SELECT max(total_revenue_cc) FROM ps)
        """,
        # TPC-H Q17: below-half-average-quantity brand revenue,
        # the avg test cross-multiplied (qty*2*n < sum_qty)
        "olap_small_qty_revenue": """
            WITH bl AS (
              SELECT l_partkey,
                     CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       AS price_cc
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#13'),
            st AS (
              SELECT l_partkey AS pk, SUM(qty) AS sum_qty,
                     COUNT(*) AS n_lines
              FROM bl GROUP BY 1)
            SELECT CAST(COALESCE(SUM(price_cc), 0) AS BIGINT)
                     AS revenue_cc,
                   COUNT(*) AS n_small_lines
            FROM bl JOIN st ON bl.l_partkey = st.pk
            WHERE qty * 2 * n_lines < sum_qty
        """,
        # TPC-H Q21 adapted: sole-late supplier on finished
        # multi-supplier orders, late = ship > order+60d
        "olap_waiting_suppliers": """
            WITH l1 AS (
              SELECT l_orderkey, l_suppkey, s_name
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
                          AND o_orderstatus = 'F'
              JOIN supplier ON l_suppkey = s_suppkey
              WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
            SELECT l_suppkey, s_name, count(*) AS numwait
            FROM l1
            WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                               AND o3.o_orderstatus = 'F'
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o3.o_orderdate
                        + INTERVAL 60 DAY)
            GROUP BY 1, 2
            ORDER BY numwait DESC, l_suppkey ASC
            LIMIT 25
        """,
        # TPC-H Q22 adapted: country code = c_nationkey % 10, cohort
        # positive-balance average cross-multiplied
        "olap_sales_opportunity": """
            WITH cust AS (
              SELECT c_custkey,
                     CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
                     CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
                       AS acctbal_cc
              FROM customer
              WHERE (c_nationkey % 10) IN (1, 3, 5, 7)),
            avg_pos AS (
              SELECT cntrycode, SUM(acctbal_cc) AS sum_cc,
                     COUNT(*) AS n
              FROM cust WHERE acctbal_cc > 0 GROUP BY 1)
            SELECT c.cntrycode, COUNT(*) AS numcust,
                   CAST(SUM(acctbal_cc) AS BIGINT) AS totacctbal_cc
            FROM cust c JOIN avg_pos a ON c.cntrycode = a.cntrycode
            WHERE c.acctbal_cc * a.n > a.sum_cc
              AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= '2001-01-01')
            GROUP BY 1
        """,
        # TPC-H Q2 over the derived partsupp: per-part argmin cost
        # among EUROPE suppliers, deterministic top-100
        "olap_min_cost_supplier": _PS_CTE + """
            , eligible AS (
              SELECT ps_partkey, ps_supplycost_cc, s_name, n_name,
                     CAST(ROUND(s_acctbal * 100, 0) AS BIGINT)
                       AS acctbal_cc
              FROM partsupp
              JOIN part ON ps_partkey = p_partkey
                        AND p_type = 'STANDARD'
                        AND p_size % 5 = 0
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
                          AND r_name = 'EUROPE'),
            mn AS (
              SELECT ps_partkey AS pk,
                     MIN(ps_supplycost_cc) AS min_cost
              FROM eligible GROUP BY 1)
            SELECT acctbal_cc, s_name, n_name,
                   ps_partkey AS p_partkey,
                   ps_supplycost_cc AS supplycost_cc
            FROM eligible JOIN mn
              ON ps_partkey = pk AND ps_supplycost_cc = min_cost
            ORDER BY acctbal_cc DESC, n_name ASC, s_name ASC,
                     p_partkey ASC
            LIMIT 100
        """,
        # TPC-H Q9 over the derived partsupp: per (nation, year)
        # profit, all terms in centi-cent·percent BIGINTs
        "olap_product_profit": _PS_CTE + """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0)
                                   AS BIGINT))
                     - ps_supplycost_cc * 100
                       * CAST(ROUND(l_quantity, 0) AS BIGINT))
                     AS BIGINT) AS profit_cc,
                   count(*) AS n_lines
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                      AND p_name LIKE '%rod%'
            JOIN partsupp ON l_partkey = ps_partkey
                          AND l_suppkey = ps_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        # TPC-H Q11 over the derived partsupp: one nation's per-part
        # supply value vs 1.5x the per-part average, cross-multiplied
        "olap_important_stock": _PS_CTE + """
            , slice AS (
              SELECT ps_partkey,
                     ps_supplycost_cc * ps_availqty AS value
              FROM partsupp
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
                          AND n_name = 'NATION_3'),
            pp AS (
              SELECT ps_partkey,
                     CAST(SUM(value) AS BIGINT) AS value_cc
              FROM slice GROUP BY 1)
            SELECT ps_partkey, value_cc
            FROM pp
            WHERE value_cc * (SELECT count(*) FROM pp) * 2
                  > (SELECT SUM(value_cc) FROM pp) * 3
        """,
        # TPC-H Q16 over the derived partsupp: distinct suppliers per
        # (brand, type, size); complaints = s_suppkey % 7 = 0
        "olap_parts_supplier": _PS_CTE + """
            SELECT p_brand, p_type,
                   CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM partsupp
            JOIN part ON ps_partkey = p_partkey
            WHERE p_brand <> 'Brand#13'
              AND p_type <> 'PROMO'
              AND p_size IN (5, 10, 15, 20, 25, 30)
              AND ps_suppkey NOT IN (
                SELECT s_suppkey FROM supplier
                WHERE s_suppkey % 7 = 0)
            GROUP BY 1, 2, 3
        """,
        # TPC-H Q20 over the derived partsupp: availqty*2 beats the
        # pair's year shipped quantity (zero-ship pairs drop, like
        # TPC-H's NULL scalar subquery); counts per supplier
        "olap_part_promotion": _PS_CTE + """
            , shipped AS (
              SELECT l_partkey AS pk, l_suppkey AS sk,
                     SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
                       AS shipped
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01'
                AND l_shipdate < '1997-01-01'
              GROUP BY 1, 2),
            q AS (
              SELECT ps_suppkey, count(*) AS n_excess_parts
              FROM partsupp
              JOIN part ON ps_partkey = p_partkey
                        AND p_name LIKE 'small%'
              JOIN shipped ON ps_partkey = pk
                           AND ps_suppkey = sk
              WHERE ps_availqty * 2 > shipped
              GROUP BY 1)
            SELECT s_suppkey, s_name, n_excess_parts
            FROM q JOIN supplier ON ps_suppkey = s_suppkey
        """,
        # local clustering coefficient as (n_triangles, n_wedges)
        # integer rationals over the Jaccard pair graph
        "graph_clustering_coeff": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , deg AS (
              SELECT node, count(*) AS degree FROM (
                SELECT a AS node FROM p
                UNION ALL SELECT b FROM p) q
              GROUP BY 1),
            t AS (
              SELECT e1.a, e1.b, e2.c
              FROM p e1
              JOIN (SELECT a AS b, b AS c FROM p) e2 USING (b)
              JOIN (SELECT a, b AS c FROM p) e3
                ON e3.a = e1.a AND e3.c = e2.c),
            tri AS (
              SELECT node, count(*) AS n_triangles FROM (
                SELECT unnest([a, b, c]) AS node FROM t) x
              GROUP BY 1)
            SELECT deg.node, degree,
                   CAST(COALESCE(n_triangles, 0) AS BIGINT)
                     AS n_triangles,
                   CAST((degree * (degree - 1)) // 2 AS BIGINT)
                     AS n_wedges
            FROM deg LEFT JOIN tri ON deg.node = tri.node
        """,
        # weekly cohort LTV: firsts join + age rollup + running
        # cumulative over the cohort-age aggregate
        "events_cohort_ltv": """
            WITH firsts AS (
              SELECT user_id,
                     MIN(date_trunc('week', ts)) AS cohort_week
              FROM events GROUP BY 1),
            per_age AS (
              SELECT cohort_week,
                     CAST(date_diff('day', cohort_week,
                            date_trunc('week', ts)) // 7 AS BIGINT)
                       AS week_age,
                     CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                       AS n_users,
                     CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                       AS BIGINT) AS revenue_cents
              FROM events e JOIN firsts f ON e.user_id = f.user_id
              GROUP BY 1, 2)
            SELECT cohort_week, week_age, n_users, revenue_cents,
                   CAST(SUM(revenue_cents) OVER (
                     PARTITION BY cohort_week ORDER BY week_age
                     ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT)
                     AS cum_revenue_cents
            FROM per_age
        """,
        # baseline-JPEG decode over the block-constant fixtures:
        # closed-form block pixel formula, 64 px per block, gray
        # triplicated into (r, g, b) like the other image kinds
        "multimodal_jpeg": """
            WITH b AS (
              SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
              FROM documents),
            px AS (
              SELECT b.doc_id,
                     3 * 64 * SUM((b.doc_id + 11 * gx.x + 13 * gy.y)
                                  % 251) AS pixel_sum
              FROM b
              CROSS JOIN generate_series(0, 2) gx(x)
              CROSS JOIN generate_series(0, 1) gy(y)
              WHERE gx.x < b.bw AND gy.y < b.bh
              GROUP BY 1)
            SELECT b.doc_id, 'jpg' AS kind,
                   CAST(8 * b.bw AS BIGINT) AS width,
                   CAST(8 * b.bh AS BIGINT) AS height,
                   CAST(px.pixel_sum AS BIGINT) AS pixel_sum,
                   CAST(b.doc_id % 251 AS BIGINT) AS first_px,
                   CAST(-1 AS BIGINT) AS sample_rate,
                   CAST(-1 AS BIGINT) AS n_samples,
                   CAST(-1 AS BIGINT) AS sample_sum,
                   CAST(-1 AS BIGINT) AS first_sample,
                   CAST(-1 AS BIGINT) AS duration_us
            FROM b JOIN px USING (doc_id)
        """,
        # top-20 consecutive event-type triples per user stream
        "events_paths": """
            WITH o AS (
              SELECT event_type,
                     LAG(event_type, 1) OVER w AS p1,
                     LAG(event_type, 2) OVER w AS p2
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_id))
            SELECT p2 AS t1, p1 AS t2, event_type AS t3,
                   count(*) AS n
            FROM o WHERE p2 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 20
        """,
        # per-doc type-token ratio under the shared word split
        "text_ttr": """
            WITH w AS (
              SELECT doc_id, word
              FROM (SELECT doc_id,
                           unnest(string_split_regex(trim(text),
                                                     ' +')) AS word
                    FROM documents) q
              WHERE word <> ''),
            agg AS (
              SELECT doc_id,
                     CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types,
                     CAST(COUNT(*) AS BIGINT) AS n_tokens
              FROM w GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(n_types, 0) AS n_types,
                   COALESCE(n_tokens, 0) AS n_tokens
            FROM documents d LEFT JOIN agg USING (doc_id)
        """,
        # k-anonymity audit (k=5) over (lang, source, len bucket)
        "curation_kanonymity": """
            SELECT lang, source,
                   CAST(n_chars // 100 AS BIGINT) AS len_bucket,
                   count(*) AS class_size,
                   CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END
                     AS BIGINT) AS is_safe
            FROM documents
            GROUP BY 1, 2, 3
        """,
        # IFP sameAs: filtered claim dedup + value-bucket self-join
        # (ops/ontology.ifp_sameas; the seg predicate is non-IFP noise
        # the operator's predicate filter must drop)
        "kg_ifp_sameas": """
            WITH claims AS (
              SELECT DISTINCT s, p, o FROM (
                SELECT 'c' || c_custkey AS s, 'mbox' AS p,
                       'm' || (c_custkey // 5) AS o FROM customer
                UNION ALL
                SELECT 'c' || c_custkey, 'home',
                       'h' || (c_custkey // 11) FROM customer
                UNION ALL
                SELECT 'c' || o_custkey, 'mbox',
                       'm' || (o_custkey // 5) FROM orders
              ) q)
            SELECT x.s AS a, y.s AS b, x.p AS via_p, x.o AS via_o
            FROM claims x JOIN claims y
              ON x.p = y.p AND x.o = y.o AND x.s < y.s
        """,
        # context-overlap disambiguation: sparse posting join +
        # argmax with (score DESC, entity_id ASC) tie-break
        "kg_disambiguate": """
            WITH cands AS (
              SELECT 's' || ((doc_id // 50) % 5) AS surface,
                     'e' || doc_id AS entity_id,
                     (string_split(text, ' '))[1:20] AS tokens
              FROM documents WHERE doc_id % 50 = 0),
            mentions AS (
              SELECT doc_id AS mention_id,
                     's' || (doc_id % 5) AS surface,
                     (string_split(text, ' '))[1:20] AS tokens
              FROM documents WHERE doc_id % 50 <> 0),
            m_tok AS (
              SELECT DISTINCT mention_id, surface, tok
              FROM (SELECT mention_id, surface, unnest(tokens) AS tok
                    FROM mentions) q),
            c_tok AS (
              SELECT DISTINCT entity_id, surface, tok
              FROM (SELECT entity_id, surface, unnest(tokens) AS tok
                    FROM cands) q),
            overlap AS (
              SELECT mention_id, entity_id, count(*) AS ov
              FROM m_tok JOIN c_tok USING (surface, tok)
              GROUP BY 1, 2),
            pairs AS (
              SELECT m.mention_id, m.surface, c.entity_id
              FROM mentions m JOIN cands c USING (surface)),
            scored AS (
              SELECT p.mention_id, p.surface, p.entity_id,
                     CAST(COALESCE(o.ov, 0) AS BIGINT) AS score,
                     count(*) OVER (PARTITION BY p.mention_id)
                       AS n_candidates,
                     row_number() OVER (
                       PARTITION BY p.mention_id
                       ORDER BY COALESCE(o.ov, 0) DESC, p.entity_id ASC
                     ) AS rn
              FROM pairs p LEFT JOIN overlap o
                ON p.mention_id = o.mention_id
               AND p.entity_id = o.entity_id)
            SELECT mention_id, surface, entity_id, score, n_candidates
            FROM scored WHERE rn = 1
        """,
        # unrolled 4-step fixed-point Markov power iteration — the
        # pagerank-oracle device over the lag-window transition counts
        "events_markov_stationary": """
            WITH ordered AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events),
            trans AS (
              SELECT prev AS src, event_type AS dst, count(*) AS n
              FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2),
            states AS (
              SELECT src AS state FROM trans
              UNION SELECT dst FROM trans),
            rowtot AS (SELECT src, sum(n) AS rowtot FROM trans GROUP BY 1),
            m0 AS (
              SELECT state,
                     CAST(1000000000000 // (SELECT count(*) FROM states)
                          AS BIGINT) AS mass
              FROM states),
            m1 AS (
              SELECT s.state,
                     CAST(COALESCE(i.inflow, 0) AS BIGINT) AS mass
              FROM states s LEFT JOIN (
                SELECT t.dst AS state,
                       CAST(SUM((m.mass * t.n) // r.rowtot) AS BIGINT)
                         AS inflow
                FROM trans t
                JOIN m0 m ON t.src = m.state
                JOIN rowtot r ON t.src = r.src
                GROUP BY 1
              ) i ON s.state = i.state
            ),
            m2 AS (
              SELECT s.state,
                     CAST(COALESCE(i.inflow, 0) AS BIGINT) AS mass
              FROM states s LEFT JOIN (
                SELECT t.dst AS state,
                       CAST(SUM((m.mass * t.n) // r.rowtot) AS BIGINT)
                         AS inflow
                FROM trans t
                JOIN m1 m ON t.src = m.state
                JOIN rowtot r ON t.src = r.src
                GROUP BY 1
              ) i ON s.state = i.state
            ),
            m3 AS (
              SELECT s.state,
                     CAST(COALESCE(i.inflow, 0) AS BIGINT) AS mass
              FROM states s LEFT JOIN (
                SELECT t.dst AS state,
                       CAST(SUM((m.mass * t.n) // r.rowtot) AS BIGINT)
                         AS inflow
                FROM trans t
                JOIN m2 m ON t.src = m.state
                JOIN rowtot r ON t.src = r.src
                GROUP BY 1
              ) i ON s.state = i.state
            ),
            m4 AS (
              SELECT s.state,
                     CAST(COALESCE(i.inflow, 0) AS BIGINT) AS mass
              FROM states s LEFT JOIN (
                SELECT t.dst AS state,
                       CAST(SUM((m.mass * t.n) // r.rowtot) AS BIGINT)
                         AS inflow
                FROM trans t
                JOIN m3 m ON t.src = m.state
                JOIN rowtot r ON t.src = r.src
                GROUP BY 1
              ) i ON s.state = i.state
            )
            SELECT state, mass AS mass_scaled FROM m4
        """,
        # 4-cycle census: canonical undirected edges from the same
        # closed-form grid, wedge self-join, C(c,2) per diagonal pair
        "graph_squares": """
            WITH raw AS (
              SELECT 'g' || p_partkey AS src,
                     'g' || (p_partkey + 1) AS dst
              FROM part WHERE p_partkey % 100 <> 99
              UNION ALL
              SELECT 'g' || p_partkey, 'g' || (p_partkey + 100)
              FROM part WHERE (p_partkey // 100) % 10 <> 9
              UNION ALL
              SELECT 'g' || p_partkey, 'g' || (p_partkey + 101)
              FROM part WHERE p_partkey % 100 <> 99
                AND (p_partkey // 100) % 10 <> 9),
            e AS (
              SELECT DISTINCT least(src, dst) AS a,
                     greatest(src, dst) AS b
              FROM raw WHERE src <> dst),
            adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            pairs AS (
              SELECT u.b AS u, w.b AS w, count(*) AS n_common
              FROM adj u JOIN adj w ON u.a = w.a AND u.b < w.b
              GROUP BY 1, 2)
            SELECT u, w, CAST(n_common AS BIGINT) AS n_common,
                   CAST(n_common * (n_common - 1) // 2 AS BIGINT)
                     AS c4_pairs
            FROM pairs WHERE n_common >= 2
        """,
        # byte-exact N-Triples lines incl. the escape chain
        # (backslash first, then quote, LF, CR; TAB stays literal)
        "kg_ntriples": """
            WITH t AS (
              SELECT 'http://x.test/s' || p_partkey AS s,
                     'http://x.test/p' || (p_partkey % 3) AS p,
                     CASE WHEN p_partkey % 2 = 0
                          THEN 'http://x.test/o' || (p_partkey % 50)
                          ELSE 'v' || p_partkey || ' say "hi" '
                               || chr(92) || ' ' || chr(10) || chr(13)
                               || chr(9) || 'end'
                     END AS o,
                     p_partkey % 2 = 0 AS o_is_iri
              FROM part)
            SELECT '<' || s || '> <' || p || '> ' ||
                   CASE WHEN o_is_iri THEN '<' || o || '>'
                        ELSE '"' || replace(replace(replace(replace(o,
                               chr(92), chr(92) || chr(92)),
                               '"', chr(92) || '"'),
                               chr(10), chr(92) || 'n'),
                               chr(13), chr(92) || 'r') || '"'
                   END || ' .' AS line
            FROM t
        """,
        # skolemization: same md5(label) derivation in SQL; the
        # substr(x,1,2)='_:' test is the exact startswith (LIKE would
        # wildcard the underscore)
        "kg_skolemize": """
            WITH t AS (
              SELECT CASE WHEN p_partkey % 3 = 0
                          THEN '_:b' || p_partkey
                          ELSE 'http://x.test/s' || p_partkey
                     END AS s,
                     'http://x.test/p' || (p_partkey % 4) AS p,
                     CASE WHEN p_partkey % 10 = 0
                          THEN '_:ob' || p_partkey
                          WHEN p_partkey % 2 = 0
                          THEN 'http://x.test/o' || (p_partkey % 50)
                          ELSE 'lit ' || p_partkey
                     END AS o,
                     (p_partkey % 10 <> 0 AND p_partkey % 2 = 0)
                       AS is_iri
              FROM part)
            SELECT CASE WHEN substr(s, 1, 2) = '_:'
                        THEN 'http://example.org/.well-known/genid/'
                             || md5(substr(s, 3))
                        ELSE s END AS s,
                   p,
                   CASE WHEN NOT is_iri AND substr(o, 1, 2) = '_:'
                        THEN 'http://example.org/.well-known/genid/'
                             || md5(substr(o, 3))
                        ELSE o END AS o,
                   CAST(is_iri OR (NOT is_iri AND substr(o, 1, 2) = '_:')
                        AS VARCHAR) AS o_is_iri
            FROM t
        """,
        # disjointness audit: canonicalized axioms x deduped types,
        # violations are the mod-12 residues
        "kg_disjoint_classes": """
            WITH types AS (
              SELECT DISTINCT s, cls FROM (
                SELECT 'e' || p_partkey AS s,
                       'C' || (p_partkey % 6) AS cls FROM part
                UNION ALL
                SELECT 'e' || p_partkey,
                       'C' || (p_partkey % 4 + 6) FROM part) q),
            ax AS (
              SELECT DISTINCT least(c1, c2) AS c1,
                     greatest(c1, c2) AS c2
              FROM (VALUES ('C0', 'C6'), ('C1', 'C7'), ('C8', 'C2'),
                           ('C3', 'C3'), ('C6', 'C0')) v(c1, c2)
              WHERE c1 <> c2)
            SELECT DISTINCT t1.s, ax.c1, ax.c2
            FROM types t1 JOIN ax ON t1.cls = ax.c1
            JOIN types t2 ON t2.s = t1.s AND t2.cls = ax.c2
        """,
        # built-in session_window boundary rule: an event EXACTLY
        # gap after the previous still MERGES (closed boundary, same
        # as the custom sessionizer's strict >; verified by unit
        # fixture with a gap-equal pair); end is exclusive (last+gap)
        "events_session_window_stream": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL THEN 1
                          WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS newf
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, ts,
                         CAST(SUM(newf) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
                  FROM g)
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end_excl,
                   count(*) AS n_events
            FROM s GROUP BY user_id, seq
        """,
        # merge gate: the oracle computes per-lang registers DIRECTLY;
        # equality pins merge(per-source partials) == global
        "sketch_hll_merge": """
            WITH w2 AS (
              SELECT lang, word FROM (
                SELECT lang,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents
              ) WHERE word <> ''
            ),
            r AS (
              SELECT lang, substr(md5(word), 1, 3) AS bucket,
                     CASE WHEN v = 0 THEN 61
                          ELSE 61 - length(bin(v)) END AS rho
              FROM (
                SELECT lang, word,
                       ('0x' || substr(md5(word), 4, 15))::BIGINT AS v
                FROM w2
              )
            ),
            regs AS (
              SELECT lang, bucket, max(rho) AS m FROM r GROUP BY 1, 2
            ),
            pg AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_registers_used,
                     CAST(sum(CASE WHEN m <= 50
                                   THEN (1::BIGINT << (50 - m))
                                   ELSE 0 END) AS BIGINT) AS s_used
              FROM regs GROUP BY 1
            ),
            est AS (
              SELECT lang, n_registers_used,
                     1.3621383526174148e+22
                       / (s_used
                          + (4096 - n_registers_used)
                            * (1::BIGINT << 50)) AS raw,
                     4096 - n_registers_used AS empty
              FROM pg
            )
            SELECT est.lang, est.n_registers_used,
                   CASE WHEN est.raw <= 10240.0 AND est.empty > 0
                        THEN 4096.0 * ln(4096.0 / est.empty)
                        ELSE est.raw END AS est_distinct
            FROM est
        """,
        "graph_conductance": _WORDS_CTE + _PAIR_GRAPH_CTE
        + _lpa_ctes(4, final=False) + """
            , sided AS MATERIALIZED (
              SELECT p.a, p.b, la.community AS ca, lb.community AS cb
              FROM p JOIN l4 la ON la.node = p.a
                     JOIN l4 lb ON lb.node = p.b),
            cdeg AS (
              SELECT node, community, count(*) AS deg FROM (
                SELECT a AS node, ca AS community FROM sided
                UNION ALL SELECT b, cb FROM sided) q GROUP BY 1, 2),
            vol AS (
              SELECT community, count(*) AS n_nodes,
                     CAST(sum(deg) AS BIGINT) AS volume
              FROM cdeg GROUP BY 1),
            cut AS (
              SELECT community, count(*) AS cut FROM (
                SELECT ca AS community FROM sided WHERE ca <> cb
                UNION ALL SELECT cb FROM sided WHERE ca <> cb) q
              GROUP BY 1),
            mm AS (SELECT count(*) * 2 AS m2 FROM sided)
            SELECT v.community, v.n_nodes, v.volume,
                   CAST(COALESCE(c.cut, 0) AS BIGINT) AS cut,
                   CAST(least(v.volume, mm.m2 - v.volume) AS BIGINT)
                     AS denom
            FROM vol v LEFT JOIN cut c USING (community)
            CROSS JOIN mm
        """,
        # typed-literal gates restated with regexp_matches, same
        # most-specific-first order, xsd:string fallthrough
        "kg_datatype_inference": r"""
            WITH lex AS (
              SELECT CAST(p_partkey AS VARCHAR) AS key,
                     CASE
                       WHEN p_partkey % 6 = 0 THEN '12' || p_partkey
                       WHEN p_partkey % 6 = 1 THEN '-' || p_partkey
                       WHEN p_partkey % 6 = 2
                         THEN p_partkey || '.' || (p_partkey % 100)
                       WHEN p_partkey % 6 = 3
                         THEN CASE WHEN p_partkey % 2 = 1
                                   THEN 'true' ELSE 'false' END
                       WHEN p_partkey % 6 = 4
                         THEN '19' || (92 + p_partkey % 8)
                              || '-0' || (1 + p_partkey % 9)
                              || '-1' || (p_partkey % 10)
                       WHEN p_partkey % 12 = 5
                         THEN '19' || (92 + p_partkey % 8)
                              || '-0' || (1 + p_partkey % 9)
                              || '-1' || (p_partkey % 10)
                              || 'T0' || (p_partkey % 10)
                              || ':00:0' || (p_partkey % 6) || 'Z'
                       ELSE 'plain ' || p_partkey
                     END AS lex
              FROM part)
            SELECT key, lex,
                   CASE
                     WHEN regexp_matches(lex, '^(true|false)$')
                       THEN 'http://www.w3.org/2001/XMLSchema#boolean'
                     WHEN regexp_matches(lex, '^[+-]?[0-9]+$')
                       THEN 'http://www.w3.org/2001/XMLSchema#integer'
                     WHEN regexp_matches(lex, '^[+-]?[0-9]*\.[0-9]+$')
                       THEN 'http://www.w3.org/2001/XMLSchema#decimal'
                     WHEN regexp_matches(lex,
                       '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
                       THEN 'http://www.w3.org/2001/XMLSchema#date'
                     WHEN regexp_matches(lex,
                       '^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}Z?$')
                       THEN 'http://www.w3.org/2001/XMLSchema#dateTime'
                     ELSE 'http://www.w3.org/2001/XMLSchema#string'
                   END AS datatype
            FROM lex
        """,
        # acronym derivation via list_transform word initials,
        # case-insensitive equality join
        "kg_acronym_link": """
            WITH ents AS (
              SELECT 'e' || p_partkey AS entity_id,
                     'Alpha ' || (p_partkey % 7)
                       || ' Beta ' || (p_partkey % 3) AS name
              FROM part WHERE p_partkey % 5 = 0
                AND p_partkey < 200),
            dic AS (
              SELECT entity_id,
                     array_to_string(
                       list_transform(string_split(name, ' '),
                                      x -> substr(x, 1, 1)), '')
                       AS acronym
              FROM ents),
            m AS (
              SELECT o_orderkey AS mention_id,
                     (CASE WHEN o_orderkey % 2 = 0
                           THEN 'A' ELSE 'a' END)
                     || (o_orderkey % 7)
                     || (CASE WHEN o_orderkey % 4 = 0
                              THEN 'B' ELSE 'b' END)
                     || (o_orderkey % 3) AS surface
              FROM orders WHERE o_orderkey % 3 = 0)
            SELECT m.mention_id, m.surface, d.entity_id, d.acronym
            FROM m JOIN dic d
              ON lower(m.surface) = lower(d.acronym)
        """,
        # two-stage lower-median order statistics, k=3 flags
        "curation_mad": """
            WITH base AS (
              SELECT doc_id, lang, n_chars FROM documents),
            r1 AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM base),
            med AS (
              SELECT lang, n_chars AS med FROM r1
              WHERE rn = (n + 1) // 2),
            dev AS (
              SELECT b.doc_id, b.lang, b.n_chars, m.med,
                     abs(b.n_chars - m.med) AS adev
              FROM base b JOIN med m USING (lang)),
            r2 AS (
              SELECT lang, adev,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY adev, doc_id) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM dev),
            mad AS (
              SELECT lang, adev AS mad FROM r2
              WHERE rn = (n + 1) // 2)
            SELECT d.doc_id, d.lang, d.n_chars, d.med, x.mad,
                   CASE WHEN d.adev > 3 * x.mad THEN 1 ELSE 0 END
                     AS is_outlier
            FROM dev d JOIN mad x USING (lang)
        """,
        # flat sweep-line running sum over boundary seconds — the
        # single-sequence twin of the hierarchical day-split scan
        "events_concurrency": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL THEN 1
                          WHEN floor(epoch(ts))::BIGINT
                             - floor(epoch(lag(ts) OVER w))::BIGINT
                               > 1800
                          THEN 1 ELSE 0 END AS newf
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, ts,
                         CAST(SUM(newf) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_seq
                  FROM g),
            sess AS (
              SELECT user_id, session_seq,
                     floor(epoch(min(ts)))::BIGINT AS s_sec,
                     floor(epoch(max(ts)))::BIGINT AS e_sec
              FROM s GROUP BY 1, 2),
            deltas AS (
              SELECT sec, CAST(SUM(d) AS BIGINT) AS delta FROM (
                SELECT s_sec AS sec, 1 AS d FROM sess
                UNION ALL
                SELECT e_sec + 1, -1 FROM sess) q
              GROUP BY 1),
            conc AS (
              SELECT sec,
                     SUM(delta) OVER (ORDER BY sec
                       ROWS UNBOUNDED PRECEDING) AS concurrent
              FROM deltas)
            SELECT CAST(sec - (sec % 3600) AS BIGINT) AS hour_sec,
                   CAST(max(concurrent) AS BIGINT) AS max_concurrent
            FROM conc GROUP BY 1
        """,
        # CUSUM via s_t = p_t - min(0, min prefix p): two stock
        # windows on the scaled-integer steps
        "events_cusum": """
            WITH hourly AS (
              SELECT event_type,
                     CAST(floor(epoch(ts))::BIGINT
                          - (floor(epoch(ts))::BIGINT % 3600)
                          AS BIGINT) AS hour_sec,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2),
            tot AS (
              SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS n
              FROM hourly GROUP BY 1),
            stepped AS (
              SELECT h.event_type, h.hour_sec, h.n_events, t.total,
                     h.n_events * 2 * t.n - 3 * t.total AS step
              FROM hourly h JOIN tot t USING (event_type)),
            p AS (
              SELECT event_type, hour_sec, n_events, total,
                     SUM(step) OVER win AS psum
              FROM stepped
              WINDOW win AS (PARTITION BY event_type ORDER BY hour_sec
                             ROWS UNBOUNDED PRECEDING)),
            c AS (
              SELECT event_type, hour_sec, n_events, total,
                     psum - least(MIN(psum) OVER win, 0)
                       AS cusum_scaled
              FROM p
              WINDOW win AS (PARTITION BY event_type ORDER BY hour_sec
                             ROWS UNBOUNDED PRECEDING))
            SELECT event_type, hour_sec, n_events,
                   CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
                   CASE WHEN cusum_scaled > 4 * 3 * total
                        THEN 1 ELSE 0 END AS alarm
            FROM c
        """,
        # closed-form watermark admission, MEASURED on this engine's
        # availableNow file replay and pinned at three SFs: the
        # watermark batch k evaluates against is max event ts of
        # chunks <= k-2 (minus 30 min) — watermark updates propagate
        # with one commit of lag — and a (possibly 2h-shifted) row
        # counts iff its window end is >= that watermark
        "events_late_data_stream": """
            WITH arr AS (
              SELECT event_id, ts AS arrival_ts, event_type,
                     CASE WHEN event_id % 17 = 0
                          THEN ts - INTERVAL 2 HOUR ELSE ts
                     END AS ev_ts,
                     row_number() OVER (ORDER BY ts, event_id) AS rn,
                     count(*) OVER () AS n
              FROM events),
            ch AS (
              SELECT *, (rn - 1) // ((n + 5) // 6) AS chunk FROM arr),
            cmax AS (
              SELECT chunk, max(ev_ts) AS chunk_max
              FROM ch GROUP BY 1),
            wm AS (
              SELECT chunk,
                     max(chunk_max) OVER (ORDER BY chunk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
                       AS prev_max
              FROM cmax),
            admitted AS (
              SELECT c.event_type,
                     date_trunc('hour', c.ev_ts) AS win_start
              FROM ch c JOIN wm USING (chunk)
              WHERE wm.prev_max IS NULL
                 OR epoch_ms(date_trunc('hour', c.ev_ts)
                             + INTERVAL 1 HOUR)
                    >= epoch_ms(wm.prev_max) - 1800000)
            SELECT win_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM admitted GROUP BY 1, 2
        """,
        # nested verified ranking + scaled reciprocal sum
        "rank_mrr": """
            WITH re AS (
              WITH tf AS (
                SELECT doc_id, word, count(*) AS tf FROM (
                  SELECT doc_id,
                         unnest(string_split_regex(trim(text), ' +'))
                           AS word
                  FROM documents) u
                WHERE word IN ('join', 'data', 'spark') GROUP BY 1, 2),
              r AS (SELECT word, tf, doc_id, (doc_id % 13 = 0) AS rel,
                           row_number()
                             OVER (PARTITION BY word
                                   ORDER BY tf DESC, doc_id ASC)
                             AS rank
                    FROM tf)
              SELECT word AS term, count(*) AS n_ranked,
                     min(CASE WHEN rel THEN rank END)
                       AS first_rel_rank
              FROM r GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(SUM(CASE WHEN first_rel_rank <= 10
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hit_at_k,
                   CAST(SUM(CASE WHEN first_rel_rank <= 10
                            THEN 2520 // first_rel_rank
                            ELSE 0 END) AS BIGINT) AS mrr_scaled,
                   CAST(2520 AS BIGINT) AS scale
            FROM re
        """,
        # md5 user bucketing + integer-cents rollup
        "events_abtest": """
            WITH a AS (
              SELECT CAST(('0x' || substr(md5('ab:' || user_id), 1, 8)
                          )::BIGINT % 2 AS BIGINT) AS variant,
                     event_type, user_id,
                     CAST(ROUND(COALESCE(value, 0) * 100, 0)
                          AS BIGINT) AS cents
              FROM events)
            SELECT variant, event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS value_cents
            FROM a GROUP BY 1, 2
        """,
        # the oracle builds the GLOBAL sketch directly (merge of
        # per-source tables == global by counter additivity)
        "sketch_cms_merge": r"""
            WITH w AS (
              SELECT word FROM (
                SELECT unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents
              ) WHERE word <> ''
            ),
            cnt AS (
              SELECT r.r AS row,
                     substr(md5('cm' || r.r || ':' || word), 1, 3)
                       AS bucket,
                     count(*) AS c
              FROM w CROSS JOIN generate_series(0, 3) r(r)
              GROUP BY 1, 2
            ),
            cands AS (
              SELECT * FROM (VALUES ('join'), ('data'), ('spark'))
                v(word)
            )
            SELECT t.word, CAST(min(COALESCE(c.c, 0)) AS BIGINT)
                     AS cms_n
            FROM cands t
            CROSS JOIN generate_series(0, 3) r(r)
            LEFT JOIN cnt c ON c.row = r.r
             AND c.bucket = substr(md5('cm' || r.r || ':' || t.word),
                                   1, 3)
            GROUP BY 1
        """,
        # time travel: the MERGE over the deterministic first-2-chunks
        # prefix of the (ts, event_id)-ordered changelog
        "olap_time_travel": """
            WITH base AS (
              SELECT c_custkey AS key,
                     CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bval
              FROM customer),
            chg0 AS (
              SELECT user_id + 1 AS key,
                     CAST(ROUND(COALESCE(value, 0) * 100, 0)
                          AS BIGINT) AS cval,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I'
                          ELSE 'U' END AS op,
                     ts, event_id,
                     row_number() OVER (ORDER BY ts, event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
              WHERE event_type IN ('signup', 'purchase', 'error')),
            chg AS (
              SELECT key, cval, op, ts, event_id FROM chg0
              WHERE rn <= 2 * ((n + 3) // 4)),
            latest AS (
              SELECT key, cval, op FROM (
                SELECT *, row_number()
                         OVER (PARTITION BY key
                               ORDER BY ts DESC, event_id DESC) AS rn
                FROM chg) WHERE rn = 1)
            SELECT COALESCE(b.key, l.key) AS key,
                   COALESCE(l.cval, b.bval) AS val,
                   CASE WHEN l.op IS NULL THEN 'base'
                        ELSE 'cdc' END AS src
            FROM base b FULL OUTER JOIN latest l ON b.key = l.key
            WHERE l.op IS NULL OR l.op <> 'D'
        """,
        # bow-tie: recursive closure + mutual join for SCC, largest
        # component as core, recursive reachability both ways
        "graph_bowtie": """
            WITH RECURSIVE ed AS (
              SELECT DISTINCT src, dst FROM (
                SELECT 'c' || (p_partkey % 20) AS src,
                       'c' || ((p_partkey + 1) % 20) AS dst
                FROM part WHERE p_partkey <= 20
                UNION ALL
                SELECT 'i' || p_partkey, 'c' || (p_partkey % 20)
                FROM part WHERE p_partkey % 7 = 0 AND p_partkey <= 140
                UNION ALL
                SELECT 'c' || (p_partkey % 20), 'o' || p_partkey
                FROM part WHERE p_partkey % 5 = 0 AND p_partkey <= 100
                UNION ALL
                SELECT 'i' || p_partkey, 't' || p_partkey
                FROM part WHERE p_partkey % 7 = 0 AND p_partkey <= 140
                UNION ALL
                SELECT 'x' || p_partkey, 'y' || p_partkey
                FROM part WHERE p_partkey % 11 = 0 AND p_partkey <= 110
              ) q WHERE src IS NOT NULL AND dst IS NOT NULL),
            reach AS (
              SELECT src, dst FROM ed
              UNION
              SELECT r.src, ed.dst FROM reach r
              JOIN ed ON r.dst = ed.src),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM ed
                UNION ALL SELECT dst FROM ed) q),
            mut AS (
              SELECT f.src AS node, min(f.dst) AS min_other
              FROM reach f JOIN reach g
                ON f.src = g.dst AND f.dst = g.src
              GROUP BY 1),
            lab AS (
              SELECT n.node,
                     least(n.node, COALESCE(m.min_other, n.node))
                       AS scc_id
              FROM nodes n LEFT JOIN mut m USING (node)),
            core_id AS (
              SELECT scc_id FROM lab GROUP BY 1
              ORDER BY count(*) DESC, scc_id ASC LIMIT 1),
            cn AS (SELECT node FROM lab
                   WHERE scc_id = (SELECT scc_id FROM core_id)),
            fwd AS (
              SELECT DISTINCT node FROM (
                SELECT r.dst AS node
                FROM reach r JOIN cn ON r.src = cn.node
                UNION ALL SELECT node FROM cn) q),
            bwd AS (
              SELECT DISTINCT node FROM (
                SELECT r.src AS node
                FROM reach r JOIN cn ON r.dst = cn.node
                UNION ALL SELECT node FROM cn) q)
            SELECT l.node,
                   CASE WHEN l.scc_id = (SELECT scc_id FROM core_id)
                          THEN 'CORE'
                        WHEN l.node IN (SELECT node FROM bwd)
                          THEN 'IN'
                        WHEN l.node IN (SELECT node FROM fwd)
                          THEN 'OUT'
                        ELSE 'OTHER' END AS cls
            FROM lab l
        """,
        # PARIS-style evidence join: shared (s,o) statements per
        # predicate pair + extension sizes
        "kg_schema_alignment": """
            WITH ls AS (
              SELECT DISTINCT 'e' || (l_orderkey % 500) AS s,
                     'a' || (l_linenumber % 3) AS p,
                     'v' || (l_partkey % 120) AS o
              FROM lineitem),
            rs AS (
              SELECT DISTINCT s, p, o FROM (
                SELECT 'e' || (l_orderkey % 500) AS s,
                       'b' || (l_linenumber % 3) AS p,
                       'v' || (l_partkey % 120) AS o
                FROM lineitem WHERE l_suppkey % 5 <> 0
                UNION ALL
                SELECT 'e' || (l_orderkey % 500), 'bnoise',
                       'w' || (l_suppkey % 7)
                FROM lineitem) q),
            shared AS (
              SELECT l.p AS p_left, r.p AS p_right,
                     count(*) AS n_shared
              FROM ls l JOIN rs r ON l.s = r.s AND l.o = r.o
              GROUP BY 1, 2 HAVING count(*) >= 2),
            nl AS (SELECT p AS p_left, count(*) AS n_left
                   FROM ls GROUP BY 1),
            nr AS (SELECT p AS p_right, count(*) AS n_right
                   FROM rs GROUP BY 1)
            SELECT s.p_left, s.p_right, s.n_shared,
                   nl.n_left, nr.n_right
            FROM shared s JOIN nl USING (p_left)
            JOIN nr USING (p_right)
        """,
        # graded tf ranking + the fixed integer discount table; the
        # ideal permutation is a second window over (gain desc, rank)
        "rank_ndcg": f"""
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> '' GROUP BY 1, 2),
            g AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 13 = 0 THEN 3
                          WHEN doc_id % 7 = 0 THEN 1
                          ELSE 0 END AS gain
              FROM documents),
            h AS (
              SELECT t.word AS term, t.doc_id, t.tf, g.gain
              FROM tf t JOIN g USING (doc_id)
              WHERE t.word IN ('join', 'data', 'spark')),
            r AS (
              SELECT term, gain,
                     row_number() OVER (PARTITION BY term
                       ORDER BY tf DESC, doc_id ASC) AS rank
              FROM h),
            r2 AS (
              SELECT term, gain, rank,
                     row_number() OVER (PARTITION BY term
                       ORDER BY gain DESC, rank ASC) AS irank
              FROM r)
            SELECT term, CAST(count(*) AS BIGINT) AS n_ranked,
                   CAST(SUM(gain * {_ndcg_case('rank')}) AS BIGINT)
                     AS dcg_scaled,
                   CAST(SUM(gain * {_ndcg_case('irank')}) AS BIGINT)
                     AS idcg_scaled,
                   CAST(1048576 AS BIGINT) AS wscale
            FROM r2 GROUP BY term
        """,
        # the oracle takes the k smallest hashes DIRECTLY from all
        # rows (merge of per-source sketches == global by the
        # union/re-take-k algebra); HUGEINT carries (k-1)*2^52
        "sketch_kmv": """
            WITH w AS (
              SELECT word FROM (
                SELECT unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents
              ) WHERE word <> ''),
            hv AS (
              SELECT DISTINCT
                     ('0x' || substr(md5(word), 1, 13))::BIGINT AS hv
              FROM w),
            k AS (SELECT hv FROM hv ORDER BY hv LIMIT 64),
            a AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                         CAST(max(hv) AS BIGINT) AS kth_hash
                  FROM k)
            SELECT k_used,
                   COALESCE(kth_hash, 0) AS kth_hash,
                   CASE WHEN k_used >= 64 AND kth_hash > 0
                        THEN CAST(63::HUGEINT * (1::HUGEINT << 52)
                                  // kth_hash::HUGEINT AS BIGINT)
                        ELSE k_used END AS est_distinct
            FROM a
        """,
        # word-source document contingency; HUGEINT twin of the
        # DECIMAL(38,0) DIV — exact integral division on both sides
        "text_chi2_keywords": """
            WITH dw AS (
              SELECT DISTINCT doc_id, source, word FROM (
                SELECT doc_id, source,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> ''),
            ns AS (SELECT source, count(*) AS ns
                   FROM documents GROUP BY 1),
            nt AS (SELECT count(*) AS n FROM documents),
            af AS (SELECT source, word, count(*) AS a
                   FROM dw GROUP BY 1, 2),
            cwf AS (SELECT word, count(*) AS cw FROM dw GROUP BY 1),
            j AS (
              SELECT af.source, af.word, af.a,
                     ns.ns - af.a AS b,
                     cwf.cw - af.a AS c,
                     nt.n - ns.ns - (cwf.cw - af.a) AS d,
                     nt.n AS n
              FROM af JOIN ns USING (source)
              JOIN cwf USING (word) CROSS JOIN nt),
            f AS (
              SELECT source, word, a, c,
                     CAST(n AS HUGEINT)
                       * (a * d - b * c)::HUGEINT
                       * (a * d - b * c)::HUGEINT * 10000
                     // ((a + b)::HUGEINT * (c + d)::HUGEINT
                         * (a + c)::HUGEINT * (b + d)::HUGEINT)
                       AS chi2_scaled
              FROM j WHERE b + d > 0 AND c + d > 0),
            r AS (
              SELECT source, word, a, c, chi2_scaled,
                     row_number() OVER (PARTITION BY source
                       ORDER BY chi2_scaled DESC, word ASC) AS rk
              FROM f)
            SELECT source, CAST(rk AS BIGINT) AS rk, word,
                   CAST(a AS BIGINT) AS df_in,
                   CAST(c AS BIGINT) AS df_out,
                   CAST(chi2_scaled AS BIGINT) AS chi2_scaled
            FROM r WHERE rk <= 5
        """,
        # the Rabin boundary rule restated position-by-position:
        # H(i) over the trailing 8 chars, boundary iff H % 64 = 0;
        # chunks are the boundary-delimited substrings + the tail
        "dedup_cdc_chunks": """
            WITH d AS (
              SELECT doc_id, COALESCE(text, '') AS text,
                     length(COALESCE(text, '')) AS n
              FROM documents),
            lim AS (
              SELECT unnest(range(8, 1 + GREATEST(
                (SELECT COALESCE(max(n), 0) FROM d), 8))) AS i),
            pos AS (
              SELECT d.doc_id, d.text, d.n, r.i
              FROM d CROSS JOIN lim r
              WHERE r.i <= d.n),
            b AS (
              SELECT doc_id, i FROM pos
              WHERE ((unicode(substr(text, i - 7, 1))::BIGINT
                      * 27512614111
                    + unicode(substr(text, i - 6, 1))::BIGINT
                      * 887503681
                    + unicode(substr(text, i - 5, 1))::BIGINT
                      * 28629151
                    + unicode(substr(text, i - 4, 1))::BIGINT * 923521
                    + unicode(substr(text, i - 3, 1))::BIGINT * 29791
                    + unicode(substr(text, i - 2, 1))::BIGINT * 961
                    + unicode(substr(text, i - 1, 1))::BIGINT * 31
                    + unicode(substr(text, i, 1))::BIGINT)
                    % 1073741824) % 64 = 0),
            seg AS (
              SELECT doc_id, i AS e,
                     COALESCE(lag(i) OVER (PARTITION BY doc_id
                                           ORDER BY i), 0) AS sp
              FROM b),
            chunks AS (
              SELECT s.doc_id,
                     substr(d.text, s.sp + 1, s.e - s.sp) AS chunk
              FROM seg s JOIN d USING (doc_id)
              UNION ALL
              SELECT d.doc_id,
                     substr(d.text, COALESCE(mx.m, 0) + 1) AS chunk
              FROM d LEFT JOIN (SELECT doc_id, max(i) AS m
                                FROM b GROUP BY 1) mx USING (doc_id)
              WHERE COALESCE(mx.m, 0) < d.n OR d.n = 0),
            ch AS (SELECT doc_id, md5(chunk) AS chunk_md5
                   FROM chunks),
            occ AS (SELECT chunk_md5,
                           count(DISTINCT doc_id) AS nd
                    FROM ch GROUP BY 1)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CASE WHEN occ.nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared_chunks
            FROM ch JOIN occ USING (chunk_md5) GROUP BY 1
        """,
        # every gradient-sign bit recomputed from the pixel formula
        # (d + x + 2y) % 251, packed row-major MSB-first over the
        # (w-1)*h horizontal pairs
        "multimodal_dhash": """
            WITH b AS (SELECT doc_id, 1 + doc_id % 7 AS w,
                              1 + doc_id % 5 AS h
                       FROM documents),
            bits AS (
              SELECT b.doc_id, b.w, b.h,
                     gy.y * (b.w - 1) + gx.x AS i,
                     CASE WHEN ((b.doc_id + gx.x + 1 + 2 * gy.y) % 251)
                             > ((b.doc_id + gx.x + 2 * gy.y) % 251)
                          THEN 1 ELSE 0 END AS bit
              FROM b
              CROSS JOIN generate_series(0, 5) gx(x)
              CROSS JOIN generate_series(0, 4) gy(y)
              WHERE gx.x < b.w - 1 AND gy.y < b.h)
            SELECT b.doc_id, CAST(b.w AS BIGINT) AS width,
                   CAST(b.h AS BIGINT) AS height,
                   CAST(COALESCE(SUM(bits.bit), 0) AS BIGINT)
                     AS n_ones,
                   CAST(COALESCE(SUM(bits.bit * (CAST(1 AS BIGINT)
                          << ((b.w - 1) * b.h - 1 - bits.i))), 0)
                        AS BIGINT) AS dhash
            FROM b LEFT JOIN bits USING (doc_id)
            GROUP BY b.doc_id, b.w, b.h
        """,
        # 4 unrolled rounds of per-seed min-hop relaxation over the
        # Jaccard pair graph (== BFS at minimal hop counts); seeds =
        # the 5 smallest nodes of the pair graph
        "graph_eccentricity": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , e AS (SELECT a AS x, b AS y FROM p
                    UNION SELECT b, a FROM p),
            sd AS (SELECT node FROM (
                     SELECT a AS node FROM p
                     UNION SELECT b FROM p) q
                   ORDER BY node LIMIT 5),
            d0 AS (SELECT node AS seed, node, 0 AS dist FROM sd),
            d1 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d0
                     UNION ALL
                     SELECT d0.seed, e.y, d0.dist + 1
                     FROM d0 JOIN e ON e.x = d0.node) q
                   GROUP BY 1, 2),
            d2 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d1
                     UNION ALL
                     SELECT d1.seed, e.y, d1.dist + 1
                     FROM d1 JOIN e ON e.x = d1.node) q
                   GROUP BY 1, 2),
            d3 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d2
                     UNION ALL
                     SELECT d2.seed, e.y, d2.dist + 1
                     FROM d2 JOIN e ON e.x = d2.node) q
                   GROUP BY 1, 2),
            d4 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d3
                     UNION ALL
                     SELECT d3.seed, e.y, d3.dist + 1
                     FROM d3 JOIN e ON e.x = d3.node) q
                   GROUP BY 1, 2)
            SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                   CAST(max(dist) AS BIGINT) AS ecc
            FROM d4 GROUP BY 1
        """,
        # midpoint in a scalar CTE; same md5 bucketing and cents
        # rounding as events_abtest; floor(epoch()) == Spark's
        # cast(ts as long) truncation
        "events_cuped": """
            WITH bnd AS (
              SELECT (floor(epoch(min(ts)))::BIGINT
                      + floor(epoch(max(ts)))::BIGINT) // 2 AS mid
              FROM events),
            u AS (
              SELECT CAST(('0x' || substr(md5('ab:' || user_id), 1, 8)
                          )::BIGINT % 2 AS BIGINT) AS variant,
                     user_id,
                     SUM(CASE WHEN floor(epoch(ts))::BIGINT < bnd.mid
                              THEN CAST(ROUND(COALESCE(value, 0) * 100,
                                              0) AS BIGINT)
                              ELSE 0 END) AS x,
                     SUM(CASE WHEN floor(epoch(ts))::BIGINT >= bnd.mid
                              THEN CAST(ROUND(COALESCE(value, 0) * 100,
                                              0) AS BIGINT)
                              ELSE 0 END) AS y
              FROM events CROSS JOIN bnd
              GROUP BY 1, 2)
            SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy
            FROM u GROUP BY 1
        """,
        # the two validated-triple branches composed on the shared
        # canonical subject: the generic l.o = r.s path join
        "kg_path_features": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k)
            SELECT l.s, l.p || '/' || r.p AS path, r.o,
                   CAST(count(*) AS BIGINT) AS n_paths
            FROM vt l JOIN vt r ON l.o = r.s
            GROUP BY 1, 2, 3
        """,
        # gaps-and-islands phrase segmentation restated in SQL; the
        # 1-based positions shift every island key by a per-doc
        # constant, which cannot change the grouping
        "text_rake": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), ' +') AS arr
              FROM documents),
            lim AS (
              SELECT unnest(range(1, 1 + GREATEST(
                (SELECT COALESCE(max(len(arr)), 0) FROM t), 1))) AS i),
            tok AS (
              SELECT doc_id, g.i AS pos, arr[g.i] AS word
              FROM t CROSS JOIN lim g
              WHERE g.i <= len(arr) AND arr[g.i] <> ''
                AND lower(arr[g.i]) NOT IN
                    ('the','a','an','of','to','and','in','is','on',
                     'for','with','was','by','at','it')),
            isl AS (
              SELECT doc_id, word,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM tok),
            pl AS (SELECT doc_id, grp, count(*) AS phrase_len
                   FROM isl GROUP BY 1, 2),
            ws AS (
              SELECT word, CAST(count(*) AS BIGINT) AS freq,
                     CAST(SUM(phrase_len) AS BIGINT) AS deg
              FROM isl JOIN pl USING (doc_id, grp) GROUP BY 1),
            sc AS (SELECT word, freq, deg,
                          (deg * 10000) // freq AS score_scaled
                   FROM ws)
            SELECT CAST(row_number() OVER (ORDER BY score_scaled DESC,
                                           word ASC) AS BIGINT) AS rk,
                   word, freq, deg,
                   CAST(score_scaled AS BIGINT) AS score_scaled
            FROM sc ORDER BY score_scaled DESC, word ASC LIMIT 10
        """,
        # per-source k-min sketches + per-pair union rank, all
        # windows — the same sketch rows the Spark plan builds
        "sketch_kmv_jaccard": """
            WITH w AS (
              SELECT source, word FROM (
                SELECT source,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> ''),
            sk AS (
              SELECT DISTINCT source AS part,
                     ('0x' || substr(md5(word), 1, 13))::BIGINT AS hv
              FROM w),
            tk AS (
              SELECT part, hv FROM (
                SELECT part, hv,
                       row_number() OVER (PARTITION BY part
                                          ORDER BY hv) AS rn
                FROM sk) q
              WHERE rn <= 64),
            pr AS (
              SELECT a.part AS pa, b.part AS pb
              FROM (SELECT DISTINCT part FROM tk) a
              JOIN (SELECT DISTINCT part FROM tk) b
                ON a.part < b.part),
            u AS (
              SELECT pa, pb, hv, max(in_a) AS in_a,
                     1 - min(in_a) AS in_b
              FROM (
                SELECT pr.pa, pr.pb, t.hv, 1 AS in_a
                FROM pr JOIN tk t ON t.part = pr.pa
                UNION ALL
                SELECT pr.pa, pr.pb, t.hv, 0
                FROM pr JOIN tk t ON t.part = pr.pb) q
              GROUP BY 1, 2, 3),
            r AS (
              SELECT pa, pb, hv, in_a, in_b,
                     row_number() OVER (PARTITION BY pa, pb
                                        ORDER BY hv) AS urn
              FROM u)
            SELECT pa AS part_a, pb AS part_b,
                   CAST(count(*) AS BIGINT) AS k_used,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_shared
            FROM r WHERE urn <= 64 GROUP BY 1, 2
        """,
        # same 4-round min-hop relaxation as graph_eccentricity, read
        # out as the lcm-scaled reciprocal-distance sum
        "graph_harmonic": _WORDS_CTE + _PAIR_GRAPH_CTE + """
            , e AS (SELECT a AS x, b AS y FROM p
                    UNION SELECT b, a FROM p),
            sd AS (SELECT node FROM (
                     SELECT a AS node FROM p
                     UNION SELECT b FROM p) q
                   ORDER BY node LIMIT 5),
            d0 AS (SELECT node AS seed, node, 0 AS dist FROM sd),
            d1 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d0
                     UNION ALL
                     SELECT d0.seed, e.y, d0.dist + 1
                     FROM d0 JOIN e ON e.x = d0.node) q
                   GROUP BY 1, 2),
            d2 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d1
                     UNION ALL
                     SELECT d1.seed, e.y, d1.dist + 1
                     FROM d1 JOIN e ON e.x = d1.node) q
                   GROUP BY 1, 2),
            d3 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d2
                     UNION ALL
                     SELECT d2.seed, e.y, d2.dist + 1
                     FROM d2 JOIN e ON e.x = d2.node) q
                   GROUP BY 1, 2),
            d4 AS (SELECT seed, node, min(dist) AS dist FROM (
                     SELECT seed, node, dist FROM d3
                     UNION ALL
                     SELECT d3.seed, e.y, d3.dist + 1
                     FROM d3 JOIN e ON e.x = d3.node) q
                   GROUP BY 1, 2)
            SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                   CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist
                                 ELSE 0 END) AS BIGINT) AS harm_scaled,
                   CAST(12 AS BIGINT) AS scale
            FROM d4 GROUP BY 1
        """,
        # latest-assertion window over the order-date timeline; the
        # pre-canonicalization subject surfaces are per-order
        "kg_asof_triples": f"""
            WITH cand AS (
              SELECT DISTINCT
                     CASE WHEN o_orderkey % 5 = 0
                          THEN '{EX}alt/' || o_custkey
                          ELSE '{EX}cust/' || o_custkey END AS s,
                     '{EX}locatedIn' AS p,
                     '{EX}nation/' ||
                       (CASE WHEN o_orderkey % 2 = 0 THEN 1
                             ELSE o_orderkey % 25 END) AS o,
                     date_diff('day', DATE '1970-01-01',
                               o_orderdate::DATE) AS asof_day
              FROM orders WHERE o_orderkey % 11 <> 0),
            r AS (
              SELECT s, p, o, asof_day,
                     row_number() OVER (PARTITION BY s, p
                       ORDER BY asof_day DESC, o ASC) AS rn
              FROM cand),
            st AS (
              SELECT s, p, count(DISTINCT o) AS n_values,
                     count(*) AS n_assertions
              FROM cand GROUP BY 1, 2)
            SELECT r.s, r.p, r.o,
                   CAST(r.asof_day AS BIGINT) AS asof_day,
                   CAST(st.n_values AS BIGINT) AS n_values,
                   CAST(st.n_assertions AS BIGINT) AS n_assertions
            FROM r JOIN st USING (s, p) WHERE rn = 1
        """,
        # claims in closed form from the order grammar; lower median
        # as the same ⌈n/2⌉ order statistic
        "kg_numeric_fusion": f"""
            WITH cl AS (
              SELECT CASE WHEN o_orderkey % 5 = 0
                          THEN '{EX}alt/' || o_custkey
                          ELSE '{EX}cust/' || o_custkey END AS s,
                     '{EX}totalValue' AS p,
                     CAST(floor(o_totalprice) AS BIGINT) AS v
              FROM orders),
            r AS (
              SELECT s, p, v,
                     row_number() OVER (PARTITION BY s, p
                                        ORDER BY v ASC) AS rn,
                     count(*) OVER (PARTITION BY s, p) AS n
              FROM cl),
            med AS (SELECT s, p, v AS v_med FROM r
                    WHERE rn = (n + 1) // 2),
            st AS (
              SELECT s, p, CAST(count(*) AS BIGINT) AS n_claims,
                     CAST(min(v) AS BIGINT) AS v_min,
                     CAST(max(v) AS BIGINT) AS v_max
              FROM cl GROUP BY 1, 2)
            SELECT st.s, st.p, st.n_claims, st.v_min,
                   CAST(med.v_med AS BIGINT) AS v_med, st.v_max
            FROM st JOIN med USING (s, p)
        """,
        # the (p, o) subject-count profile over the two validated
        # branches — n_shared_o counts key violations
        "kg_key_discovery": f"""{_KG_CTE}
            , vt AS (
              SELECT DISTINCT canon.subj AS s, '{EX}locatedIn' AS p,
                     '{EX}nation/' || nk AS o
              FROM osurf JOIN canon ON canon.k = osurf.k
              WHERE o % 11 <> 0
              UNION ALL
              SELECT '{EX}order/' || o, '{EX}placedBy', canon.subj
              FROM osurf JOIN canon ON canon.k = osurf.k),
            po AS (SELECT p, o, count(DISTINCT s) AS n_subj
                   FROM vt GROUP BY 1, 2)
            SELECT p, CAST(SUM(n_subj) AS BIGINT) AS n_statements,
                   CAST(count(*) AS BIGINT) AS n_distinct_o,
                   CAST(SUM(CASE WHEN n_subj >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared_o
            FROM po GROUP BY 1
        """,
        # pre-conversion paths ranked from both ends; floored-second
        # ties broken by event_id on both engines
        "events_attribution_multi": """
            WITH ev AS (
              SELECT user_id, event_type,
                     floor(epoch(ts))::BIGINT AS sec, event_id
              FROM events),
            cv AS (SELECT user_id, min(sec) AS conv_sec FROM ev
                   WHERE event_type = 'purchase' GROUP BY 1),
            tc AS (
              SELECT e.user_id, e.event_type, e.sec, e.event_id
              FROM ev e JOIN cv USING (user_id)
              WHERE e.event_type <> 'purchase'
                AND e.sec < cv.conv_sec),
            fl AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC) AS rk_first,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY sec DESC, event_id DESC) AS rk_last
              FROM tc)
            SELECT event_type,
                   CAST(SUM(CASE WHEN rk_first = 1 AND rk_last > 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_first,
                   CAST(SUM(CASE WHEN rk_last = 1 AND rk_first > 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_last,
                   CAST(SUM(CASE WHEN rk_first > 1 AND rk_last > 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_middle,
                   CAST(SUM(CASE WHEN rk_first = 1 AND rk_last = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_solo,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                     AS n_conversions
            FROM fl GROUP BY 1
        """,
        # per-user lifetime envelope + reverse running at-risk sum;
        # censoring cut at 7 days before the window end
        "events_survival": """
            WITH pu AS (
              SELECT user_id,
                     min(floor(epoch(ts))::BIGINT // 86400) AS d0,
                     max(floor(epoch(ts))::BIGINT // 86400) AS d1
              FROM events GROUP BY 1),
            wend AS (SELECT max(d1) AS w FROM pu),
            lab AS (
              SELECT d1 - d0 AS lifetime, (d1 >= w - 7) AS censored
              FROM pu CROSS JOIN wend),
            g AS (
              SELECT lifetime,
                     SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)
                       AS n_churned,
                     SUM(CASE WHEN censored THEN 1 ELSE 0 END)
                       AS n_censored
              FROM lab GROUP BY 1)
            SELECT CAST(lifetime AS BIGINT) AS lifetime,
                   CAST(SUM(n_churned + n_censored) OVER (
                          ORDER BY lifetime DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS n_at_risk,
                   CAST(n_churned AS BIGINT) AS n_churned,
                   CAST(n_censored AS BIGINT) AS n_censored
            FROM g
        """,
        # the DIRECT closure over the full pair graph — the gate
        # passes iff incremental merge == from-scratch CC
        "graph_cc_incremental": _WORDS_CTE.replace(
            "WITH ", "WITH RECURSIVE ", 1
        ) + _PAIR_GRAPH_CTE + """
            , und AS (
              SELECT a AS x, b AS y FROM p
              UNION SELECT b, a FROM p),
            walk AS (
              SELECT x AS node, x AS reach FROM und
              UNION
              SELECT wk.node, u.y FROM walk wk
              JOIN und u ON u.x = wk.reach)
            SELECT node AS doc_id, MIN(reach) AS component
            FROM walk GROUP BY 1
        """,
        # the ring MST is closed-form: all edges except the heaviest,
        # plus every pendant bridge; canonical a < b endpoints
        "graph_mst": """
            WITH base AS (
              SELECT p_partkey - 1 AS i FROM part
              WHERE p_partkey <= 24),
            ring AS (
              SELECT 'n' || i AS s2, 'n' || ((i + 1) % 24) AS d2,
                     CAST((37 * i) % 101 AS BIGINT) AS w
              FROM base),
            pend AS (
              SELECT 'n' || i AS s2, 'p' || i AS d2,
                     CAST(200 + i AS BIGINT) AS w
              FROM base),
            mx AS (SELECT max(w) AS mw FROM ring)
            SELECT LEAST(s2, d2) AS a, GREATEST(s2, d2) AS b, w
            FROM ring CROSS JOIN mx WHERE w <> mw
            UNION ALL
            SELECT LEAST(s2, d2), GREATEST(s2, d2), w FROM pend
        """,
        # top-V cut (ties word-asc) + left-join OOV flag
        "text_oov": """
            WITH tok AS (
              SELECT source, word FROM (
                SELECT source,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> ''),
            vc AS (SELECT word, count(*) AS n FROM tok GROUP BY 1),
            vocab AS (SELECT word FROM vc
                      ORDER BY n DESC, word ASC LIMIT 100)
            SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov
            FROM tok LEFT JOIN vocab v USING (word) GROUP BY 1
        """,
        # frame energies from the sample formula; strict local max
        # via lag/lead; consecutive landmark pairs via lead
        "multimodal_audio_landmarks": """
            WITH b AS (SELECT doc_id, 160 + doc_id % 64 AS n
                       FROM documents),
            fr AS (
              SELECT b.doc_id, g.j // 16 AS f,
                     SUM((((b.doc_id * 31 + 7 * g.j * g.j) % 65536)
                          - 32768)
                         * (((b.doc_id * 31 + 7 * g.j * g.j) % 65536)
                            - 32768)) AS e
              FROM b CROSS JOIN generate_series(0, 223) g(j)
              WHERE g.j < (b.n // 16) * 16
              GROUP BY 1, 2),
            lm AS (
              SELECT doc_id, f, e,
                     lag(e) OVER w AS ep, lead(e) OVER w AS en
              FROM fr
              WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
            l2 AS (
              SELECT doc_id, f, e FROM lm
              WHERE ep IS NOT NULL AND en IS NOT NULL
                AND e > ep AND e > en),
            pr AS (
              SELECT doc_id, f AS f1,
                     lead(f) OVER w2 AS f2,
                     e AS e1, lead(e) OVER w2 AS e2
              FROM l2
              WINDOW w2 AS (PARTITION BY doc_id ORDER BY f))
            SELECT doc_id, CAST(f1 AS BIGINT) AS f1,
                   CAST(f2 AS BIGINT) AS f2,
                   CAST(CASE WHEN e1 = 0 THEN 0
                             ELSE length(bin(e1)) END AS BIGINT) AS b1,
                   CAST(CASE WHEN e2 = 0 THEN 0
                             ELSE length(bin(e2)) END AS BIGINT) AS b2
            FROM pr WHERE f2 IS NOT NULL
        """,
        # k-th smallest boundary values via ORDER/LIMIT subqueries;
        # ties share the lower stage
        "pack_curriculum": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            b1 AS (SELECT max(n_chars) AS b FROM (
                     SELECT n_chars FROM documents
                     ORDER BY n_chars ASC
                     LIMIT (SELECT (n + 2) // 3 FROM nn)) q),
            b2 AS (SELECT max(n_chars) AS b FROM (
                     SELECT n_chars FROM documents
                     ORDER BY n_chars ASC
                     LIMIT (SELECT (2 * n + 2) // 3 FROM nn)) q)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(CASE WHEN n_chars <= b1.b THEN 0
                             WHEN n_chars <= b2.b THEN 1
                             ELSE 2 END AS BIGINT) AS stage,
                   md5('cur:' || doc_id) AS shuffle_key
            FROM documents CROSS JOIN b1 CROSS JOIN b2
        """,
        # identical RANGE frame over floored event seconds
        "events_rate_burst": """
            WITH ev AS (
              SELECT user_id, floor(epoch(ts))::BIGINT AS sec
              FROM events),
            pe AS (
              SELECT user_id,
                     count(*) OVER (PARTITION BY user_id ORDER BY sec
                       RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
                       AS burst
              FROM ev)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(burst) AS BIGINT) AS max_burst,
                   max(burst) >= 5 AS is_burst
            FROM pe GROUP BY 1
        """,
        # the fixture edge set restated + reverse-membership join
        "graph_reciprocity": """
            WITH base AS (
              SELECT p_partkey - 1 AS i FROM part
              WHERE p_partkey BETWEEN 1 AND 20),
            e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT 'h' || i AS src, 'h' || ((i + 1) % 20) AS dst
                FROM base
                UNION ALL
                SELECT 'h' || ((i + 1) % 20), 'h' || i
                FROM base WHERE i % 3 = 0
                UNION ALL
                SELECT 'h' || i, 'h' || ((i + 5) % 20) FROM base) q
              WHERE src <> dst),
            n AS (SELECT count(*) AS n_nodes FROM (
                    SELECT src AS x FROM e UNION SELECT dst FROM e) q)
            SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT count(*) FROM e a JOIN e b
                         ON a.src = b.dst AND a.dst = b.src)
                        AS BIGINT) AS n_reciprocated,
                   CAST(n.n_nodes AS BIGINT) AS n_nodes
            FROM n
        """,
        # running hit count + lcm-scaled precision contributions
        "rank_ap": """
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> '' GROUP BY 1, 2),
            h AS (
              SELECT t.word AS term, t.doc_id, t.tf,
                     (t.doc_id % 7 = 0) AS rel
              FROM tf t
              WHERE t.word IN ('join', 'data', 'spark')),
            r AS (
              SELECT term, rel,
                     row_number() OVER (PARTITION BY term
                       ORDER BY tf DESC, doc_id ASC) AS rank
              FROM h),
            g AS (
              SELECT term, rel, rank,
                     SUM(CASE WHEN rel THEN 1 ELSE 0 END)
                       OVER (PARTITION BY term ORDER BY rank
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS hits_at
              FROM r)
            SELECT term, CAST(count(*) AS BIGINT) AS n_ranked,
                   CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rel,
                   CAST(SUM(CASE WHEN rel AND rank <= 10
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_rel_at_k,
                   CAST(SUM(CASE WHEN rel AND rank <= 10
                                 THEN hits_at * (2520 // rank)
                                 ELSE 0 END) AS BIGINT) AS ap_scaled,
                   CAST(2520 AS BIGINT) AS scale
            FROM g GROUP BY term
        """,
        # the verified chunk CTE composed for both snapshots
        "dedup_chunk_store": f"""
            WITH {_cdc_chunks_sql('doc_id % 2 = 0', 'o')},
            {_cdc_chunks_sql('doc_id % 2 = 1', 'w')},
            os AS (SELECT DISTINCT chunk_md5 FROM och),
            ns AS (
              SELECT chunk_md5, max(chunk_len) AS chunk_len
              FROM wch GROUP BY 1)
            SELECT
              CAST(SUM(CASE WHEN os.chunk_md5 IS NULL THEN 1
                            ELSE 0 END) AS BIGINT) AS n_new_chunks,
              CAST(SUM(CASE WHEN os.chunk_md5 IS NULL
                            THEN ns.chunk_len ELSE 0 END) AS BIGINT)
                AS new_chars,
              CAST(SUM(CASE WHEN os.chunk_md5 IS NOT NULL THEN 1
                            ELSE 0 END) AS BIGINT) AS n_reused_chunks,
              CAST(SUM(CASE WHEN os.chunk_md5 IS NOT NULL
                            THEN ns.chunk_len ELSE 0 END) AS BIGINT)
                AS reused_chars
            FROM ns LEFT JOIN os USING (chunk_md5)
        """,
        # closed form: pendants carry 1·47; ring edge j positions
        # past the max-weight break carries 2j·(48−2j)
        "graph_tree_betweenness": """
            WITH base AS (
              SELECT p_partkey - 1 AS i FROM part
              WHERE p_partkey BETWEEN 1 AND 24),
            wr AS (SELECT i, (37 * i) % 101 AS w FROM base),
            m AS (SELECT i AS m FROM wr ORDER BY w DESC LIMIT 1),
            ring AS (
              SELECT 'n' || i AS s2, 'n' || ((i + 1) % 24) AS d2,
                     2 * (((i - m.m + 24) % 24))
                       * (48 - 2 * (((i - m.m + 24) % 24)))
                       AS n_through
              FROM base CROSS JOIN m WHERE i <> m.m),
            pend AS (
              SELECT 'n' || i AS s2, 'p' || i AS d2, 47 AS n_through
              FROM base)
            SELECT LEAST(s2, d2) AS a, GREATEST(s2, d2) AS b,
                   CAST(n_through AS BIGINT) AS n_through
            FROM (SELECT * FROM ring UNION ALL SELECT * FROM pend) q
        """,
        # both windows + the k²-bounded pair join
        "rank_kendall": """
            WITH tf AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +'))
                         AS word
                FROM documents) u
              WHERE word <> '' GROUP BY 1, 2),
            h AS (
              SELECT word AS term, doc_id, tf FROM tf
              WHERE word IN ('join', 'data', 'spark')),
            pool AS (
              SELECT term, doc_id, tf,
                     row_number() OVER (PARTITION BY term
                       ORDER BY tf DESC, doc_id ASC) AS ra
              FROM h QUALIFY ra <= 20),
            ab AS (
              SELECT term, doc_id, ra,
                     row_number() OVER (PARTITION BY term
                       ORDER BY (doc_id % 17) ASC, doc_id ASC) AS rb
              FROM pool),
            pr AS (
              SELECT x.term,
                     (x.ra - y.ra) * (x.rb - y.rb) AS prod
              FROM ab x JOIN ab y
                ON x.term = y.term AND x.doc_id < y.doc_id)
            SELECT term, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_concordant,
                   CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_discordant
            FROM pr GROUP BY 1
        """,
        # the +5 corruption makes validity closed-form: exactly the
        # o%3<>0 orders carry a correct check digit (the Spark side
        # must rediscover this through regexp + the 16-term Luhn
        # circuit over the constructed digit string)
        "pii_luhn": """
            SELECT o_orderkey AS doc_id,
                   CAST(1 AS BIGINT) AS n_card_candidates,
                   CAST(CASE WHEN o_orderkey % 3 = 0 THEN 0
                             ELSE 1 END AS BIGINT) AS n_valid_cards
            FROM orders
        """,
    }
    # count-of-counts over the verified CC labeling — the oracle wraps
    # the dedup_components SQL verbatim as a derived table
    o["graph_component_sizes"] = (
        "WITH comp AS (" + o["dedup_components"] + ") "
        "SELECT size, count(*) AS n_components FROM ("
        "SELECT component, count(*) AS size FROM comp GROUP BY 1) "
        "GROUP BY 1"
    )
    # LSH recall meta-eval: nest both verified twins, count the join
    # keep-best canonical selection: nest the verified cluster SQL
    # and the verified quality SQL, argmax per component
    o["dedup_canonical"] = (
        "WITH comp AS (" + o["dedup_components"] + "), "
        "q AS (" + o["text_quality"] + "), "
        "j AS (SELECT c.doc_id, c.component, q.is_quality, q.n_words "
        "FROM comp c JOIN q ON c.doc_id = q.doc_id), "
        "r AS (SELECT doc_id, component, "
        "first_value(doc_id) OVER (PARTITION BY component "
        "ORDER BY is_quality DESC, n_words DESC, doc_id ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS canonical_id FROM j) "
        "SELECT doc_id, component, canonical_id, "
        "CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END AS demoted "
        "FROM r"
    )
    # boilerplate: the parameterized chunk CTE over the footer-derived
    # text + the integer share threshold
    from shacl_rust_spark.queries_ops import _FOOTER as _FTR

    o["text_boilerplate"] = f"""
        WITH {_cdc_chunks_sql('TRUE', 'a',
                              text_sql="COALESCE(text, '') || '" + _FTR
                                       + "' || source || '.'")},
        am AS (
          SELECT ach.doc_id, ach.chunk_md5, ach.chunk_len, d.source
          FROM ach JOIN documents d USING (doc_id)),
        gs AS (SELECT source, count(*) AS ng
               FROM documents GROUP BY 1),
        pres AS (
          SELECT source, chunk_md5, count(DISTINCT doc_id) AS nd
          FROM am GROUP BY 1, 2),
        boiler AS (
          SELECT p.source, p.chunk_md5
          FROM pres p JOIN gs USING (source)
          WHERE p.nd >= 2 AND p.nd * 100 >= 50 * gs.ng)
        SELECT am.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN b.chunk_md5 IS NOT NULL THEN 1
                             ELSE 0 END) AS BIGINT) AS n_boiler_chunks,
               CAST(SUM(CASE WHEN b.chunk_md5 IS NOT NULL
                             THEN am.chunk_len ELSE 0 END) AS BIGINT)
                 AS boiler_chars
        FROM am LEFT JOIN boiler b
          ON b.source = am.source AND b.chunk_md5 = am.chunk_md5
        GROUP BY 1
    """
    # ANN recall meta-eval: nest both verified ANN twins and join
    o["ann_eval_recall"] = (
        "WITH ex AS (" + o["ann_cosine_topk"] + "), "
        "ap AS (" + o["ann_ivf_topk"] + ") "
        "SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact, "
        "CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_hit "
        "FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id "
        "AND ex.neighbor_id = ap.neighbor_id "
        "GROUP BY 1"
    )
    o["dedup_eval_recall"] = (
        "WITH ex AS (" + o["dedup_jaccard"] + "), "
        "lsh AS (" + o["dedup_minhash_lsh"] + "), "
        "cm AS (SELECT ex.a, ex.b FROM ex JOIN lsh "
        "ON ex.a = lsh.a AND ex.b = lsh.b) "
        "SELECT (SELECT count(*) FROM ex) AS n_exact, "
        "(SELECT count(*) FROM lsh) AS n_lsh, "
        "(SELECT count(*) FROM cm) AS n_common"
    )
    return o
