"""Web-scale KG-construction pipeline (BASELINE.json north_rule).

Stages: pages → extract (Arrow pandas UDF, byte-identical text) →
mention detection → entity linking (broadcast dict + minhash-LSH
fuzzy fallback, salted aggregation for head-entity skew) →
connected-components canonicalization (checkpointed fixpoint) →
SHACL-validated triple emission (violations anti-join) →
partitioned triple/node tables with manifest-based resume + lineage.

The SHACL validation layer is the reference's capability
(ensaremirerol/shacl-rust); the surrounding stages are Spark-native by
design and have no Rust counterpart (SURVEY.md preamble).
"""
