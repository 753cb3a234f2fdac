"""shacl_rust_spark — PySpark-native KG construction + SHACL validation.

A from-scratch Spark-first engine with the query capabilities of the
reference validator `ensaremirerol/shacl-rust` (see SURVEY.md): the data
graph is a (large, partitioned) triples DataFrame; shapes compile on the
driver into set-oriented DataFrame plans (targets → path joins →
constraint predicates/aggregations → violations DataFrame).
"""

__version__ = "0.1.0"
