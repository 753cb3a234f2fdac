"""Large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) over the `documents`,
`embeddings`, and pages tables.

All hot paths are pure Column expressions or Arrow-batched pandas UDFs;
no row-at-a-time Python. Every op ships with a `queries()` entry and —
where SQL-expressible — a DuckDB oracle twin in __spark_entry__.py.
"""
