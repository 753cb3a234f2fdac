"""sh:sparql constraint execution (subset) — placeholder for step 8.

The reference rewrites SPARQL SELECT/ASK constraints over the data +
shapes graphs (/root/reference/src/validation/constraints/sparql.rs).
The Spark engine rewrites the supported BGP+FILTER subset into joins
over the `triples` view. Until the rewriter lands, any sh:sparql
constraint conservatively emits one violation per focus node — matching
the reference's last-resort behavior for unsupported queries
(sparql.rs:368-392 emits heuristic violations rather than silently
passing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..shapes.ir import Shape, SparqlC
from .. import vocab as V


def sparql_violations(vd, shape: Shape, c: SparqlC, focus_df: DataFrame, values: DataFrame) -> list[DataFrame]:
    return [vd.vio(focus_df, shape, V.SH_SPARQL_CC, "sh:sparql constraint (subset rewriter pending)")]
