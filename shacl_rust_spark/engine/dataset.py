"""Validation dataset: the data graph as a Spark DataFrame + driver shapes.

Spark analog of the reference's ValidationDataset
(/root/reference/src/validation/dataset.rs): the (potentially huge) data
graph is a `triples` DataFrame; the shapes graph is tiny and stays on
the driver. Subclass/subproperty closures (utils.rs:6-146) are computed
from the data graph's rdfs:subClassOf / rdfs:subPropertyOf edges —
ontology edges are a vanishing fraction of a web-scale triple corpus, so
they are collected once (capped) and closed driver-side; the resulting
class/property lists are folded into broadcast-friendly isin filters.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rdf.graph import Graph
from ..schema import graph_to_df
from ..term import Term
from .. import vocab as V

# Ontology-edge safety cap: beyond this we refuse to collect driver-side.
_MAX_ONTOLOGY_EDGES = 2_000_000


class Dataset:
    def __init__(self, spark: SparkSession, triples: DataFrame, shapes_graph: Graph):
        self.spark = spark
        self.triples = triples
        self.shapes_graph = shapes_graph
        self._closure_edges: dict[str, dict[Term, list[Term]]] = {}
        self._shapes_df: DataFrame | None = None

    def shapes_triples_df(self) -> DataFrame:
        """The (tiny, broadcastable) shapes graph as a triples DataFrame —
        the named-graph side of the reference's dual-graph store
        (dataset.rs:40-47), used by GRAPH $shapesGraph blocks."""
        if self._shapes_df is None:
            self._shapes_df = graph_to_df(self.spark, self.shapes_graph)
        return self._shapes_df

    @classmethod
    def from_graphs(cls, spark: SparkSession, data_graph: Graph, shapes_graph: Graph) -> "Dataset":
        return cls(spark, graph_to_df(spark, data_graph), shapes_graph)

    def pred(self, iri: str) -> DataFrame:
        """Triples with a fixed predicate — filter pushes to the scan."""
        return self.triples.where(F.col("p") == iri)

    # --- closures (reference utils.rs:59-78 / 126-146) -----------------
    def _edges(self, predicate: str) -> dict[Term, list[Term]]:
        """parent-term → [child terms] over subClassOf/subPropertyOf."""
        cached = self._closure_edges.get(predicate)
        if cached is not None:
            return cached
        rows = (
            self.pred(predicate)
            .select("s", "o")
            .limit(_MAX_ONTOLOGY_EDGES + 1)
            .collect()
        )
        if len(rows) > _MAX_ONTOLOGY_EDGES:
            raise RuntimeError(
                f"{predicate} edge count exceeds driver-side closure cap; "
                "precompute the hierarchy closure as a table instead"
            )
        children: dict[Term, list[Term]] = defaultdict(list)
        for r in rows:
            children[Term(*r.o)].append(Term(*r.s))
        self._closure_edges[predicate] = children
        return children

    def descendants(self, root: Term, predicate: str) -> list[str]:
        """BFS closure incl. the root, IRI results only.

        Matches collect_all_subclasses / collect_all_subproperties
        (utils.rs:59-78, 126-146): blank nodes traversed but filtered
        from the result.
        """
        children = self._edges(predicate)
        visited: set[Term] = set()
        stack = [root]
        while stack:
            cur = stack.pop()
            if cur in visited:
                continue
            visited.add(cur)
            stack.extend(c for c in children.get(cur, ()) if c not in visited)
        return [t.value for t in visited if t.is_iri]

    def subclasses(self, root: Term) -> list[str]:
        return self.descendants(root, V.RDFS_SUBCLASS_OF)

    def subproperties(self, root: Term) -> list[str]:
        return self.descendants(root, V.RDFS_SUBPROPERTY_OF)
