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
    def __init__(
        self,
        spark: SparkSession,
        triples: DataFrame,
        shapes_graph: Graph,
        small: bool = False,
        cheap_pred: bool = False,
        distinct_triples: bool = False,
    ):
        self.spark = spark
        self.triples = triples
        self.shapes_graph = shapes_graph
        # `small` marks a fixture-scale data graph (driver-parsed): enables
        # whole-graph nested-shape memoization in the validator. Never set
        # for table-backed datasets.
        self.small = small
        # `cheap_pred` marks a triples frame whose per-predicate scans are
        # already cheap (e.g. backed by predicate-partitioned parquet with
        # column pruning): the validator then skips defensive
        # materialization of predicate-filtered intermediates.
        self.cheap_pred = cheap_pred
        # `distinct_triples` asserts the caller guarantees the triples
        # frame is a SET (no duplicate (s,p,o) rows) — e.g. the pipeline
        # dropDuplicates(["s","p","o"])-es candidates before validation.
        # The validator then skips defensive per-path dedup shuffles on
        # fused target-path pairs. With the default False, any
        # table-backed source with duplicate rows still gets exact set
        # semantics at the cost of one extra exchange per fused shape.
        self.distinct_triples = distinct_triples
        self._closure_edges: dict[str, dict[Term, list[Term]]] = {}
        self._kleene_pair_counts: dict[tuple, int] = {}
        self._shapes_df: DataFrame | None = None
        self._all_terms_df: DataFrame | None = None

    def all_terms_df(self) -> DataFrame:
        """Every distinct term appearing as subject or object — the focus
        universe used for small-dataset nested-shape memoization."""
        if self._all_terms_df is None:
            self._all_terms_df = (
                self.triples.select(F.col("s").alias("focus"))
                .unionByName(self.triples.select(F.col("o").alias("focus")))
                .dropDuplicates(["focus"])
                .localCheckpoint(eager=True)
            )
        return self._all_terms_df

    def shapes_triples_df(self) -> DataFrame:
        """The (tiny, broadcastable) shapes graph as a triples DataFrame —
        the named-graph side of the reference's dual-graph store
        (dataset.rs:40-47), used by GRAPH $shapesGraph blocks."""
        if self._shapes_df is None:
            self._shapes_df = graph_to_df(self.spark, self.shapes_graph)
        return self._shapes_df

    # Fixture graphs below this size get whole-graph nested-shape memoization.
    _SMALL_GRAPH_TRIPLES = 100_000

    @classmethod
    def from_graphs(cls, spark: SparkSession, data_graph: Graph, shapes_graph: Graph) -> "Dataset":
        return cls(
            spark,
            graph_to_df(spark, data_graph),
            shapes_graph,
            small=len(data_graph) < cls._SMALL_GRAPH_TRIPLES,
        )

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

    # --- Kleene-closure pair cache ----------------------------------------
    # sh:zeroOrMorePath / sh:oneOrMorePath over a single predicate is by far
    # the common case (rdf:rest lists, skos:broader chains). Instead of an
    # iterative frontier loop per call site — which the compile-time-unrolled
    # nested shapes of shacl-shacl re-run dozens of times — compute the
    # transitive-closure PAIRS (start, reached-in-≥1-step) once per
    # (predicate, direction) and serve every call as one broadcast join.
    # Driver-side only when the predicate's edge set is small (the same
    # policy as the subclass closure above); large edge sets fall back to
    # the distributed fixpoint in paths.py.
    _MAX_KLEENE_EDGES = 100_000
    _MAX_KLEENE_PAIRS = 2_000_000
    # Broadcast-hint gate: the pair cap (2M rows of two multi-field Term
    # structs) can be a several-hundred-MB driver-built relation — far
    # past a sane broadcast. Closures at or under this row count get the
    # F.broadcast hint; larger ones join plain (AQE may still pick a
    # broadcast from the runtime size, bounded by
    # spark.sql.autoBroadcastJoinThreshold).
    _BROADCAST_KLEENE_PAIRS = 250_000

    def kleene_pairs(
        self, predicate: str, inverse: bool, spec: bool = False
    ) -> DataFrame | None:
        """(start TERM, reached TERM) pairs for p+ semantics, or None if the
        edge set is too large for driver-side closure.

        With ``spec=False`` semantics mirror the reference BFS
        (path.rs:141-171): `reached` excludes the start node itself even
        when it is reachable through a cycle (the visited set is seeded
        with the start). With ``spec=True`` the pairs follow SPARQL 1.1
        §18.4 ALP semantics instead — a cycle back to the start DOES
        re-emit it — which is what sh:sparql property paths need
        (sparql.rs evaluates them with oxigraph's full SPARQL engine,
        not the SHACL path walker)."""
        key = ("kleene", predicate, inverse, spec)
        if key in self._closure_edges:
            return self._closure_edges[key]  # type: ignore[return-value]
        rows = (
            self.pred(predicate)
            .select("s", "o")
            .limit(self._MAX_KLEENE_EDGES + 1)
            .collect()
        )
        result: DataFrame | None
        if len(rows) > self._MAX_KLEENE_EDGES:
            result = None
        else:
            succ: dict[Term, list[Term]] = defaultdict(list)
            for r in rows:
                a, b = Term(*r.s), Term(*r.o)
                if b.kind == "lit" and not inverse:
                    # literals are valid targets but never traversed further
                    succ[a].append(b)
                elif inverse:
                    succ[b].append(a)
                else:
                    succ[a].append(b)
            pairs: list[tuple] = []
            total = 0
            overflow = False
            for start in list(succ):
                frontier = (
                    list(succ[start]) if spec
                    else [n for n in succ[start] if n != start]
                )
                reached: set[Term] = set()
                while frontier:
                    nxt: list[Term] = []
                    for n in frontier:
                        if n in reached:
                            continue
                        reached.add(n)
                        if n.kind != "lit":
                            nxt.extend(
                                m for m in succ.get(n, ())
                                if m not in reached
                                and (spec or m != start)
                            )
                    frontier = nxt
                total += len(reached)
                if total > self._MAX_KLEENE_PAIRS:
                    overflow = True
                    break
                pairs.extend((start, n) for n in reached)
            if overflow:
                result = None
            else:
                from ..schema import TERM_TYPE
                from pyspark.sql.types import StructField, StructType

                schema = StructType([
                    StructField("start", TERM_TYPE),
                    StructField("reached", TERM_TYPE),
                ])
                result = self.spark.createDataFrame(pairs, schema)
                self._kleene_pair_counts[key] = len(pairs)
        self._closure_edges[key] = result  # type: ignore[assignment]
        return result

    def kleene_pairs_hinted(
        self, predicate: str, inverse: bool, spec: bool = False
    ) -> DataFrame | None:
        """:meth:`kleene_pairs` with a SIZE-GATED broadcast hint: small
        closures broadcast (the common rdf:rest / skos:broader case);
        near-cap closures join plain so the hint can never force a
        hundreds-of-MB driver broadcast (see ``_BROADCAST_KLEENE_PAIRS``)."""
        pairs = self.kleene_pairs(predicate, inverse, spec)
        if pairs is None:
            return None
        n = self._kleene_pair_counts.get(
            ("kleene", predicate, inverse, spec), self._MAX_KLEENE_PAIRS
        )
        return F.broadcast(pairs) if n <= self._BROADCAST_KLEENE_PAIRS else pairs
