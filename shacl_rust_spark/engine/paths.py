"""SHACL property-path resolution as DataFrame join combinators.

Set-oriented re-expression of the reference's per-node traversal
(/root/reference/src/core/path.rs:88-195): a frontier DataFrame
(focus TERM, v TERM) flows through each path element left-to-right;
every element application deduplicates (path.rs:189-195) and drops
literal inputs (path.rs:113-120). Kleene closures are iterative
frontier joins with a per-focus visited set and localCheckpoint() to
cut lineage — the reference's BFS visited-set semantics exactly,
including the quirk that oneOrMore NEVER re-emits the start node even
when it is reachable through a cycle (visited is seeded with the start,
path.rs:158-160).

Every hop is an equi-join of the frontier against `triples` filtered to
one predicate (the PODS'17 triple-pattern join); the predicate filter
pushes down to the scan, and at scale the join shuffles on the term key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..shapes.ir import (
    Alternative, Hop, Inverse, OneOrMore, Path, PathElem, ZeroOrMore, ZeroOrOne,
)
from .dataset import Dataset

_MAX_KLEENE_ITERS = 10_000  # termination backstop; dedup guarantees progress


def _nodes_only(df: DataFrame) -> DataFrame:
    """Literal frontier values yield no further traversal (path.rs:113-120)."""
    return df.where(F.col("v.kind") != "lit")


def _dedup(df: DataFrame) -> DataFrame:
    return df.dropDuplicates(["focus", "v"])


def resolve_path(ds: Dataset, path: Path, focus_df: DataFrame) -> DataFrame:
    """focus_df(focus) → (focus, v) pairs after applying the full path.

    Literal focus nodes resolve to nothing (validation/mod.rs:184-189);
    callers that need the node-shape identity case handle it themselves.
    """
    cur = focus_df.where(F.col("focus.kind") != "lit").select(
        "focus", F.col("focus").alias("v")
    )
    for elem in path.elements:
        cur = resolve_element(ds, elem, cur)
    return cur


def resolve_element(ds: Dataset, elem: PathElem, frontier: DataFrame) -> DataFrame:
    nodes = _nodes_only(frontier)

    if isinstance(elem, Hop):
        t = ds.pred(elem.iri).select(F.col("s").alias("_hs"), F.col("o").alias("_ho"))
        return _dedup(
            nodes.join(t, nodes["v"] == F.col("_hs"))
            .select("focus", F.col("_ho").alias("v"))
        )

    if isinstance(elem, Inverse):
        t = ds.pred(elem.iri).select(F.col("s").alias("_hs"), F.col("o").alias("_ho"))
        return _dedup(
            nodes.join(t, nodes["v"] == F.col("_ho"))
            .select("focus", F.col("_hs").alias("v"))
        )

    if isinstance(elem, Alternative):
        parts = [resolve_element(ds, alt, nodes) for alt in elem.alts]
        if not parts:
            return nodes.limit(0)
        return _dedup(reduce(DataFrame.unionByName, parts))

    if isinstance(elem, ZeroOrOne):
        hop = resolve_element(ds, elem.inner, nodes)
        return _dedup(nodes.select("focus", "v").unionByName(hop))

    if isinstance(elem, (ZeroOrMore, OneOrMore)):
        closure = _kleene_closure(ds, elem.inner, nodes)
        if isinstance(elem, ZeroOrMore):
            return _dedup(nodes.select("focus", "v").unionByName(closure))
        return closure

    raise TypeError(f"unknown path element {elem!r}")


def _kleene_closure(ds: Dataset, inner: PathElem, start: DataFrame) -> DataFrame:
    """Per-focus BFS: nodes reachable in ≥1 step, excluding each focus's
    own start node (reference visited-set seeding, path.rs:141-171).

    Fast path: for single-predicate inner elements with a small edge set,
    the Dataset serves memoized transitive-closure pairs and the whole
    closure is ONE broadcast join — reused across every shape/constraint
    that traverses the same predicate. Large edge sets (the 100 TB case)
    use the iterative checkpointed frontier loop below."""
    if isinstance(inner, (Hop, Inverse)):
        pairs = ds.kleene_pairs_hinted(inner.iri, isinstance(inner, Inverse))
        if pairs is not None:
            return _dedup(
                start.join(
                    pairs, start["v"] == pairs["start"]
                ).select("focus", F.col("reached").alias("v"))
            )
    visited = _dedup(start.select("focus", "v")).localCheckpoint(eager=True)
    frontier = visited
    acc: DataFrame | None = None
    for _ in range(_MAX_KLEENE_ITERS):
        step = resolve_element(ds, inner, frontier)
        fresh = step.join(visited, ["focus", "v"], "left_anti").localCheckpoint(
            eager=True
        )
        if fresh.isEmpty():
            break
        acc = fresh if acc is None else acc.unionByName(fresh)
        visited = visited.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    else:
        raise RuntimeError("Kleene closure did not terminate")
    if acc is None:
        return start.select("focus", "v").limit(0)
    return _dedup(acc)
