"""Target resolution: scans producing focus-node DataFrames.

Spark analog of /root/reference/src/core/target.rs:48-104. Each target
kind becomes a declarative scan over `triples`; a shape's targets union
with set-dedup (validation/mod.rs:99-109). Class/property hierarchies
fold into isin filters from the driver-side closure (see Dataset), which
Catalyst pushes into the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import terms_to_df
from ..shapes.ir import Shape, Target
from .. import vocab as V
from .dataset import Dataset


def resolve_target(ds: Dataset, target: Target) -> DataFrame:
    if target.kind == "node":
        return terms_to_df(ds.spark, [target.term])

    if target.kind == "class":
        classes = ds.subclasses(target.term)
        typed = ds.pred(V.RDF_TYPE)
        return (
            typed.where(
                (F.col("o.kind") == "iri") & F.col("o.value").isin(classes)
            )
            .select(F.col("s").alias("focus"))
            .distinct()
        )

    if target.kind == "subjectsOf":
        props = ds.subproperties(target.term)
        return (
            ds.triples.where(F.col("p").isin(props))
            .select(F.col("s").alias("focus"))
            .distinct()
        )

    if target.kind == "objectsOf":
        props = ds.subproperties(target.term)
        return (
            ds.triples.where(F.col("p").isin(props) & (F.col("o.kind") != "lit"))
            .select(F.col("o").alias("focus"))
            .distinct()
        )

    # sh:target (advanced) resolves to the empty set (target.rs:102)
    return terms_to_df(ds.spark, [])


def resolve_targets(ds: Dataset, shape: Shape, cache: dict | None = None) -> DataFrame:
    """Union of all the shape's targets, deduplicated.

    ``cache`` mirrors the reference's TargetResolutionCache
    (validation/mod.rs:24-41): identical targets across shapes share one
    resolved DataFrame plan.
    """
    dfs: list[DataFrame] = []
    for t in shape.targets:
        if cache is not None:
            if t not in cache:
                cache[t] = resolve_target(ds, t)
            dfs.append(cache[t])
        else:
            dfs.append(resolve_target(ds, t))
    if not dfs:
        return terms_to_df(ds.spark, [])
    return reduce(DataFrame.unionByName, dfs).dropDuplicates(["focus"])
