"""Canonicalization: connected components over same-as/alias edges (M4).

Generalizes the reference's order-preserving label dedup
(app/core/entity_helpers.py:39-47, O-29) to corpus-wide entity resolution:
mention labels, canonical German labels and Wikidata QIDs form a graph
(label ↔ label_de, label_de ↔ wikidata_id); each connected component is one
real-world entity; the canonical id is the lexicographic minimum member
(hashed for stability).

Implementation: iterative min-label propagation with
``localCheckpoint()`` each round to cut lineage (SURVEY §4.2 — a driver-side
loop; no Catalyst analog, no GraphFrames dependency).  Convergence is
O(graph diameter) rounds; each round is one shuffle (groupBy node).  For
hub-heavy graphs at 10^12-page scale, swap the propagation step for
small-star/large-star (same loop skeleton) — diameters here are tiny because
components are star-shaped around QIDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_edges(entities: DataFrame) -> DataFrame:
    """Derive the resolution graph from the linked-entity table."""
    e1 = (entities.filter(F.col("label") != F.col("label_de"))
          .select(F.col("label").alias("a"), F.col("label_de").alias("b")))
    e2 = (entities.filter(F.col("wikidata_id") != "")
          .select(F.col("label_de").alias("a"), F.col("wikidata_id").alias("b")))
    return e1.unionByName(e2).distinct()


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(a, b) undirected edges → (node, comp) with comp = min member label.

    Each iteration: every node adopts the min component id among itself and
    its neighbors.  Stops at fixpoint (checked via count of changed rows) or
    max_iter.  localCheckpoint truncates the growing plan each round.
    """
    # materialize the (tiny) undirected edge relation ONCE — it is joined in
    # every round, and a lazy `und` would re-run its whole upstream lineage
    # (the pandas extraction chain) per iteration
    und = (edges.select("a", "b")
           .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .localCheckpoint())
    nodes = und.select(F.col("a").alias("node")).distinct()
    comps = nodes.withColumn("comp", F.col("node")).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (und.join(comps, und.a == comps.node)
                   .select(F.col("b").alias("node"), "comp")
                   .groupBy("node").agg(F.min("comp").alias("nbr_comp")))
        new = (comps.join(nbr_min, "node", "left")
               .select("node", F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"))
               .localCheckpoint())
        changed = (new.alias("n").join(comps.alias("o"), "node")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        comps = new
        if changed == 0:
            break
    return comps


def canonical_entities(entities: DataFrame, max_iter: int = 20) -> DataFrame:
    """entities → (node, comp, canonical_id): every mention label / canonical
    label / QID mapped to its component representative."""
    comps = connected_components(entity_edges(entities), max_iter=max_iter)
    return comps.withColumn("canonical_id", F.sha2(F.col("comp"), 256))
