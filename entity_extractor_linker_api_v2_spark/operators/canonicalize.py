"""Canonicalization: connected components over same-as/alias edges (M4).

Generalizes the reference's order-preserving label dedup
(app/core/entity_helpers.py:39-47, O-29) to corpus-wide entity resolution:
mention labels, canonical German labels and Wikidata QIDs form a graph
(label ↔ label_de, label_de ↔ wikidata_id); each connected component is one
real-world entity; the canonical id is the lexicographic minimum member
(hashed for stability).

Two implementations, identical partitions (pytest-asserted on chain / hub /
random graphs):

  * ``connected_components`` — min-label propagation WITH pointer jumping
    (each round also adopts comp(comp)): O(log diameter) rounds, one
    groupBy-node shuffle + one comp-lookup join per round.  The default for
    the star-shaped entity graphs here.
  * ``connected_components_star`` — alternating small-star / large-star
    (Kiveris et al.): the hub-safe choice at 10^12 edges — neighbor sets
    never materialize on one row (join-based, no collect_list) and rounds
    strictly shrink the edge relation toward the component stars.

Both are driver-side loops with ``localCheckpoint()`` per round to cut
lineage (SURVEY §4.2 — no Catalyst analog, no GraphFrames dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_edges(entities: DataFrame) -> DataFrame:
    """Derive the resolution graph from the linked-entity table."""
    e1 = (entities.where("label != label_de")
          .selectExpr("label AS a", "label_de AS b"))
    e2 = (entities.where("wikidata_id != ''")
          .selectExpr("label_de AS a", "wikidata_id AS b"))
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
               .select("node", F.least("comp", F.coalesce("nbr_comp", "comp"))
                       .alias("comp")))
        # pointer jumping (path compression): also adopt comp(comp) — turns
        # O(diameter) convergence into O(log diameter); without it a
        # 60-link chain silently failed to converge inside max_iter=20
        # (caught by the small-star/large-star equivalence test)
        c2 = new.select(F.col("node").alias("c_node"),
                        F.col("comp").alias("c_comp"))
        new = (new.join(c2, new.comp == c2.c_node, "left")
               .select("node", F.least("comp", F.coalesce("c_comp", "comp"))
                       .alias("comp"))
               .localCheckpoint())
        changed = (new.alias("n").join(comps.alias("o"), "node")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        comps = new
        if changed == 0:
            break
    return comps


def connected_components_star(edges: DataFrame, max_iter: int = 30,
                              assume_distinct: bool = False) -> DataFrame:
    """Alternating small-star / large-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the hub-safe formulation for 10^12-edge graphs:

      large-star: every node u links each LARGER neighbor v>u to
                  m = min(Γ(u) ∪ {u})
      small-star: every node u links each not-larger neighbor (and itself)
                  to the minimum among them

    Both steps are expressed as ONE aggregation + ONE join over the edge
    relation (no collect_list — a hub's neighbor set never materializes on
    a single row), so per-round memory is O(1) per edge.  Converges in
    O(log n) rounds on chain-shaped graphs where plain min-label
    propagation needs O(diameter).  Node ids are strings; lexicographic
    order plays the role of the integer order in the paper.

    Returns (node, comp) with comp = the component's minimum member —
    identical partition (pytest-asserted on random graphs) to
    ``connected_components``.
    """
    # `assume_distinct`: callers that hand in an ALREADY-materialized,
    # already-deduped edge relation (canonical_entities localCheckpoints
    # entity_edges, which ends in .distinct()) skip the defensive
    # distinct + re-checkpoint here — one full extra job at every call
    # site that can prove cleanliness; the defensive path stays the
    # default for arbitrary input.
    base = edges.select("a", "b").filter(F.col("a") != F.col("b"))
    e0 = base if assume_distinct else base.distinct().localCheckpoint()
    e = e0
    # all_nodes is consumed ONCE, in the final left join — deriving it
    # lazily from the already-materialized e0 costs nothing per round,
    # where the old eager localCheckpoint paid a full extra job up front
    all_nodes = (e0.selectExpr("a AS node")
                 .unionByName(e0.selectExpr("b AS node"))
                 .distinct())

    # round bodies are selectExpr/where strings (round 8): the Column
    # formulation issued ~1000 py4j round trips per CC round of pure
    # plan-build time inside the bench timer (guide §1.2); the strings
    # parse to the identical trees.
    def star(ed: DataFrame, large: bool) -> DataFrame:
        # each step views the edge list as UNDIRECTED: symmetrize first
        # (neighbor sets are wrong otherwise — the previous step's output
        # is directed (member -> min))
        sym = ed.unionByName(ed.selectExpr("b AS a", "a AS b"))
        src = sym if large else sym.where("b <= a")
        m = (src.groupBy("a").agg(F.expr("min(b) AS _mn"))
             .selectExpr("a", "least(a, _mn) AS m"))
        if large:
            out = (sym.join(m, "a").where("b > a")
                   .selectExpr("b AS a", "m AS b"))
            # NO dedup here (round 8): the large-star output feeds ONLY the
            # small-star half of the same round, whose min-aggregate is
            # duplicate-insensitive and whose own distinct dedups the round's
            # result — the intermediate exchange bought nothing (guide §2.4)
            return out.where("a != b")
        out = (src.join(m, "a")
               .selectExpr("b AS a", "m AS b")
               .unionByName(m.selectExpr("a", "m AS b")))
        return out.where("a != b").distinct()

    prev_sig = None
    for _ in range(max_iter):
        e = star(star(e, large=True), large=False).localCheckpoint()
        # convergence check: the edge relation is a fixpoint when its
        # (count, checksum) signature stops changing
        sig = tuple(e.agg(F.count("*"),
                          F.expr("bit_xor(xxhash64(a, b))")).collect()[0])
        if sig == prev_sig:
            break
        prev_sig = sig
    # after convergence e is a star: (member, root); roots map to themselves
    comps = e.selectExpr("a AS node", "b AS comp")
    return (all_nodes.join(comps, "node", "left")
            .selectExpr("node", "coalesce(comp, node) AS comp"))


# above this many edges the hub-safe small-star/large-star formulation is
# the default: min-propagation's groupBy(node) materializes per-node
# neighbor aggregates whose skew grows with hub degree, while star rounds
# stay O(1) memory per edge.  Deliberately low so every driver-measured run
# (sf0.01 upward — 12 edges on this gazetteer universe) exercises the path
# that must hold at 10^12 edges.
STAR_EDGE_THRESHOLD = 8


# above this many batch nodes, merge_components_delta stops FORCING
# broadcast of its probe frames (a fat catch-up batch would otherwise OOM
# the driver/executors on the broadcast) and lets AQE pick the strategy
DELTA_BROADCAST_MAX_NODES = 1_000_000


def affected_members(comps: DataFrame, batch_nodes: DataFrame,
                     hint_broadcast: bool = True) -> DataFrame:
    """All (node, comp) rows of the components that contain at least one
    batch node — the ONLY part of the state that a batch of new edges can
    change.  A component none of whose members touches a new edge keeps
    both its membership and its minimum, so it must not enter the merge's
    CC input.  Two left-semi probes over a streamed scan of the state;
    with `hint_broadcast` (micro-batch-sized probes — the normal fold path)
    both are forced broadcasts so the state side is never shuffled here.
    Callers folding a FAT batch pass hint_broadcast=False and AQE chooses
    (see DELTA_BROADCAST_MAX_NODES)."""
    maybe = F.broadcast if hint_broadcast else (lambda df: df)
    affected = (comps.join(maybe(batch_nodes), "node", "left_semi")
                .select("comp").distinct())
    return comps.join(maybe(affected), "comp", "left_semi")


def merge_components_delta(comps: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental connected components, delta form: fold a batch of NEW
    edges into an existing (node, comp) partition and return ONLY the rows
    that change — new nodes plus members whose comp label moves.

    Correctness: a new edge can only change components it (transitively via
    other new edges) touches, and every endpoint of every new edge is a
    batch node — so restricting the CC input to ``affected_members`` plus
    the new edges loses nothing.  Inside that subgraph the existing
    partition is a star relation (member → comp root) with the same
    connectivity as the original edges, so CC(stars ∪ new_edges) ≡
    CC(all_old_edges ∪ new_edges), and comp labels stay the
    component-minimum because every star already points at its minimum.

    Per micro-batch cost: CC iterations run over O(|batch| ×
    affected-component size) rows — NOT O(|components|); the full state is
    only STREAMED (broadcast semi-probes), never iterated or shuffled.
    Pytest-asserted ≡ full recompute on random multi-batch splits."""
    # both are micro-batch-sized; materialized eagerly because each is
    # consumed twice (edges: node projection + CC union; batch_nodes: the
    # broadcast probe) and a lazy frame would re-run the caller's upstream
    # extraction lineage per consumer
    edges = new_edges.select("a", "b").distinct().localCheckpoint()
    batch_nodes = (edges.select(F.col("a").alias("node"))
                   .unionByName(edges.select(F.col("b").alias("node")))
                   .distinct().localCheckpoint())
    # fat-batch guard (round-5 advice): a catch-up batch can carry millions
    # of nodes — forcing those through a broadcast would OOM; the count is
    # free here (batch_nodes is already materialized)
    hint = batch_nodes.count() <= DELTA_BROADCAST_MAX_NODES
    members = affected_members(comps, batch_nodes,
                               hint_broadcast=hint).localCheckpoint()
    stars = (members.filter(F.col("node") != F.col("comp"))
             .select(F.col("node").alias("a"), F.col("comp").alias("b")))
    res = connected_components_star(stars.unionByName(edges).distinct())
    prev = members.select("node", F.col("comp").alias("old_comp"))
    return (res.join(prev, "node", "left")
            .filter(F.col("old_comp").isNull()
                    | (F.col("comp") != F.col("old_comp")))
            .select("node", "comp"))


def merge_components(comps: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental connected components, full-view form: the merged
    (node, comp) partition after folding a batch of NEW edges.  Thin
    wrapper over ``merge_components_delta`` — unchanged rows (the vast
    majority at scale) are carried through with a broadcast anti-join,
    never re-derived."""
    delta = merge_components_delta(comps, new_edges).localCheckpoint()
    # no forced broadcast here: unlike the batch-bounded probe frames, the
    # delta is bounded by the AFFECTED COMPONENT sizes (a batch merging two
    # huge components rewrites both) — let AQE pick broadcast when small
    untouched = comps.join(delta.select("node"), "node", "left_anti")
    return delta.unionByName(untouched)


def canonical_entities(entities: DataFrame, max_iter: int = 20,
                       algo: str = "auto") -> DataFrame:
    """entities → (node, comp, canonical_id): every mention label / canonical
    label / QID mapped to its component representative.

    algo: "star" | "minprop" | "auto" (star iff the edge relation has ≥
    STAR_EDGE_THRESHOLD edges — one count over the localCheckpoint'd edge
    relation, which both algorithms materialize anyway)."""
    edges = entity_edges(entities).localCheckpoint()
    if algo == "auto":
        algo = "star" if edges.count() >= STAR_EDGE_THRESHOLD else "minprop"
    comps = (connected_components_star(edges, assume_distinct=True)
             if algo == "star"
             else connected_components(edges, max_iter=max_iter))
    return comps.selectExpr("*", "sha2(comp, 256) AS canonical_id")
