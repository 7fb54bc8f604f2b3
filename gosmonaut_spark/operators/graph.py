"""Distributed connected components over pair tables.

The missing last step of every fuzzy-dedup family in this engine
(minhash-LSH / simhash / embedding near-dup all emit *pairs*): turn the
pair table into cluster assignments so a corpus keeps exactly one
canonical document per near-duplicate cluster.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14). Each round is two shuffle stages (groupBy min +
re-expand); the edge set converges to per-component stars rooted at the
component's minimum id in O(log n) rounds — unlike naive min-label
propagation whose round count is the component *diameter* (fatal for
chain-shaped near-dup clusters at corpus scale, where transitive LSH
matches routinely form long paths).

Scale notes (100 TB lens):
* every stage is a key-partitioned aggregation or equi-join — no
  broadcast of the vertex set, no driver-side state;
* per-round `localCheckpoint` truncates lineage so the loop does not
  accumulate a plan of depth O(rounds) (iterative-algorithm discipline;
  the checkpoint is also what makes the convergence-test action cheap);
* convergence is an exact set comparison, not a hash fingerprint — no
  probabilistic early stop. Both edge sets are DISTINCT canonical
  (min,max) sets, so set equality reduces to ``|after| == |before|``
  plus ``after ANTI JOIN before`` being empty: the two counts are
  metadata-cheap scans of already-checkpointed data, and the single
  LEFT ANTI join (with ``limit(1)``) replaces the two full
  ``exceptAll`` shuffles the r3 version ran per round — at
  corpus-scale edge counts that check roughly doubled per-round cost.

Reference parity: the reference resolves entity dependencies with an
id-tracker bitset (/root/reference/id_tracker.go:60) but has no
clustering surface; this operator exists for the dedup families the graft
adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: attach every strictly-larger neighbor to
    min(N(u) ∪ {u}). Orientation-free (works on the undirected view)."""
    undirected = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nbrs = undirected.groupBy("u").agg(
        F.collect_set("v").alias("ns"), F.min("v").alias("mn")
    )
    m = F.least(F.col("u"), F.col("mn"))
    return (
        nbrs.select(
            F.explode(F.filter("ns", lambda v: v > F.col("u"))).alias("u"),
            m.alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge toward the smaller endpoint, then for each node
    u: attach every (smaller-or-equal) neighbor and u itself to
    min(N(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    nbrs = oriented.groupBy("u").agg(
        F.collect_set("v").alias("ns"), F.min("v").alias("mn")
    )
    m = F.least(F.col("u"), F.col("mn"))
    return (
        nbrs.select(
            F.explode(F.array_append("ns", F.col("u"))).alias("n"),
            m.alias("v"),
        )
        .where(F.col("n") != F.col("v"))
        .select(F.col("n").alias("u"), "v")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster assignment from an undirected pair table.

    Returns one row per node that appears in ``pairs``:
    ``(id, component)`` with ``component`` = the minimum node id in the
    node's connected component (a deterministic canonical representative,
    so downstream "keep one doc per cluster" is reproducible).

    Nodes with no pair (singletons) are absent — callers left-join and
    ``coalesce(component, id)``, which keeps this operator linear in the
    *pair* count, not the corpus size.
    """
    edges = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_before = edges.count()
    for _ in range(max_iter):
        grown = _large_star(edges).localCheckpoint()
        shrunk = _small_star(grown).localCheckpoint()
        # converged iff the oriented edge set is a fixpoint: compare as
        # canonical (min, max) sets — exact, not a hash fingerprint.
        # Both sides are DISTINCT sets, so equality == (same count AND
        # after \ before empty): one cheap count on the freshly
        # checkpointed set plus ONE anti-join probe (the previous
        # round's count is carried over, so the old set is never
        # re-scanned) — vs the two full exceptAll shuffles this check
        # used to cost per round.
        before = edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        after = shrunk.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        n_after = shrunk.count()
        changed = n_after != n_before or bool(
            after.join(before, ["u", "v"], "left_anti").limit(1).count()
        )
        edges, n_before = shrunk, n_after
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # post-condition (loud, cheap — the edge set at convergence is tiny
    # relative to the input): the fixpoint must be a union of stars, i.e.
    # no root is also a member (no 2-level chains) and every member has
    # exactly one root. Guards against a hypothetical non-star fixpoint of
    # the alternation ever silently producing wrong clusters.
    two_level = edges.join(
        edges.select(F.col("u").alias("v")).distinct(), "v", "left_semi"
    )
    multi_root = edges.groupBy("u").count().where(F.col("count") > 1)
    if two_level.limit(1).count() or multi_root.limit(1).count():
        raise AssertionError(
            "connected_components converged to a non-star edge set"
        )
    # fixpoint of small-star = stars rooted at each component's min id:
    # every edge is (member, root). Members point at the root; the root
    # itself appears only on the v side, so add its self-assignment.
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component"))
    return members.unionByName(roots).distinct()
