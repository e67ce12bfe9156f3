"""Distributed connected components — the cluster-formation step that
turns pairwise near-duplicate matches (MinHash/SimHash/embedding pairs)
into keep-one dedup decisions: every document gets the min doc-id of
its similarity component as ``cluster_id``, and the minimum member is
the canonical survivor.

Algorithm: iterative min-label propagation. labels start as each
node's own id; each round every node takes the min of its own label
and its neighbors' labels; converged when no label changes. This is
the Spark-idiomatic iterative-algorithm shape — per round ONE
edge⨝label join + ONE min aggregate (both shuffles on node id, AQE
coalesces them), and only a single scalar (the label-sum) returns to
the driver to test convergence. Rounds needed = component diameter:
for dedup graphs (tiny clusters of copies, mostly pairs/triangles)
that is 2-4 rounds. For adversarial long-path graphs at extreme scale
the literature's large-star/small-star contraction halves the round
count; the propagation loop here is the right default for dedup
workloads and fails loudly rather than returning a half-converged
labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``edges`` (undirected). Returns ``(v, label)``. ``nodes`` widens
    the vertex set beyond edge endpoints (singletons label
    themselves). Raises if ``max_iter`` rounds don't converge —
    a truncated labeling silently merges or splits clusters.

    Determinism: min-label propagation's fixpoint is unique (the
    component-wise min), independent of partitioning and join order.
    """
    sym = edges.select(
        F.col(a).cast("bigint").alias("v"), F.col(b).cast("bigint").alias("u")
    )
    sym = sym.union(
        sym.select(F.col("u").alias("v"), F.col("v").alias("u"))
    ).distinct().persist()
    # Iterate ONLY over edge-endpoint nodes: an isolated node's label
    # never changes, and at corpus scale the duplicate graph is a tiny
    # fraction of the vertex set — singletons join back self-labeled
    # after convergence instead of riding every round's join.
    # Materialize the symmetrized edge cache at the CALLER's shuffle
    # width — edge generation is corpus-sized work (e.g. MinHash
    # banding) and must not run under the narrowed loop conf below.
    sym.count()
    # Fused first round: with labels initialized to each node's own id,
    # round 1's neighbor-min is just min(v, min(u)) — one aggregate over
    # the symmetrized edges, no label join. Starting the loop from that
    # state saves a full join+aggregate round every call (and for the
    # dedup-graph common case of pairs/stars, it IS the fixpoint, so
    # the loop's first iteration doubles as the convergence check).
    #
    # localCheckpoint (not persist) at EVERY step: each round's plan
    # references `labels` twice (the neighbor-min join and the least
    # join), so an uncut lineage DOUBLES per iteration — exponential
    # plan growth that OOMs the driver around diameter ~20 (caught by
    # the randomized union-find cross-check). Checkpointing truncates
    # the plan to a materialized leaf each round; superseded checkpoint
    # RDDs are unreferenced after reassignment and the ContextCleaner
    # reclaims them.
    labels = (
        sym.groupBy("v")
        .agg(F.least(F.col("v"), F.min("u")).alias("label"))
        .localCheckpoint(eager=True)
    )
    # The iterated frames are duplicate-graph-sized, not corpus-sized —
    # scope the shuffle width down for the loop so each round pays a
    # handful of tasks, not a full-width stage per join/aggregate. (At
    # genuinely large duplicate graphs, raise spark.sql.shuffle
    # .partitions around the call; AQE coalesces either way.)
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "8")
    # Labels are monotonically non-increasing under least(), so the
    # label-sum is stationary iff every label is — one cheap scalar
    # action per round instead of a changed-rows join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    try:
        for _ in range(max_iter):
            nbr_min = (
                sym.join(
                    labels.select(
                        F.col("v").alias("u"), F.col("label").alias("nl")
                    ),
                    "u",
                )
                .groupBy("v")
                .agg(F.min("nl").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr_min, "v", "left")
                .select(
                    "v",
                    F.least(
                        F.col("label"), F.coalesce("nbr_min", F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                sym.unpersist()
                if nodes is not None:
                    singles = (
                        nodes.select(
                            F.col(node_col).cast("bigint").alias("v")
                        )
                        .distinct()
                        .join(labels, "v", "left_anti")
                        .select("v", F.col("v").alias("label"))
                    )
                    labels = labels.union(singles)
                return labels
            prev_sum = new_sum
    except Exception:
        sym.unpersist()
        raise
    finally:
        spark.conf.set(conf_key, prev_parts)
    sym.unpersist()
    raise RuntimeError(
        f"connected_components: not converged after {max_iter} rounds — "
        f"component diameter exceeds the iteration budget; raise max_iter"
    )
