"""Distributed connected components — the cluster-formation step that
turns pairwise near-duplicate matches (MinHash/SimHash/embedding pairs)
into keep-one dedup decisions: every document gets the min doc-id of
its similarity component as ``cluster_id``, and the minimum member is
the canonical survivor.

Algorithm: iterative min-label propagation with pointer jumping.
labels start as each node's own id; each round every node takes the
min of its own label, its neighbors' labels, AND its label's label
(the pointer-jumping hop — label chains halve every round, so
convergence needs O(log diameter) rounds, not O(diameter)). Per round
that is an edge⨝label join + min aggregate + a label⨝label self-join
(all shuffles on node id over the duplicate-graph-sized frame, AQE
coalesces them), and only a single scalar (the label-sum) returns to
the driver to test convergence. For dedup graphs (tiny clusters of
copies, mostly pairs/triangles) 2-3 rounds suffice either way; the
hop is what keeps chain-shaped components (embedding-cosine graphs,
where near-dup similarity is locally transitive) from paying a round
per hop — measured r7: the 8-round sf0.1 embedding graph converges
in 4. Fails loudly rather than returning a half-converged labeling.
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
    small_graph_edges: int | None = None,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``edges`` (undirected). Returns ``(v, label)``. ``nodes`` widens
    the vertex set beyond edge endpoints (singletons label
    themselves). Raises if ``max_iter`` rounds don't converge —
    a truncated labeling silently merges or splits clusters.

    Size-adaptive: the symmetrized edge frame is materialized (and
    therefore counted) before the loop either way, so when the
    duplicate graph is small — ≤ ``small_graph_edges`` undirected
    edges, a few MB — the component closure runs as driver union-find
    on the already-materialized edges instead of paying several Spark
    rounds of fixed job overhead for a toy graph (measured r7: the
    467-edge sf0.1 embedding graph cost ~7 s in loop overhead, <1 ms
    in union-find). The distributed propagation loop below is the
    100 TB path and the semantics are identical; the property suite
    cross-checks the loop against union-find. Singleton attachment
    stays distributed in both paths (``nodes`` is corpus-sized).

    ``small_graph_edges`` defaults to the Spark conf
    ``spark.graft.cc.smallGraphEdges`` (else 200_000) so a deployment
    whose pair graphs run large or skewed can force the distributed
    tier fleet-wide (set it to 0) without touching call sites; an
    explicit argument wins over the conf. The boundary is inclusive:
    exactly ``small_graph_edges`` undirected edges still takes the
    driver tier (pinned by test_cc_small_graph_boundary).

    Determinism: min-label propagation's fixpoint is unique (the
    component-wise min), independent of partitioning and join order;
    union-find with min-root labeling computes the same fixpoint.
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
    n_sym = sym.count()
    spark = edges.sparkSession
    if small_graph_edges is None:
        small_graph_edges = int(
            spark.conf.get("spark.graft.cc.smallGraphEdges", "200000")
        )

    def _attach_singles(labels: DataFrame) -> DataFrame:
        if nodes is None:
            return labels
        singles = (
            nodes.select(F.col(node_col).cast("bigint").alias("v"))
            .distinct()
            .join(labels, "v", "left_anti")
            .select("v", F.col("v").alias("label"))
        )
        return labels.union(singles)

    if n_sym <= 2 * small_graph_edges:  # sym holds both directions
        pairs = sym.collect()
        sym.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in pairs:
            ra, rb = find(row.v), find(row.u)
            if ra != rb:
                # union by min: smaller id becomes the root, so the
                # root IS the component min at the end.
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        verts = {x for row in pairs for x in (row.v, row.u)}
        labels = spark.createDataFrame(
            [(v, find(v)) for v in sorted(verts)], "v bigint, label bigint"
        )
        return _attach_singles(labels)

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
            # Pointer jumping: label(label(v)) — label values are node
            # ids that exist in `labels` (the component min is an
            # edge-endpoint node), so the hop join always matches;
            # `left` + coalesce keeps the expression total anyway.
            hop = labels.select(
                F.col("v").alias("hop_key"), F.col("label").alias("hop_label")
            )
            new_labels = (
                labels.join(nbr_min, "v", "left")
                .join(hop, F.col("label") == F.col("hop_key"), "left")
                .select(
                    "v",
                    F.least(
                        F.col("label"),
                        F.coalesce("nbr_min", F.col("label")),
                        F.coalesce("hop_label", F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                sym.unpersist()
                return _attach_singles(labels)
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
