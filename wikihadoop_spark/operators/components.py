"""Connected components over a candidate-pair edge list.

The missing last step of a near-dup pipeline: LSH/SimHash emit *pairs*,
but deduplication needs *clusters* (a templated page family at 100 TB
is one component spanning thousands of pairwise edges, and exactly one
keeper must survive per component).  The reference leaves this step to
"external sort/uniq" post-processing (README.rst:236-247); here it is a
first-class distributed operator.

Algorithm: iterative min-label propagation to a fixpoint — every node
ends labeled with the minimum node id reachable from it.

Design for 100 TB:
- Each iteration is one equi-join (edges ⨝ labels on the edge source)
  plus one min-aggregate — both shuffle on node id, map-side combine
  applies, and the iteration count is the graph DIAMETER, not |V|.
  Near-dup graphs are unions of quasi-cliques (LSH buckets emit all
  in-bucket pairs), so the diameter is small (2-4) — min-propagation
  converges in a handful of rounds; for adversarial long-chain graphs
  use the large-star/small-star variant (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), which this module's
  loop structure accommodates but the dedup use case never needs.
- Lineage is truncated every iteration with an eager localCheckpoint —
  without it the plan doubles per round and Catalyst analysis time
  dominates by iteration ~10.
- Convergence is detected from the SUM of labels: labels only ever
  decrease, so the sum strictly decreases until the fixpoint and is
  stable exactly there.  That is one scalar per iteration on the
  driver — control flow, not a data collect.
- Skew: a mega-component concentrates its min-aggregate on one label
  value, but min is combiner-friendly (partial aggregation bounds the
  shuffle at one row per (node, map partition)); the join side is keyed
  on node id which stays uniform regardless of component sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every vertex with the minimum vertex id in its connected
    component.  Returns ``(id_col, component)``; isolated vertices are
    their own component.  Deterministic (pure min-fixpoint).

    ``vertices`` must contain each node exactly once; ``edges`` is an
    undirected pair list (any orientation, duplicates tolerated).
    """
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym.s == labels.node)
            .select(F.col("d").alias("node"), "component")
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter too large — switch to the "
            "large-star/small-star formulation)"
        )
    return labels.select(F.col("node").alias(id_col), "component")


def component_summary(
    cc: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Per-member cluster view: component, member count, and the keeper
    flag (the minimum id IS the component label, so the keeper test is
    a plain column comparison — no extra join)."""
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return cc.select(
        F.col(id_col),
        "component",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col(id_col) == F.col("component")).alias("is_keeper"),
    )
