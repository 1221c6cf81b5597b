"""Graph analytics over relationally-derived edges (north-star
extension): clickstream transition graphs + PageRank.

Design: the 100 TB part of a web/event-graph job is EDGE CONTRACTION —
turning a raw event stream into a weighted transition relation — and
that is one window + one hash-aggregate here (distributed, map-side
combined). The rank iteration then runs on the contracted graph as
pure relational algebra (join ranks→edges, ordered-fold incoming mass,
redistribute dangling mass), which is exactly Pregel's message-passing
shape expressed in joins: it distributes unchanged when the node set
itself is huge, and it replays bit-identically in the DuckDB oracle
because every float op is a correctly-rounded IEEE primitive applied
in a FIXED order (sequential fold by source node — the same
associativity discipline as pq_mse's subspace sum).

Deliberately NOT a driver-side numpy loop: collect-and-iterate would
cap the graph at driver memory and leave nothing for the oracle to
replay (compare dup_clusters' distributed label propagation, which is
the unweighted special case of this module's iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """``(src, dst, w)`` — the weighted state-transition graph of user
    journeys: for each user's event sequence (total order: ts, then id
    for ties), count consecutive (state → next state) pairs.

    One window (partitioned by user — parallel across users, no global
    sort) + one hash-aggregate with map-side combine: each partition
    collapses to ≤ |states|² rows before the shuffle, so the exchanged
    payload is O(graph), not O(stream) — the same contraction shape as
    cms_build."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return pairs.groupBy("src", "dst").agg(F.count("*").alias("w"))


def _ordered_sum(order_col: str, val) -> F.Column:
    """Sequential fold of ``val`` in ascending ``order_col`` order —
    the oracle twin is ``list_sum(list(val ORDER BY order_col))``."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col(order_col), val.alias("v")))),
        F.lit(0.0),
        lambda acc, x: acc + x["v"],
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """``(node, pr)`` — PageRank after ``iters`` power iterations with
    uniform initialization, out-weight-proportional transition
    probabilities, and dangling-mass redistribution:

        r'(v) = (1−d)/N + d·(Σ_{u→v} p(u,v)·r(u) + dangle/N)

    Every iteration is: join ranks onto edges (broadcast — the rank
    relation is one row per node), ordered-fold the incoming mass per
    destination, fold the dangling mass, recombine. The float sequence
    is pinned — incoming folds by src, dangling folds by node, and the
    recombination applies ops in one fixed order — so DuckDB replays
    the trajectory exactly, not just approximately."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # p(u,v) = w/out_w(u): one IEEE division of exact integers
    probs = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("ow").cast("double")).alias("p"),
        )
        .persist()
    )
    dangling = nodes.join(
        edges.select("src").distinct(),
        nodes.node == F.col("src"),
        "left_anti",
    ).persist()

    n_d = F.lit(float(n_nodes))
    base = F.lit(1.0 - damping) / n_d
    r = nodes.select("node", (F.lit(1.0) / n_d).alias("pr"))
    for _ in range(iters):
        # materialize the rank relation ONCE per iteration: it is
        # referenced twice below (contribs + dangling), and without a
        # lineage cut the shared subtree re-executes per reference —
        # 2^iters recomputations of the whole chain (measured 8.4s for
        # 5 iterations on a 5-node graph; ~1s with the cut). This is
        # SURVEY §4's iterative-checkpoint rule (Bahmani's loop does
        # the same); one O(|nodes|) job per iteration.
        r = r.localCheckpoint(eager=True)
        contribs = probs.join(
            F.broadcast(r), probs.src == r.node
        ).select("dst", "src", (F.col("p") * F.col("pr")).alias("c"))
        inc = contribs.groupBy("dst").agg(
            _ordered_sum("src", F.col("c")).alias("inc")
        )
        dangle = (
            dangling.join(F.broadcast(r), "node")
            .agg(_ordered_sum("node", F.col("pr")).alias("dm"))
            .select(F.coalesce(F.col("dm"), F.lit(0.0)).alias("dm"))
        )
        r = (
            nodes.join(inc, nodes.node == inc.dst, "left")
            .crossJoin(F.broadcast(dangle))
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inc"), F.lit(0.0))
                        + F.col("dm") / n_d
                    )
                ).alias("pr"),
            )
        )
    return r
