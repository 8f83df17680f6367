"""Link-graph centrality — iterative PageRank as DataFrame rounds.

Near-dup mining gives a *pair graph* (components.py collapses it);
large-scale corpus curation also wants a *ranking* over a link graph —
per-host authority for crawl prioritization, per-source importance for
mixture weighting (the same role PageRank plays in production
crawl/curation stacks; Page et al. 1999, public). Vanilla Spark SQL has
no iterative-fixpoint operator, so each PageRank round is expressed as
one broadcast join + one aggregation over the cached edge list — the
Pregel message-passing step lowered onto DataFrames.

Determinism discipline (the cross-engine oracle constraint): every
arithmetic step is **64-bit integer fixed-point** (1 rank unit =
1e-12). Integer sums are order-independent and engine-exact, integer
floor-division is identical everywhere, so a Spark run and a DuckDB
recursive re-derivation agree bit-for-bit — no float summation-order
drift, no decimal-rounding-mode mismatch. The quantization error is
≤ outdeg ulps per node per round (documented, bounded, and irrelevant
at 1e-12 granularity).

Scale notes (100 TB link graph, 1000 executors):
- the edge list is aggregated once to ``(src, dst)`` distinct rows and
  cached; every round reuses that one shuffle-partitioned frame —
  iteration adds NO new edge shuffles beyond the per-round groupBy.
- the rank vector is |V| rows — orders of magnitude smaller than |E|
  (hosts vs links). It is broadcast into the join, so each round costs
  one map-side hash join over edges plus one ``groupBy(dst)`` partial
  aggregation; edges never re-shuffle.
- lineage is truncated with ``localCheckpoint`` per round, the same
  guard components.py uses — an unchecked 20-round plan otherwise
  drowns Catalyst analysis time.
- dangling nodes (outdeg 0) contribute no mass — the "mass leak"
  PageRank variant. Callers who need a stochastic matrix should
  symmetrize or add self-loops before calling (q143 feeds a
  symmetrized bipartite graph, so every node has outdeg >= 1).

Reference parity: the reference engine has no graph operator; this is
part of the beyond-reference LLM-pipeline layer (SURVEY.md §6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: 1.0 of rank mass, in fixed-point units (1e-12 granularity).
UNIT = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    max_nodes_broadcast: int = 50_000_000,
    assume_distinct: bool = False,
    weight: str | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Returns ``(node, rank_units, rank)`` — ``rank_units`` is the exact
    BIGINT fixed-point mass (what the oracle re-derives), ``rank`` the
    human-facing double ``rank_units / 1e12`` (one exact division).

    ``damping_pct`` is an integer percentage so the damped update
    ``d * contrib + (1 - d) / N`` stays in integer arithmetic:
    ``(contrib_sum * damping_pct) DIV 100 + ((100 - damping_pct) *
    (UNIT DIV 100)) DIV N``.

    ``weight`` names a POSITIVE INTEGER edge-weight column (link
    multiplicity, order counts): each edge then carries
    ``(rank * w) DIV sum_w(src)`` instead of an equal split — still
    pure int64, so still bit-exact cross-engine. Weights must stay
    below ~9.2e6 (rank_units reaches 1e12, and 1e12 * w must fit
    int64); ANSI mode makes an overflow throw rather than wrap, and
    weighted edges are NOT deduped (multiplicity is the caller's
    semantics — ``assume_distinct`` is implied).

    ``seeds`` (a one-column frame of node ids) switches to PERSONALIZED
    PageRank: teleport mass and the initial distribution concentrate on
    the seed set (restricted to graph nodes; empty intersection fails
    loudly), ranking every node by walk-proximity to the seeds — the
    topic-sensitive / crawl-frontier form.

    ``max_nodes_broadcast`` guards the broadcast of the rank vector the
    same way asof.py guards its dimension broadcast: past ~5e7 nodes a
    rank vector stops fitting executor memory and the caller should
    switch to a shuffle-join variant — fail loudly, not silently spill.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")

    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight is not None:
        cols.append(F.col(weight).cast("bigint").alias("w"))
    e = edges.select(*cols)
    # ``assume_distinct`` lets a caller who already deduped skip the
    # one big shuffle in here. It matters more than it looks: a raw
    # fact-table feed (orders x lineitem at 100x = 120M rows) pays a
    # hash aggregate that spilled 9.4 GB under the 24g clamp; the same
    # graph pre-deduped BEFORE symmetrizing distincts 60M and flips the
    # result — measured in scripts/bench_graph_linkage_scale100.py.
    if not assume_distinct and weight is None:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    if n_nodes > max_nodes_broadcast:
        raise ValueError(
            f"pagerank: {n_nodes} nodes exceeds max_nodes_broadcast="
            f"{max_nodes_broadcast}; the per-round rank broadcast would not fit — "
            "use a shuffle-join variant (repartition edges and ranks by node) "
            "for graphs this wide"
        )

    outdeg = e.groupBy("src").agg(
        (
            F.sum("w") if weight is not None else F.count(F.lit(1))
        ).alias("outdeg")
    )
    # teleport mass, exact integer: (100-d)% of one UNIT. Uniform PageRank
    # spreads it over all N nodes; PERSONALIZED PageRank (``seeds``: a
    # one-column frame of node ids — topic pages, trusted hosts, a crawl
    # frontier) concentrates teleport AND the initial mass on the seed
    # set, ranking nodes by proximity to it (Page et al. §6; the
    # crawl-prioritization form). Same integer discipline: the teleport
    # becomes a per-node column on the node spine instead of a scalar.
    total_teleport = (100 - damping_pct) * (UNIT // 100)
    if seeds is None:
        spine = nodes.select(
            "node", F.lit(total_teleport // n_nodes).cast("bigint").alias("tele")
        ).localCheckpoint(eager=False)
        init = UNIT // n_nodes
        ranks = spine.select(
            "node", F.lit(init).cast("bigint").alias("rank_units")
        )
    else:
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        # seeds outside the graph would silently leak teleport mass —
        # restrict to graph nodes and count what remains
        seed_ids = seed_ids.join(nodes, "node", "left_semi")
        n_seeds = seed_ids.count()
        if n_seeds == 0:
            raise ValueError(
                "pagerank: seeds contain no node of the graph — "
                "personalized teleport would have nowhere to land"
            )
        spine = (
            nodes.join(seed_ids.withColumn("__s", F.lit(1)), "node", "left")
            .select(
                "node",
                F.when(
                    F.col("__s").isNotNull(),
                    F.lit(total_teleport // n_seeds),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("tele"),
            )
            .localCheckpoint(eager=False)
        )
        init = UNIT // n_seeds
        ranks = spine.select(
            "node",
            F.when(F.col("tele") > 0, F.lit(init))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rank_units"),
        )
    for i in range(iterations):
        if i:
            # truncate lineage BETWEEN rounds (an unchecked k-round plan
            # drowns Catalyst analysis); the LAST round stays a live
            # plan so callers — and the plan-audit tests — see the
            # real per-round physical shape, not a checkpoint scan
            ranks = ranks.localCheckpoint(eager=False)
        # per-src outgoing mass, integer floor division (DIV truncates
        # toward zero == floor on the nonnegative units; DuckDB's //
        # floors identically — the cross-engine-exact step a double
        # intermediate would break, since Spark's double->bigint cast
        # truncates where DuckDB's rounds). Every |V|-bounded side is
        # broadcast EXPLICITLY (ranks, outdeg, contrib) — checkpointed
        # RDDs carry no stats, so left to itself Catalyst would SMJ the
        # small sides and, worse, could re-shuffle the edge list.
        if weight is None:
            give = F.broadcast(
                ranks.join(
                    F.broadcast(outdeg.withColumnRenamed("src", "node")), "node"
                ).select(
                    F.col("node").alias("g_src"),
                    F.expr("rank_units DIV outdeg").cast("bigint").alias("give"),
                )
            )
            contrib = (
                e.join(give, F.col("src") == F.col("g_src"))
                .groupBy("dst")
                .agg(F.sum("give").alias("got"))
            )
        else:
            # weighted: the split is per-EDGE ((rank * w) DIV sum_w),
            # so the broadcast carries (rank, sum_w) and the division
            # happens in the edge join's projection — still one
            # broadcast + one groupBy(dst) per round
            state = F.broadcast(
                ranks.join(
                    F.broadcast(outdeg.withColumnRenamed("src", "node")), "node"
                ).select(
                    F.col("node").alias("g_src"),
                    "rank_units",
                    F.col("outdeg").alias("sw"),
                )
            )
            contrib = (
                e.join(state, F.col("src") == F.col("g_src"))
                .groupBy("dst")
                .agg(
                    F.sum(F.expr("(rank_units * w) DIV sw"))
                    .cast("bigint")
                    .alias("got")
                )
            )
        ranks = spine.join(
            F.broadcast(contrib), spine.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.expr(f"(coalesce(got, 0L) * {damping_pct}) DIV 100")
                + F.col("tele")
            )
            .cast("bigint")
            .alias("rank_units"),
        )

    return ranks.select(
        "node",
        "rank_units",
        (F.col("rank_units") / F.lit(float(UNIT))).alias("rank"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list —
    the local clustering signal (a dedup-pair graph whose nodes sit in
    many triangles is a dense boilerplate cluster; one with few is
    chains of borderline matches — different cleanup actions).

    Algorithm: **degree orientation** (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011 — public).
    Each undirected edge is oriented from the (degree, id)-smaller
    endpoint to the larger; every triangle then has exactly ONE node
    with two outgoing oriented edges, so joining oriented edges (u,v),
    (u,w) and probing (v,w) counts each triangle once — and the join
    fan-out per node is bounded by its ORIENTED out-degree, which the
    orientation caps near sqrt(|E|) even for celebrity nodes. That
    bound is the whole point at 100 TB: the naive (u,v)(v,w) join
    explodes on the highest-degree node; the oriented one cannot.

    Wedges are generated by a self-join on the oriented source, then
    closed with ONE semi-ish inner join against the symmetric edge set.
    Returns (node, triangles) for EVERY node that appears in ``edges``
    — including nodes whose only edges are self-loops (loops can't
    form triangles but their endpoints are still graph nodes) —
    zero-filled.
    """
    # checkpoint the INPUT once: it is re-read by the canonical edge
    # set below AND the node spine at the end — without truncation the
    # upstream edge producer (e.g. a quadratic fuzzy-pair join)
    # re-executes for every reuse (measured: 172s -> 8s at sf0.01 on
    # q145 when only `sym` was checkpointed and the spine read `both`)
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=False
    )
    sym = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # ...and the canonical set once more: degree, orientation and
        # closure all branch from here
        .localCheckpoint(eager=False)
    )
    both = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))

    # orient by (degree, id): strict total order, so exactly one
    # direction survives per edge
    d1 = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    d2 = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        both.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(d1, "a")
        .join(d2, "b")
        .filter(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
    )

    w1 = oriented.select(F.col("a").alias("pivot"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("pivot"), F.col("b").alias("y"))
    wedges = w1.join(w2, "pivot").filter(F.col("x") < F.col("y"))
    # close against `both` (one step from the checkpoint): oriented +
    # its reverse IS the symmetric edge set, and rebuilding it from
    # `oriented` would re-run the two orientation joins a third and
    # fourth time (review find)
    closed = wedges.join(
        both.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )

    per_node = (
        closed.select(F.col("pivot").alias("node"))
        .union(closed.select(F.col("x").alias("node")))
        .union(closed.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # node spine from the RAW edges, not the loop-filtered set: a node
    # whose only edge is a self-loop is still a node and must appear
    # zero-filled (review find)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles")
    )
