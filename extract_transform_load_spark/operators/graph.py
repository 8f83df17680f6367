"""Link-graph centrality — iterative PageRank as DataFrame rounds.

Near-dup mining gives a *pair graph* (components.py collapses it);
large-scale corpus curation also wants a *ranking* over a link graph —
per-host authority for crawl prioritization, per-source importance for
mixture weighting (the same role PageRank plays in production
crawl/curation stacks; Page et al. 1999, public). Vanilla Spark SQL has
no iterative-fixpoint operator, so each PageRank round is expressed as
one join + one aggregation over the cached edge list — the Pregel
message-passing step lowered onto DataFrames.

Determinism discipline (the cross-engine oracle constraint): every
arithmetic step is **64-bit integer fixed-point** (1 rank unit =
1e-12). Integer sums are order-independent and engine-exact, integer
floor-division is identical everywhere, so a Spark run and a DuckDB
recursive re-derivation agree bit-for-bit — no float summation-order
drift, no decimal-rounding-mode mismatch. The quantization error is
≤ outdeg ulps per node per round (documented, bounded, and irrelevant
at 1e-12 granularity). The SAME integer math runs under both physical
engines below, so ``engine="broadcast"`` and ``engine="shuffle"`` are
byte-equal by construction (pinned in tests/test_graph_linkage.py).

Two physical engines (100 TB link graph, 1000 executors):

``engine="broadcast"`` — host-level graphs (|V| up to ~5e7):
- the edge list is aggregated once to ``(src, dst)`` distinct rows and
  cached; every round reuses that one shuffle-partitioned frame —
  iteration adds NO new edge shuffles beyond the per-round groupBy.
- the rank vector is |V| rows — orders of magnitude smaller than |E|
  (hosts vs links). It is broadcast into the join, so each round costs
  one map-side hash join over edges plus one ``groupBy(dst)`` partial
  aggregation; edges never re-shuffle.

``engine="shuffle"`` — page-level graphs (|V| beyond the broadcast
ceiling; a per-round 1 GB+ rank broadcast stops fitting executors):
- edges are hash-partitioned ONCE by ``src`` (the one |E| shuffle);
  ranks, outdeg, the node spine and every per-round contribution frame
  are |V|-row frames hash-partitioned on the node key with the same
  partition count, so every per-round join is co-partitioned — Catalyst
  inserts NO exchange on the edge side, ever.
- per round exactly ONE exchange moves data: the ``groupBy(dst)``
  message aggregation (|E| in, |V| out, map-side combined). The
  |V|-bounded joins use SHUFFLE_HASH hints: a sort-merge plan would
  re-sort the |E| frame every round; a hash build over the |V| side
  streams the edges untouched.
- nothing is ever broadcast, so the operator has NO width ceiling: the
  working set per round is |E|/P + 2|V|/P per partition — scale P with
  the cluster, not with executor memory.

``engine="auto"`` (default) dispatches on a node count that is needed
anyway (the teleport denominator): broadcast below
``max_nodes_broadcast``, shuffle above — the asof.py statistics-dispatch
discipline applied to graph width.

Common to both:
- lineage is truncated with ``localCheckpoint`` per round, the same
  guard components.py uses — an unchecked 20-round plan otherwise
  drowns Catalyst analysis time. (``Dataset.localCheckpoint`` preserves
  the physical output partitioning into the LogicalRDD, so the shuffle
  engine's co-partitioning SURVIVES the truncation — the property the
  whole round-over-round reuse rests on.)
- dangling nodes (outdeg 0) contribute no mass — the "mass leak"
  PageRank variant. Callers who need a stochastic matrix should
  symmetrize or add self-loops before calling (q143 feeds a
  symmetrized bipartite graph, so every node has outdeg >= 1).

Reference parity: the reference engine has no graph operator; this is
part of the beyond-reference LLM-pipeline layer (SURVEY.md §6).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: 1.0 of rank mass, in fixed-point units (1e-12 granularity).
UNIT = 10**12

_ENGINES = ("auto", "broadcast", "shuffle")

_AQE_LOCK = threading.Lock()
#: id(SparkSession) -> [depth, saved "spark.sql.adaptive.enabled"].
_AQE_DEPTH: dict[int, list] = {}


@contextmanager
def _aqe_compile_off(spark):
    """Reentrant, serialized 'AQE off while compiling' window.

    The shuffle engines compile their per-round plans (and the
    localCheckpoints that freeze them) with AQE disabled, because under
    AQE a localCheckpoint captures UnknownPartitioning — the adaptive
    plan's final layout isn't known at checkpoint-creation time, eager
    or not (measured) — which would re-insert an |E|-sized exchange
    above the edge scan EVERY round. The toggle covers only plan
    CONSTRUCTION: execution (whenever the caller acts) and every other
    query are unaffected.

    The naive save/set/restore was not reentrancy-safe (ADVICE r9):
    two overlapping shuffle-engine calls on one session raced — the
    second snapshotted the already-disabled value and its restore left
    AQE off session-wide. This helper serializes the state transitions
    under a module lock and keys a depth counter per session: the FIRST
    entry snapshots and disables, the LAST exit restores, nested/
    concurrent entries only bump the counter. Inherent residual (a
    session-global conf has no narrower scope): an UNRELATED query
    compiled inside someone else's window still sees AQE off for that
    compile — callers who interleave plan construction with graph
    rounds on one session should expect that, and execution-time
    behavior is never affected.
    """
    key = id(spark)
    with _AQE_LOCK:
        state = _AQE_DEPTH.get(key)
        if state is None:
            saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            state = _AQE_DEPTH[key] = [0, saved]
        state[0] += 1
    try:
        yield
    finally:
        with _AQE_LOCK:
            state = _AQE_DEPTH[key]
            state[0] -= 1
            if state[0] == 0:
                spark.conf.set("spark.sql.adaptive.enabled", state[1])
                del _AQE_DEPTH[key]


@contextmanager
def _shuffle_fanout(spark, num: int | None):
    """Pin ``spark.sql.shuffle.partitions`` to the engine's
    scale-adaptive fan-out while the round plans (and the
    localCheckpoints that freeze them) are compiled, so the per-round
    groupBy exchanges land at the SAME partition count as the frozen
    edge/state frames and the co-partitioned joins stay exchange-free.
    Save/restore is serialized under the module lock (the
    _aqe_compile_off discipline); like that window it covers only plan
    CONSTRUCTION — execution and other queries are unaffected, with the
    same documented residual for plans another thread compiles inside
    this window."""
    if num is None:
        yield
        return
    key = ("shuffle_partitions", id(spark))
    with _AQE_LOCK:
        stack = _FANOUT_STACK.setdefault(key, [])
        stack.append(spark.conf.get("spark.sql.shuffle.partitions", None))
        spark.conf.set("spark.sql.shuffle.partitions", str(num))
    try:
        yield
    finally:
        with _AQE_LOCK:
            saved = _FANOUT_STACK[key].pop()
            if not _FANOUT_STACK[key]:
                del _FANOUT_STACK[key]
            if saved is None:
                spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                spark.conf.set("spark.sql.shuffle.partitions", saved)


#: (tag, id(SparkSession)) -> stack of saved conf values for
#: _shuffle_fanout's save/restore.
_FANOUT_STACK: dict[tuple, list] = {}


def _shuffle_partitions(spark) -> int:
    """The session's shuffle fan-out, for the explicit edge repartition
    in shuffle mode. Matching ``spark.sql.shuffle.partitions`` keeps the
    edge frame co-partitioned with every groupBy/distinct output, so no
    join in the round loop re-shuffles the |E| side."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" under some AQE configs
        return spark.sparkContext.defaultParallelism


#: Edge rows per frozen-frame partition in the shuffle engines. An edge
#: row is two or three int64s (~25-50 B shuffled), so 2M rows ≈
#: 50-100 MB — the guide's fewer-larger-partitions band (§2.2) for the
#: per-round exchanges that AQE cannot coalesce here (round plans
#: compile with AQE off; see _aqe_compile_off).
_EDGE_ROWS_PER_PARTITION = 2_000_000


def _scaled_partitions(spark, n_rows: int) -> int:
    """Scale-adaptive fan-out for the shuffle engines' frozen frames:
    ``spark.sql.shuffle.partitions`` stays the CEILING (a cluster
    operator sizes it for the cluster, and a 100 TB edge list always
    saturates it), but a small graph gets proportionally fewer, larger
    partitions instead of conf-many near-empty ones. The round plans
    compile with AQE off, so the usual partition coalescing never sees
    them — without this, every one of the R per-round exchanges and
    hash joins schedules conf-many tiny tasks regardless of |E|
    (measured at sf0.1: the fan-out, not the data, dominates the round
    cost), and the fixed overhead scales with the conf instead of the
    input at every core count the driver benches."""
    cap = _shuffle_partitions(spark)
    need = -(-max(1, n_rows) // _EDGE_ROWS_PER_PARTITION)  # ceil div
    return max(1, min(cap, need))


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
    engine: str = "auto",
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
    topic-sensitive / crawl-frontier form. The initial distribution is
    keyed off seed MEMBERSHIP, not off a nonzero teleport, so the
    degenerate ``damping_pct=100`` (teleport 0) still seeds the walk.

    ``engine`` picks the physical plan (same math, byte-equal results):
    ``"broadcast"`` re-broadcasts the |V|-row rank vector each round
    (fastest while it fits; raises past ``max_nodes_broadcast``),
    ``"shuffle"`` co-partitions ranks and edges by node and reuses that
    partitioning across rounds (no width ceiling; one extra |E| shuffle
    up front), ``"auto"`` dispatches on the node count.

    Why ``auto`` here dispatches on NODES ONLY while :func:`kcore` and
    :func:`label_propagation` dispatch on (nodes, edges) — the
    per-family cost model, made explicit (VERDICT r10 next-round #7):

    ======================  ===============================  ==========
    engine pair             broadcast per-round cost         edge cap?
    ======================  ===============================  ==========
    pagerank                O(|E|) MAP-SIDE against the      no
                            frozen edge checkpoint — the
                            edge frame is never filtered or
                            re-materialized, so per-round
                            work matches the shuffle
                            engine's minus its up-front |E|
                            exchange
    kcore                   O(|E|) RE-MATERIALIZED — the     yes
                            surviving edge frame is
                            semi-joined and rewritten every
                            round, vs delta peeling's
                            deaths-only messages (measured
                            30x at 100x, ~50M edges)
    label_propagation       label column rewritten over       yes
                            the full |E| frame per round
                            vs co-partitioned MIN-merge
                            (measured 1.6x at 100x)
    ======================  ===============================  ==========

    So for pagerank the broadcast form is never asymptotically worse
    per round — the ONLY reason to leave it is rank-vector WIDTH
    (executor memory), which is exactly ``max_nodes_broadcast``; an
    edge-count cap would route mid-size graphs onto the engine with
    one extra |E| exchange for no per-round saving (PERFORMANCE.md's
    100x table: broadcast 480 s vs shuffle 349 s in one session, 313 s
    vs 477 s in another — within tenant noise of each other, both
    spill-free, neither dominant — against kcore's unambiguous
    2155 s -> 71 s). Byte-equality across engines makes the dispatch
    invisible to results either way.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")

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
    # checkpoint BEFORE deriving the node spine, so the (possibly
    # expensive) upstream build runs once and both the spine and every
    # round read its blocks; the shuffle engine re-checkpoints its
    # repartitioned copy below, which is one cheap shuffle over these
    # same blocks, not a second build. EAGER on purpose: the node count
    # below consumes it immediately anyway, and a lazy checkpoint here
    # let the round-1 broadcast-exchange thread race the main job into
    # materializing the full upstream build TWICE (measured at 100x on
    # the weighted feed: two 10.8 GB fact-join stages, 1.7-5.9 GB of
    # sort spill in the broadcast copy; eager => one build, no spill).
    e = e.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # ONE counting job resolves everything the plan needs eagerly: the
    # node count (teleport denominator + engine dispatch) and, for the
    # personalized form, the in-graph seed count — the seed flag join is
    # lazily checkpointed first so the count job materializes it and the
    # spine below reuses the same blocks (no second join, no second
    # scheduler round-trip; review r8 nit).
    flagged = None
    if seeds is not None:
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        # seeds outside the graph would silently leak teleport mass —
        # restrict to graph nodes via the left join's membership flag
        flagged = nodes.join(
            seed_ids.withColumn("__s", F.lit(1)), "node", "left"
        ).localCheckpoint(eager=False)
        counts = flagged.agg(
            F.count(F.lit(1)).alias("n"), F.sum("__s").alias("s")
        ).first()
        n_nodes, n_seeds = counts["n"], int(counts["s"] or 0)
        if n_nodes and n_seeds == 0:
            raise ValueError(
                "pagerank: seeds contain no node of the graph — "
                "personalized teleport would have nowhere to land"
            )
    else:
        n_nodes, n_seeds = nodes.count(), 0

    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    if engine == "auto":
        engine = "broadcast" if n_nodes <= max_nodes_broadcast else "shuffle"
    elif engine == "broadcast" and n_nodes > max_nodes_broadcast:
        raise ValueError(
            f"pagerank: {n_nodes} nodes exceeds max_nodes_broadcast="
            f"{max_nodes_broadcast}; the per-round rank broadcast would not fit — "
            "pass engine='shuffle' (or 'auto') for graphs this wide"
        )

    spark_ = edges.sparkSession
    if engine == "shuffle":
        # Compile every round plan with AQE OFF (see _aqe_compile_off:
        # under AQE a localCheckpoint captures UnknownPartitioning and
        # every round would re-exchange the |E| frame). What AQE would
        # have contributed per round — skew splitting on the
        # groupBy(dst) hot keys — is absorbed by map-side partial
        # aggregation instead. The fan-out is scale-adaptive
        # (_scaled_partitions; e is an eager checkpoint so the sizing
        # count reads cached blocks), and _shuffle_fanout pins the
        # session conf to it during compilation so the per-round
        # groupBy exchanges co-partition with the frozen frames.
        num = _scaled_partitions(spark_, e.count())
        with _aqe_compile_off(spark_), _shuffle_fanout(spark_, num):
            out = _pagerank_rounds(
                e, nodes, flagged, n_nodes, n_seeds,
                iterations, damping_pct, weight, engine, num,
            )
            # freeze the FINAL round's physical plan inside the window
            # too: direct consumers (collect, the plan audits) reuse
            # this cached plan — one exchange per round at the adaptive
            # fan-out. A consumer that composes further (orderBy/limit)
            # re-plans at the session conf, which costs at most one
            # extra |V|-row exchange on the last round, under AQE.
            out._jdf.queryExecution().executedPlan()
            return out
    return _pagerank_rounds(
        e, nodes, flagged, n_nodes, n_seeds,
        iterations, damping_pct, weight, engine, None,
    )


def _pagerank_rounds(
    e: DataFrame,
    nodes: DataFrame,
    flagged: DataFrame | None,
    n_nodes: int,
    n_seeds: int,
    iterations: int,
    damping_pct: int,
    weight: str | None,
    engine: str,
    num: int | None,
) -> DataFrame:
    """The round loop, shared by both engines — identical int64 math,
    different physical strategy for the |V|-bounded sides."""
    # maybe-broadcast / maybe-hint: the |V|-bounded sides are broadcast
    # EXPLICITLY in broadcast mode (checkpointed RDDs carry no stats, so
    # left to itself Catalyst would SMJ the small sides and, worse,
    # could re-shuffle the edge list); in shuffle mode the same sides
    # get a SHUFFLE_HASH hint instead — co-partitioned inputs make the
    # join exchange-free either way, and the hash build avoids SMJ
    # re-sorting the |E| frame every round.
    if engine == "broadcast":
        _small = F.broadcast
    else:
        _small = lambda df: df.hint("shuffle_hash")  # noqa: E731

    if engine == "shuffle":
        # the ONE |E| shuffle of this engine: hash-partition edges by
        # src at the scale-adaptive fan-out (the session conf caps it;
        # every groupBy/repartition below lands at the SAME number via
        # _shuffle_fanout, so the round loop stays co-partitioned), and
        # freeze that layout for all rounds — with AQE off (see caller)
        # the checkpoint preserves HashPartitioning(src) into the
        # LogicalRDD, so no round ever re-exchanges the edge frame.
        e = e.repartition(num, "src").localCheckpoint(eager=False)

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
    if flagged is None:
        spine = nodes.select(
            "node", F.lit(total_teleport // n_nodes).cast("bigint").alias("tele")
        )
    else:
        # the spine keeps the seed flag itself (not ``tele > 0``): with
        # damping_pct=100 the teleport is 0 everywhere, and an initial
        # distribution keyed off a nonzero teleport would be all zeros —
        # the walk must start FROM THE SEEDS regardless of teleport
        # (ADVICE r8 fix, pinned by test_damping_100_still_seeds).
        spine = flagged.select(
            "node",
            F.when(F.col("__s").isNotNull(), F.lit(total_teleport // n_seeds))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("tele"),
            F.col("__s").isNotNull().alias("__seed"),
        )
    if engine == "shuffle":
        # node-hash the spine once, so the per-round contrib join and
        # the state derived from it stay co-partitioned on the node key
        spine = spine.repartition(num, "node")

    # Fold the STATIC outdeg onto the spine once, instead of re-joining
    # ranks against it every round (guide §2.4: two operations keyed the
    # same way share one exchange — here the join disappears entirely).
    # The old loop paid one |V| ranks-x-outdeg join (a broadcast build
    # in broadcast mode, a hash build in shuffle mode) per round to
    # recover a value that never changes; the state frame now carries
    # (node, tele, outdeg, rank_units) across rounds, so each round is
    # exactly one edge join + one groupBy(dst) + one state update.
    # Dangling nodes keep a NULL outdeg: the give projection filters
    # them out, which is byte-identical to the old inner join.
    state = spine.join(
        _small(outdeg.withColumnRenamed("src", "node")), "node", "left"
    )
    if flagged is None:
        state = state.select(
            "node", "tele", "outdeg",
            F.lit(UNIT // n_nodes).cast("bigint").alias("rank_units"),
        )
    else:
        state = state.select(
            "node", "tele", "outdeg",
            F.when(F.col("__seed"), F.lit(UNIT // n_seeds))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rank_units"),
        )
    state = state.localCheckpoint(eager=False)
    for i in range(iterations):
        if i:
            # truncate lineage BETWEEN rounds (an unchecked k-round plan
            # drowns Catalyst analysis); the LAST round stays a live
            # plan so callers — and the plan-audit tests — see the
            # real per-round physical shape, not a checkpoint scan
            state = state.localCheckpoint(eager=False)
        # per-src outgoing mass, integer floor division (DIV truncates
        # toward zero == floor on the nonnegative units; DuckDB's //
        # floors identically — the cross-engine-exact step a double
        # intermediate would break, since Spark's double->bigint cast
        # truncates where DuckDB's rounds).
        if weight is None:
            give = _small(
                state.filter(F.col("outdeg").isNotNull()).select(
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
            # so the build side carries (rank, sum_w) and the division
            # happens in the edge join's projection — still one
            # groupBy(dst) per round
            give = _small(
                state.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("g_src"),
                    "rank_units",
                    F.col("outdeg").alias("sw"),
                )
            )
            contrib = (
                e.join(give, F.col("src") == F.col("g_src"))
                .groupBy("dst")
                .agg(
                    F.sum(F.expr("(rank_units * w) DIV sw"))
                    .cast("bigint")
                    .alias("got")
                )
            )
        state = state.join(
            _small(contrib), state.node == contrib.dst, "left"
        ).select(
            "node", "tele", "outdeg",
            (
                F.expr(f"(coalesce(got, 0L) * {damping_pct}) DIV 100")
                + F.col("tele")
            )
            .cast("bigint")
            .alias("rank_units"),
        )

    return state.select(
        "node",
        "rank_units",
        (F.col("rank_units") / F.lit(float(UNIT))).alias("rank"),
    )


def min_label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    engine: str = "auto",
    max_nodes_broadcast: int = 50_000_000,
    max_edges_broadcast: int = 10_000_000,
) -> DataFrame:
    """Bounded-radius min-label propagation over the UNDIRECTED edge
    set: after R synchronous rounds every node carries the minimum node
    id within R hops — ``(node, label)``. This is the fixed-cost
    complement to ``components.connected_components``: exact CC runs
    until convergence (diameter-many rounds, unbounded on a web-scale
    link graph), while R-hop labels give a deterministic R-round budget
    — the community-seed / crawl-frontier-expansion pass (label == the
    R-hop neighborhood's representative; two nodes sharing a label are
    provably <= 2R hops apart). On a graph whose diameter <= R the
    labels ARE the connected components.

    Same physical discipline as :func:`pagerank`, both engines: labels
    are the |V|-row frame, one ``groupBy(dst) MIN`` message exchange
    per round; ``engine="broadcast"`` broadcasts labels into the edge
    join (guarded by ``max_nodes_broadcast``), ``engine="shuffle"``
    co-partitions labels and edges by node with the AQE-off checkpoint
    compilation so nothing re-exchanges the |E| frame; ``auto``
    dispatches on the node count. MIN is idempotent/associative, so the
    result is byte-equal across engines and summation-order-free by
    construction (no fixed-point discipline even needed).

    Measured at 100x (PERFORMANCE.md r10 table): the shuffle engine is
    ~1.6x faster than broadcast (111 vs 178 s, both spill-free) — the
    broadcast engine rebuilds the |V|-row label broadcast each round
    while the shuffle engine's exchange carries only the per-round MIN
    messages. ``auto`` therefore dispatches on BOTH dimensions, like
    :func:`kcore`: shuffle past ``max_nodes_broadcast`` (the memory
    guard) OR past ``max_edges_broadcast`` (the measured cost
    crossover); byte-equal engines make the dispatch invisible to
    results. An explicit ``engine="broadcast"`` applies only the
    memory guard.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    e = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    # eager, for the same reason as pagerank: the node count consumes
    # it now, and a lazy checkpoint lets the round-1 broadcast thread
    # race the main job into building the upstream twice
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    n_sym = None
    if engine == "auto":
        # e is an eager checkpoint: this count reads its blocks — cheap
        # relative to even one propagation round (2|E| symmetric rows)
        n_sym = e.count()
        engine = (
            "broadcast"
            if n_nodes <= max_nodes_broadcast and n_sym // 2 <= max_edges_broadcast
            else "shuffle"
        )
    elif engine == "broadcast" and n_nodes > max_nodes_broadcast:
        raise ValueError(
            f"min_label_propagation: {n_nodes} nodes exceeds "
            f"max_nodes_broadcast={max_nodes_broadcast} — pass "
            "engine='shuffle' (or 'auto') for graphs this wide"
        )
    spark_ = edges.sparkSession
    if engine == "shuffle":
        num = _scaled_partitions(spark_, n_sym if n_sym is not None else e.count())
        with _aqe_compile_off(spark_), _shuffle_fanout(spark_, num):
            out = _label_rounds(e, nodes, rounds, engine, spark_, num)
            # freeze the final round's plan inside the window (the
            # pagerank discipline): direct consumers see one exchange
            # per round at the adaptive fan-out
            out._jdf.queryExecution().executedPlan()
            return out
    return _label_rounds(e, nodes, rounds, engine, spark_, None)


def _label_rounds(
    e: DataFrame, nodes: DataFrame, rounds: int, engine: str, spark_,
    num: int | None,
) -> DataFrame:
    """min_label_propagation's round loop, shared by both engines."""
    if engine == "broadcast":
        _small = F.broadcast
    else:
        _small = lambda df: df.hint("shuffle_hash")  # noqa: E731
    if engine == "shuffle":
        e = e.repartition(num, "src").localCheckpoint(eager=False)
        nodes = nodes.repartition(num, "node").localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(rounds):
        if i:
            labels = labels.localCheckpoint(eager=False)
        msgs = (
            e.join(
                _small(
                    labels.select(
                        F.col("node").alias("g_src"),
                        F.col("label").alias("lbl"),
                    )
                ),
                F.col("src") == F.col("g_src"),
            )
            .groupBy("dst")
            .agg(F.min("lbl").alias("m"))
        )
        labels = labels.join(
            _small(msgs), labels.node == msgs.dst, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("m"), F.col("label"))
            ).alias("label"),
        )
    return labels


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 10,
    check_converged: bool = True,
    engine: str = "auto",
    max_nodes_broadcast: int = 50_000_000,
    max_edges_broadcast: int = 10_000_000,
) -> DataFrame:
    """Iterative k-core peeling over an undirected edge list — the
    density filter of the graph family: the k-core is the maximal
    subgraph where every node keeps degree >= k. On a near-dup pair
    graph it separates dense boilerplate/spam farms (deep cores) from
    chains of borderline matches (peeled immediately); on a
    customer-supplier graph it isolates the entrenched trading core.
    Returns ``(node, degree)`` for surviving nodes, with ``degree``
    measured INSIDE the final core.

    Peeling is confluent: the k-core is unique regardless of removal
    order (Seidman 1983, public), and a round applied to a converged
    core removes nothing — so extra rounds are idempotent and
    ``rounds`` is an upper bound, not a semantic knob.
    ``check_converged`` adds one tiny aggregate (min surviving degree
    >= k) and fails loudly if the peel needs more rounds — never
    silently returns a non-core.

    Two physical engines (same layer-synchronous peel, identical
    (node, degree) output — pinned byte-equal in
    tests/test_graph_linkage.py):

    ``engine="broadcast"`` (|V| up to ``max_nodes_broadcast``): each
    round is one degree aggregation over the surviving symmetric edge
    set plus two broadcast semi-joins against the |V|-bounded survivor
    list — edges shuffle only in the per-round groupBy, over a
    monotonically SHRINKING frame. Refuses loudly past the width guard
    (the pagerank discipline; ADVICE r9 — previously this engine would
    OOM executors silently instead of raising with advice).

    ``engine="shuffle"`` (no width ceiling): **delta peeling.** The
    symmetric edge frame is hash-partitioned ONCE by ``u`` and frozen;
    the round state is the |V|-row live-degree table, co-partitioned
    on the same key. Per round, only the NEWLY dead nodes (live degree
    just dropped below k) send messages: their edges are selected with
    a co-partitioned semi-join (exchange-free), aggregated by the far
    endpoint (``groupBy(v)`` — the ONE per-round exchange, bounded by
    the edges incident to this round's deaths, not |E|), and the
    decrements land on the live-degree table through another
    co-partitioned SHUFFLE_HASH join. Nothing is broadcast, nothing
    |E|-sized moves after the initial partition, and across the WHOLE
    peel each edge is shuffled at most twice (once per endpoint death)
    — cheaper asymptotics than the broadcast engine's per-round |E|
    scan, at the price of one up-front |E| exchange. Decrements
    addressed to nodes that died the same round fall out naturally
    (the join target is the live table). Layer-synchronous equality
    with the broadcast engine holds by induction: round i's newly-dead
    set is exactly the broadcast engine's round-i removal set, so
    after R rounds both hold the same survivors with the same
    in-core degrees.

    ``engine="auto"`` dispatches on BOTH graph dimensions (one
    distinct-count job plus one checkpoint-block count, both cheap
    relative to a peel): shuffle when ``n_nodes >
    max_nodes_broadcast`` (the MEMORY guard — past it the broadcast
    engine raises instead of OOMing) **or** when ``n_edges >
    max_edges_broadcast`` (the COST dispatch: measured at 100x —
    PERFORMANCE.md r10 table — the delta engine is ~30x faster on a
    ~50M-edge graph, 71 vs 2155 s both spill-free, because the
    broadcast engine re-materializes the full shrinking frame every
    round while delta rounds move only the deaths' incident edges;
    broadcast wins only when the whole graph is small — 1x: 8.0 vs
    11.0 s, the up-front |E| repartition dominating). Dispatch can
    never change results: the engines are byte-equal by construction.
    An explicit ``engine="broadcast"`` honors the user's cost choice
    and applies only the memory guard.

    Lineage is truncated per round, components.py-style; the last
    round stays a live plan so plan audits see the real per-round
    physical shape.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    both = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))

    n_edges = None
    if engine != "shuffle":
        # the guard/dispatch needs |V|; the count job also materializes
        # the sym checkpoint both engines iterate over, so it is not a
        # throwaway pass. The |E| count after it reads the materialized
        # checkpoint blocks — cheap relative to a single peel round.
        n_nodes = both.select("u").distinct().count()
        if engine == "auto":
            n_edges = sym.count()
            engine = (
                "broadcast"
                if n_nodes <= max_nodes_broadcast
                and n_edges <= max_edges_broadcast
                else "shuffle"
            )
        elif n_nodes > max_nodes_broadcast:
            raise ValueError(
                f"kcore: {n_nodes} nodes exceeds max_nodes_broadcast="
                f"{max_nodes_broadcast}; the per-round survivor broadcast "
                "would not fit executors — pass engine='shuffle' (or "
                "'auto') for graphs this wide"
            )

    if engine == "shuffle":
        spark_ = edges.sparkSession
        if n_edges is None:
            # explicit-shuffle callers skip the dispatch counts: the
            # sizing count materializes the sym checkpoint, work the
            # first peel round would have triggered anyway
            n_edges = sym.count()
        num = _scaled_partitions(spark_, 2 * n_edges)
        with _aqe_compile_off(spark_), _shuffle_fanout(spark_, num):
            final_deg = _kcore_delta_rounds(both, k, rounds, spark_, num)
            # freeze the final plan inside the window (the pagerank
            # discipline): direct consumers see the per-round shape at
            # the adaptive fan-out
            final_deg._jdf.queryExecution().executedPlan()
    else:
        final_deg = _kcore_broadcast_rounds(both, k, rounds)

    if check_converged:
        lo = final_deg.agg(F.min("degree")).first()[0]
        if lo is not None and lo < k:
            raise ValueError(
                f"kcore: a surviving node still has degree {lo} < k={k} "
                f"after {rounds} rounds — the peel has not converged; "
                "raise rounds (extra rounds past convergence are idempotent "
                "and cheap: each is one aggregate over the shrunken core)"
            )
    return final_deg.select("node", "degree")


def _kcore_broadcast_rounds(both: DataFrame, k: int, rounds: int) -> DataFrame:
    """Broadcast engine: re-filter the shrinking edge set each round.

    Early exit (r11): peeling is confluent and a round that removes
    nothing proves every later round removes nothing — so each round
    counts this round's deaths (one tiny job over the checkpointed
    |V|-row degree table, which the chained lazy checkpoints would have
    materialized at the final action anyway) and STOPS at the fixpoint
    instead of paying ``rounds - depth`` no-op rounds, each of which
    still re-materializes the full surviving edge frame. ``rounds``
    stays the upper bound and the non-converged contract is unchanged.
    On early exit the degree table already computed IS the result, so
    the final aggregate is free too."""
    alive = both.localCheckpoint(eager=False)
    for i in range(rounds):
        if i:
            alive = alive.localCheckpoint(eager=False)
        deg = alive.groupBy("u").agg(
            F.count(F.lit(1)).alias("deg")
        ).localCheckpoint(eager=False)
        if deg.filter(F.col("deg") < k).count() == 0:
            return deg.select(
                F.col("u").alias("node"), F.col("deg").cast("bigint").alias("degree")
            )
        keep = deg.filter(F.col("deg") >= k).select("u")
        alive = alive.join(F.broadcast(keep), "u", "left_semi").join(
            F.broadcast(keep.select(F.col("u").alias("v"))), "v", "left_semi"
        )
    return alive.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).select(F.col("u").alias("node"), "degree")


def _kcore_delta_rounds(
    both: DataFrame, k: int, rounds: int, spark_, num: int
) -> DataFrame:
    """Shuffle engine: Pregel-style delta peeling over a frozen,
    u-partitioned edge frame — only newly-dead nodes send degree
    decrements, so the per-round exchange is bounded by the deaths'
    incident edges and each edge moves at most twice across the peel.

    Early exit (r11), same argument as the broadcast engine: a round
    with zero deaths proves the fixpoint — the per-round death count
    is one tiny job over the checkpointed |V|-row live-degree table,
    and it saves every later no-op round's stages."""
    _small = lambda df: df.hint("shuffle_hash")  # noqa: E731
    # the ONE |E| shuffle of this engine; with AQE off at compile time
    # the checkpoint preserves HashPartitioning(u), so the per-round
    # semi-join and the degree aggregation below are exchange-free
    e = both.repartition(num, "u").localCheckpoint(eager=False)
    # live-degree table: |V| rows, co-partitioned with e on the node
    # key (groupBy("u") over a u-partitioned frame inserts no exchange
    # and emits the same HashPartitioning)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    for i in range(rounds):
        deg = deg.localCheckpoint(eager=False)
        dead = deg.filter(F.col("deg") < k).select("u")
        if dead.count() == 0:
            break
        live = deg.filter(F.col("deg") >= k)
        # edges whose near endpoint just died, keyed by the far one:
        # the semi-join is co-partitioned on u (free); the groupBy(v)
        # is THE per-round exchange, carrying only the dead nodes'
        # incident edges (map-side combined to <= |V| rows out)
        msgs = (
            e.join(_small(dead), "u", "left_semi")
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("dec"))
        )
        # land the decrements on the live table; both sides hash on the
        # node key at the same fan-out (ProjectExec is alias-aware, so
        # the v->u rename keeps msgs' partitioning visible), so the
        # SHUFFLE_HASH join is exchange-free — and decrements addressed
        # to same-round deaths vanish here because the left side is the
        # LIVE table only
        deg = live.join(
            _small(msgs.select(F.col("v").alias("u"), "dec")), "u", "left"
        ).select(
            "u", (F.col("deg") - F.coalesce("dec", F.lit(0))).alias("deg")
        )
    # deg == 0 means every neighbor died: the node has NO surviving
    # edges, so the broadcast engine (degree recomputed from surviving
    # edges) never emits it — drop it here too so the engines agree
    # byte-for-byte even on a non-converged peel's final table (ADVICE
    # r10; a 0-degree node can never sit in a k>=1 core, so this never
    # removes a true core member).
    return deg.filter(F.col("deg") > 0).select(
        F.col("u").alias("node"), F.col("deg").cast("bigint").alias("degree")
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
    # direction survives per edge. Every join in the wedge pipeline is
    # SHUFFLE_HASH-hinted: SMJ would SORT the streamed side, and at
    # 100x that side is the ~|E|*sqrt(|E|)-row wedge frame — measured
    # 13.1 GB of sort spill on the closure join alone before the hints
    # (420 s wall); the hash build sides (degrees, oriented edges, the
    # symmetric edge set) are all |E|-bounded or smaller and partition
    # cleanly, so the big frame streams unsorted.
    d1 = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    d2 = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        both.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(d1.hint("shuffle_hash"), "a")
        .join(d2.hint("shuffle_hash"), "b")
        .filter(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
    )

    w1 = oriented.select(F.col("a").alias("pivot"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("pivot"), F.col("b").alias("y"))
    wedges = w1.join(w2.hint("shuffle_hash"), "pivot").filter(F.col("x") < F.col("y"))
    # close against `both` (one step from the checkpoint): oriented +
    # its reverse IS the symmetric edge set, and rebuilding it from
    # `oriented` would re-run the two orientation joins a third and
    # fourth time (review find). Build on the edge set, STREAM the
    # wedges — the asymmetric side sizes are the whole point of the
    # hint here.
    closed = wedges.join(
        both.select(F.col("u").alias("x"), F.col("v").alias("y")).hint(
            "shuffle_hash"
        ),
        ["x", "y"],
    )

    # ONE pass over the closed triangles: explode the three corners
    # instead of unioning three projections of `closed` — the union
    # form re-plans (and re-executes) the wedge+closure join pipeline,
    # the most expensive subtree in the operator, once PER CORNER
    # (r11 plan audit: three copies under the final aggregate).
    # explode triples the row count of a frame that already exists
    # instead of tripling the joins; counts are identical.
    per_node = (
        closed.select(
            F.explode(F.array("pivot", "x", "y")).alias("node")
        )
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
