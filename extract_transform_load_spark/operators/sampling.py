"""Deterministic sampling & dataset splits for corpus curation.

A training pipeline needs splits and samples that are (a) reproducible
run-to-run with no stored state, (b) stable under corpus growth — a doc
keeps its split when new docs arrive, which no ``ORDER BY random()``
or row-number scheme survives — and (c) join-free at 100 TB: the
assignment must be a pure function of the document key, computable
inside the scan's codegen, never a shuffle or a broadcast of an
assignment table.

Everything here keys off the first byte of ``md5(id)`` — engine-portable
(identical in DuckDB, so the queries are oracle-checked end-to-end)
and uniform. 256 buckets bound ratio granularity to 1/256 ≈ 0.4%,
plenty for 80/10/10-style splits; finer ratios widen the prefix.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def md5_uniform(id_col: Column) -> Column:
    """The house deterministic uniform in (0,1): first 12 md5 nibbles of
    the stringified key → 48-bit integer, shifted off the lattice by
    +0.5. Every keyed sampler derives acceptance from THIS expression
    (and every oracle twin replicates it in SQL) — one definition, or
    the samplers drift apart.
    """
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 12), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))


def hash_bucket(id_col: Column, buckets: int = 256) -> Column:
    """Stable bucket in [0, buckets): first-bytes of md5 of the id.

    ``conv(hex, 16, 10)`` runs JVM-side; the md5 of the (stringified)
    key is uniform regardless of key skew — sequential ids, hot shards,
    anything.
    """
    if buckets > 1 << 28:
        raise ValueError("bucket count beyond md5-prefix precision")
    nibbles = max(2, (buckets - 1).bit_length() + 3 >> 2)
    if (16 ** nibbles) % buckets != 0:
        # modulo-bias guard: a prefix space that buckets does not divide
        # gives the low residues up to 2x the mass (256 % 200 = 56 hot
        # buckets). Two headroom nibbles bound the bias at
        # buckets/16^nibbles < 0.4%. Power-of-16 counts (the 256-bucket
        # splits every oracle twin replicates) divide exactly and keep
        # their historical minimal-prefix assignment.
        nibbles += 2
    prefix = F.conv(F.substring(F.md5(id_col.cast("string")), 1, nibbles), 16, 10)
    return (prefix.cast("bigint") % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 205), ("val", 26), ("test", 25)),
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label.

    ``splits`` is (label, weight-in-256ths); weights must sum to 256.
    The default is ~80/10/10. The assignment is a scan-local expression:
    no shuffle, no state, stable forever for a given id.
    """
    weights = [w for _, w in splits]
    if sum(weights) != 256:
        raise ValueError(f"split weights must sum to 256, got {sum(weights)}")
    b = hash_bucket(F.col(id_col), 256)
    edge = 0
    expr = None
    for label, w in splits[:-1]:
        edge += w
        expr = F.when(b < edge, label) if expr is None else expr.when(b < edge, label)
    expr = expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0])
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Reproducible ``fraction``-sample keyed on the id (granularity
    1/256). Unlike ``df.sample`` it is stable across runs, partitionings
    and Spark versions, and a doc's membership never flips as the corpus
    grows — the property eval-set holdouts need."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    cut = round(fraction * 256)
    if cut == 0:
        raise ValueError(
            f"fraction {fraction} is below the 1/256 granularity floor — "
            "the sample would be silently empty; use a finer keyed filter"
        )
    return df.filter(hash_bucket(F.col(id_col), 256) < cut)


def shuffled(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic global shuffle: order by md5(id).

    Training-data export wants rows decorrelated from ingest order
    (time, source, crawl host). ``orderBy(rand())`` is neither stable
    nor resumable; hashing the key gives the same pseudo-random
    permutation on every run — a re-export after a failure produces
    byte-identical shards. One range-partitioned sort, the same cost
    Spark pays for any global orderBy.
    """
    return (
        df.withColumn("__shuffle_key", F.md5(F.col(id_col).cast("string")))
        .orderBy("__shuffle_key")
        .drop("__shuffle_key")
    )


def epoch_shard_plan(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 256,
) -> DataFrame:
    """Per-epoch deterministic shuffle plan: (id, shard, pos).

    Multi-epoch training wants a DIFFERENT pseudo-random permutation
    each epoch, reproducible run-to-run (so a crashed job resumes
    mid-epoch at shard/pos, and two data-parallel readers agree without
    coordination). :func:`shuffled` gives one fixed permutation; this
    salts the hash with the epoch — md5(epoch || ':' || id) — and
    returns the loader-facing assignment: ``shard`` from the hash
    prefix (``hash_bucket`` on the salted key, so shards are balanced
    regardless of id skew) and ``pos`` the rank within the shard by the
    full hash. One window per shard key — the sort is per-shard
    (n_shards-way parallel), never a global single-partition sort; at
    100 TB shards map to writer tasks and ``pos`` to in-file order.
    """
    from pyspark.sql import Window

    salted = F.concat(
        F.lit(str(epoch)), F.lit(":"), F.col(id_col).cast("string")
    )
    key = F.md5(salted)
    w = Window.partitionBy("shard").orderBy("__key")
    return (
        df.select(
            F.col(id_col),
            hash_bucket(salted, n_shards).alias("shard"),
            key.alias("__key"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__key")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    rows_per_shard: int = 100_000,
    fmt: str = "json",
    mode: str = "overwrite",
) -> None:
    """Export deterministically-shuffled, size-bounded training shards.

    ``maxRecordsPerFile`` caps shard size inside the writer (no extra
    repartition pass); combined with :func:`shuffled`, shard N is the
    same rows on every run — loaders can resume mid-epoch by shard
    index. ``fmt`` is json (JSONL, the common text-pipeline interchange)
    or parquet.
    """
    (
        shuffled(df, id_col)
        .write.option("maxRecordsPerFile", rows_per_shard)
        .mode(mode)
        .format(fmt)
        .save(path)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    n_per_stratum: int,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic N-per-stratum sample: smallest md5(id) wins.

    Balanced corpora (N docs per language, per source, per quality
    bucket) need a sample that is reproducible AND corpus-growth-stable
    per stratum — ``sampleBy`` is neither, and fractions can't promise
    exact counts. Ranking by the md5-hex of the key inside each stratum
    is a pseudo-random but stable total order (engine-portable
    lexicographic ordering, see q58's hash-ordering note), so the
    selected set only changes when a new doc hashes below the current
    cut.

    Scale: one shuffle on the strata key. ``row_number`` must see each
    stratum whole, but Spark's window TopK pushes a per-partition
    rank-limit below the exchange (WindowGroupLimit), so the shuffle
    carries ~n_per_stratum rows per input partition per stratum, not
    the full table — the same physical shape as any top-k-per-group.
    """
    key = F.col(id_col)
    return cap_per_group(
        df,
        strata_cols,
        [F.md5(key.cast("string")), key],
        n_per_stratum,
        rank_col=rank_col,
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    n: int,
    key_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sample without replacement (top-n).

    Efraimidis–Spirakis A-Res: each row gets key u^(1/w) with u uniform
    in (0,1); the n largest keys are a weighted sample without
    replacement. Here u derives from md5(id) (first 12 hex nibbles →
    48-bit uniform), so the draw is a pure function of the key set —
    reproducible, growth-stable in distribution, no RNG state. Upsample
    long/high-quality docs by passing their weight; w must be > 0.

    Scale: scan-local key computation + one top-n (global sort prunes
    to n per partition via TakeOrdered). Keys are well-separated random
    uniforms, so double rounding can't flip the order in practice.
    """
    u = md5_uniform(F.col(id_col))
    key = F.pow(u, F.lit(1.0) / weight_col.cast("double"))
    return (
        df.withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(n)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Downsample groups to hit a target mixture distribution.

    Data mixing: a training corpus rarely arrives at the language/domain
    proportions the run wants, and the standard fix is downsample-only
    rebalancing (never upsampling — duplication is the dedup pipeline's
    enemy). Given target shares ``targets[g]`` (positive, summing to ~1
    over the groups to keep; others are dropped), the largest corpus
    satisfying them keeps an expected ``scale * t_g`` rows of group g
    where ``scale = min_g(n_g / t_g)`` — the binding group (smallest
    relative to its target) is kept whole and every other group is
    thinned to match.

    Membership is the house deterministic rule: a 48-bit uniform from
    ``md5(id)`` compared against the group's acceptance probability —
    a pure function of (key, corpus group counts), so the draw is
    reproducible and engine-portable (oracle-checked in q83). Counts are
    expected, not exact (±√n noise): the exact-count alternative is an
    in-group rank (see :func:`stratified_sample`), which costs a window
    shuffle PARTITIONED BY THE GROUP KEY — five language keys at 100 TB
    is five reducers; the threshold form is a tiny count aggregate plus
    a broadcast-back, and the big table never shuffles.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    if any(t <= 0 for t in targets.values()):
        raise ValueError("target shares must be positive")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        sorted((g, float(t)) for g, t in targets.items()),
        schema=f"{group_col} string, __target double",
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    joined = counts.join(F.broadcast(tgt), group_col)
    scale = joined.select(F.min(F.col("__n") / F.col("__target")).alias("__scale"))
    fracs = joined.crossJoin(F.broadcast(scale)).select(
        group_col,
        ((F.col("__scale") * F.col("__target")) / F.col("__n")).alias("__p"),
    )
    u = md5_uniform(F.col(id_col))
    return df.join(F.broadcast(fracs), group_col).filter(u < F.col("__p")).drop("__p")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Greedy token-budget sequence packing for training export.

    LLM training wants fixed-budget sequences with minimal padding, so
    short documents are concatenated until the next doc would overflow
    ``budget`` tokens (an oversized single doc gets its own pack —
    truncation policy belongs downstream). Packing runs partition-local
    over rows sorted by md5(id) within hash partitions: no shuffle
    beyond the optional repartition, deterministic pack composition
    run-to-run — the property that makes shard-resumable training
    (see ``write_training_shards``) hold after packing too.

    Output: one row per pack — (pack_key = first doc id, n_docs,
    total_tokens, fill_ratio, doc_ids).
    """
    from collections.abc import Iterator

    import pandas as pd

    src = df.select(F.col(id_col), F.col(token_col))
    if partitions is not None:
        src = src.repartition(partitions, id_col)
    src = src.withColumn("__ord", F.md5(F.col(id_col).cast("string"))).sortWithinPartitions(
        "__ord"
    )

    # id columns keep their input type (string doc keys pack like longs)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"pack_key {id_type}, n_docs int, total_tokens long, "
        f"fill_ratio double, doc_ids array<{id_type}>"
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        total = 0

        def flush():
            nonlocal total
            row = {
                "pack_key": ids[0],
                "n_docs": len(ids),
                "total_tokens": total,
                "fill_ratio": min(total / budget, 1.0),
                "doc_ids": list(ids),
            }
            ids.clear()
            total = 0
            return pd.DataFrame([row])

        for pdf in batches:
            for did, toks in zip(pdf.iloc[:, 0].tolist(), pdf.iloc[:, 1]):
                t = int(toks)
                if ids and total + t > budget:
                    yield flush()
                ids.append(did)
                total += t
        if ids:
            yield flush()

    return src.select(id_col, token_col).mapInPandas(pack, out_schema)


def read_training_shards(spark, path: str, schema, fmt: str = "json") -> DataFrame:
    """Read back a ``write_training_shards`` export with an explicit
    schema — never inference: at shard-store scale a schema-inference
    pass is a full extra read, and silent type widening (long→double on
    a single stray value) would poison a training run. The loader's
    contract is the round trip: read(write(df)) row-equals df, tested.
    """
    reader = spark.read.schema(schema)
    return reader.json(path) if fmt == "json" else reader.parquet(path)


def importance_logratios(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scores: per-doc log ratio of a target
    unigram model vs the raw-corpus unigram model (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    ``target`` is a boolean column marking the in-domain subset (the
    distribution we want more of — e.g. a declared-language slice or a
    high-quality seed). Both unigram models are estimated in ONE pass
    over the token stream (conditional counts in the same aggregate),
    add-one smoothed over the joint vocabulary, and the per-doc score is
    the length-normalized sum of per-token log ratios — positive means
    "looks more like the target than the corpus average". ``selected``
    flags docs whose average log ratio is positive, the deterministic
    analogue of DSIR's importance resampling draw.

    Scale shape: two token-stream shuffles (vocab counts, per-doc tf —
    the same shape as the q76 unigram scorer), a term-keyed join, then a
    partial-agg-friendly per-doc sum; the three scalars (token totals,
    vocab size) broadcast. At 100 TB the vocab table is bounded by
    hashing terms into buckets first (DSIR's hashed n-gram features) —
    pass the docs through a projection that maps terms to
    ``xxhash64(term) % B`` to cap the model table at B rows; scores are
    unchanged in expectation.

    Per-term contributions are summed as DECIMAL(38,12) so the result is
    partition-order-free; the final division happens once in double.
    """
    from .textops import words

    toks = docs.select(
        F.col(id_col), target.alias("__is_t"), F.explode(words(F.col(text_col))).alias("term")
    )
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.count(F.when(F.col("__is_t"), F.lit(1))).alias("cnt_tgt"),
    )
    totals = vocab.agg(
        F.sum("cnt_raw").alias("n_raw"),
        F.sum("cnt_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    log_ratio = F.log(
        (F.col("cnt_tgt").cast("double") + 1) / (F.col("n_tgt").cast("double") + F.col("v"))
    ) - F.log(
        (F.col("cnt_raw").cast("double") + 1) / (F.col("n_raw").cast("double") + F.col("v"))
    )
    scored = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("tf").cast("bigint").alias("tf"),
            (F.col("tf").cast("double") * log_ratio).cast("decimal(38,12)").alias("term_lr"),
        )
    )
    avg = (F.sum("term_lr").cast("double") / F.sum("tf")).cast("double")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_words"),
        avg.alias("avg_logratio"),
        (avg > 0).alias("selected"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled mixture sampling (the T5/mT5 multilingual
    recipe): target shares are computed FROM the corpus itself,
    proportional to ``n_g^(1/T)`` — T=1 keeps natural proportions, T→∞
    approaches uniform — then applied with :func:`mixture_sample`'s
    downsample-only, md5-keyed acceptance rule. The rarest group binds
    (kept whole); head groups are thinned toward the flattened mixture.

    Same plan shape as ``mixture_sample``: a tiny count aggregate, share
    arithmetic on that handful of rows, and a broadcast of per-group
    probabilities over a scan-local filter — the corpus never shuffles.

    Engine portability: at the default T=2 the weight is ``sqrt(n)``,
    which IEEE 754 rounds correctly in every engine, so the acceptance
    threshold (a fixed chain of correctly-rounded mul/div) is
    bit-identical and the kept SET is oracle-checkable. Other
    temperatures use ``pow``, whose last-ulp rounding is
    platform-defined — deterministic within Spark, but cross-engine
    hash checks should stick to T=2.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    n = F.col("__n")
    w = F.sqrt(n) if abs(temperature - 2.0) < 1e-12 else F.pow(n, 1.0 / temperature)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    weighted = counts.select(group_col, n.alias("__n"), w.alias("__w"))
    sw = weighted.agg(F.sum("__w").alias("__sw"))
    shares = weighted.crossJoin(F.broadcast(sw)).select(
        group_col, F.col("__n"), (F.col("__w") / F.col("__sw")).alias("__tgt")
    )
    scale = shares.agg(F.min(F.col("__n") / F.col("__tgt")).alias("__scale"))
    fracs = shares.crossJoin(F.broadcast(scale)).select(
        group_col, ((F.col("__scale") * F.col("__tgt")) / F.col("__n")).alias("__p")
    )
    u = md5_uniform(F.col(id_col))
    return df.join(F.broadcast(fracs), group_col).filter(u < F.col("__p")).drop("__p")


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    cap: int,
    rank_col: str = "group_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per group under an explicit quality
    order — the per-host / per-source cap every crawl-curation stack
    applies so one boilerplate-heavy domain cannot dominate the corpus
    (C4 and Gopher both cap per-domain contribution; public).

    ``stratified_sample`` is the hash-ordered special case (stable
    pseudo-random pick); this is the QUALITY-ordered general form —
    pass e.g. ``[F.col("distinct_words").desc(), F.col("doc_id")]`` to
    keep the richest docs. The final order column must be a tiebreaker
    unique within the group or the cap boundary is nondeterministic.

    Scale: identical physical shape to stratified_sample — one shuffle
    on the group key, with Spark's WindowGroupLimit pushing a
    per-partition top-``cap`` below the exchange, so the shuffle
    carries ~cap rows per input partition per group, not the table.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )
