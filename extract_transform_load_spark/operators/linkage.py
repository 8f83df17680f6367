"""Fuzzy record linkage — blocked edit-distance matching.

Entity resolution over dirty dimensions (duplicate customers, vendor
master dedup, author disambiguation in a training corpus) is a join the
relational layer cannot express: equality fails on typos, and the naive
fix is an O(n²) cross join with an edit-distance filter. The standard
scale answer (Fellegi–Sunter / Christen's "Data Matching", public) is
**blocking**: only records sharing a cheap deterministic block key are
compared, turning O(n²) into sum-of-block-sizes² with a recall contract
that is explicit rather than accidental.

Pipeline shape (all JVM-side, zero Python in the hot path):

1. normalize (lower/trim) — scan-local;
2. block key (default: normalized prefix) — scan-local;
3. self-join within block — ONE hash shuffle of each side by block key,
   the only data movement in the operator;
4. candidate prefilter ``abs(len_a - len_b) <= max_dist`` — a free
   lower bound on edit distance that skips the O(|a|·|b|) DP for most
   pairs (length difference alone already exceeds the threshold);
5. ``levenshtein() <= max_dist`` verify — Spark built-in, whole-stage
   codegen, and present in DuckDB for the oracle twin.

Recall semantics (documented, not hidden): a pair whose names differ
inside the block prefix is NEVER compared — that is the blocking
tradeoff. Run multiple passes with complementary keys (prefix + suffix
+ phonetic) and union the pair sets when higher recall is needed; each
pass is this same operator with a different ``block_expr``.

Skew guard: one cheap aggregate audits the largest block BEFORE the
quadratic join; a block past ``max_block`` fails loudly with the block
key named (the asof.py cap discipline — a 10M-row block would
otherwise quietly schedule a 100-trillion-pair task at 100 TB).

Clusters, not pairs: feed the result to
``operators.components.connected_components`` for transitive entity
groups — the same pairs→clusters step near-dup dedup uses.

Reference parity: no linkage operator exists in the reference engine;
beyond-reference LLM-pipeline layer (SURVEY.md §6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_len: int = 8,
    max_dist: int = 1,
    block_expr: Column | None = None,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, name_a, name_b, dist)`` with
    ``dist = levenshtein(norm_a, norm_b) <= max_dist``, compared only
    within blocks of equal ``block_expr`` (default: first ``block_len``
    chars of the lower/trimmed name). ``id_a < id_b`` canonical order.

    ``max_block=None`` skips the skew audit (callers who already bound
    block size upstream); otherwise the audit is one tiny aggregate
    job over (block, count) before any quadratic work is scheduled.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    norm = F.lower(F.trim(F.col(name_col)))
    key = block_expr if block_expr is not None else F.substring(norm, 1, block_len)
    base = df.select(
        F.col(id_col).alias("rid"),
        norm.alias("name"),
        key.alias("block"),
    ).filter(F.col("name").isNotNull() & (F.length("name") > 0))

    if max_block is not None:
        top = (
            base.groupBy("block")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc())
            .limit(1)
            .collect()
        )
        if top and top[0]["n"] > max_block:
            raise ValueError(
                f"fuzzy_pairs: block {top[0]['block']!r} holds {top[0]['n']} rows "
                f"(> max_block={max_block}); the within-block join would schedule "
                f"~{top[0]['n'] ** 2:,} comparisons — tighten block_expr (longer "
                "prefix, add a second key column) or raise max_block deliberately"
            )

    # Parallelism of the quadratic stage: the build side broadcasts (a
    # dimension's worth of (id, name, block) is small even when the
    # base table is huge relative to block count), so the verify work
    # is distributed by the PROBE side's partitioning — and a dimension
    # read from one parquet split would run every comparison on ONE
    # task (measured: 95s -> 3s at sf0.1). Round-robin repartition of
    # the probe side fixes that regardless of how few distinct blocks
    # exist; if the join ever degrades to SMJ past the broadcast
    # threshold, Spark re-shuffles by block anyway and this extra pass
    # over the narrow probe projection is noise (AQE skew-split then
    # handles oversized blocks).
    parallelism = base.sparkSession.sparkContext.defaultParallelism
    a = base.select(
        F.col("rid").alias("id_a"), F.col("name").alias("name_a"), "block"
    ).repartition(parallelism)
    b = base.select(
        F.col("rid").alias("id_b"), F.col("name").alias("name_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        # free lower bound: |len(a)-len(b)| <= levenshtein(a,b); prunes
        # the DP for pairs that cannot possibly pass
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(max_dist)
        )
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= F.lit(max_dist))
    )
