"""Broadcast Bloom filter as a pure JVM expression — the scan-local
prefilter for benchmark decontamination at corpus scale.

The standard contamination check (does any corpus document share an
n-gram with the benchmark suite?) has an asymmetric shape at 100 TB:
the benchmark side is tiny (thousands of documents), the corpus side is
everything. A semi-join on grams exchanges the corpus's exploded gram
stream unless the benchmark grams broadcast; raw gram strings broadcast
at ~10-100 bytes each, while a Bloom bitset at ~10 bits/gram is 10-60x
smaller — and membership becomes a handful of codegen'd integer ops per
gram, evaluated INSIDE the corpus scan with zero exchange.

Bloom filters have false positives and no false negatives, so the
prefilter is used soundly: survivors (a tiny fraction of the corpus)
are re-verified with an exact broadcast semi-join against the true gram
set. The final answer is exactly the exact-join answer; the bitset only
decides how much of the corpus reaches the verify stage. q121 registers
the composition with a purely exact SQL oracle — the Bloom stage is
correctness-invisible by construction, and a dedicated test asserts the
prefilter passes every true positive (no-false-negative property).

Probe construction: bit_i = xxhash64(value, i) mod m for i < k — k
independent JVM hashes instead of the classic double-hash wrap
arithmetic, because ANSI mode (on in Spark 4) rejects the mod-2^64
overflow the Kirsch–Mitzenmacher mix relies on. The builder collects
those SAME k hashes per benchmark gram from Spark itself, so there is
no cross-language hash reimplementation to drift.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bloom_parameters(n_items: int, bits_per_item: int = 12) -> tuple[int, int]:
    """(m, k): bitset size (power of two, >= 64) and hash count.

    k = round(m/n · ln 2) is the standard optimum; bits_per_item=12
    gives ~0.3% false-positive rate, i.e. the verify stage sees ~0.3%
    of clean grams plus every true hit.
    """
    n = max(1, n_items)
    m = 1 << max(6, math.ceil(math.log2(n * bits_per_item)))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def build_bloom_bits(probe_rows: list, m: int) -> list[int]:
    """Driver-side bitset from collected probe-hash rows (k longs per
    item, as produced by ``xxhash64(value, i)``). Returns m/64 longs in
    signed-64 range for an array<long> literal."""
    words = [0] * (m // 64)
    mask = m - 1
    for row in probe_rows:
        for h in row:
            bit = (h & 0xFFFFFFFFFFFFFFFF) & mask
            words[bit >> 6] |= 1 << (bit & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_filter_maybe(
    df: DataFrame, value_col: str, words: list[int], m: int, k: int
) -> DataFrame:
    """Keep rows whose ``value_col`` MAY be in the bitset — a pure
    codegen'd filter over the scan (no join, no exchange).

    The bitset rides into the plan as ONE array<long> literal
    (``F.lit(words)`` — a per-word CreateArray would mean m/64 Py4J
    round-trips and a quarter-million-child expression at MMLU-sized
    m). Each probe's masked hash is staged as a projected column so the
    word-index and bit-offset lookups share one xxhash64 evaluation
    (filter codegen does not common-subexpression-eliminate). Probe
    math is SQL because PySpark's shift wrappers only take literal
    shift amounts; ``& mask`` on a power-of-two m keeps every
    intermediate in signed-long range, so ANSI mode is happy.
    """
    mask = m - 1
    staged = df.withColumn("__bf_bits", F.lit(words).cast("array<long>"))
    for i in range(k):
        staged = staged.withColumn(
            f"__bf_b{i}", F.expr(f"xxhash64(`{value_col}`, {i}L) & {mask}L")
        )
    probes = [
        f"((shiftrightunsigned(element_at(__bf_bits, "
        f"CAST(shiftrightunsigned(__bf_b{i}, 6) AS INT) + 1), "
        f"CAST(__bf_b{i} & 63L AS INT)) & 1L) = 1L)"
        for i in range(k)
    ]
    return staged.filter(F.expr(" AND ".join(probes))).drop(
        "__bf_bits", *[f"__bf_b{i}" for i in range(k)]
    )


def bloom_prefilter_contains(
    corpus_grams: DataFrame,
    benchmark_grams: DataFrame,
    gram_col: str = "gram",
    max_benchmark_grams: int | None = 2_000_000,
) -> DataFrame:
    """Rows of ``corpus_grams`` whose gram is in ``benchmark_grams`` —
    exact result, Bloom-prefiltered execution.

    The benchmark grams' probe hashes collect to the driver (bounded:
    the benchmark suite is driver-scale by definition — k longs per
    distinct gram), build the bitset, and the corpus scan keeps only
    may-contain rows; the exact broadcast semi-join then removes Bloom
    false positives. No corpus-side exchange before the verify join's
    broadcast.
    """
    # localCheckpoint (not persist): the benchmark scan/explode/distinct
    # still runs once — the count, the probe-hash collect, and the
    # verify join all read the materialized blocks — but the blocks are
    # released by the ContextCleaner as soon as the returned plan is
    # unreferenced, instead of staying pinned in executor memory for
    # the whole session (a persist here leaked one cached gram frame
    # per decontamination call across a 121-query driver run).
    # Tradeoff: localCheckpoint truncates lineage, so losing an
    # executor between the count/collect below and the verify join
    # fails the job instead of recomputing — acceptable for a
    # driver-scale benchmark frame; on preemptible executors prefer
    # persist(MEMORY_AND_DISK_2) + unpersist-after-use.
    distinct_grams = benchmark_grams.select(gram_col).distinct().localCheckpoint(
        eager=True
    )
    n = distinct_grams.count()
    if max_benchmark_grams is not None and n > max_benchmark_grams:
        raise ValueError(
            f"benchmark side has {n} distinct grams (> {max_benchmark_grams}): "
            "this is a corpus, not a benchmark suite — the driver-side bitset "
            "build would not be bounded. Use the exact semi-join (q69 shape) "
            "or raise max_benchmark_grams deliberately."
        )
    m, k = bloom_parameters(n)
    probe_rows = distinct_grams.select(
        *[F.xxhash64(F.col(gram_col), F.lit(i).cast("long")).alias(f"h{i}") for i in range(k)]
    ).collect()
    words = build_bloom_bits(probe_rows, m)
    maybe = bloom_filter_maybe(corpus_grams, gram_col, words, m, k)
    return maybe.join(F.broadcast(distinct_grams), gram_col, "left_semi")
