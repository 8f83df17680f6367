"""Byte-pair-encoding vocabulary learning + encoding (Sennrich et al.
2016), the tokenizer-training stage of a training-data pipeline.

The key scale observation: BPE never needs the corpus inside its merge
loop. The corpus aggregates ONCE to a ``(word, count)`` table — at 100 TB
that is the only full scan — and every merge iteration runs over that
word table, whose size is the distinct-word vocabulary, not the token
stream. Two execution paths share one algorithm:

- **driver-side** (default when the word table is small enough to
  collect): the classic single-node loop over a freq dict, like every
  production tokenizer trainer; the cluster's job is only the count.
- **distributed**: the same loop expressed as DataFrame ops — pair
  counts via ``zip_with`` + explode + groupBy, argmax with a
  deterministic tie-break, merge application as a JVM-side
  ``aggregate`` fold over symbol arrays. One small Spark job per merge;
  ``localCheckpoint`` truncates the 50-deep lineage. This is the path
  when the vocabulary itself doesn't fit a driver (web-scale junk
  tokens) — or cap it first with a top-V count cut.

Both paths are proven merge-for-merge identical in tests; ties break
(count desc, left asc, right asc) so results are reproducible anywhere.

Reference has no tokenizer surface; this extends SURVEY.md §2's
"token counting" line (BASELINE.json north star: text analysis).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

Merge = tuple[str, str]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → ``(word, cnt)``. Partial aggregation does the
    heavy lifting map-side; the shuffle carries distinct words only."""
    from .textops import words

    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _chars(col: Column) -> Column:
    # split('', '') yields [''] — filter keeps symbol arrays non-empty-safe
    return F.filter(F.split(col, ""), lambda c: c != F.lit(""))


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """Fold the symbol array left-to-right, fusing adjacent (left, right)
    into one symbol. ``F.get`` (0-based) returns null past the end — no
    ANSI out-of-bounds throw like ``element_at``."""
    merged = F.lit(left + right)

    def step(acc: Column, i: Column) -> Column:
        cur = F.get(sym, i)
        nxt = F.get(sym, i + F.lit(1))
        hit = (cur == F.lit(left)) & nxt.isNotNull() & (nxt == F.lit(right))
        return (
            F.when(acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")))
            .when(
                hit,
                F.struct(F.array_append(acc["out"], merged).alias("out"), F.lit(True).alias("skip")),
            )
            .otherwise(
                F.struct(F.array_append(acc["out"], cur).alias("out"), F.lit(False).alias("skip"))
            )
        )

    init = F.struct(F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip"))
    return F.aggregate(
        F.sequence(F.lit(0), F.size(sym) - 1), init, step, lambda acc: acc["out"]
    )


def _learn_driver_side(pairs: list[tuple[str, int]], n_merges: int, min_pair_count: int) -> list[Merge]:
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in pairs:
        syms = tuple(word)
        if syms:
            vocab[syms] = vocab.get(syms, 0) + cnt
    merges: list[Merge] = []
    for _ in range(n_merges):
        counts: dict[Merge, int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        fused = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    collect_threshold: int = 200_000,
) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from the corpus. The corpus is
    scanned once (word counts); if the distinct-word table fits under
    ``collect_threshold`` rows the loop runs driver-side, else fully
    distributed (``collect_threshold=0`` forces the distributed path —
    used by the equivalence test)."""
    # Checkpoint the word counts BEFORE the size probe: the probe's
    # limit+collect and the distributed path's first symbol table would
    # otherwise each re-run the full corpus word-count aggregate — the
    # "scanned once" promise held only for the driver-side path.
    wc = word_counts(docs, text_col).localCheckpoint(eager=True)
    if collect_threshold > 0:
        sample = wc.limit(collect_threshold + 1).collect()
        if len(sample) <= collect_threshold:
            return _learn_driver_side([(r["word"], r["cnt"]) for r in sample], n_merges, min_pair_count)

    sym_tab = wc.select("cnt", _chars(F.col("word")).alias("sym")).localCheckpoint(eager=True)
    merges: list[Merge] = []
    pair_struct = "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1), (x, y) -> named_struct('a', x, 'b', y))"
    for _ in range(n_merges):
        best = (
            sym_tab.filter(F.size("sym") >= 2)
            .select("cnt", F.explode(F.expr(pair_struct)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        sym_tab = sym_tab.select(
            "cnt", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=True)
    return merges


def encode_bpe(
    docs: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens): whitespace-split then per-word BPE with the learned
    merges applied in rank order — exactly the trainer's application
    rule, so encoding a training word reproduces its final symbols.

    Arrow-batched ``mapInPandas``: the merge list is tiny and ships in
    the closure; a per-batch word cache collapses Zipf-repeated words to
    one encode each, so cost tracks distinct words per batch, not
    tokens. Scan-local — no shuffle at any scale.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    merge_list = list(merges)

    def enc_word(word: str, cache: dict[str, list[str]]) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        sym = list(word)
        while len(sym) >= 2:
            best_rank = None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = merge_list[best_rank]
            fused = a + b
            out: list[str] = []
            i = 0
            n = len(sym)
            while i < n:
                if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        cache[word] = sym
        return sym

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = [
                []
                if text is None
                else [t for w in text.split(" ") if w for t in enc_word(w, cache)]
                for text in pdf.iloc[:, 1]
            ]
            yield pd.DataFrame({"id": pdf.iloc[:, 0].to_numpy(), "tokens": toks})

    # the id column keeps its input type (string doc keys work like longs)
    id_type = docs.schema[id_col].dataType.simpleString()
    return (
        docs.select(id_col, text_col)
        .mapInPandas(run, schema=f"id {id_type}, tokens array<string>")
        .withColumnRenamed("id", id_col)
    )
