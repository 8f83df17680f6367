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


def _select_batch_fast(top: list, alphabet: set[str], max_accept: int) -> list[Merge]:
    """Standard batched-BPE selection (``exact=False``): walk the sorted
    candidates, SKIP pairs that share a symbol with an accepted one, and
    take up to ``max_accept`` disjoint pairs per round. Counts of later
    accepted pairs may be slightly stale relative to a sequential train
    (the universal batched-BPE tradeoff); the result is still fully
    deterministic — same corpus, same merges — just not guaranteed
    merge-for-merge equal to ``batch=1``. Disjointness + the fused-string
    collision guard keep every accepted count exact w.r.t. the OTHER
    pairs accepted in the same round."""
    accepted: list[Merge] = []
    used: set[str] = set()
    for i, row in enumerate(top):
        if len(accepted) >= max_accept:
            break
        a, b, fused = row["a"], row["b"], row["a"] + row["b"]
        # the top candidate is the true sequential argmax — always take
        # it (even on a fused-string collision, which is a valid BPE
        # merge; it only invalidates BATCHING other pairs with it)
        if i > 0 and (a in used or b in used or fused in used or fused in alphabet):
            continue
        accepted.append((a, b))
        used.update((a, b, fused))
    return accepted


def _select_batch(
    top: list, alphabet: set[str], max_accept: int
) -> list[Merge]:
    """Pick a prefix of the (count desc, a, b)-sorted candidates whose
    simultaneous merge is PROVABLY identical to merging them one at a
    time — the batch never trades exactness for speed.

    Soundness argument (each accepted pair c_j, j>=2, is still the
    sequential argmax at its step):

    - **consecutive prefix, stop at first conflict**: accepted pairs
      occupy sorted positions 1..m, so any pair whose count a prior
      merge could have changed (it shares a symbol with an accepted
      pair) ranks BELOW every accepted pair — counts only decrease for
      such pairs, so they cannot rise past c_j.
    - **strictly-greater-than-the-cut counts**: pairs CREATED by a merge
      (x, fused) inherit count <= the old count of a symbol-sharing pair
      (each new instance x·ab came from an x·a·b triple), which ranks
      below the prefix, i.e. <= count(first excluded candidate). Requiring
      count(c_j) > that cut for j>=2 beats new pairs outright, with no
      dependence on tie-break strings. c_1 is the true argmax and always
      safe.
    - **no fused-string collisions**: if a fused string equals an
      existing symbol (or an earlier accepted fused string), a merge
      could INCREASE some pair's count; stop the batch there instead.
    - **self-pairs END the batch**: for an accepted (a, a), the pairs its
      merge creates — (aa, a) from odd runs, (aa, aa) from long runs —
      come from instances of (a, a) ITSELF, so their counts are bounded
      only by count(a, a) (up to floor(count/2)), which sits INSIDE the
      prefix, not below the cut. Nothing after a self-pair in the same
      round is provably still the sequential argmax, so the self-pair
      becomes the round's last merge. (Found by adversarial review: with
      word counts {aaa:15, aa:7, a:1, abbbbb:3, aabaab:1} the old rule
      accepted [(a,a),(b,b)] while sequential BPE's second merge is the
      newly created (aa,a)=15.)
    """
    accepted: list[Merge] = []
    used: set[str] = set()
    cut = 0  # index of the first excluded candidate
    for i, row in enumerate(top):
        a, b, fused = row["a"], row["b"], row["a"] + row["b"]
        if i >= max_accept or (
            i > 0
            and (a in used or b in used or fused in alphabet or fused in used)
        ):
            cut = i
            break
        accepted.append((a, b))
        used.update((a, b, fused))
        cut = i + 1
        if a == b:
            break
    if cut < len(top):
        cut_count = top[cut]["c"]
        while len(accepted) > 1 and top[len(accepted) - 1]["c"] <= cut_count:
            accepted.pop()
    return accepted


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    collect_threshold: int = 200_000,
    batch: int = 1,
    exact: bool = True,
) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from the corpus. The corpus is
    scanned once (word counts); if the distinct-word table fits under
    ``collect_threshold`` rows the loop runs driver-side, else fully
    distributed (``collect_threshold=0`` forces the distributed path —
    used by the equivalence test).

    ``batch`` > 1 batches the distributed path: each round collects the
    top candidates once and merges several per round. Two selection
    modes:

    - ``exact=True`` (default): only pairs whose counts PROVABLY cannot
      interact (:func:`_select_batch`) — bit-identical to ``batch=1``,
      property-tested. On Zipf-distributed text this admits ~1.2
      merges/round (measured): ties and shared letters dominate, so it
      is a correctness-preserving opportunist, not a throughput lever.
    - ``exact=False``: the standard batched-BPE trick
      (:func:`_select_batch_fast`) — up to ``batch`` symbol-disjoint top
      pairs per round, ~``batch``x fewer driver-paced rounds for a real
      32k-vocab train. Deterministic, but later in-round merges use
      counts that a sequential train would have slightly updated (the
      tradeoff every parallel tokenizer trainer makes)."""
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
    alphabet: set[str] = set()
    if batch > 1:
        # one extra job: the collision guard needs the live symbol set
        alphabet = {
            r["s"] for r in sym_tab.select(F.explode("sym").alias("s")).distinct().collect()
        }
    merges: list[Merge] = []
    pair_struct = "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1), (x, y) -> named_struct('a', x, 'b', y))"
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        top = (
            sym_tab.filter(F.size("sym") >= 2)
            .select("cnt", F.explode(F.expr(pair_struct)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            # +1 beyond the acceptance cap: the exactness rule needs the
            # count of the first EXCLUDED candidate; the x8 headroom lets
            # the fast mode skip conflicted candidates and still fill
            .limit(want * 8 + 1)
            .collect()
        )
        top = [r for r in top if r["c"] >= min_pair_count]
        if not top:
            break
        if want <= 1:
            round_merges = [(top[0]["a"], top[0]["b"])]
        elif exact:
            round_merges = _select_batch(top, alphabet, want)
        else:
            round_merges = _select_batch_fast(top, alphabet, want)
        if not round_merges:  # selectors always take the argmax; belt+braces
            break
        merges.extend(round_merges)
        for a, b in round_merges:
            alphabet.add(a + b)
        # one Project node per merge (disjoint ⇒ composition order is
        # free): each level references the previous projection's output
        # ATTRIBUTE. Nesting the Columns inline instead would duplicate
        # the subtree at every `sym` reference (3 per _apply_merge) —
        # ~3^batch expression blowup, codegen OOM. Checkpoint once per
        # round, not per merge.
        for a, b in round_merges:
            sym_tab = sym_tab.select(
                "cnt", _apply_merge(F.col("sym"), a, b).alias("sym")
            )
        sym_tab = sym_tab.localCheckpoint(eager=True)
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
