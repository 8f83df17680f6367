"""Text-analysis column builders: tokenization, quality, fingerprints.

Built for the ``documents`` table (doc_id, text, lang, source, n_chars).
Everything stays JVM-side (built-in functions inside whole-stage
codegen) — the right hot path for a 100 TB corpus scan — with one
measured exception: winnowing selection (``winnow_anchor_rows`` /
``winnow_summary_rows``) runs as an Arrow-batched ``mapInPandas``
because the higher-order-function form pays O(n*w) string compares per
document and loses 2.4x to C md5 + an O(n) deque (both forms are kept
and equivalence-tested). Engine-portable: each builder has an exact
DuckDB SQL twin used by the oracle queries in plans/datapipe.py.
"""

from __future__ import annotations

import hashlib
from collections import deque
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .spread import spread_small_scan


def words(text: Column) -> Column:
    """Whitespace tokens (documents are single-space word soup)."""
    return F.split(text, " ")


def n_words(text: Column) -> Column:
    return F.size(words(text)).cast("bigint")


def regex_tokens(text: Column) -> Column:
    """BPE-ish lowercase-alpha token stream via regexp (portable subset)."""
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), 0)


def substring_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len - len(replace))/len(needle).

    Chosen over regexp counting because the replace-trick is defined
    identically in every SQL engine (the DuckDB oracle uses the same
    expression verbatim).
    """
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def normalized(text: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics."""
    return F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def let(value: Column, fn) -> Column:
    """Bind ``value`` as a higher-order-function lambda variable so the
    engine evaluates it exactly once per row: ``transform(array(value),
    v -> fn(v))[0]``. This is the functional let-binding Spark's
    expression language lacks — and the ONLY projection-proof way to
    share an expensive subexpression across per-element lambdas:

    - Referencing the expression tree directly inside a windowed
      ``transform`` re-evaluates it per element (no loop-invariant
      hoisting): winnowing went O(n^2) in md5 calls, 80-210 s on 5k
      docs vs 2.6 s with the binding.
    - Staging it as its own projection works until any downstream
      Generate/aggregate lets CollapseProject or generator-pushdown
      re-inline it (measured: clean 2-select plan has 1 md5, adding
      ``explode`` inflates it to 15).

    A lambda variable is a bound value — no optimizer rule substitutes
    its definition into the body, so the plan stays one evaluation no
    matter what is built on top.
    """
    return F.get(F.transform(F.array(value), fn), 0)


def gram_hashes(text: Column, k: int = 8) -> Column:
    """md5 of every char ``k``-gram (1-based starts); [] when the text is
    shorter than ``k``. Always consume via ``let`` — see its docstring."""
    n_grams = F.length(text) - k + 1
    return (
        F.when(
            n_grams >= 1,
            F.transform(F.sequence(F.lit(1), n_grams), lambda i: F.md5(text.substr(i, F.lit(k)))),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., MOSS).

    The rolling-hash fingerprint family the reference lacks: hash every
    char ``k``-gram, slide a window of ``w`` consecutive gram hashes,
    keep each window's minimum, dedupe. Guarantees: any shared substring
    of length >= k + w - 1 contributes at least one *common* selected
    fingerprint, and selection density is ~2/(w+1) — sub-linear output
    per document.

    Spark-first shape: all higher-order array functions inside
    whole-stage codegen; the gram array is let-bound so the md5 pass
    runs once per document (not once per window — see ``let``). md5 is
    the gram hash so min-selection (lexicographic) is bit-identical in
    any engine — the DuckDB oracle runs the same algorithm in SQL.

    Short-doc guards (ANSI mode: ``sequence`` throws on negative
    ranges): fewer than ``w`` grams → one window over all grams; no
    grams → empty set.
    """

    def selection(grams: Column) -> Column:
        n = F.size(grams)
        mins = F.transform(
            F.sequence(F.lit(1), n - w + 1), lambda j: F.array_min(F.slice(grams, j, w))
        )
        return (
            F.when(n >= w, F.array_sort(F.array_distinct(mins)))
            .when(n >= 1, F.array(F.array_min(grams)))
            .otherwise(F.array().cast("array<string>"))
        )

    return let(gram_hashes(text, k), selection)


def winnow_anchor_positions(text: Column, k: int = 25, w: int = 8) -> Column:
    """Winnowing anchors WITH their char positions:
    ``array<struct<pos int, fp string>>`` — ``winnow_fingerprints``'s
    selection keeping where each selected gram starts (1-based), the
    form span-level dedup needs. Content-defined selection is the
    point: two copies of a repeated substring select the same gram
    *contents* regardless of where the copies sit, so (unlike
    stride-anchored sampling, whose windows mis-align between copies)
    any shared substring of length >= k + w - 1 yields a common anchor
    fingerprint in both copies.

    Ties inside a window (equal md5 = equal gram content) resolve to the
    first occurrence — ``array_position``/``list_position`` agree across
    engines, so selection is bit-identical in the DuckDB oracle. Both
    the gram array and each window's min are let-bound (``let``), so the
    plan hashes each document once.
    """

    def selection(grams: Column) -> Column:
        n = F.size(grams)

        def win(j: Column) -> Column:
            # slice bound too: inline it and each window copies the
            # sub-array twice (min + position scan) — measured 13% off
            # the whole span pipeline at sf0.1 from this one binding.
            return let(
                F.slice(grams, j, w),
                lambda sl: let(
                    F.array_min(sl),
                    lambda m: F.struct(
                        (j - 1 + F.array_position(sl, m)).cast("int").alias("pos"),
                        m.alias("fp"),
                    ),
                ),
            )

        single = let(
            F.array_min(grams),
            lambda m: F.struct(
                F.array_position(grams, m).cast("int").alias("pos"), m.alias("fp")
            ),
        )
        return (
            F.when(n >= w, F.transform(F.sequence(F.lit(1), n - w + 1), win))
            .when(n >= 1, F.array(single))
            .otherwise(F.array().cast("array<struct<pos:int,fp:string>>"))
        )

    return let(gram_hashes(text, k), selection)


def _winnow_digest_anchors(text: str | None, k: int, w: int) -> list[tuple[int, bytes]]:
    """Single-doc winnowing core shared by the Arrow extractors: distinct
    (1-based gram start, md5 digest) anchors, identical selection to
    :func:`winnow_anchor_positions` (per-window lexicographic min, ties
    to the FIRST occurrence). Lexicographic order of the lowercase-hex
    fingerprint equals byte order of the digest, so comparisons run on
    the 16-byte digests and hex-encode only the ~2/(w+1) selected
    anchors. A monotonic deque makes selection O(n) per document where
    the column-expression form pays O(n*w) string compares.
    """
    if text is None:
        return []
    ng = len(text) - k + 1
    if ng < 1:
        return []
    md5 = hashlib.md5
    digests = [md5(text[i : i + k].encode("utf-8")).digest() for i in range(ng)]
    out: list[tuple[int, bytes]] = []
    seen: set[tuple[int, bytes]] = set()
    if ng < w:
        m = min(digests)
        return [(digests.index(m) + 1, m)]
    dq: deque[int] = deque()
    for i, d in enumerate(digests):
        # strict pop keeps the earliest index among equal minima —
        # array_position / list_position first-occurrence semantics.
        while dq and digests[dq[-1]] > d:
            dq.pop()
        dq.append(i)
        start = i - w + 1
        while dq[0] < start:
            dq.popleft()
        if start >= 0:
            a = (dq[0] + 1, digests[dq[0]])
            if a not in seen:
                seen.add(a)
                out.append(a)
    return out


def winnow_anchor_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 25,
    w: int = 8,
) -> DataFrame:
    """Distinct winnowing anchors as rows (id, pos, fp) via Arrow-batched
    ``mapInPandas`` — bit-identical to ``explode(array_distinct(``
    :func:`winnow_anchor_positions` ``))`` (equivalence is pinned by
    tests/test_datapipe.py) but 2.4x faster at sf0.1: the higher-order
    column form pays O(n*w) JVM string compares plus a slice allocation
    per window, while this path hashes each gram once in C (hashlib) and
    selects minima with an O(n) monotonic deque. Python is justified
    here by measurement, not convenience — the expression-only form IS
    implemented (above) and loses. Scan-local: no shuffle, no explode;
    the 100 TB cost model is unchanged (anchors ~2/(w+1) of chars).
    """
    sel = spread_small_scan(docs.select(id_col, text_col))
    id_type = docs.schema[id_col].dataType.simpleString()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            poss: list[int] = []
            fps: list[str] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for pos, digest in _winnow_digest_anchors(text, k, w):
                    ids.append(did)
                    poss.append(pos)
                    fps.append(digest.hex())
            yield pd.DataFrame(
                {id_col: ids, "pos": pd.Series(poss, dtype="int32"), "fp": fps}
            )

    return sel.mapInPandas(extract, f"{id_col} {id_type}, pos int, fp string")


def winnow_summary_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint summary (n_fingerprints,
    first_fp, last_fp of the sorted distinct set) computed inside one
    Arrow-batched map — the whole q58 answer without materializing the
    fingerprint arrays. Matches ``winnow_fingerprints`` + size/get
    exactly (same selection core as :func:`winnow_anchor_rows`); zero
    exchange, zero explode, one pass over the corpus scan.
    """
    sel = spread_small_scan(docs.select(id_col, text_col))
    id_type = docs.schema[id_col].dataType.simpleString()

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            ns: list[int] = []
            firsts: list[str | None] = []
            lasts: list[str | None] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                fps = {d for _, d in _winnow_digest_anchors(text, k, w)}
                ids.append(did)
                ns.append(len(fps))
                firsts.append(min(fps).hex() if fps else None)
                lasts.append(max(fps).hex() if fps else None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_fingerprints": pd.Series(ns, dtype="int32"),
                    "first_fp": firsts,
                    "last_fp": lasts,
                }
            )

    return sel.mapInPandas(
        summarize, f"{id_col} {id_type}, n_fingerprints int, first_fp string, last_fp string"
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (distinct not applied — caller decides).

    Guarded for short docs: sequence(0, n) errors in ANSI mode when
    n < 0, so texts with fewer than k words yield an empty array.
    """
    def sel(w: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(w) - k)
        shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
        return F.when(F.size(w) >= k, shingles).otherwise(F.array().cast("array<string>"))

    # let-bound: referencing words(text) inside the per-shingle lambda
    # would re-split the text once per shingle (see ``let``).
    return let(words(text), sel)


# Tiny per-language stopword marker lists for the heuristic language
# classifier. Spaces matter: they anchor whole-word matches.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(substring_count(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


# --- PII detection / redaction -----------------------------------------
#
# Training corpora scraped from the web carry emails, phone numbers,
# IPs and national-id-shaped strings that must be scrubbed before
# export (the reference has no such surface; this is a training-data
# pipeline extension). Patterns stay in the portable regex subset that
# Java (Spark) and RE2 (DuckDB) interpret identically: character
# classes, bounded quantifiers, non-capturing groups, \b — no
# lookaround, no backreferences (RE2 has neither). Caveat: \s differs
# at \x0B between the engines; none of these patterns relies on it
# beyond plain spaces.
#
# Redaction applies in priority order (email > ssn > ipv4 > phone) so a
# higher-priority match can't be re-counted by a looser later pattern —
# an SSN is phone-shaped, an IP is phone-shaped. Counts follow the same
# discipline: each category is counted on the text with all
# higher-priority categories already replaced. Placeholder tokens are
# digit-free, so redaction is idempotent.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\(?\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its digit-free placeholder token."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts under the priority discipline.

    Returns {category: int column}; count category N on the text with
    categories 1..N-1 already redacted, so overlapping shapes (SSN vs
    phone) are attributed once, to the higher-priority category.
    """
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.regexp_count(cur, F.lit(pat)).cast("int")
        cur = F.regexp_replace(cur, pat, repl)
    return out


def scrub_frequent_grams(
    docs,
    k: int = 5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Remove boilerplate spans: every word-``k``-gram occurrence whose
    gram recurs in >= ``min_docs`` distinct documents is masked out of
    the text (all ``k`` covered word positions drop), and the document
    is rebuilt from the surviving words in order.

    This is the transformation twin of the q89 *measurement*: q89 tells
    you how much repeated-template mass a corpus carries; this actually
    strips it (the RefinedWeb/CCNet step that removes footers, nav
    bars and license blurbs while keeping the unique prose around
    them). Overlapping frequent grams merge naturally — coverage is a
    position set, not a span list.

    Scale shape: gram occurrences explode scan-side; one shuffle
    counts per-gram doc-frequency (map-side partial over distinct
    (doc, gram) pairs); the occurrences↔frequent-grams join reuses the
    gram hash partitioning; covered positions then collapse to ONE
    small array per doc (``collect_set`` — boilerplate coverage is a
    tiny fraction of corpus tokens), and the rebuild is a codegen-only
    indexed ``filter`` over the words array — the corpus text itself
    is never shuffled, only (id, position-set) pairs are.
    """
    occ = docs.select(
        F.col(id_col),
        F.posexplode(word_shingles(F.col(text_col), k)).alias("start", "gram"),
    )
    freq = (
        occ.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    cov = (
        occ.join(freq, "gram")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("start"), F.col("start") + (k - 1))).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("cov"))
    )
    w = words(F.col(text_col))
    kept = F.filter(w, lambda x, i: ~F.array_contains(F.col("cov"), i))
    return (
        docs.join(cov, id_col, "left")
        .withColumn("cov", F.coalesce(F.col("cov"), F.array().cast("array<int>")))
        .select(
            F.col(id_col),
            F.size(w).cast("bigint").alias("n_tokens"),
            F.size(kept).cast("bigint").alias("n_kept"),
            F.array_join(kept, " ").alias("scrubbed_text"),
        )
    )


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Gopher-style repetition metrics, one row per document.

    For each n in ``ns`` emits ``top_{n}gram_frac`` (occurrences of the
    single most frequent word n-gram / total n-gram occurrences) and
    ``dup_{n}gram_frac`` (fraction of n-gram occurrences whose gram
    appears >= 2 times in the document) plus ``n_words``. These are the
    repetition filters of the Gopher/MassiveText curation recipe
    (Rae et al. 2021, table A1) at word granularity — a document whose
    top 2-gram covers >20% of it, or whose duplicate 3-gram mass
    exceeds ~60%, is boilerplate/spam and gets cut before training.

    Scale shape: ONE corpus scan tags every n-gram with its n and
    explodes (scan-side, no pre-shuffle); counting is a
    (doc, n, gram)-keyed aggregate with map-side partials; the per-doc
    reduction collapses to |docs|x|ns| rows before the pivot, so
    everything after the first shuffle is tiny. The corpus text is
    never shuffled — only grams leave the scan stage. Documents whose
    word count < n carry NULL fracs for that n (no n-grams exist), via
    the left join back to the id spine.
    """
    w = words(F.col(text_col))

    def tagged(n: int) -> Column:
        grams = w if n == 1 else word_shingles(F.col(text_col), n)
        return F.transform(
            grams, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
        )

    ex = docs.select(
        F.col(id_col),
        F.explode(F.flatten(F.array(*[tagged(n) for n in ns]))).alias("t"),
    )
    counts = ex.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("c"))
    # ONE doc-keyed aggregate instead of groupBy(doc, n) + pivot(doc)
    # (r11): each (doc, gram) row belongs to exactly one n, so the
    # per-n stats are conditional aggregates over the same rows — the
    # (doc, n) exchange and the pivot's second |docs| exchange both
    # disappear (3 exchanges -> 2 after the gram count). NULL semantics
    # match the pivot exactly: a doc with no n-grams for some n has no
    # matching rows, so max/sum over the all-NULL branch yield NULL —
    # the same NULL the missing pivot cell produced.
    wide = counts.groupBy(id_col).agg(
        *[
            agg
            for n in ns
            for agg in (
                F.max(F.when(F.col("t.n") == n, F.col("c"))).alias(f"{n}_top"),
                F.sum(F.when(F.col("t.n") == n, F.col("c"))).alias(f"{n}_total"),
                F.sum(
                    F.when(
                        F.col("t.n") == n,
                        F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)),
                    )
                ).alias(f"{n}_dup"),
            )
        ]
    )
    gram_word = {1: "word", 2: "bigram", 3: "trigram"}
    out_cols = [F.col(id_col), F.size(w).cast("bigint").alias("n_words")]
    for n in ns:
        label = gram_word.get(n, f"{n}gram")
        top = F.col(f"{n}_top").cast("double")
        dup = F.col(f"{n}_dup").cast("double")
        total = F.col(f"{n}_total")
        out_cols.append((top / total).alias(f"top_{label}_frac"))
        out_cols.append((dup / total).alias(f"dup_{label}_frac"))
    return docs.join(wide, id_col, "left").select(*out_cols)


def build_vocab(df: Column | "DataFrame", text_col: str = "text", size: int = 30000):
    """Deterministic frequency vocab: top-``size`` words get ids
    1..size (rank by count desc, word asc — reproducible run-to-run);
    id 0 is reserved for OOV. One word-count aggregate with map-side
    combine, then TakeOrdered top-``size`` — the full vocabulary is
    counted but never globally sorted; the ranking window runs over the
    ≤ size survivors on one partition (a vocab is driver-scale by
    definition)."""
    from pyspark.sql import Window

    w = df.select(F.explode(words(F.col(text_col))).alias("word"))
    counts = w.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(size)
    rank = Window.orderBy(F.col("n").desc(), F.col("word").asc())
    return top.withColumn("token_id", F.row_number().over(rank)).select("word", "token_id")


def encode_tokens(
    df, vocab, id_col: str = "doc_id", text_col: str = "text"
):
    """(id, token_ids array<int>, n_tokens, n_oov) — the text → id-array
    step a training exporter runs after curation and before packing
    (q75 budgets on counts; this produces the ids those counts meter).

    Order is load-bearing: collect_list has no ordering guarantee under
    shuffle, so positions ride along and ``array_sort`` over
    (pos, id) structs restores document order deterministically before
    the ids are peeled out. The vocab broadcasts (a vocab is MB-scale
    against a 100 TB corpus); unknown words encode as 0.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "word")
    )
    j = toks.join(F.broadcast(vocab), "word", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(0))
    return j.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), tid.alias("tid")))),
            lambda s: s.tid,
        ).alias("token_ids"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
    )


def decode_tokens(encoded, vocab, id_col: str = "doc_id", oov_marker: str = "<unk>"):
    """Inverse of :func:`encode_tokens`: id arrays → text, OOV ids (0)
    rendering as ``oov_marker``. Round trip decode(encode(d)) == d for
    fully in-vocab documents (tested) — the loader-side check that an
    exported id-shard and its vocab actually belong together."""
    inv = vocab.select(F.col("token_id"), F.col("word"))
    ex = encoded.select(F.col(id_col), F.posexplode("token_ids").alias("pos", "token_id"))
    j = ex.join(F.broadcast(inv), "token_id", "left")
    word = F.coalesce(F.col("word"), F.lit(oov_marker))
    return (
        j.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("pos"), word.alias("w")))),
                    lambda s: s.w,
                ),
                " ",
            ).alias("text")
        )
    )


def vocab_encode_map(vocab) -> Column:
    """The vocab as a constant ``map<string,int>`` column (word → id).

    A vocabulary is driver-scale by definition (≤ ~1M entries — MBs
    against a 100 TB corpus), so it collects once and folds into a map
    literal every executor evaluates in place. Lookups then run inside
    the corpus scan with ZERO shuffle — the join-based
    :func:`encode_tokens` posexplodes the whole corpus and shuffles
    every (doc, token) row through a collect_list to restore order,
    an O(corpus tokens) exchange that the map form simply deletes.
    Keep the join form only for a vocab too large to serialize into
    the plan."""
    rows = vocab.select("word", "token_id").collect()
    return F.map_from_arrays(
        F.lit([r["word"] for r in rows]),
        F.lit([r["token_id"] for r in rows]),
    )


def vocab_decode_map(vocab) -> Column:
    """Inverse constant map (id → word) for scan-local decoding."""
    rows = vocab.select("word", "token_id").collect()
    return F.map_from_arrays(
        F.lit([r["token_id"] for r in rows]),
        F.lit([r["word"] for r in rows]),
    )


def vocab_maps(vocab) -> tuple[Column, Column]:
    """(encode map, decode map) from ONE collect — a round-trip caller
    (q93) would otherwise execute the vocab aggregate twice."""
    rows = vocab.select("word", "token_id").collect()
    ws = F.lit([r["word"] for r in rows])
    ids = F.lit([r["token_id"] for r in rows])
    return F.map_from_arrays(ws, ids), F.map_from_arrays(ids, ws)


def encode_ids(text: Column, enc_map: Column) -> Column:
    """token id array for ``text`` under a :func:`vocab_encode_map`;
    OOV → 0. ``try_element_at`` (not ``element_at``) because ANSI mode
    raises on missing map keys."""
    return F.transform(
        words(text), lambda w: F.coalesce(F.try_element_at(enc_map, w), F.lit(0))
    )


def decode_ids(ids: Column, dec_map: Column, oov_marker: str = "<unk>") -> Column:
    """id array → text under a :func:`vocab_decode_map`."""
    return F.array_join(
        F.transform(
            ids, lambda i: F.coalesce(F.try_element_at(dec_map, i), F.lit(oov_marker))
        ),
        " ",
    )


def encode_tokens_mapped(df, vocab, id_col: str = "doc_id", text_col: str = "text"):
    """Drop-in :func:`encode_tokens` twin via the broadcast map literal:
    same output schema, but one scan-local projection — no posexplode,
    no vocab join, no collect_list shuffle. This is the 100 TB default;
    equivalence to the join form is property-tested."""
    ids = encode_ids(F.col(text_col), vocab_encode_map(vocab))
    return df.select(
        F.col(id_col),
        let(
            ids,
            lambda t: F.struct(
                t.alias("token_ids"),
                F.size(t).cast("bigint").alias("n_tokens"),
                F.size(F.filter(t, lambda i: i == 0)).cast("bigint").alias("n_oov"),
            ),
        ).alias("__e"),
    ).select(id_col, "__e.token_ids", "__e.n_tokens", "__e.n_oov")


def decode_tokens_mapped(
    encoded, vocab, id_col: str = "doc_id", oov_marker: str = "<unk>"
):
    """Drop-in :func:`decode_tokens` twin: scan-local map lookups."""
    return encoded.select(
        F.col(id_col),
        decode_ids(F.col("token_ids"), vocab_decode_map(vocab), oov_marker).alias("text"),
    )
