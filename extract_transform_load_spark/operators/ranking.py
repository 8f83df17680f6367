"""BM25 lexical retrieval — query-anchored corpus ranking.

Okapi BM25 (Robertson & Sparck Jones probabilistic relevance framework;
the ``+1``-inside-the-log idf variant popularized by Lucene, which keeps
idf positive even for terms in more than half the corpus — all public)
over a tokenized document corpus. The training-data-curation use: rank
the corpus against a set of ANCHOR queries (benchmark prompts for
decontamination triage, seed documents for targeted selection,
complaint exemplars for cleanup) and take the top-k per query — the
lexical complement of the embedding-space ``cosine_topk``/ANN family
(exact tokens, no encoder, explainable matches).

Scale shape (the parts that matter at 100 TB):

- The corpus is tokenized ONCE into a (doc_id, term, tf) postings
  frame — one exchange keyed by (doc_id, term) with map-side combine;
  document lengths and the global avgdl ride the same pass.
- ``max_df_frac`` cuts terms present in more than that fraction of
  documents BEFORE the query join (the dedup family's df-cut
  discipline): stopword posting lists are the quadratic hazard here,
  and they contribute the least idf mass — the cut bounds the join
  fan-out per query term at ``max_df_frac x N`` docs.
- The query side (queries x their distinct terms) is small by
  construction and BROADCASTS into the postings join; the per-(query,
  doc) score aggregation is the one data-sized exchange after the
  postings build.
- Scoring sums per-term doubles in DECIMAL(28,12)
  (functions/decimals.py policy: identical per-term doubles in both
  engines -> identical decimals -> order-independent exact sum ->
  one bit-reproducible cast back to double), so ranks cannot flap
  run-to-run or engine-to-engine.

Registry row q161 pins the full derivation against a DuckDB twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Per-term score aggregation type: 16 integer digits cover any
#: realistic score mass; 12 fractional digits make the decimal rounding
#: far finer than any rank gap while absorbing nothing meaningful.
_SCORE_DEC = "decimal(28,12)"


def _tokens(df: DataFrame, id_col: str, text_col: str, out_id: str) -> DataFrame:
    """(id, term) rows — lowercase, whitespace-split, empties dropped
    (the corpus-wide tokenization convention; textops.words)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 1.0,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25, excluding self-matches
    (``doc_id == query_id``, the ``cosine_topk`` convention — an anchor
    document must not retrieve itself when the queries are corpus
    rows). Returns ``(query_id, doc_id, score, rank)``; ties broken by
    ``doc_id`` ascending for determinism.

    Query terms are DISTINCT per query (query-side term frequency is
    ignored — the common retrieval simplification; a repeated query
    term contributes once). Terms of a query that never occur in the
    corpus contribute nothing; a query with NO corpus terms simply
    returns no rows.

    ``max_df_frac`` drops corpus terms whose document frequency exceeds
    that fraction of N before scoring — the posting-list bound (see
    module docstring). 1.0 keeps everything.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 < max_df_frac <= 1.0:
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")

    toks = _tokens(docs, doc_id_col, text_col, "doc_id")
    # postings (doc, term, tf): ONE tokenization scan, checkpointed —
    # doc lengths, corpus stats, df and the score join all derive from
    # this frame (dl = sum of tf per doc), so the corpus text is read
    # exactly once however many consumers follow
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # N and avgdl: sums of integer-valued doubles are exact (and
    # order-free) below 2^53 -> one identical double division
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).first()
    n_docs = stats["n_docs"] or 0
    if n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [], "query_id long, doc_id long, score double, rank int"
        )
    avgdl = float(stats["sum_dl"]) / float(n_docs)

    qterms = (
        _tokens(queries, query_id_col, query_text_col, "query_id")
        .distinct()
    )
    # Cut the postings to QUERY TERMS before any exchange (guide §2.3 /
    # §3: reduce the big side before shuffling it). Only terms that
    # occur in some query can ever contribute a score, and restricting
    # tf to those terms keeps EVERY corpus occurrence of them — so the
    # per-term df (and hence idf) computed from the restricted frame is
    # exactly the corpus-wide df. Before this reorder the full postings
    # frame was exchanged twice (by term for the idf join, then by
    # doc_id for the dl join) before the broadcast query filter pruned
    # it; now the broadcast semi-join prunes in-scan and both df_t and
    # the score join see only query-term postings. The checkpoint is
    # shared, so the distinct-term broadcast costs no extra corpus scan.
    tf_q = tf.join(
        F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
    )
    # The (postings x query-terms) broadcast join below FANS OUT — one
    # row per (posting, matching query) — and a broadcast join runs in
    # the probe side's own partitions. A small corpus AQE-coalesces the
    # postings to one partition, so the whole expansion plus its
    # map-side decimal combine would run on ONE core (measured at
    # sf0.1: the expansion task dominated the query). Gate on the
    # n_docs scalar already in hand — .rdd-based partition probes would
    # force the adaptive plan — and spread only the (tiny, query-term-
    # pruned) postings; a warehouse-scale corpus skips the shuffle and
    # already carries scan parallelism.
    if n_docs < 1_000_000:
        tf_q = tf_q.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
    tf_q = tf_q.localCheckpoint(eager=False)

    df_t = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df_frac < 1.0:
        df_t = df_t.filter(
            F.col("df").cast("double") <= F.lit(max_df_frac * n_docs)
        )
    # Lucene-style idf: ln(1 + (N - df + .5)/(df + .5)) — positive for
    # every df, so the df-cut only ever removes near-zero-mass terms.
    # The idf table is bounded by the DISTINCT QUERY VOCABULARY (small
    # by construction), so it broadcasts into the score join.
    idf = df_t.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )

    # per-(query, doc, term) score contribution; the query-vocabulary
    # sides broadcast — only the dl attachment exchanges the (already
    # query-term-pruned) postings, keyed by doc_id
    contrib = (
        tf_q.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).cast(_SCORE_DEC).alias("__s"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("__s").cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int"))
    )
