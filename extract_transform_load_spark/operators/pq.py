"""Product quantization (PQ) — the 32x-compressed ANN store.

int8 scalar quantization (`similarity.quantize_embeddings`) shrinks the
embedding store 4x; PQ goes further: split each (L2-normalized) vector
into ``m`` subvectors, k-means a ``k``-entry codebook per subspace, and
store one code byte per subspace — 64 float32 dims (256 B) become 8
bytes. Queries never decompress the corpus: an ADC (asymmetric distance
computation) lookup table of the float query against every codebook
entry turns scoring into ``m`` table lookups per corpus vector
(Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS IndexPQ layout).

Scale design:
- **training on a deterministic sample** (first ``sample`` ids) — the
  published practice; codebooks are (m × k × dim/m) floats on the
  driver, broadcast to executors;
- **encoding** is one Arrow-batched ``mapInPandas`` pass (vectorized
  argmin per subspace), writing a corpus-sized but 32x-smaller table;
- **search** broadcasts the query batch + its LUTs; corpus code
  batches score with numpy fancy indexing (no Python-per-row), each
  partition emits only its local top-k, and a final window keeps the
  global top-k — shuffle carries O(partitions × queries × k) rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _normalized_matrix(series) -> np.ndarray:
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in series])
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _kmeans_subspaces(mat: np.ndarray, m: int, k: int, iterations: int) -> np.ndarray:
    """Per-subspace Lloyd k-means over a driver-side sample matrix.

    Deterministic: seeds are the first ``k`` sample subvectors.
    """
    n, dim = mat.shape
    if n < k:
        raise ValueError(
            f"codebook training needs at least k={k} sample vectors, got {n}: "
            "lower k or raise the training sample"
        )
    d_sub = dim // m
    books = np.empty((m, k, d_sub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * d_sub : (s + 1) * d_sub]  # (n, d_sub)
        cents = sub[:k].copy()
        for _ in range(iterations):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cents[j] = sub[mask].mean(axis=0)
        books[s] = cents
    return books


def _check_pq_params(dim: int, m: int, k: int) -> None:
    if dim % m:
        raise ValueError("dim must be divisible by m")
    if k > 128:
        raise ValueError("codes are stored as tinyint; k must be <= 128")


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 32,
    sample: int = 4096,
    iterations: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, dim/m) codebooks from k-means per subspace on a sample.

    Deterministic: the sample is the ``sample`` lowest ids, seeds are
    the first ``k`` sample subvectors. Lloyd runs driver-side on the
    sample — training cost is independent of corpus size.
    """
    _check_pq_params(dim, m, k)
    rows = (
        corpus.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    mat = _normalized_matrix([r[0] for r in rows])  # (n, dim)
    return _kmeans_subspaces(mat, m, k, iterations)


def train_residual_codebooks(
    corpus: DataFrame,
    centroids: np.ndarray,
    dim: int,
    m: int = 8,
    k: int = 32,
    sample: int = 4096,
    iterations: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_cell: bool = False,
) -> np.ndarray:
    """PQ codebooks trained on IVF *residuals* (x̂ − ĉ(cell)).

    When the corpus clusters, residuals are what's left after the
    coarse quantizer explains the cell-level structure — tighter spread
    per subspace, so the same code budget quantizes them with lower
    error (FAISS IVFPQ's default `by_residual`). On a corpus with weak
    cluster structure the effect inverts (‖x̂ − ĉ‖² = 2 − 2·x̂·ĉ can
    exceed ‖x̂‖² = 1), so this is a measured choice, not a default.
    The other trade: codes are only decodable relative to a cell, so
    re-clustering the coarse level forces a re-encode, which raw-vector
    PQ avoids.

    ``per_cell=True`` trains a SEPARATE codebook per coarse cell
    (returns shape (C, m, k, d_sub) instead of (m, k, d_sub)): each
    cell's residual distribution gets its own fit — "local codebooks"
    in the IVFADC literature — at C× the codebook memory (still tiny:
    C·m·k·d_sub floats broadcast to every executor) and C× the training
    k-means. Cells with fewer sample residuals than k seed by cycling
    what they have; empty cells inherit the global residual books.
    """
    _check_pq_params(dim, m, k)
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    rows = corpus.orderBy(id_col).limit(sample).select(vec_col).collect()
    mat = _normalized_matrix([r[0] for r in rows])  # (n, dim)
    assign = (mat @ norm_c.T).argmax(axis=1)
    resid = mat - norm_c[assign]
    shared = _kmeans_subspaces(resid, m, k, iterations)
    if not per_cell:
        return shared
    n_cells = centroids.shape[0]
    d_sub = dim // m
    books = np.empty((n_cells, m, k, d_sub), dtype=np.float64)
    for c in range(n_cells):
        cell_resid = resid[assign == c]
        if len(cell_resid) == 0:
            books[c] = shared
            continue
        if len(cell_resid) < k:
            cell_resid = cell_resid[np.arange(k) % len(cell_resid)]
        books[c] = _kmeans_subspaces(cell_resid, m, k, iterations)
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code array<tinyint>) — nearest codebook entry per subspace."""
    m, k, d_sub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], out_col: []})
                continue
            mat = _normalized_matrix(pdf.iloc[:, 1])
            codes = np.empty((len(pdf), m), dtype=np.int8)
            for s in range(m):
                sub = mat[:, s * d_sub : (s + 1) * d_sub]
                d2 = ((sub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1).astype(np.int8)
            yield pd.DataFrame(
                {"id": pdf.iloc[:, 0].to_numpy(), out_col: list(codes)}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(encode, schema=f"id {id_t}, {out_col} array<tinyint>")
        .withColumnRenamed("id", id_col)
    )


def pq_encode_residual(
    df: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """(id, cell, pq_code) — residual vs the nearest coarse centroid,
    then nearest residual-codebook entry per subspace. One Arrow pass
    computes assignment and codes together, so the IVF join
    ``_assign_cells`` does separately disappears. ``codebooks`` may be
    shared (m, k, d_sub) or per-cell (C, m, k, d_sub); per-cell rows
    encode against their own cell's books."""
    per_cell = codebooks.ndim == 4
    m, k, d_sub = codebooks.shape[-3:]
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "cell": [], out_col: []})
                continue
            mat = _normalized_matrix(pdf.iloc[:, 1])
            cells = (mat @ norm_c.T).argmax(axis=1)
            resid = mat - norm_c[cells]
            codes = np.empty((len(pdf), m), dtype=np.int8)
            for s in range(m):
                sub = resid[:, s * d_sub : (s + 1) * d_sub]
                if per_cell:
                    cb = codebooks[cells, s]  # (n, k, d_sub) per-row books
                    d2 = ((sub[:, None, :] - cb) ** 2).sum(axis=2)
                else:
                    d2 = ((sub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1).astype(np.int8)
            yield pd.DataFrame(
                {
                    "id": pdf.iloc[:, 0].to_numpy(),
                    "cell": cells.astype(np.int32),
                    out_col: list(codes),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(encode, schema=f"id {id_t}, cell int, {out_col} array<tinyint>")
        .withColumnRenamed("id", id_col)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    refine_factor: int | None = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: approximate cosine via per-subspace LUT lookups.

    Same output contract as ``cosine_topk_bruteforce``; the bulk scan
    reads codes only. With ``refine_factor`` (the FAISS refine stage)
    the ADC pass keeps a ``k × refine_factor`` shortlist and only the
    shortlisted vectors' floats are fetched for exact re-scoring — at
    100 TB that's point reads of ~50 vectors per query against a
    code-only scan of everything else. Measured on the synthetic
    embeddings (weak neighbors — a hard case): ADC alone ~0.68
    recall@10, shortlist-50 + exact rerank ~0.9. Compose with IVF for
    the standard IVF-PQ index: cells prune the scan, PQ shrinks what's
    scanned.
    """
    if refine_factor is not None:
        shortlist = pq_topk(
            corpus, queries, dim, k=k * refine_factor, m=m, n_codes=n_codes,
            refine_factor=None, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col,
        ).select("query_id", "neighbor_id")
        from .similarity import _dot, _norm

        cand = (
            shortlist.join(
                corpus.select(
                    F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
                ),
                "neighbor_id",
            )
            .join(
                F.broadcast(
                    queries.select(
                        F.col(query_id_col).alias("query_id"),
                        F.col(vec_col).alias("__qvec"),
                    )
                ),
                "query_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                (
                    _dot(F.col("__qvec"), F.col("__cvec"))
                    / (_norm(F.col("__qvec")) * _norm(F.col("__cvec")))
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
        )
    codebooks = train_pq_codebooks(
        corpus, dim, m, n_codes, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(corpus, codebooks, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    from .similarity import collect_probe_batch

    q_rows = collect_probe_batch(queries, query_id_col, vec_col)
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalized_matrix([r[1] for r in q_rows])  # (Q, dim)
    d_sub = dim // m
    # LUT[q][s][j] = dot(query_sub, codebook entry): approx IP on unit
    # vectors = approx cosine
    luts = np.einsum("qsd,skd->qsk", q_mat.reshape(len(q_ids), m, d_sub), codebooks)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
                continue
            code_mat = np.asarray(
                [np.asarray(c, dtype=np.int64) for c in pdf["pq_code"]]
            )  # (n, m)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                sims = luts[qi][sub_idx[None, :], code_mat].sum(axis=1)  # (n,)
                top = np.argsort(-sims)[: k + 1]  # +1 covers a self-match
                out_q.extend([qid] * len(top))
                out_n.extend(pdf["neighbor_id"].to_numpy()[top])
                out_s.extend(sims[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    nid_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    partial = codes.mapInPandas(
        score, schema=f"query_id {qid_t}, neighbor_id {nid_t}, cos_sim double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    n_centroids: int = 16,
    n_probe: int = 8,
    refine_factor: int = 5,
    residual: bool = False,
    per_cell_codebooks: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: coarse cells prune the scan, PQ codes shrink it, exact
    rerank restores precision — the standard FAISS IVFPQ + refine stack.

    Per query only the ``n_probe`` nearest cells' codes are ADC-scored
    (the others are masked out; at 100 TB the cell id is the physical
    partition key so they are never read at all), the shortlist's float
    vectors are point-read for exact re-scoring. Cells and codebooks
    both train deterministically.

    ``residual=False`` encodes raw vectors — one codebook serves every
    cell, so encode is cell-independent (re-clustering never
    re-encodes). ``residual=True`` encodes x̂ − ĉ(cell) (FAISS
    `by_residual`): the same code budget spends itself on the tighter
    residual distribution, and the ADC score adds the exact q·ĉ(cell)
    term back per row — better shortlists, at the cost of re-encoding
    whenever the coarse quantizer moves.

    ``per_cell_codebooks=True`` (residual only) trains one codebook per
    coarse cell — tighter per-cell fits on clustered corpora for C× the
    (tiny) codebook memory; the ADC LUT grows to (Q, C, m, k), still
    driver-side negligible.
    """
    from .similarity import _assign_cells, _dot, _norm, train_ivf_centroids

    if per_cell_codebooks and not residual:
        raise ValueError("per-cell codebooks only make sense for residual encoding")

    centroids = train_ivf_centroids(corpus, dim, n_centroids, id_col=id_col, vec_col=vec_col)
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    if residual:
        codebooks = train_residual_codebooks(
            corpus, centroids, dim, m, n_codes, id_col=id_col, vec_col=vec_col,
            per_cell=per_cell_codebooks,
        )
        codes = pq_encode_residual(
            corpus, codebooks, centroids, id_col, vec_col
        ).withColumnRenamed(id_col, "neighbor_id")
    else:
        codebooks = train_pq_codebooks(corpus, dim, m, n_codes, id_col=id_col, vec_col=vec_col)
        cells = _assign_cells(
            corpus.select(F.col(id_col), F.col(vec_col)), centroids, "neighbor_id"
        )
        codes = pq_encode(corpus, codebooks, id_col, vec_col).withColumnRenamed(
            id_col, "neighbor_id"
        ).join(cells, "neighbor_id")

    from .similarity import collect_probe_batch

    q_rows = collect_probe_batch(queries, query_id_col, vec_col)
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalized_matrix([r[1] for r in q_rows])
    d_sub = dim // m
    q_sub = q_mat.reshape(len(q_ids), m, d_sub)
    if per_cell_codebooks:
        luts = np.einsum("qsd,cskd->qcsk", q_sub, codebooks)  # (Q, C, m, k)
    else:
        luts = np.einsum("qsd,skd->qsk", q_sub, codebooks)
    q_cell_ip = q_mat @ norm_c.T if residual else None  # (Q, C): exact q·ĉ term
    probed = np.argsort(-(q_mat @ norm_c.T), axis=1)[:, :n_probe]  # (Q, n_probe)

    shortlist_k = k * refine_factor

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": [], "neighbor_id": [], "adc": []})
                continue
            code_mat = np.asarray(
                [np.asarray(c, dtype=np.int64) for c in pdf["pq_code"]]
            )
            cell_arr = pdf["cell"].to_numpy()
            ids_arr = pdf["neighbor_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                mask = np.isin(cell_arr, probed[qi])
                if not mask.any():
                    continue
                if per_cell_codebooks:
                    row_cells = cell_arr[mask].astype(np.int64)
                    sims = luts[qi][
                        row_cells[:, None], sub_idx[None, :], code_mat[mask]
                    ].sum(axis=1)
                else:
                    sims = luts[qi][sub_idx[None, :], code_mat[mask]].sum(axis=1)
                if q_cell_ip is not None:
                    sims = sims + q_cell_ip[qi][cell_arr[mask].astype(np.int64)]
                top = np.argsort(-sims)[: shortlist_k + 1]
                out_q.extend([qid] * len(top))
                out_n.extend(ids_arr[mask][top])
                out_s.extend(sims[top])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "adc": out_s})

    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    nid_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    shortlist = (
        codes.mapInPandas(score, schema=f"query_id {qid_t}, neighbor_id {nid_t}, adc double")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__r", F.row_number().over(w_short))
        .filter(F.col("__r") <= shortlist_k)
        .select("query_id", "neighbor_id")
    )
    cand = (
        shortlist.join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("__qvec"), F.col("__cvec"))
                / (_norm(F.col("__qvec")) * _norm(F.col("__cvec")))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
