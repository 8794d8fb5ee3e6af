"""Similarity search over embedding columns (training-data ops).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (small), corpus side streams; per-row dot
  products via ``zip_with``/``aggregate`` (JVM, vectorizable), one
  window for the top-k cut. At 100 TB the corpus side stays partitioned
  and only (query_id, sim) pairs shuffle for the final top-k.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic md5-seeded planes); candidates only within matching
  buckets, then exact re-rank. Bucket keys are uniform → no skew.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import let, let2

__all__ = ["dot", "norm", "cosine", "cosine_topk", "hyperplane_bucket",
           "lsh_topk", "ivf_centroids", "ivf_assign", "ivf_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return let2(
        dot(a, b),
        norm(a) * norm(b),
        lambda d, n: F.when(n > 0, d / n).otherwise(F.lit(0.0)),
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours per query (self-matches excluded).
    ``queries`` must be small — it is broadcast."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("qv").cast("array<double>"),
                       F.col("cv").cast("array<double>")),
                5,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def hyperplane_bucket(vec: Column, n_planes: int = 4, dim: int = 64,
                      table: int = 0) -> Column:
    """One random-hyperplane LSH bucket key: bit_j = sign(v · h_j)
    where h_j[i] ∈ {−1, +1} is derived from md5(table:j:i) —
    deterministic, engine-portable, no stored plane matrix. The
    projection folds left in array order, matching DuckDB list_reduce
    bit-for-bit."""
    def plane_sign(j: int, i: Column) -> Column:
        return F.when(
            F.substring(
                F.md5(F.concat(F.lit(f"{table}:{j}:"),
                               i.cast("string"))), 1, 1
            ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    bits = []
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec.cast("array<double>"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: plane_sign(j, i),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _plane_signs(n_tables: int, n_planes: int, dim: int):
    """The md5-derived ±1 plane matrix, shape (dim, n_tables·n_planes) —
    sign(t, j, i) = +1 iff md5(f"{t}:{j}:{i}")[0] ∈ [8-f], identical to
    hyperplane_bucket and the DuckDB oracle."""
    import hashlib

    s = np.empty((dim, n_tables * n_planes), dtype=np.float64)
    for t in range(n_tables):
        for j in range(n_planes):
            for i in range(dim):
                h = hashlib.md5(f"{t}:{j}:{i}".encode()).hexdigest()
                s[i, t * n_planes + j] = 1.0 if h[0] in "89abcdef" else -1.0
    return s


def bucket_keys(df: DataFrame, idc: str, vc: str,
                n_tables: int = 12, n_planes: int = 4,
                dim: int = 64) -> DataFrame:
    """(id, vec) → one row per (table, key), IDS ONLY: bucket keys via
    a numpy kernel — all L·b projections are ONE ±1 matrix product per
    batch (BLAS), vs 48 interpreted HOF trees per row in the
    expression form (measured 200+ s for 500 rows). The fold over
    dimensions is sequential (loop over dim, vectorized over rows) so
    the float sums are bit-identical to DuckDB list_reduce. Vectors
    are NOT carried through the bucket rows — each id would otherwise
    ship its embedding L times through downstream join/dedup
    exchanges."""
    import pandas as pd

    signs = _plane_signs(n_tables, n_planes, dim)

    def gen(batches):
        for pdf in batches:
            ids = pdf[idc]
            vecs = np.array([np.asarray(v, dtype=np.float64)
                             for v in pdf[vc]])
            n = len(pdf)
            if n == 0 or vecs.size == 0:
                yield pd.DataFrame(columns=[idc, "tbl", "key"])
                continue
            acc = np.zeros((n, n_tables * n_planes))
            for i in range(dim):          # exact left-fold order
                acc += np.outer(vecs[:, i], signs[i])
            bits = acc > 0
            rows = []
            for r in range(n):
                for t in range(n_tables):
                    key = "".join(
                        "1" if bits[r, t * n_planes + j] else "0"
                        for j in range(n_planes))
                    rows.append((ids.iloc[r], t, key))
            yield pd.DataFrame(rows, columns=[idc, "tbl", "key"])

    # derive the id column's Spark type from the frame (a string/int id
    # corpus must not silently coerce to long)
    id_type = dict(df.dtypes)[idc]
    return df.select(idc, vc).mapInPandas(
        gen, f"{idc} {id_type}, tbl int, key string")


def embedding_near_dup(corpus: DataFrame, threshold: float = 0.9,
                       n_tables: int = 12, n_planes: int = 4,
                       dim: int = 64, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup flavour of the
    ANN machinery: multi-table hyperplane-LSH buckets → candidate pairs
    (id < id, ids-only self-join on (tbl, key)) → id-level dedup →
    vectors re-joined → exact cosine ≥ threshold.

    100-TB shape: the quadratic step happens only inside buckets
    (md5-uniform keys, no skew); the only all-rows shuffle carries
    (id, tbl, key) — never the vectors, which join back against the
    tiny candidate set."""
    base = corpus.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"))
    k = bucket_keys(base, "id", "v", n_tables, n_planes, dim)
    a, b = k.alias("a"), k.alias("b")
    pair_ids = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    sims = (
        pair_ids.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                F.round(cosine(F.col("va").cast("array<double>"),
                               F.col("vb").cast("array<double>")),
                        5).alias("sim"))
    )
    return sims.filter(F.col("sim") >= threshold)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
             n_tables: int = 12, n_planes: int = 4, dim: int = 64,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN scale path: multi-table hyperplane LSH (OR-construction) →
    candidate pairs → exact cosine re-rank.

    A single b-bit table has recall (1−θ/π)^b per neighbour — near zero
    for unclustered embeddings (measured 0/15 with one 8-bit table on
    the testdata); L tables of fewer bits trade candidate volume for
    recall (L=12, b=4 → recall 1.0 here). At scale each (table, key)
    bucket is a shuffle partition key: only same-bucket pairs
    materialize, keys are md5-uniform → no skew, and candidate pairs
    dedupe before the exact re-rank so each pair's dot product is
    computed once."""
    from pyspark.sql.window import Window

    qv_df = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"))
    cv_df = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"))
    qk = bucket_keys(qv_df, "query_id", "qv", n_tables, n_planes, dim)
    ck = bucket_keys(cv_df, "neighbor_id", "cv", n_tables, n_planes,
                     dim)
    pair_ids = (
        ck.join(F.broadcast(qk),
                (ck["tbl"] == qk["tbl"]) & (ck["key"] == qk["key"])
                & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # vectors join back AFTER the dedup: the candidate-id set is tiny
    # next to the corpus, so the corpus side resolves as a semi-join-
    # shaped hash join (ids-only exchange), and query vectors broadcast
    pairs = (
        pair_ids.join(cv_df, "neighbor_id")
        .join(F.broadcast(qv_df), "query_id")
    )
    sims = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qv").cast("array<double>"),
                       F.col("cv").cast("array<double>")), 5).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


# ---------------------------------------------------------------------------
# IVF-style coarse quantization — the second ANN scale path next to
# hyperplane-LSH: assign every vector to its argmax-dot centroid cell,
# probe the top-n cells per query, exact cosine re-rank inside probed
# cells. At 100 TB the cell id is the partition/bucket key: the corpus
# shuffles once into cells (ids-only downstream, vectors re-join), a
# query touches n_probe cells instead of the whole corpus, and
# centroids are deterministic literals shared with the DuckDB oracle —
# no training step, no stored model.
# ---------------------------------------------------------------------------


def ivf_centroids(n_cells: int = 16, dim: int = 64) -> np.ndarray:
    """Deterministic pseudo-random centroids in [-1, 1)^dim, derived
    from md5 so every engine regenerates the identical float64 matrix
    (the oracle SQL inlines these exact values as literals)."""
    import hashlib

    c = np.empty((n_cells, dim), dtype=np.float64)
    for j in range(n_cells):
        for i in range(dim):
            h = hashlib.md5(f"ivf:{j}:{i}".encode()).hexdigest()
            c[j, i] = int(h[:8], 16) / float(1 << 31) - 1.0
    return c


def ivf_assign(df: DataFrame, idc: str, vc: str, n_cells: int = 16,
               n_probe: int = 1, dim: int = 64) -> DataFrame:
    """(id, vec) → (id, cell, probe) rows, IDS ONLY: the ``probe``-th
    best cell per vector (probe 0 = argmax dot). The dot products fold
    sequentially over dimensions (vectorized over rows) so they equal
    DuckDB's list_dot_product bit-for-bit; ties break to the lowest
    cell id on both engines."""
    import pandas as pd

    cents = ivf_centroids(n_cells, dim)

    def gen(batches):
        for pdf in batches:
            ids = pdf[idc]
            vecs = np.array([np.asarray(v, dtype=np.float64)
                             for v in pdf[vc]])
            n = len(pdf)
            if n == 0 or vecs.size == 0:
                yield pd.DataFrame(columns=[idc, "cell", "probe"])
                continue
            acc = np.zeros((n, n_cells))
            for i in range(dim):          # exact left-fold order
                acc += np.outer(vecs[:, i], cents[:, i])
            rows = []
            for r in range(n):
                # stable argsort on -dot → lowest cell wins ties
                order = np.argsort(-acc[r], kind="stable")[:n_probe]
                for p, cell in enumerate(order):
                    rows.append((ids.iloc[r], int(cell), p))
            yield pd.DataFrame(rows, columns=[idc, "cell", "probe"])

    id_type = dict(df.dtypes)[idc]
    return df.select(idc, vc).mapInPandas(
        gen, f"{idc} {id_type}, cell int, probe int")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
             n_cells: int = 16, n_probe: int = 4, dim: int = 64,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN via IVF cells: corpus assigned to 1 cell each, queries probe
    their top ``n_probe`` cells, exact cosine re-rank on the matched
    candidates. Same output contract as cosine_topk/lsh_topk."""
    from pyspark.sql.window import Window

    qv_df = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"))
    cv_df = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"))
    ca = ivf_assign(cv_df, "neighbor_id", "cv", n_cells, 1, dim) \
        .select("neighbor_id", "cell")
    qa = ivf_assign(qv_df, "query_id", "qv", n_cells, n_probe, dim) \
        .select("query_id", "cell")
    pair_ids = (
        ca.join(F.broadcast(qa), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # vectors join back AFTER the candidate cut (ids-only exchange on
    # the corpus side, query vectors broadcast) — the lsh_topk shape
    pairs = (
        pair_ids.join(cv_df, "neighbor_id")
        .join(F.broadcast(qv_df), "query_id")
    )
    sims = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qv").cast("array<double>"),
                       F.col("cv").cast("array<double>")), 5).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )
