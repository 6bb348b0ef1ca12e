"""Distributed k-means (Lloyd's algorithm) over an embedding column —
semantic clustering for corpus curation (topic bucketing, semantic
dedup, stratified mixture design).

Scale shape (the textbook distributed Lloyd):
- Centroids (k × d floats) are tiny and BROADCAST via ``ray.put`` each
  iteration; the corpus never moves.
- Each iteration is ONE ``map_batches`` pass emitting per-batch partial
  (cluster, count, per-dimension sums) rows — k rows of d+2 numbers per
  batch — so the driver-side reduce handles O(k·d·num_blocks) floats,
  never vectors.  No shuffle at all; the only all-to-all is the final
  assignment output, which is (vec_id, cluster) ints.
- Assignment math is vectorized float64 numpy ((x-c)² summed over d);
  argmin breaks ties toward the smaller centroid id.

Determinism for verification: after each averaging step the centroids
are ROUNDED to 6 decimals.  Distributed partial sums and SQL's AVG
accumulate in different orders and can differ in the last ulp; rounding
collapses that drift so the SQL oracle (generated, unrolled one CTE per
iteration from the SAME constants — see ``kmeans_oracle_sql``) sees
bit-identical centroids.  A true tie on a rounding boundary or a point
equidistant to two centroids within one ulp could still flip — measure
zero on real-valued embeddings, and the planted-cluster pytest plus the
driver hash gate would catch it.

Init: the embeddings of the k smallest vec_ids (deterministic, no RNG).
Empty clusters keep their previous centroid on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_ROUND = 6


def _init_centroids(ds: Dataset, k: int, vec_col: str,
                    id_col: str) -> np.ndarray:
    """Embeddings of the k smallest ids (ids need not be dense)."""

    def low(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) <= k:
            return batch
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(order)))

    rows = ds.map_batches(low, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:k]
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(rows)}")
    return np.array([np.asarray(r[vec_col], dtype=np.float64)
                     for r in rows])


def _assign_ids(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # (n, k) squared distances; argmin ties -> lowest centroid id
    diff = vecs[:, None, :] - cents[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    return np.argmin(d2, axis=1)


def kmeans_fit(ds: Dataset, *, k: int = KMEANS_K,
               iters: int = KMEANS_ITERS,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Run ``iters`` Lloyd iterations from the deterministic init and
    return the final (k, d) float64 centroid matrix (rounded to
    KMEANS_ROUND decimals — see module docstring)."""
    cents = np.round(_init_centroids(ds, k, vec_col, id_col),
                     KMEANS_ROUND)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            from .ann import _fixed_matrix

            c = ray.get(_ref)
            vecs = _fixed_matrix(batch.column(vec_col), dtype=np.float64)
            a = _assign_ids(vecs, c)
            kk, d = c.shape
            sums = np.zeros((kk, d))
            np.add.at(sums, a, vecs)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "cnt": pa.array(counts),
                "sums": pa.array(list(sums),
                                 pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partial,
                               batch_format="pyarrow").take_all()
        kk, d = cents.shape
        sums = np.zeros((kk, d))
        counts = np.zeros(kk, dtype=np.int64)
        for p in parts:
            sums[p["cluster"]] += np.asarray(p["sums"])
            counts[p["cluster"]] += p["cnt"]
        new = cents.copy()          # empty cluster keeps old centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = np.round(new, KMEANS_ROUND)
    return cents


def kmeans_fit_predict(ds: Dataset, *, k: int = KMEANS_K,
                       iters: int = KMEANS_ITERS,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> Dataset:
    """Fit (``kmeans_fit``) then return the final (vec_id, cluster)
    assignment as a Dataset."""
    cents = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col,
                       id_col=id_col)
    ref = ray.put(cents)

    def assign(batch: pa.Table, _ref=ref) -> pa.Table:
        from .ann import _fixed_matrix

        c = ray.get(_ref)
        vecs = _fixed_matrix(batch.column(vec_col), dtype=np.float64)
        a = _assign_ids(vecs, c)
        return pa.table({id_col: batch.column(id_col),
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_oracle_sql(*, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                      table: str = "embeddings",
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> str:
    """DuckDB SQL replaying the identical quantized Lloyd iterations —
    generated from the same (k, iters, rounding) constants so the two
    sides cannot drift.  One assignment CTE + one centroid CTE per
    iteration; final SELECT is the last assignment."""
    sql = [f"""
WITH emb AS (
  SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
), c0 AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cid,
         list_transform(v, x -> ROUND(x, 6)) AS cvec
  FROM (SELECT {id_col}, v FROM emb ORDER BY {id_col} LIMIT {k})
)"""]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        sql.append(f""", a{i} AS (
  SELECT {id_col}, v, cid AS cluster FROM (
    SELECT e.{id_col}, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY list_distance(e.v, c.cvec), c.cid) AS rn
    FROM emb e CROSS JOIN {prev} c) WHERE rn = 1
), c{i} AS (
  SELECT cluster AS cid, list(ROUND(m, 6) ORDER BY dim) AS cvec FROM (
    SELECT cluster, dim, AVG(x) AS m FROM (
      SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim
      FROM a{i})
    GROUP BY cluster, dim)
  GROUP BY cluster
  UNION ALL
  SELECT cid, cvec FROM {prev}
  WHERE cid NOT IN (SELECT DISTINCT cluster FROM a{i})
)""")
    sql.append(f"""
SELECT {id_col}, CAST(cid AS BIGINT) AS cluster FROM (
  SELECT e.{id_col}, c.cid,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY list_distance(e.v, c.cvec), c.cid) AS rn
  FROM emb e CROSS JOIN c{iters} c)
WHERE rn = 1""")
    return "".join(sql)
