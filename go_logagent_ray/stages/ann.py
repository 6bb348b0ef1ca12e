"""Similarity search over an embedding column (list<float>).

Not in the reference; first-class for training-data pipelines. Two paths:

- ``cosine_topk``: exact brute force — the query matrix is tiny and
  BROADCAST (rides the actor state, sent once per actor, never per
  batch); each batch does one numpy matmul and emits only its local
  top-k candidates per query, so the shuffle moves ≤ k·Q rows per batch,
  not the corpus. A final per-query reduce keeps the global top-k.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets both
  corpus and queries; candidates are scored only within matching buckets
  (multi-probe via sign-flip neighbors). Approximate; recall measured in
  tests against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined


def _fixed_matrix(col: pa.Array | pa.ChunkedArray, dim: int | None = None,
                  dtype=np.float32) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.FixedSizeListArray):
        d = arr.type.list_size
        return np.asarray(arr.values, dtype=dtype).reshape(len(arr), d)
    # variable list<float>: all rows must share the dim
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if len(arr) == 0:
        return np.zeros((0, dim or 0), dtype=dtype)
    d = int(lens[0]) if dim is None else dim
    if not (lens == d).all():
        raise ValueError("embedding column has inconsistent dimensions")
    vals = np.asarray(arr.values, dtype=dtype)
    start = offs[0]
    return vals[start : start + len(arr) * d].reshape(len(arr), d)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BatchTopK:
    """Actor: holds the normalized query matrix; emits local top-k.

    ``dtype`` defaults to float64 so the similarity ordering is computed
    at the same precision as the DuckDB oracle (float32 can flip the
    order of two near-equal sims — a latent rank flake); pass float32 as
    the documented memory-saving option at scale."""

    def __init__(self, queries_ref, k: int, id_field: str, vec_field: str,
                 exclude_self: bool, dtype=np.float64):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.asarray(q["ids"])
        self.qmat = _normalize(np.asarray(q["mat"], dtype=dtype))
        self.k = k
        self.id_field = id_field
        self.vec_field = vec_field
        self.exclude_self = exclude_self
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        ids = as_combined(batch[self.id_field]).to_numpy(zero_copy_only=False)
        mat = _normalize(_fixed_matrix(batch[self.vec_field], dtype=self.dtype))
        sims = mat @ self.qmat.T  # (batch, Q)
        if self.exclude_self:
            self_mask = ids[:, None] == self.qids[None, :]
            sims = np.where(self_mask, -np.inf, sims)
        k = min(self.k, sims.shape[0])
        # per-query (sim DESC, vec_id ASC) — the vec_id tie-break matters:
        # equal-sim candidates at the k boundary would otherwise be kept
        # or dropped by unstable partition order, breaking exactness vs
        # the SQL oracle's deterministic rank
        top = np.stack([np.lexsort((ids, -sims[:, q]))[:k]
                        for q in range(sims.shape[1])], axis=1)  # (k, Q)
        out_q = np.repeat(self.qids[None, :], k, axis=0).reshape(-1)
        out_v = ids[top].reshape(-1)
        out_s = np.take_along_axis(sims, top, axis=0).reshape(-1)
        keep = np.isfinite(out_s)
        return pa.table({
            "query_id": pa.array(out_q[keep]),
            "vec_id": pa.array(out_v[keep]),
            "sim": pa.array(out_s[keep].astype(np.float64)),
        })


def cosine_topk(
    ds: Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    exclude_self: bool = True,
    dtype=np.float64,
) -> Dataset:
    """Exact cosine top-k per query. Result: (query_id, vec_id, sim, rank).

    Scale: queries broadcast via ``ray.put`` once; per-batch matmul emits
    ≤ k rows per query per batch; the only shuffle is the per-query
    top-k reduce over those candidates. ``dtype=np.float32`` halves the
    matmul footprint when oracle-exact rank ordering is not required.
    """
    import ray

    ref = ray.put({"ids": np.asarray(query_ids), "mat": np.asarray(query_mat)})
    candidates = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, id_field=id_field,
                                   vec_field=vec_field, exclude_self=exclude_self,
                                   dtype=dtype),
        batch_format="pyarrow", concurrency=2,
    )

    # Top-k per query is a MERGEABLE reduction: prune per bundle, then one
    # exact final pass over a single coalesced block (no shuffle — Ray's
    # groupby shuffle costs ~10s fixed; the candidate set is ≤ k·Q·blocks
    # and the bundle-level prune caps it at k·Q).
    def local_prune(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (df.sort_values(["sim", "vec_id"], ascending=[False, True])
                  .groupby("query_id", sort=False).head(k))

    def final_rank(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = (df.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", sort=False).head(k))
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    pruned = candidates.repartition(16).map_batches(
        local_prune, batch_format="pyarrow", batch_size=None)
    return pruned.repartition(1).materialize().map_batches(
        final_rank, batch_format="pyarrow", batch_size=None)


def load_queries(path: str, n_queries: int, id_field: str = "vec_id",
                 vec_field: str = "embedding"):
    """First n rows of an embeddings parquet as the broadcast query set.

    Streams record batches and stops after n rows — never materializes
    the whole table on the driver."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    batches = []
    got = 0
    for b in pf.iter_batches(batch_size=max(n_queries, 1024),
                             columns=[id_field, vec_field]):
        batches.append(b)
        got += b.num_rows
        if got >= n_queries:
            break
    t = pa.Table.from_batches(batches).slice(0, n_queries)
    ids = t[id_field].to_numpy()
    mat = _fixed_matrix(t[vec_field])
    return ids, mat


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 13) -> np.ndarray:
    """Tiny deterministic k-means (cosine space: normalized centroids)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    centroids = _normalize(centroids)
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class _IvfAssigner:
    """Adds the nearest-centroid list id (centroids broadcast via state)."""

    def __init__(self, centroids_ref, vec_field: str):
        import ray

        self.centroids = ray.get(centroids_ref)
        self.vec_field = vec_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], type=pa.int64()))
        mat = _normalize(_fixed_matrix(batch[self.vec_field]))
        lists = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lists))


def ivf_topk(
    ds: Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: np.ndarray | None = None,
    train_limit: int = 4096,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    seed: int = 13,
) -> Dataset:
    """IVF approximate top-k: k-means coarse quantizer → inverted lists →
    score only the ``nprobe`` lists nearest each query.

    Scale shape: centroids train on a driver-side SAMPLE (tiny), broadcast
    once; assignment is one matmul per batch; the per-list grouping is the
    only shuffle and each group is ~corpus/n_lists. Same output schema as
    cosine_topk; recall vs exact measured in tests (rises with nprobe;
    ``nprobe == n_lists`` scans every list and is EXACT). When
    ``train_sample`` is omitted, a deterministic corpus prefix (first
    ``train_limit`` rows) trains the quantizer — never the query matrix,
    whose tiny size would silently collapse recall.
    """
    import ray

    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    if train_sample is None:
        head = ds.limit(train_limit).take_all()
        if not head:
            raise ValueError("ivf_topk: empty corpus, nothing to train on")
        train_sample = np.asarray([r[vec_field] for r in head], dtype=np.float32)
    centroids = _kmeans(_normalize(np.asarray(train_sample, dtype=np.float32)),
                        min(n_lists, len(train_sample)), seed=seed)
    cref = ray.put(centroids)

    q_probe = np.argsort(-(qmat @ centroids.T.astype(np.float64)), axis=1)[:, :nprobe]
    probes: dict[int, list[int]] = {}
    for qi, lists in enumerate(q_probe):
        for li in lists:
            probes.setdefault(int(li), []).append(qi)
    qids = np.asarray(query_ids)

    assigned = ds.map_batches(
        _IvfAssigner, fn_constructor_kwargs=dict(centroids_ref=cref,
                                                 vec_field=vec_field),
        batch_format="pyarrow", concurrency=2,
    )

    def score_list(group: pd.DataFrame) -> pd.DataFrame:
        li = int(group["ivf_list"].iloc[0])
        q_idx = probes.get(li)
        if not q_idx:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        ids = group[id_field].to_numpy()
        # float64 scoring: sims ordering must match the float64 SQL oracle
        mat = _normalize(np.stack(group[vec_field].to_numpy()).astype(np.float64))
        sims = mat @ qmat[q_idx].T
        rows_q, rows_v, rows_s = [], [], []
        for ci, qi in enumerate(q_idx):
            s = sims[:, ci]
            idx = np.nonzero(ids != qids[qi])[0]
            # (sim DESC, vec_id ASC) with explicit tie-break (see _BatchTopK)
            top = idx[np.lexsort((ids[idx], -s[idx]))[:k]]
            rows_q.extend([qids[qi]] * len(top))
            rows_v.extend(ids[top])
            rows_s.extend(s[top].astype(np.float64))
        return pd.DataFrame({"query_id": rows_q, "vec_id": rows_v, "sim": rows_s})

    candidates = assigned.groupby("ivf_list").map_groups(
        score_list, batch_format="pandas")

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id") \
            .sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(
        reduce_topk, batch_format="pandas")


class _LshBucketer:
    """Random-hyperplane signs → bucket id (deterministic seed per pool)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11,
                 id_field: str = "vec_id", vec_field: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.id_field = id_field
        self.vec_field = vec_field

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs.astype(np.uint32) @ (1 << np.arange(signs.shape[1], dtype=np.uint32))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], type=pa.int64()))
        mat = _normalize(_fixed_matrix(batch[self.vec_field]))
        b = self.bucket_of(mat)
        return batch.append_column("bucket", pa.array(b))


def lsh_topk(
    ds: Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    dim: int,
    n_planes: int = 8,
    multiprobe: int = 1,
    probe_all: bool = False,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    seed: int = 11,
) -> Dataset:
    """Approximate cosine top-k: score only within the query's LSH bucket
    (plus ``multiprobe`` single-bit-flip neighbor buckets). Same output
    schema as cosine_topk; recall vs exact measured in tests.

    ``probe_all=True`` probes every 2^n_planes bucket, which makes the
    result EXACT (every corpus vector scored exactly once) — the
    verification mode used to check the bucketed machinery end-to-end
    against a SQL oracle; approximate settings are recall-tested in
    pytest."""
    bucketer = _LshBucketer(dim, n_planes, seed, id_field, vec_field)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    qb = bucketer.bucket_of(qmat.astype(np.float32))
    probes: dict[int, list[int]] = {}
    if probe_all:
        all_q = list(range(len(qb)))
        probes = {bb: all_q for bb in range(1 << n_planes)}
    else:
        # multiprobe: original bucket + single-bit-flip neighbors
        for qi, b in enumerate(qb):
            bl = [int(b)] + [int(b) ^ (1 << f) for f in range(n_planes)][: max(0, multiprobe)]
            for bb in bl:
                probes.setdefault(bb, []).append(qi)

    qids = np.asarray(query_ids)

    bucketed = ds.map_batches(
        _LshBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed,
                                   id_field=id_field, vec_field=vec_field),
        batch_format="pyarrow", concurrency=2,
    )

    def score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        q_idx = probes.get(b)
        if not q_idx:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        ids = group[id_field].to_numpy()
        # float64 scoring: ordering must match the float64 SQL oracle
        mat = _normalize(np.stack(group[vec_field].to_numpy()).astype(np.float64))
        sub_q = qmat[q_idx]
        sims = mat @ sub_q.T
        rows_q, rows_v, rows_s = [], [], []
        for ci, qi in enumerate(q_idx):
            s = sims[:, ci]
            mask = ids != qids[qi]
            idx = np.nonzero(mask)[0]
            # (sim DESC, vec_id ASC) with explicit tie-break (see _BatchTopK)
            top = idx[np.lexsort((ids[idx], -s[idx]))[:k]]
            rows_q.extend([qids[qi]] * len(top))
            rows_v.extend(ids[top])
            rows_s.extend(s[top].astype(np.float64))
        return pd.DataFrame({"query_id": rows_q, "vec_id": rows_v, "sim": rows_s})

    candidates = bucketed.groupby("bucket").map_groups(
        score_bucket, batch_format="pandas"
    )

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id") \
            .sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(
        reduce_topk, batch_format="pandas"
    )


# ----------------------------------------------------- int8 quantization


def quantize_embeddings_int8(ds: Dataset, *, vec_col: str = "embedding",
                             id_col: str = "vec_id") -> Dataset:
    """Symmetric per-vector int8 quantization — the memory-scale path
    for ANN (a 100 TB float32 embedding store shrinks 4× and the
    distance kernels stay SIMD-friendly): q_i = round(v_i · 127 / s)
    with s = max|v_i| (zero vectors quantize to zeros).

    Rounding is half-AWAY-from-zero (sign·floor(|x|+0.5)) to match SQL
    ROUND, and the scale math runs the same op order in float64 on both
    sides, so the integers compare bit-exact.  Output per vector is the
    compact integer summary (sum, |sum|, min, max) — any per-element
    quantization difference shifts at least one of them.

    Pure per-batch map over a zero-copy flattened matrix; no shuffle.
    """

    def quant(batch: pa.Table) -> pa.Table:
        m = _fixed_matrix(batch.column(vec_col), dtype=np.float64)
        s = np.abs(m).max(axis=1)
        safe = np.where(s == 0, 1.0, s)
        x = m * 127.0 / safe[:, None]
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        q[s == 0] = 0
        return pa.table({
            id_col: batch.column(id_col),
            "qsum": pa.array(q.sum(axis=1), pa.int64()),
            "ql1": pa.array(np.abs(q).sum(axis=1), pa.int64()),
            "qmin": pa.array(q.min(axis=1), pa.int64()),
            "qmax": pa.array(q.max(axis=1), pa.int64()),
        })

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)
