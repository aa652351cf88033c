"""Approximate nearest-neighbour search over an embedding column.

- brute_topk: exact blocked cosine top-k (numpy matmul per batch against a
  broadcast query matrix) — the baseline and the per-bucket kernel.
- lsh_topk: random-hyperplane LSH — sign-bit bucket keys per table, candidates
  are vectors sharing the query's bucket in any table, exact rerank among them.
  This is the scale path: the shuffle moves only (bucket, id) rows and the
  rerank touches a small candidate set.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scores_batch(emb: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """(n_batch, n_query) cosine matrix, float64."""
    num = emb @ Q.T
    den = np.linalg.norm(emb, axis=1)[:, None] * np.linalg.norm(Q, axis=1)[None, :]
    return num / np.maximum(den, 1e-300)


def brute_topk(ds, queries: np.ndarray, k: int, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Exact top-k per query vector.  Partial top-k inside every batch, final
    top-k on the (tiny) union — no full sort of the corpus."""
    import ray

    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)

    def kernel(b: pa.Table) -> pa.Table:
        Qm = ray.get(qref)
        if b.num_rows == 0:      # LSH/IVF filters upstream can empty a block
            return pa.table({"query": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "cos_micro": pa.array([], pa.int64())})
        emb = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        ids = b.column(id_col).to_numpy()
        cos = _scores_batch(emb, Qm)
        out_q, out_id, out_s = [], [], []
        kk = min(k, emb.shape[0])
        for q in range(Qm.shape[0]):
            top = np.argpartition(-cos[:, q], kk - 1)[:kk]
            out_q.append(np.full(kk, q, dtype=np.int32))
            out_id.append(ids[top].astype(np.int64))
            out_s.append(cos[top, q])
        return pa.table({
            "query": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "cos_micro": pa.array(np.rint(np.concatenate(out_s) * 1e6)
                                  .astype(np.int64))})

    partial = ds.map_batches(kernel, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        # one batch holds ALL partials (<= k rows per (query, input block)) —
        # a coalesce, not a shuffle; per-query top-k via one global sort +
        # vectorized rank-within-query (a groupby here costs a full
        # sort-shuffle round for a k*blocks-row table)
        import pyarrow.compute as pc
        idx = pc.sort_indices(g, sort_keys=[("query", "ascending"),
                                            ("cos_micro", "descending"),
                                            (id_col, "ascending")])
        g = g.take(idx)
        qcol = g.column("query").to_numpy()
        starts = np.flatnonzero(np.r_[True, qcol[1:] != qcol[:-1]])
        rank = np.arange(len(qcol)) - np.repeat(
            starts, np.diff(np.r_[starts, len(qcol)]))
        return g.filter(pa.array(rank < k))

    return partial.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 23):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_keys(emb: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, n_tables) int64 bucket keys: sign bits of the projections."""
    n_tables, n_bits, _ = planes.shape
    keys = np.empty((emb.shape[0], n_tables), dtype=np.int64)
    for t in range(n_tables):
        bits = (emb @ planes[t].T) > 0
        keys[:, t] = bits @ (1 << np.arange(n_bits, dtype=np.int64))
    return keys


def lsh_topk(ds, query: np.ndarray, k: int, id_col: str = "vec_id",
             emb_col: str = "embedding", n_bits: int = 10, n_tables: int = 6):
    """ANN top-k for one query: filter to LSH candidates (any-table bucket match
    with the query), exact rerank.  Recall depends on n_bits/n_tables; the
    filter runs inside map_batches so the corpus streams."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(q.shape[0], n_bits, n_tables)
    qkeys = _bucket_keys(q[None, :], planes)[0]
    ref = ray.put((planes, qkeys, q))

    def filter_candidates(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        pl, qk, _ = ray.get(ref)
        emb = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        keys = _bucket_keys(emb, pl)
        hit = (keys == qk[None, :]).any(axis=1)
        return b.filter(pa.array(hit))

    cand = ds.map_batches(filter_candidates, batch_format="pyarrow")
    return brute_topk(cand, q[None, :], k, id_col, emb_col)


def kmeans_centroids(X: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 41) -> np.ndarray:
    """Plain Lloyd k-means on a driver-side SAMPLE (the IVF coarse quantizer
    is always trained on a sample, not the corpus).  Deterministic seeding;
    empty clusters re-seeded from the farthest points."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, dtype=np.float64)
    C = X[rng.choice(X.shape[0], size=min(n_centroids, X.shape[0]),
                     replace=False)].copy()
    x2 = (X ** 2).sum(1)[:, None]
    for _ in range(iters):
        # GEMM distance form: no (n, k, dim) broadcast temp — the big temp
        # costs ~2 s of first-touch page warmup alone at 2000x64x64
        d2 = x2 - 2 * X @ C.T + (C ** 2).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
            else:
                C[c] = X[d2.min(axis=1).argmax()]
    return C


def ivf_assign(ds, centroids: np.ndarray, emb_col: str = "embedding"):
    """Add the IVF list id (nearest centroid) to every row — ONE streaming
    pass with the centroid matrix broadcast via ray.put.  Persisting the
    result partitioned by list_id IS the IVF index: a probe then reads only
    nprobe partitions of the corpus."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def kernel(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        emb = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        d2 = (emb ** 2).sum(1)[:, None] - 2 * emb @ C.T + (C ** 2).sum(1)[None, :]
        return b.append_column("list_id",
                               pa.array(d2.argmin(axis=1).astype(np.int32)))

    return ds.map_batches(kernel, batch_format="pyarrow")


def ivf_topk(ds, query: np.ndarray, k: int, centroids: np.ndarray,
             nprobe: int = 8, id_col: str = "vec_id",
             emb_col: str = "embedding"):
    """IVF ANN top-k: probe the nprobe lists nearest to the query, exact
    rerank within them (partial top-k per batch + tiny final merge).  With a
    list_id-partitioned parquet index the filter becomes a partition-pruned
    read; over a raw dataset it streams and recomputes assignment per batch
    (no materialized state, same result)."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2q = ((C - q[None, :]) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(d2q)[:nprobe]).astype(np.int32)
    cref = ray.put((C, probe))

    def filter_lists(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        Cm, pr = ray.get(cref)
        if "list_id" in b.column_names:
            lid = b.column("list_id").to_numpy()
        else:
            emb = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            d2 = (emb ** 2).sum(1)[:, None] - 2 * emb @ Cm.T \
                + (Cm ** 2).sum(1)[None, :]
            lid = d2.argmin(axis=1).astype(np.int32)
        return b.filter(pa.array(np.isin(lid, pr)))

    cand = ds.map_batches(filter_lists, batch_format="pyarrow")
    return brute_topk(cand, q[None, :], k, id_col, emb_col)


def build_ivf_index(ds, centroids: np.ndarray, out_dir: str,
                    emb_col: str = "embedding") -> str:
    """Persist the IVF index: one ivf_assign pass, hive-partitioned parquet by
    list_id.  This is the multi-query scale path — the one-off index build
    streams the corpus ONCE, and every later probe reads only its nprobe
    partition directories instead of rescanning everything (at 100 TB a probe
    touches nprobe/n_lists of the bytes).  Idempotent via a _SUCCESS marker."""
    import os

    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ivf_assign(ds, centroids, emb_col).write_parquet(
        out_dir, partition_cols=["list_id"])
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def ivf_topk_indexed(index_dir: str, query: np.ndarray, k: int,
                     centroids: np.ndarray, nprobe: int = 8,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Top-k for one query from a persisted IVF index: partition-pruned read
    of ONLY the nprobe nearest list directories, exact rerank (brute_topk).
    Same results as ivf_topk over the raw dataset with the same quantizer —
    minus the full-corpus scan."""
    import glob
    import os

    import ray.data as rd

    q = np.asarray(query, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    probe = np.argsort(((C - q[None, :]) ** 2).sum(axis=1))[:nprobe]
    files = [f for p in probe
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"list_id={p}", "*.parquet")))]
    if not files:
        return rd.from_arrow(pa.table({
            "query": pa.array([], pa.int32()),
            id_col: pa.array([], pa.int64()),
            "cos_micro": pa.array([], pa.int64())}))
    from .joins import PLAN_LOCK
    with PLAN_LOCK:
        cand = rd.read_parquet(files, columns=[id_col, emb_col])
    return brute_topk(cand, q[None, :], k, id_col, emb_col)


def quantize_embeddings(ds, emb_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Symmetric per-vector int8 quantization — the ANN storage-scale path
    (4x smaller than float32, 8x than float64; at 100 TB the embedding
    column IS the storage bill).  code = round(x / scale) with
    scale = max|x| / 127, so reconstruction error is bounded by scale/2 per
    component.  Codes ride as fixed-width binary (dim bytes); scale as
    float64.  Pure streaming map_batches — no shuffle, no driver state."""
    def kernel(b: pa.Table) -> pa.Table:
        M = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        scale = np.abs(M).max(axis=1) / 127.0
        scale = np.where(scale == 0, 1.0, scale)
        codes = np.clip(np.rint(M / scale[:, None]), -127, 127) \
            .astype(np.int8)
        return pa.table({
            id_col: b.column(id_col),
            "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
            "scale": pa.array(scale),
            "dim": pa.array(np.full(len(scale), M.shape[1], dtype=np.int32))})

    return ds.map_batches(kernel, batch_format="pyarrow")


def dequantize_batch(b: pa.Table, emb_col: str = "embedding") -> pa.Table:
    """Inverse of quantize_embeddings for a batch: codes*scale back to a
    float64 list column (used to run the exact rerank kernels unchanged
    over a quantized index)."""
    scale = b.column("scale").to_numpy()
    dim = int(b.column("dim")[0].as_py()) if b.num_rows else 0
    blob = b"".join(b.column("codes").to_pylist())
    M = np.frombuffer(blob, dtype=np.int8).astype(np.float64) \
        .reshape(-1, dim) * scale[:, None]
    keep = [n for n in b.column_names if n not in ("codes", "scale", "dim")]
    out = b.select(keep)
    return out.append_column(emb_col, pa.array(list(M),
                                               pa.list_(pa.float64())))


def kmeans_fit_distributed(ds, n_centroids: int, iters: int = 5,
                           emb_col: str = "embedding", seed: int = 41):
    """Distributed Lloyd's k-means over the FULL corpus — the iterative-
    algorithm pattern: each round is one streaming pass where every block
    assigns its vectors to the broadcast centroids (GEMM distance form) and
    emits k partial rows (per-centroid vector sum + count); the driver sums
    the k x blocks partials, updates centroids, and re-broadcasts.  Shuffle
    per round = k rows per block regardless of corpus size; empty clusters
    re-seed deterministically from the previous centroid.  Init = driver
    sample through kmeans_centroids (same seed convention as the IVF
    quantizer).  Returns (centroids, per-centroid counts, total inertia)."""
    import ray

    sample = ds.limit(2048).to_pandas()
    X0 = np.stack(sample[emb_col].to_numpy())
    C = kmeans_centroids(X0, n_centroids, seed=seed)
    k, dim = C.shape

    for _ in range(iters):
        c_ref = ray.put(C)

        def kernel(b: pa.Table) -> pa.Table:
            Cb = ray.get(c_ref)
            X = np.stack(b.column(emb_col).to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            d2 = (X ** 2).sum(1)[:, None] - 2 * X @ Cb.T \
                + (Cb ** 2).sum(1)[None, :]
            a = d2.argmin(axis=1)
            sums = np.zeros((Cb.shape[0], X.shape[1]))
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=Cb.shape[0]).astype(np.int64)
            inertia = float(d2[np.arange(X.shape[0]), a].sum())
            return pa.table({
                "cid": pa.array(np.arange(Cb.shape[0], dtype=np.int64)),
                "vsum": pa.array([r.tobytes() for r in sums],
                                 pa.large_binary()),
                "cnt": pa.array(cnt),
                "inertia": pa.array(
                    np.r_[inertia, np.zeros(Cb.shape[0] - 1)])})

        sums = np.zeros((k, dim))
        cnt = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for bt in ds.map_batches(kernel, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            for i, (blob, c, q) in enumerate(zip(
                    bt.column("vsum").to_pylist(),
                    bt.column("cnt").to_pylist(),
                    bt.column("inertia").to_pylist())):
                sums[bt.column("cid")[i].as_py()] += \
                    np.frombuffer(blob, np.float64)
                cnt[bt.column("cid")[i].as_py()] += c
                inertia += q
        live = cnt > 0
        C = np.where(live[:, None], sums / np.maximum(cnt, 1)[:, None], C)
    return C, cnt, inertia
