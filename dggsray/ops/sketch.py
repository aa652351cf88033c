"""Mergeable sketches for corpus-scale statistics.

Operators a 100 TB pipeline needs where exact state would not fit:

- `hll_distinct` — HyperLogLog distinct counting.  Every block reduces to a
  fixed 2^p-byte register array (16 KiB at p=14, standard error
  1.04/sqrt(2^p) ~ 0.8%); registers merge by elementwise max, so the
  shuffle moves one blob per block regardless of input size.
- `heavy_hitters` / candidate machinery — EXACT frequency-threshold items
  in two bounded passes, built on the local-heavy-hitters lemma: if
  count(t) >= phi * N_total then, by averaging, count_b(t) >= phi * N_b in
  at least one block b.  Pass 1 keeps each block's locally phi-heavy items
  (at most 1/phi per block — bounded state, no vocabulary shuffle); pass 2
  exactly recounts ONLY those candidates (broadcast set, per-block partial
  counts) and applies the global threshold.  The result is provably exact
  — a sketch for the scan, SQL semantics for the answer.
- `quantile_sketch` — mergeable weighted quantile summary (Munro-Paterson /
  MRL rank subsampling): <= k weighted points per block, re-compacting
  merge, end-to-end rank error O(N/k).

Everything is integer-exact (thresholds in parts-per-million) so a DuckDB
oracle can reproduce the output bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hll_registers_batch", "hll_merge", "hll_estimate",
           "hll_distinct", "heavy_hitters", "qsketch_batch", "qsketch_merge",
           "qsketch_quantile", "quantile_sketch"]


# ---------------------------------------------------------------- HyperLogLog

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash64(values: pa.Array) -> np.ndarray:
    """Vectorized 64-bit mix of arbitrary values: Arrow string cast then a
    per-byte FNV-1a fold done column-wise over fixed-width chunks (process-
    stable, unlike Python hash())."""
    s = pc.cast(values, pa.large_string())
    arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    arr = pc.fill_null(arr, "")
    n = len(arr)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    # zero-copy over the Arrow buffers: offsets give each row's byte span,
    # one gather builds the (rows x maxlen) byte matrix with no row loop
    off = np.frombuffer(arr.buffers()[1], np.int64, count=n + 1,
                        offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off)
    maxlen = int(lens.max(initial=0))
    if maxlen:
        pos = off[:-1, None] + np.arange(maxlen)
        live = pos < off[1:, None]
        mat = data[np.minimum(pos, data.size - 1)] * live
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                col = mat[:, j].astype(np.uint64)
                lv = live[:, j]
                out[lv] = (out[lv] ^ col[lv]) * _FNV_PRIME
    # FNV diffuses tail-byte differences into low bits only; the register
    # index needs the TOP bits, so finish with an avalanche mix
    return _hash64_ints(out.astype(np.int64))


def _hash64_ints(values: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64 keys — fully vectorized."""
    x = values.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def hll_registers_batch(values, p: int = 14) -> np.ndarray:
    """One batch -> HLL register array (uint8[2^p]).  Integer inputs hash
    with splitmix64; everything else through the byte fold."""
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        h = _hash64_ints(values)
    elif isinstance(values, (pa.Array, pa.ChunkedArray)) and \
            pa.types.is_integer(values.type):
        h = _hash64_ints(values.to_numpy(zero_copy_only=False))
    else:
        h = _hash64(values if isinstance(values, (pa.Array, pa.ChunkedArray))
                    else pa.array(values))
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    nz = rest != 0
    lz = np.full(h.shape, 64 - p, dtype=np.uint8)
    if nz.any():
        # log2 via float is exact for the leading-bit position
        top = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        lz[nz] = (63 - top).astype(np.uint8)
    rank = np.minimum(lz + 1, 64 - p).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected estimate with the standard small-range linear-counting
    switch (Flajolet et al. 2007)."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-block registers
    (one 2^p blob per block leaves each task), max-merged on the driver."""
    def kernel(b: pa.Table) -> pa.Table:
        regs = hll_registers_batch(b.column(col), p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.large_binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for bt in ds.map_batches(kernel, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in bt.column("regs").to_pylist():
            merged = hll_merge(merged, np.frombuffer(blob, np.uint8))
    return hll_estimate(merged)


# ------------------------------------------------------- exact heavy hitters

def heavy_hitters(ds, list_col_kernel, phi_ppm: int,
                  token_col: str = "token",
                  broadcast_limit: int = 2_000_000):
    """All items with corpus frequency >= phi_ppm/1e6 of total items — EXACT.

    `list_col_kernel(batch) -> pa.Table[(token)]` flattens a batch into one
    row per item occurrence (the caller owns tokenization).  Pass 1 counts
    per block and keeps items with count_b * 1e6 >= phi_ppm * N_b — by the
    averaging lemma a superset of every globally phi-heavy item, at most
    1e6/phi_ppm rows per block.  Pass 2 broadcasts the candidate set,
    recounts ONLY candidates per block, sums with sized_groupby and applies
    the exact global threshold (integer arithmetic end-to-end).

    Returns a typed Arrow table (token, n, n_total) — the result is
    small by construction (<= 1e6/phi_ppm rows), and a typed collect keeps
    the schema even when no token clears the bar; n_total is repeated so
    the threshold is auditable in the output."""
    import ray
    from ray.data.aggregate import Sum

    from .joins import sized_groupby

    def block_counts(b: pa.Table) -> pa.Table:
        t = list_col_kernel(b)
        vc = t.column(token_col).value_counts()
        return pa.table({token_col: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = ds.map_batches(block_counts, batch_format="pyarrow")

    def local_heavy(b: pa.Table) -> pa.Table:
        """Block summary: one null-token row carrying the block's item total
        (so N_total needs no extra pass), then the locally phi-heavy items."""
        n_b = int(pc.sum(b.column("n")).as_py() or 0)
        keep = pc.greater_equal(
            pc.multiply(b.column("n"), pa.scalar(1_000_000, pa.int64())),
            pa.scalar(phi_ppm * n_b, pa.int64()))
        toks = b.filter(keep).column(token_col)
        return pa.table({
            token_col: pa.concat_arrays(
                [pa.array([None], toks.type),
                 toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                 else toks]),
            "_n_b": pa.array([n_b] + [0] * len(toks), pa.int64())})

    summ = [bt for bt in counts.map_batches(local_heavy,
                                            batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
            if bt.num_rows]
    summ_tbl = pa.concat_tables(summ) if summ else None
    n_total = int(pc.sum(summ_tbl.column("_n_b")).as_py() or 0) \
        if summ_tbl is not None else 0
    cand = pc.unique(pc.drop_null(summ_tbl.column(token_col))) \
        if summ_tbl is not None else pa.array([], pa.string())
    out_schema = pa.schema([(token_col, pa.string()), ("n", pa.int64()),
                            ("n_total", pa.int64())])
    if len(cand) == 0:
        return out_schema.empty_table()
    if len(cand) <= broadcast_limit:
        cand_ref = ray.put(cand)

        def cand_counts(b: pa.Table) -> pa.Table:
            keep = pc.is_in(b.column(token_col),
                            value_set=ray.get(cand_ref))
            return b.filter(keep)

        survivors = counts.map_batches(cand_counts, batch_format="pyarrow")
    else:
        # tiny phi at petabyte scale can push the candidate union past
        # broadcast size: fall back to a key-hash semi join
        import ray.data as rd

        from .joins import hash_join, join_partitions
        cand_ds = rd.from_arrow(pa.table({token_col: cand}))
        survivors = hash_join(counts, cand_ds, on=token_col,
                              num_partitions=join_partitions())
    exact = sized_groupby(survivors, token_col, Sum("n", alias_name="n"))

    thr = phi_ppm * n_total

    def final(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply(b.column("n"), pa.scalar(1_000_000, pa.int64())),
            pa.scalar(thr, pa.int64()))
        b = b.filter(keep)
        return pa.table({token_col: b.column(token_col),
                         "n": b.column("n"),
                         "n_total": pa.array([n_total] * b.num_rows,
                                             pa.int64())})

    from .dedup import collect_typed
    return collect_typed(exact.map_batches(final, batch_format="pyarrow"),
                         out_schema)


# ----------------------------------------------------- quantile sketch (MRL)

def qsketch_batch(values: np.ndarray, k: int = 4096):
    """One block -> weighted quantile summary (points, weights), <= k points.
    Equal-weight rank subsampling (the Munro-Paterson / MRL compaction
    primitive): the sorted block is sampled at ranks (i+0.5)*n/k, each kept
    point standing for n/k originals.  Rank error of one compaction is
    <= n/(2k); summaries from different blocks merge by weighted
    re-compaction, so the end-to-end rank error is O(N/k) — choose k for
    the rank resolution, independent of stream length."""
    v = np.sort(values[~np.isnan(values)].astype(np.float64))
    n = v.size
    if n <= k:
        return v, np.ones(n, dtype=np.float64)
    ranks = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
    return v[np.minimum(ranks, n - 1)], np.full(k, n / k)


def qsketch_merge(a, b, k: int = 4096):
    """Merge two (points, weights) summaries, re-compacting above k points."""
    pts = np.concatenate([a[0], b[0]])
    wts = np.concatenate([a[1], b[1]])
    order = np.argsort(pts, kind="stable")
    pts, wts = pts[order], wts[order]
    if pts.size <= k:
        return pts, wts
    cum = np.cumsum(wts)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) * total / k
    idx = np.searchsorted(cum, targets, side="left")
    return pts[np.minimum(idx, pts.size - 1)], np.full(k, total / k)


def qsketch_quantile(sk, q: float) -> float:
    """Weighted order statistic at quantile q in [0, 1]."""
    pts, wts = sk
    if pts.size == 0:
        return float("nan")
    cum = np.cumsum(wts)
    target = q * cum[-1]
    return float(pts[np.minimum(np.searchsorted(cum, target, side="left"),
                                pts.size - 1)])


def quantile_sketch(ds, col: str, k: int = 4096):
    """Mergeable quantile summary of a Dataset column: one <= k-point
    weighted blob per block leaves each task, merged on the driver.
    Returns the (points, weights) summary — ask it any quantile after."""
    def kernel(b: pa.Table) -> pa.Table:
        pts, wts = qsketch_batch(
            b.column(col).to_numpy(zero_copy_only=False), k)
        return pa.table({"pts": pa.array([pts.tobytes()], pa.large_binary()),
                         "wts": pa.array([wts.tobytes()],
                                         pa.large_binary())})

    sk = (np.zeros(0, np.float64), np.zeros(0, np.float64))
    for bt in ds.map_batches(kernel, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for pb, wb in zip(bt.column("pts").to_pylist(),
                          bt.column("wts").to_pylist()):
            sk = qsketch_merge(sk, (np.frombuffer(pb, np.float64),
                                    np.frombuffer(wb, np.float64)), k)
    return sk


def hll_distinct_grouped(ds, col: str, group_col: str, p: int = 14):
    """Approximate COUNT(DISTINCT col) PER GROUP, register fold included in
    the dataset plan: blocks emit one (group, registers) blob per group they
    contain, a grouped map folds blobs with elementwise max — so the driver
    receives one 2^p blob per GROUP (not per block x group, which at ~1e5
    blocks would be gigabytes).  Returns a typed Arrow table
    (group, n_distinct_hll)."""
    def kernel(b: pa.Table) -> pa.Table:
        groups, blobs = [], []
        gcol = b.column(group_col)
        for g in pc.unique(gcol).to_pylist():
            sub = b.filter(pc.equal(gcol, g))
            regs = hll_registers_batch(sub.column(col), p)
            groups.append(g)
            blobs.append(regs.tobytes())
        return pa.table({group_col: pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.large_binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in t.column("regs").to_pylist():
            acc = hll_merge(acc, np.frombuffer(blob, np.uint8))
        return pa.table({group_col: t.column(group_col).slice(0, 1),
                         "n_distinct_hll": pa.array(
                             [int(round(hll_estimate(acc)))], pa.int64())})

    out = ds.map_batches(kernel, batch_format="pyarrow") \
        .groupby(group_col).map_groups(fold, batch_format="pyarrow")
    from .dedup import collect_typed
    return collect_typed(out, pa.schema([(group_col, pa.string()),
                                         ("n_distinct_hll", pa.int64())]))
