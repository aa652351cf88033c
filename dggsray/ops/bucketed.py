"""Bucketed (clustered) tables — the pick-one-partitioning-key-and-reuse-it
primitive.

`write_bucketed` hashes a key column into `n_buckets` hive partitions
(process-stable splitmix64 / byte-fold hashing — rows land in the same
bucket across runs and machines).  Tables bucketed the same way then join
with `bucketed_join` WITHOUT any shuffle: the bucket list itself is the
Dataset, and each task reads exactly one matching pair of partition
directories and joins locally — at 100 TB a repeated join on the cluster
key touches each byte once, instead of re-hashing both sides per query.
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    from .sketch import _hash64, _hash64_ints
    if pa.types.is_integer(col.type):
        h = _hash64_ints(col.to_numpy(zero_copy_only=False).astype(np.int64))
    else:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        h = _hash64(arr)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, key: str, n_buckets: int, path: str) -> str:
    """Write `ds` hive-partitioned by hash bucket of `key`.  Idempotent via
    a _SUCCESS marker carrying the bucketing contract."""
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        with open(done) as f:
            meta = json.load(f)
        if meta["key"] != key or meta["n_buckets"] != n_buckets:
            raise ValueError(f"{path} already bucketed with {meta}")
        return path
    os.makedirs(path, exist_ok=True)

    def kernel(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(_bucket_of(b.column(key), n_buckets)))

    ds.map_batches(kernel, batch_format="pyarrow") \
        .write_parquet(path, partition_cols=["bucket"])
    with open(done, "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)
    return path


def _side_schema(path: str) -> pa.Schema:
    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(path, "bucket=*", "*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {path}")
    return pq.read_schema(files[0])


def bucketed_join(path_a: str, path_b: str, on: str, suffix_b: str = "_b"):
    """Shuffle-free inner join of two tables bucketed on the SAME key and
    bucket count: the bucket-id list is the Dataset; each task reads one
    matching partition-directory pair with pyarrow and joins locally.
    Empty pairs still emit the joined SCHEMA so downstream operators never
    see schema-less blocks."""
    import pyarrow.parquet as pq
    import ray.data as rd

    metas = []
    for p in (path_a, path_b):
        with open(os.path.join(p, "_SUCCESS")) as f:
            metas.append(json.load(f))
    if metas[0] != metas[1] or metas[0]["key"] != on:
        raise ValueError(f"bucket contracts differ or key mismatch: {metas}")
    n = metas[0]["n_buckets"]

    empty = _side_schema(path_a).empty_table().join(
        _side_schema(path_b).empty_table(), keys=on, join_type="inner",
        right_suffix=suffix_b)

    def kernel(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch.column("bucket").to_pylist():
            da = os.path.join(path_a, f"bucket={i}")
            db = os.path.join(path_b, f"bucket={i}")
            if not (os.path.isdir(da) and os.path.isdir(db)):
                continue
            ta = pq.read_table(da)
            tb = pq.read_table(db)
            if ta.num_rows and tb.num_rows:
                j = ta.join(tb, keys=on, join_type="inner",
                            right_suffix=suffix_b)
                if j.num_rows:
                    out.append(j.select(empty.column_names))
        if not out:
            return empty
        return pa.concat_tables(out, promote_options="default")

    ids = rd.from_arrow(pa.table({"bucket": pa.array(range(n), pa.int64())}))
    return ids.repartition(n).map_batches(kernel, batch_format="pyarrow")
