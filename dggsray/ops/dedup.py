"""Deduplication operators for large-scale text/embedding corpora — first-class
engine components alongside the DGGS ops (the training-data operator set).

All shingle/minhash/simhash kernels are vectorized numpy over byte arrays; the
LSH stages are classic shingle -> minhash -> band -> bucket groupby pipelines so
the only shuffles are small (band_hash, doc_id) tables, never the documents.

Determinism: shingles are direct base-256 byte encodings and permutations are
fixed (a_i h + b_i) mod p with seeded constants — no Python hash() anywhere, so
retries and cross-run comparisons are stable.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .joins import join_partitions

_P = (1 << 61) - 1  # Mersenne prime for the permutation universe


def collect_typed(ds, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL result Dataset into one typed Arrow table.  Ray Data
    drops empty blocks, so a zero-match run yields a schema-less Dataset whose
    to_pandas() has no columns — breaking column-wise compares downstream.
    Only for results that are small by construction (near-dup pair lists,
    top-k, scalars); the scale paths keep returning Datasets."""
    tabs = [b.select(schema.names) for b in
            ds.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows]
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs).cast(schema)


def _shingle_hashes(text: bytes, k: int) -> np.ndarray:
    """Distinct k-byte shingles of a doc as uint64 (direct base-256 encode)."""
    b = np.frombuffer(text, dtype=np.uint8)
    if b.size < k:
        return np.zeros(1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = (np.uint64(256) ** np.arange(k, dtype=np.uint64))
    return np.unique(win @ mult)


def _word_shingle_hashes(text: bytes, k: int) -> np.ndarray:
    """Distinct k-word shingles as uint64 (crc32 per word, mixed across the
    window).  Word shingles are the standard unit for text near-dup detection:
    bag-of-shared-vocabulary corpora that look near-identical under character
    n-grams separate cleanly under word windows."""
    import zlib
    words = text.split()
    if not words:
        return np.zeros(1, dtype=np.uint64)
    wh = np.array([zlib.crc32(w) for w in words], dtype=np.uint64)
    if wh.size < k:
        win = wh[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(wh, k)
    with np.errstate(over="ignore"):
        h = np.zeros(win.shape[0], dtype=np.uint64)
        for c in range(win.shape[1]):
            h = h * np.uint64(1099511628211) + win[:, c]
    return np.unique(h)


def shingle_set(text: bytes, k: int, unit: str) -> np.ndarray:
    return _word_shingle_hashes(text, k) if unit == "word" \
        else _shingle_hashes(text, k)


def _perm_constants(num_perm: int, seed: int = 17):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_batch(texts: list[bytes], num_perm: int = 128,
                  shingle_k: int = 3, unit: str = "word") -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures, vectorized across the batch
    with per-doc segment minima (np.minimum.reduceat)."""
    a, b = _perm_constants(num_perm)
    hashes = [shingle_set(t, shingle_k, unit) for t in texts]
    offsets = np.cumsum([0] + [h.size for h in hashes[:-1]])
    H = np.concatenate(hashes) if hashes else np.zeros(0, np.uint64)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            # multiply-shift universal hashing mod 2^64 (wrapping) — standard for
            # MinHash permutations and fully vectorized
            hv = H * a[i] + b[i]
            out[:, i] = np.minimum.reduceat(hv, offsets) if H.size else 0
    return out


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 128, shingle_k: int = 3,
                       unit: str = "word"):
    def kernel(bt: pa.Table) -> pa.Table:
        texts = [t.encode("utf-8", "ignore")
                 for t in bt.column(text_col).to_pylist()]
        sig = minhash_batch(texts, num_perm, shingle_k, unit)
        return pa.table({id_col: bt.column(id_col),
                         "sig": pa.array(list(sig), pa.list_(pa.uint64()))})
    return ds.map_batches(kernel, batch_format="pyarrow")


def lsh_band_buckets(sig_ds, id_col: str = "doc_id", bands: int = 32,
                     num_perm: int = 128):
    """Signatures -> (band, band_hash, doc_id) rows; docs sharing a bucket are
    near-dup candidates.  rows_per_band = num_perm // bands; bands must
    divide num_perm exactly (a remainder would silently drop permutations,
    and rows=0 would hash every doc into one bucket)."""
    rows = num_perm // bands
    if rows == 0 or num_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_perm "
                         f"({num_perm}) with rows_per_band >= 1")

    def kernel(bt: pa.Table) -> pa.Table:
        sigs = np.stack(bt.column("sig").to_numpy(zero_copy_only=False))
        ids = bt.column(id_col).to_numpy()
        n = sigs.shape[0]
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        out_id = np.tile(ids, bands)
        out_hash = np.empty(bands * n, dtype=np.uint64)
        for b in range(bands):
            chunk = sigs[:, b * rows:(b + 1) * rows]
            # order-dependent mix of the band rows
            h = np.zeros(n, dtype=np.uint64)
            for r in range(rows):
                h = h * np.uint64(1099511628211) + chunk[:, r]
            out_hash[b * n:(b + 1) * n] = h
        return pa.table({"band": pa.array(out_band),
                         "band_hash": pa.array(out_hash),
                         id_col: pa.array(out_id)})

    return sig_ds.map_batches(kernel, batch_format="pyarrow")


def _run_pairs(new: np.ndarray, max_bucket: int):
    """All intra-run index pairs of a run-length-encoded sorted array.

    `new[k]` marks the first row of each run (bucket).  Returns global row
    indices (ia, ib) of every within-run pair (row-major upper triangle,
    runs capped at max_bucket rows) and a per-pair truncation flag.  The
    (i, j) recovery from the flat pair index is the closed-form inversion
    i = floor(m - 1/2 - sqrt((m - 1/2)^2 - 2t)) with one-step integer
    corrections (validated exhaustively to m=5000 in tests)."""
    n = new.size
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    trunc_runs = lens > max_bucket
    m_all = np.minimum(lens, max_bucket).astype(np.int64)
    npairs = m_all * (m_all - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, bool)
    run_of = np.repeat(np.arange(m_all.size), npairs)
    off = np.concatenate(([0], np.cumsum(npairs)))[:-1]
    t = np.arange(total, dtype=np.int64) - off[run_of]
    m = m_all[run_of]
    mm = m.astype(np.float64)
    i = np.floor(mm - 0.5 - np.sqrt((mm - 0.5) ** 2 - 2.0 * t)).astype(np.int64)
    i = np.clip(i, 0, m - 2)
    base = i * (2 * m - i - 1) // 2
    i -= (base > t).astype(np.int64)
    bump = t >= (i + 1) * (2 * m - i - 2) // 2
    i = i + bump.astype(np.int64)
    base = i * (2 * m - i - 1) // 2
    j = t - base + i + 1
    gi = starts[run_of]
    return gi + i, gi + j, trunc_runs[run_of]


def lsh_candidate_pairs(bucket_ds, id_col: str = "doc_id",
                        max_bucket: int = 2000, n_parts: int = 256):
    """(band, band_hash) buckets -> all intra-bucket pairs (id_a < id_b), deduped.
    Buckets above max_bucket are truncated with a warning row counter (no silent
    caps: see the 'truncated' column).

    The expansion is NOT a per-bucket map_groups (one Python call per bucket —
    and almost every bucket is a singleton): rows are grouped by a COARSE
    partition key (band_hash mod n_parts, whole buckets never split), and each
    of the <= n_parts Python calls expands ALL its buckets vectorized — sort by
    (band, band_hash), run-length detect boundaries, emit per-run triangular
    pairs with numpy repeat/arange arithmetic."""
    def part_key(b: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(
            b.column("band_hash"), np.uint64(n_parts - 1)), pa.int32())
        return b.append_column("_part", part)

    def pairs_vec(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("band", "ascending"),
                                              ("band_hash", "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        band = g.column("band").to_numpy()
        bh = g.column("band_hash").to_numpy()
        ids = g.column(id_col).to_numpy()
        n = ids.size
        new = np.ones(n, dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        ia, ib, trunc = _run_pairs(new, max_bucket)
        return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                         "id_b": pa.array(ids[ib], pa.int64()),
                         "truncated": pa.array(trunc)})

    # measured-size choice (the bucket table is bands x n_docs rows of three
    # fixed-width columns, already the shuffle payload either way): under the
    # single-task bound, ONE coalesced pairs_vec call + in-task dedup replaces
    # two full shuffle rounds (groupby-expand + groupby-dedup) whose fixed
    # per-operator cost dominates below ~10M rows; above it, the distributed
    # path with whole-bucket partitioning takes over untouched.
    buckets = bucket_ds.materialize()
    if buckets.count() <= 8_000_000:
        def pairs_dedup(g: pa.Table) -> pa.Table:
            t = pairs_vec(g)
            if t.num_rows == 0:
                return t
            return t.group_by(["id_a", "id_b"]).aggregate(
                [("truncated", "max")]) \
                .rename_columns(["id_a", "id_b", "truncated"])
        return buckets.repartition(1).map_batches(
            pairs_dedup, batch_format="pyarrow", batch_size=None)

    from ray.data.aggregate import Max

    from .joins import sized_groupby

    cand = buckets.map_batches(part_key, batch_format="pyarrow") \
        .groupby("_part").map_groups(pairs_vec, batch_format="pyarrow")
    # distinct pairs via a vectorized grouped aggregate (a per-group map_groups
    # here would cost one Python call per pair)
    return sized_groupby(cand, ["id_a", "id_b"],
                         Max("truncated", alias_name="truncated"))


def charset_bitmaps(texts: list[str]) -> np.ndarray:
    """(n, 4) uint64 bitmap of the distinct bytes of each doc (ascii corpora)."""
    out = np.zeros((len(texts), 4), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.unique(np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8))
        words = b >> 6
        bits = np.uint64(1) << (b & 63).astype(np.uint64)
        np.bitwise_or.at(out[i], words, bits)
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def charset_bitmap_table(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Distributed build of the per-doc charset bitmaps: (id, b0..b3) — 40 bytes
    per document regardless of text length.  The texts themselves never leave
    their read tasks."""
    def kernel(bt: pa.Table) -> pa.Table:
        bm = charset_bitmaps(bt.column(text_col).to_pylist())
        return pa.table({id_col: bt.column(id_col),
                         "b0": pa.array(bm[:, 0]), "b1": pa.array(bm[:, 1]),
                         "b2": pa.array(bm[:, 2]), "b3": pa.array(bm[:, 3])})
    return ds.map_batches(kernel, batch_format="pyarrow")


def _unpack_bits(bm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 4) uint64 packed charsets -> (0/1 float32 (n, 256) rows, popcounts).
    Any consistent bit permutation preserves intersection counts, so the GEMM
    inter = A @ B^T counts shared charset bits exactly (values < 2^24 are
    float32-exact)."""
    bits = np.unpackbits(np.ascontiguousarray(bm).view(np.uint8), axis=1) \
        .astype(np.float32)
    return bits, bits.sum(axis=1)


def _jaccard_cross(bits_a, pop_a, ids_a, bits_b, pop_b, ids_b, threshold,
                   chunk: int = 2048):
    """Qualifying ordered pairs (id_a < id_b) between two unpacked bitmap
    sets via chunked GEMM — no Python-per-row loop.  Works for the self case
    (a is b) too: the id inequality drops the diagonal and mirror pairs."""
    out_a, out_b, out_j = [], [], []
    for s in range(0, bits_a.shape[0], chunk):
        e = min(s + chunk, bits_a.shape[0])
        inter = (bits_a[s:e] @ bits_b.T).astype(np.float64)
        union = (pop_a[s:e, None] + pop_b[None, :]).astype(np.float64) - inter
        # counts are float-exact integers (< 2^24); divide in float64 so
        # jac_micro rounds identically to the oracle's double division
        j = inter / np.maximum(union, 1.0)
        hit = (j >= threshold) & (ids_b[None, :] > ids_a[s:e, None])
        ri, ci = np.nonzero(hit)
        out_a.append(ids_a[s:e][ri].astype(np.int64))
        out_b.append(ids_b[ci].astype(np.int64))
        out_j.append(j[ri, ci].astype(np.float64))
    a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
    jj = np.concatenate(out_j) if out_j else np.zeros(0)
    return pa.table({
        "id_a": pa.array(a, pa.int64()),
        "id_b": pa.array(b, pa.int64()),
        "jac_micro": pa.array(np.rint(jj * 1e6).astype(np.int64),
                              pa.int64())})


def _bm_of(bt: pa.Table) -> np.ndarray:
    return np.stack([bt.column(c).to_numpy().astype(np.uint64)
                     for c in ("b0", "b1", "b2", "b3")], axis=1)


class _CharsetProbe:
    """Actor-pool probe for the broadcast path: the PACKED bitmap matrix ships
    once via ray.put and is unpacked ONCE per actor here (a 25x size blow-up
    paid per actor, never per batch)."""

    def __init__(self, bref, threshold: float, id_col: str):
        import ray
        bm_all, ids_all = ray.get(bref)
        self.bits_all, self.pop_all = _unpack_bits(bm_all)
        self.ids_all = ids_all
        self.threshold = threshold
        self.id_col = id_col

    def __call__(self, bt: pa.Table) -> pa.Table:
        bits, pop = _unpack_bits(_bm_of(bt))
        ids = bt.column(self.id_col).to_numpy().astype(np.int64)
        return _jaccard_cross(bits, pop, ids, self.bits_all, self.pop_all,
                              self.ids_all, self.threshold)


def charset_jaccard_pairs(ds, threshold: float, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_broadcast_docs: int = 2_000_000):
    """All pairs with character-set Jaccard >= threshold (the DuckDB jaccard()
    definition: |chars(a) n chars(b)| / |chars(a) u chars(b)|).  The oracle
    semantics are inherently all-pairs (O(n^2) comparisons — this is the
    exact baseline; minhash/simhash are the bounded-recall scale paths), but
    neither corpus text nor an unpacked matrix is ever moved:

    - build: the DISTRIBUTED bitmap aggregate, 40 B/doc packed (4 TB per
      100 G docs — which is exactly why the broadcast is capped).
    - probe, n <= max_broadcast_docs: packed bitmaps ray.put once; an actor
      POOL unpacks them once per actor (__init__) and each batch is one
      chunked bit-GEMM against the broadcast.
    - probe, n > max_broadcast_docs: partition-pair banding — docs hash into
      P = ceil(n / max_broadcast_docs) bands, every (i, j) band pair meets in
      its own groupby bucket, so a task holds at most 2 bands of packed
      bitmaps (<= 2 * max_broadcast_docs * 40 B) instead of the full corpus.
      Replication cost is P rows per doc, the standard exact all-pairs
      exchange bound."""
    from .joins import join_partitions

    bm = charset_bitmap_table(ds, text_col, id_col).materialize()
    n = bm.count()
    if n <= max_broadcast_docs:
        import ray
        parts = [b for b in bm.iter_batches(batch_format="pyarrow",
                                            batch_size=None) if b.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
        if tbl is None:
            return bm.map_batches(lambda b: _jaccard_cross(
                *_unpack_bits(_bm_of(b)),
                b.column(id_col).to_numpy().astype(np.int64),
                *_unpack_bits(_bm_of(b)),
                b.column(id_col).to_numpy().astype(np.int64), threshold),
                batch_format="pyarrow")
        bitmaps = _bm_of(tbl)
        all_ids = tbl.column(id_col).to_numpy().astype(np.int64)
        bref = ray.put((bitmaps, all_ids))
        from .multimodal import _default_pool
        return bm.map_batches(
            _CharsetProbe, batch_format="pyarrow",
            fn_constructor_args=(bref, threshold, id_col),
            concurrency=_default_pool(), max_restarts=0)

    # over-cap: partition-pair banding
    P = int(np.ceil(n / max_broadcast_docs))

    def replicate(bt: pa.Table) -> pa.Table:
        ids = bt.column(id_col).to_numpy().astype(np.int64)
        part = ((ids.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(2**32)).astype(np.int64) % P
        reps = []
        for q in range(P):
            lo = np.minimum(part, q)
            hi = np.maximum(part, q)
            reps.append(pa.table({
                id_col: bt.column(id_col),
                "b0": bt.column("b0"), "b1": bt.column("b1"),
                "b2": bt.column("b2"), "b3": bt.column("b3"),
                "_part": pa.array(part),
                "_pk": pa.array(lo * P + hi)}))
        return pa.concat_tables(reps).combine_chunks()

    def pair_kernel(g: pa.Table) -> pa.Table:
        pk = int(g.column("_pk")[0].as_py())
        i, j = pk // P, pk % P
        part = g.column("_part").to_numpy()
        ids = g.column(id_col).to_numpy().astype(np.int64)
        bm_g = _bm_of(g)
        if i == j:
            # every row here is band i (replication sends (i, i) once)
            bits, pop = _unpack_bits(bm_g)
            return _jaccard_cross(bits, pop, ids, bits, pop, ids, threshold)
        ma, mb = part == i, part == j
        bits_a, pop_a = _unpack_bits(bm_g[ma])
        bits_b, pop_b = _unpack_bits(bm_g[mb])
        # cross pairs only — within-band pairs belong to their (i, i) bucket;
        # both orderings are covered because _jaccard_cross enforces
        # id_a < id_b and is run in both directions
        t1 = _jaccard_cross(bits_a, pop_a, ids[ma], bits_b, pop_b, ids[mb],
                            threshold)
        t2 = _jaccard_cross(bits_b, pop_b, ids[mb], bits_a, pop_a, ids[ma],
                            threshold)
        return pa.concat_tables([t1, t2]).combine_chunks()

    rep = bm.map_batches(replicate, batch_format="pyarrow")
    return rep.groupby("_pk").map_groups(pair_kernel, batch_format="pyarrow")


def _bigram_hash_sets(texts: pa.Array | pa.ChunkedArray):
    """Per-doc sorted DISTINCT word-bigram 64-bit hash sets, vectorized: one
    Arrow split, one dictionary encode, token hashes computed once per batch
    VOCAB (not per occurrence), bigram hash = asymmetric wrap-mix of the two
    token hashes, per-doc distinct via lexsort+boundary.  Returns
    (concat_sorted_hashes uint64, offsets int64 len n+1)."""
    from hashlib import blake2b

    toks = pc.split_pattern_regex(texts, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    off = toks.offsets.to_numpy()
    off = (off - off[0]).astype(np.int64)
    lens = off[1:] - off[:-1]
    nseg = len(lens)
    seg_all = np.repeat(np.arange(nseg, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    th = np.fromiter(
        (int.from_bytes(blake2b(v.encode("utf-8", "ignore"),
                                digest_size=8).digest(), "little")
         for v in vocab), dtype=np.uint64, count=len(vocab))
    seg = seg_all[keep]
    code = codes[keep]
    out_off = np.zeros(nseg + 1, dtype=np.int64)
    if seg.size >= 2:
        adj = seg[1:] == seg[:-1]
        pseg = seg[:-1][adj]
        with np.errstate(over="ignore"):
            ph = th[code[:-1][adj]] * np.uint64(0xFF51AFD7ED558CCD) \
                + th[code[1:][adj]]
        order = np.lexsort((ph, pseg))
        ss, hh = pseg[order], ph[order]
        first = np.ones(ss.size, dtype=bool)
        first[1:] = (ss[1:] != ss[:-1]) | (hh[1:] != hh[:-1])
        ss, hh = ss[first], hh[first]
        np.add.at(out_off, ss + 1, 1)
        np.cumsum(out_off, out=out_off)
        return hh, out_off
    return np.zeros(0, dtype=np.uint64), out_off


def _kgram_hash_sets(texts: pa.Array | pa.ChunkedArray, k: int):
    """Per-doc sorted DISTINCT word-k-gram 64-bit hash sets — the k-ary
    generalization of _bigram_hash_sets (same tokenize/vocab-hash prelude,
    FNV-chained window mix like _word_shingle_hashes).  Returns
    (concat_sorted_hashes uint64, offsets int64 len n+1)."""
    from hashlib import blake2b

    toks = pc.split_pattern_regex(texts, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    off = toks.offsets.to_numpy()
    off = (off - off[0]).astype(np.int64)
    lens = off[1:] - off[:-1]
    nseg = len(lens)
    seg_all = np.repeat(np.arange(nseg, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    th = np.fromiter(
        (int.from_bytes(blake2b(v.encode("utf-8", "ignore"),
                                digest_size=8).digest(), "little")
         for v in vocab), dtype=np.uint64, count=len(vocab))
    seg = seg_all[keep]
    H = th[codes[keep]]
    out_off = np.zeros(nseg + 1, dtype=np.int64)
    n = H.size
    if n >= k:
        m = n - k + 1
        with np.errstate(over="ignore"):
            wh = np.zeros(m, dtype=np.uint64)
            for c in range(k):
                wh = wh * np.uint64(1099511628211) + H[c:m + c]
        valid = seg[:m] == seg[k - 1:]        # window stays inside one doc
        gseg, gh = seg[:m][valid], wh[valid]
        order = np.lexsort((gh, gseg))
        gseg, gh = gseg[order], gh[order]
        first = np.ones(gseg.size, dtype=bool)
        first[1:] = (gseg[1:] != gseg[:-1]) | (gh[1:] != gh[:-1])
        gseg, gh = gseg[first], gh[first]
        np.add.at(out_off, gseg + 1, 1)
        np.cumsum(out_off, out=out_off)
        return gh, out_off
    return np.zeros(0, dtype=np.uint64), out_off


def decontaminate(train_ds, eval_texts: list[str], k: int = 8,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Test-set decontamination (the GPT-3/PaLM n-gram overlap rule): flag
    every training document that shares at least one word k-gram with ANY
    eval document.  The eval side — small by nature — collapses to ONE sorted
    union of k-gram hashes on the driver and is broadcast via ray.put; the
    training corpus then streams through a vectorized searchsorted membership
    kernel: no shuffle, no corpus materialization, eval bytes shipped once
    per node.  Returns (doc_id, n_shared_kgrams) rows for flagged docs, where
    n_shared_kgrams counts the doc's DISTINCT k-grams that appear anywhere in
    the eval set."""
    import ray

    ev_h, _ = _kgram_hash_sets(pa.array(list(eval_texts), pa.string()), k)
    ev = np.unique(ev_h)
    ref = ray.put(ev)

    schema = pa.schema([(id_col, pa.int64()),
                        ("n_shared_kgrams", pa.int64())])

    def kernel(bt: pa.Table) -> pa.Table:
        E = ray.get(ref)
        h, o = _kgram_hash_sets(bt.column(text_col), k)
        hit = np.zeros(h.size, dtype=np.int64)
        if h.size and E.size:
            idx = np.searchsorted(E, h)
            idx_c = np.minimum(idx, E.size - 1)
            hit = ((idx < E.size) & (E[idx_c] == h)).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(hit)])
        cnt = cs[o[1:]] - cs[o[:-1]]
        flag = cnt > 0
        ids = bt.column(id_col).to_numpy().astype(np.int64)
        return pa.table({id_col: pa.array(ids[flag]),
                         "n_shared_kgrams": pa.array(cnt[flag])})

    return collect_typed(train_ds.map_batches(kernel, batch_format="pyarrow"),
                         schema)


def _sort_hashsets(H: np.ndarray, n_per_doc: np.ndarray):
    """Concatenated per-doc hash sets -> one GLOBALLY sorted array plus the
    parallel doc-index array — the probe structure for
    _hashset_cross_pairs.  Built once per actor / per band group, never per
    batch."""
    doc_of = np.repeat(np.arange(n_per_doc.size, dtype=np.int64), n_per_doc)
    order = np.argsort(H, kind="stable")
    return H[order], doc_of[order]


def _hashset_cross_pairs(Hs, doc_g, ng, ig, h, o, ids_b, thr_micro):
    """Qualifying pairs (batch_id < other_id) between a batch of per-doc hash
    sets (h concat, o offsets, ids_b) and a reference collection given as a
    globally sorted array Hs with parallel doc indices doc_g (per-doc sizes
    ng, ids ig).  Fully vectorized: one searchsorted range probe for every
    batch hash, ragged range expansion to matched (batch_doc, ref_doc)
    events, then one sort+boundary reduction to per-pair intersection counts.
    Zero-intersection pairs can never qualify, so thr_micro must be > 0
    (enforced by the caller).  jac_micro is integer-exact:
    (inter * 1e6) // union."""
    empty = (np.zeros(0, np.int64),) * 3
    if h.size == 0 or Hs.size == 0:
        return empty
    lens_b = o[1:] - o[:-1]
    doc_b = np.repeat(np.arange(ids_b.size, dtype=np.int64), lens_b)
    lo = np.searchsorted(Hs, h, "left")
    hi = np.searchsorted(Hs, h, "right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return empty
    starts = np.cumsum(cnt) - cnt
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt) \
        + np.repeat(lo, cnt)
    bi = np.repeat(doc_b, cnt)
    gi = doc_g[pos]
    key = bi * np.int64(ig.size) + gi
    key.sort()
    first = np.ones(key.size, dtype=bool)
    first[1:] = key[1:] != key[:-1]
    uq = key[first]
    bnd = np.flatnonzero(first)
    inter = np.diff(np.concatenate([bnd, [key.size]]))
    bi_u, gi_u = uq // ig.size, uq % ig.size
    union = lens_b[bi_u] + ng[gi_u] - inter
    jm = inter * 1_000_000 // np.maximum(union, 1)
    sel = (jm >= thr_micro) & (ig[gi_u] > ids_b[bi_u])
    return ids_b[bi_u[sel]], ig[gi_u[sel]], jm[sel]


def _pairs_table(id_a, id_b, jm) -> pa.Table:
    return pa.table({"id_a": pa.array(id_a, pa.int64()),
                     "id_b": pa.array(id_b, pa.int64()),
                     "jac_micro": pa.array(jm, pa.int64())})


class _NgramProbe:
    """Actor-pool probe for the broadcast path: the concatenated hash-set
    arrays ship once via ray.put and the global sort (the probe structure) is
    built ONCE per actor here, never per batch.  Batches are rows of the
    pre-built sets table (id, _set blob) — the corpus text is never
    re-tokenized."""

    def __init__(self, bref, thr_micro: int, id_col: str):
        import ray
        H_all, n_all, ids_all = ray.get(bref)
        self.Hs, self.doc_g = _sort_hashsets(H_all, n_all)
        self.ng, self.ig = n_all, ids_all
        self.thr_micro = thr_micro
        self.id_col = id_col

    def __call__(self, bt: pa.Table) -> pa.Table:
        blobs = bt.column("_set").to_pylist()
        ids = bt.column(self.id_col).to_numpy().astype(np.int64)
        npd = np.array([len(x) // 8 for x in blobs], np.int64)
        h = np.frombuffer(b"".join(blobs), dtype=np.uint64)
        o = np.concatenate([[0], np.cumsum(npd)])
        return _pairs_table(*_hashset_cross_pairs(
            self.Hs, self.doc_g, self.ng, self.ig, h, o, ids,
            self.thr_micro))


def ngram_jaccard_pairs(ds, threshold: float, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_broadcast_docs: int = 2_000_000):
    """All pairs with word-BIGRAM set Jaccard >= threshold — the n-gram
    near-dup oracle baseline (DuckDB: list_intersect over list_distinct
    bigram lists).  Same shape as charset_jaccard_pairs: the moved payload is
    the DISTRIBUTED per-doc hash-set table (~8 B per distinct bigram), never
    the corpus text, and nothing is ever collected to the driver:

    - build: per-doc sorted distinct bigram-hash sets, one vectorized Arrow
      pass per block (_bigram_hash_sets).
    - probe, n <= max_broadcast_docs: hash arrays ray.put once; an actor POOL
      globally sorts them once per actor (__init__) and each batch is one
      vectorized searchsorted range-probe + sort-boundary pair count
      (_hashset_cross_pairs) — no per-doc Python loop.
    - probe, n > max_broadcast_docs: partition-pair banding — docs hash into
      P = ceil(n / max_broadcast_docs) bands, every (i, j) band pair meets in
      its own groupby bucket, so a task holds at most 2 bands of hash sets
      instead of the full corpus.  Replication cost is P rows per doc, the
      standard exact all-pairs exchange bound.

    Docs with no bigrams (<2 tokens) are excluded, matching the SQL's
    len(bg)>0 guard.  The oracle semantics are inherently all-pairs; the
    100 TB near-dup path is minhash_dedup.  jac_micro is integer-exact:
    (inter * 1e6) // union.  Requires threshold > 0: the matches-only kernel
    never sees zero-intersection pairs."""
    import ray

    thr_micro = int(round(threshold * 1_000_000))
    if thr_micro <= 0:
        raise ValueError(
            "ngram_jaccard_pairs requires threshold > 0 (the vectorized "
            "matches-only kernel cannot emit zero-intersection pairs)")
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        ("jac_micro", pa.int64())])

    def set_kernel(bt: pa.Table) -> pa.Table:
        h, o = _bigram_hash_sets(bt.column(text_col))
        blobs = [h[o[i]:o[i + 1]].tobytes() for i in range(len(o) - 1)]
        return pa.table({id_col: bt.column(id_col),
                         "_set": pa.array(blobs, pa.large_binary())})

    sets = ds.map_batches(set_kernel, batch_format="pyarrow").materialize()
    n = sets.count()
    if n <= max_broadcast_docs:
        ids_l, n_l, h_l = [], [], []
        for bt in sets.iter_batches(batch_format="pyarrow", batch_size=None):
            if not bt.num_rows:
                continue
            ids_l.append(bt.column(id_col).to_numpy().astype(np.int64))
            blobs = bt.column("_set").to_pylist()
            n_l.append(np.array([len(x) // 8 for x in blobs], np.int64))
            h_l.append(np.frombuffer(b"".join(blobs), dtype=np.uint64))
        if not ids_l:
            return schema.empty_table()
        bref = ray.put((np.concatenate(h_l), np.concatenate(n_l),
                        np.concatenate(ids_l)))
        from .multimodal import _default_pool
        probes = sets.map_batches(
            _NgramProbe, batch_format="pyarrow",
            fn_constructor_args=(bref, thr_micro, id_col),
            concurrency=_default_pool(), max_restarts=0)
        return collect_typed(probes, schema)

    # over-cap: partition-pair banding over the hash-set blobs
    P = int(np.ceil(n / max_broadcast_docs))

    def replicate(bt: pa.Table) -> pa.Table:
        ids = bt.column(id_col).to_numpy().astype(np.int64)
        part = ((ids.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(2**32)).astype(np.int64) % P
        reps = []
        for q in range(P):
            lo = np.minimum(part, q)
            hi = np.maximum(part, q)
            reps.append(pa.table({
                id_col: bt.column(id_col), "_set": bt.column("_set"),
                "_part": pa.array(part), "_pk": pa.array(lo * P + hi)}))
        return pa.concat_tables(reps).combine_chunks()

    def unpack(g: pa.Table, mask=None):
        sub = g.filter(pa.array(mask)) if mask is not None else g
        blobs = sub.column("_set").to_pylist()
        ids = sub.column(id_col).to_numpy().astype(np.int64)
        npd = np.array([len(x) // 8 for x in blobs], np.int64)
        H = np.frombuffer(b"".join(blobs), dtype=np.uint64)
        off = np.concatenate([[0], np.cumsum(npd)])
        return H, off, npd, ids

    def pair_kernel(g: pa.Table) -> pa.Table:
        pk = int(g.column("_pk")[0].as_py())
        i, j = pk // P, pk % P
        part = g.column("_part").to_numpy()
        if i == j:
            H, off, npd, ids = unpack(g)
            Hs, doc_g = _sort_hashsets(H, npd)
            return _pairs_table(*_hashset_cross_pairs(
                Hs, doc_g, npd, ids, H, off, ids, thr_micro))
        Ha, offa, na, ia = unpack(g, part == i)
        Hb, offb, nb, ib = unpack(g, part == j)
        # cross pairs only — within-band pairs belong to their (i, i)
        # bucket; both orderings are covered because the kernel enforces
        # batch_id < ref_id and is run in both directions
        sa, da = _sort_hashsets(Ha, na)
        sb, db = _sort_hashsets(Hb, nb)
        t1 = _pairs_table(*_hashset_cross_pairs(sa, da, na, ia,
                                                Hb, offb, ib, thr_micro))
        t2 = _pairs_table(*_hashset_cross_pairs(sb, db, nb, ib,
                                                Ha, offa, ia, thr_micro))
        return pa.concat_tables([t1, t2]).combine_chunks()

    rep = sets.map_batches(replicate, batch_format="pyarrow")
    return collect_typed(
        rep.groupby("_pk").map_groups(pair_kernel, batch_format="pyarrow"),
        schema)


def ngram_jaccard_counts(a: bytes, b: bytes, k: int = 3,
                         unit: str = "word") -> tuple[int, int]:
    """(|intersection|, |union|) of the two k-shingle sets — integer-exact
    building blocks so callers can threshold and scale without float rounding
    (the repo convention: jaccard_micro = inter * 1e6 // union)."""
    sa, sb = shingle_set(a, k, unit), shingle_set(b, k, unit)
    inter = int(np.intersect1d(sa, sb).size)
    return inter, int(sa.size) + int(sb.size) - inter


def ngram_jaccard(a: bytes, b: bytes, k: int = 3, unit: str = "word") -> float:
    inter, union = ngram_jaccard_counts(a, b, k, unit)
    return inter / union if union else 1.0


def _text_pool() -> int:
    """Actor-pool ceiling for CPU-heavy text kernels: ~5/8 of cluster CPUs."""
    import ray
    return max(2, (int(ray.cluster_resources().get("CPU", 8)) * 5) // 8)


class _MinhashPayload:
    """(doc_id, text, sig) rows; signatures ride as fixed-width binary
    (num_perm*8 bytes) — Acero hash joins reject list<> payload columns but
    pass binary through."""

    def __init__(self, text_col, id_col, num_perm, shingle_k, unit):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.unit = unit

    def __call__(self, bt: pa.Table) -> pa.Table:
        texts = [t.encode("utf-8", "ignore")
                 for t in bt.column(self.text_col).to_pylist()]
        sig = minhash_batch(texts, self.num_perm, self.shingle_k, self.unit)
        return pa.table({self.id_col: bt.column(self.id_col),
                         "text": bt.column(self.text_col),
                         "sig": pa.array([s.tobytes() for s in sig],
                                         pa.binary())})


def minhash_dedup(ds, threshold: float = 0.8, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 128, bands: int = 32,
                  shingle_k: int = 3, unit: str = "word",
                  max_broadcast_docs: int = 200_000):
    """Full MinHash+LSH near-dup pipeline: signatures -> band buckets -> candidate
    pairs -> exact n-gram Jaccard verification -> rows (id_a, id_b,
    jaccard_micro) with true Jaccard >= threshold.

    The corpus is never materialized on the driver.  Candidate pairs (small —
    that is the whole point of the LSH bands) are materialized once; when the
    candidate-doc set is under `max_broadcast_docs`, the payloads of ONLY those
    docs are collected and broadcast via ray.put, and the verify stage streams
    pair batches probing that lookup (zero joins, zero extra shuffles).  Above
    the threshold, falls back to two hash joins (on id_a, then id_b) so the
    verify stage streams (pair, text_a, text_b) batches — driver memory stays
    bounded by `max_broadcast_docs` payloads either way."""
    # task-pool stage (NOT an actor pool: the vectorized kernel is ~0.1 ms/doc,
    # so warm-worker task dispatch beats paying actor spinup in each of the two
    # plan branches that consume `pay`)
    pay = ds.map_batches(
        _MinhashPayload(text_col, id_col, num_perm, shingle_k, unit),
        batch_format="pyarrow")
    sigs = pay.map_batches(
        lambda b: pa.table({id_col: b.column(id_col),
                            "sig": pa.array(
                                [np.frombuffer(s, dtype=np.uint64)
                                 for s in b.column("sig").to_pylist()],
                                pa.list_(pa.uint64()))}),
        batch_format="pyarrow")
    cand = lsh_candidate_pairs(lsh_band_buckets(sigs, id_col, bands, num_perm),
                               id_col).drop_columns(["truncated"]) \
        .materialize()      # candidate PAIRS only — small by LSH construction

    thr_micro = int(round(threshold * 1_000_000))
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        ("jaccard_micro", pa.int64())])

    def verify_arrays(ia, ib, sa, sb, ta, tb) -> pa.Table:
        if ia.size == 0:
            return schema.empty_table()
        # cheap signature-agreement estimate first (vectorized); exact n-gram
        # Jaccard only for pairs whose estimate clears a slack margin
        est = (sa == sb).mean(axis=1)
        maybe = est >= max(0.0, threshold - 0.15)
        ia, ib, ta, tb = ia[maybe], ib[maybe], ta[maybe], tb[maybe]
        # integer-exact keep rule and micro value (inter*1e6 // union), the
        # same arithmetic as the SQL oracle — float round here drifted ±1
        cnt = [ngram_jaccard_counts(a.encode(), b.encode(), shingle_k, unit)
               for a, b in zip(ta, tb)]
        inter = np.array([c[0] for c in cnt], dtype=np.int64)
        union = np.array([c[1] for c in cnt], dtype=np.int64)
        keep = (union > 0) & (inter * 1_000_000 >= thr_micro * union)
        return pa.table({"id_a": pa.array(ia[keep], pa.int64()),
                         "id_b": pa.array(ib[keep], pa.int64()),
                         "jaccard_micro": pa.array(
                             inter[keep] * 1_000_000 // union[keep])})

    def sig_mat(col) -> np.ndarray:
        return np.stack([np.frombuffer(s, dtype=np.uint64)
                         for s in col.to_pylist()])

    n_pairs = cand.count()
    if n_pairs == 0:
        return schema.empty_table()

    if 2 * n_pairs <= max_broadcast_docs:
        import ray

        pairs = cand.to_pandas()     # n_pairs rows of two int64s
        need = np.unique(np.concatenate([pairs["id_a"].to_numpy(),
                                         pairs["id_b"].to_numpy()]))
        need_ref = ray.put(need)

        def filt(b: pa.Table) -> pa.Table:
            keep = np.isin(b.column(id_col).to_numpy(), ray.get(need_ref))
            return b.filter(pa.array(keep))

        pay_schema = pa.schema([(id_col, pa.int64()), ("text", pa.string()),
                                ("sig", pa.binary())])
        cand_pay = collect_typed(
            pay.map_batches(filt, batch_format="pyarrow"), pay_schema)
        ids_all = cand_pay.column(id_col).to_numpy()
        order = np.argsort(ids_all)
        pos_a = order[np.searchsorted(ids_all[order], pairs["id_a"].to_numpy())]
        pos_b = order[np.searchsorted(ids_all[order], pairs["id_b"].to_numpy())]
        sigm = sig_mat(cand_pay.column("sig"))
        texts = np.asarray(cand_pay.column("text").to_pylist(), dtype=object)
        return verify_arrays(pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy(),
                             sigm[pos_a], sigm[pos_b],
                             texts[pos_a], texts[pos_b])

    # large candidate set: stream the verify through two hash joins
    pay_a = pay.rename_columns(["id_a", "text_a", "sig_a"])
    pay_b = pay.rename_columns(["id_b", "text_b", "sig_b"])
    joined = cand.join(pay_a, join_type="inner", on=("id_a",),
                       num_partitions=join_partitions()) \
                 .join(pay_b, join_type="inner", on=("id_b",),
                       num_partitions=join_partitions())

    def verify(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0:
            return schema.empty_table()
        return verify_arrays(
            bt.column("id_a").to_numpy(), bt.column("id_b").to_numpy(),
            sig_mat(bt.column("sig_a")), sig_mat(bt.column("sig_b")),
            np.asarray(bt.column("text_a").to_pylist(), dtype=object),
            np.asarray(bt.column("text_b").to_pylist(), dtype=object))

    return collect_typed(joined.map_batches(verify, batch_format="pyarrow"),
                         schema)


def simhash_batch(texts: list[bytes], shingle_k: int = 2,
                  unit: str = "word") -> np.ndarray:
    """64-bit SimHash per doc over shingle features (vectorized bit-vote)."""
    a, b = _perm_constants(1, seed=99)
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = shingle_set(t, shingle_k, unit)
        # mix so the direct base-256 encoding spreads over 64 bits
        with np.errstate(over="ignore"):
            hv = h * a[0] + b[0]
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 - hv.size
        out[i] = np.packbits((votes > 0)[::-1]).view(">u8")[0]
    return out


def simhash_near_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id"):
    """SimHash near-dup: 4x16-bit band buckets (a pair within hamming<=3 shares
    at least one exact band), verified by popcount of the xor."""
    def sig(bt: pa.Table) -> pa.Table:
        texts = [t.encode("utf-8", "ignore")
                 for t in bt.column(text_col).to_pylist()]
        return pa.table({id_col: bt.column(id_col),
                         "simhash": pa.array(simhash_batch(texts), pa.uint64())})

    return hamming_near_pairs(ds.map_batches(sig, batch_format="pyarrow"),
                              max_hamming=max_hamming, id_col=id_col)


def hamming_near_pairs(sigs, max_hamming: int = 3, id_col: str = "doc_id",
                       sig_col: str = "simhash"):
    """Verified pairs within `max_hamming` over ANY 64-bit signature column
    (simhash of text, perceptual phash of images...).  4x16-bit band buckets
    — by pigeonhole a pair within hamming<=3 agrees exactly on at least one
    band, so the bucket groupby finds every qualifying pair; above 3 recall
    is best-effort (a pair may differ in all four bands).  Candidates are
    verified by popcount of the xor.  The shuffle moves (band, key, id,
    sig) rows — 4 small rows per item — never the payloads."""

    def bandify(bt: pa.Table) -> pa.Table:
        h = bt.column(sig_col).to_numpy()
        ids = bt.column(id_col).to_numpy()
        out = {"band": [], "key": [], id_col: [], sig_col: []}
        for b in range(4):
            out["band"].append(np.full(h.size, b, dtype=np.int32))
            out["key"].append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                              .astype(np.int64))
            out[id_col].append(ids)
            out[sig_col].append(h)
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})

    def part_key(bt: pa.Table) -> pa.Table:
        # coarse partition (whole (band, key) buckets never split) so the
        # expansion below runs <= 256 Python calls, each vectorized over ALL
        # its buckets — not one map_groups call per bucket
        comb = pc.add(pc.multiply(pc.cast(bt.column("band"), pa.int64()),
                                  65536), bt.column("key"))
        return bt.append_column(
            "_part", pc.cast(pc.bit_wise_and(comb, 255), pa.int32()))

    def pairs_vec(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("band", "ascending"),
                                              ("key", "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        band = g.column("band").to_numpy()
        key = g.column("key").to_numpy()
        ids = g.column(id_col).to_numpy()
        hs = g.column(sig_col).to_numpy()
        new = np.ones(ids.size, dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        ia, ib, trunc = _run_pairs(new, max_bucket=100_000)
        ham = _popcount64(hs[ia] ^ hs[ib]).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table({"id_a": pa.array(ids[ia[keep]], pa.int64()),
                         "id_b": pa.array(ids[ib[keep]], pa.int64()),
                         "hamming": pa.array(ham[keep]),
                         "truncated": pa.array(trunc[keep])})

    from ray.data.aggregate import Max, Min

    from .joins import sized_groupby

    cand = sigs.map_batches(bandify, batch_format="pyarrow") \
        .map_batches(part_key, batch_format="pyarrow") \
        .groupby("_part").map_groups(pairs_vec, batch_format="pyarrow")
    # no silent caps: 'truncated' marks pairs from any over-cap band bucket
    return sized_groupby(cand, ["id_a", "id_b"],
                         Min("hamming", alias_name="hamming"),
                         Max("truncated", alias_name="truncated"))


def _emb_of(bt: pa.Table, emb_col: str) -> np.ndarray:
    return np.stack(bt.column(emb_col).to_numpy(zero_copy_only=False)) \
        .astype(np.float64)


def _cos_cross(emb_a, norm_a, ids_a, emb_b, norm_b, ids_b, threshold) \
        -> pa.Table:
    """Qualifying ordered pairs (id_a < id_b) between two embedding blocks via
    one dense matmul.  Self case (a is b) works too: the id inequality drops
    the diagonal and mirror pairs."""
    cos = (emb_a @ emb_b.T) / np.maximum(
        norm_a[:, None] * norm_b[None, :], 1e-300)
    ii, jj = np.nonzero((cos >= threshold)
                        & (ids_a[:, None] < ids_b[None, :]))
    return pa.table({
        "id_a": pa.array(ids_a[ii], pa.int64()),
        "id_b": pa.array(ids_b[jj], pa.int64()),
        "cos_micro": pa.array(np.rint(cos[ii, jj] * 1e6).astype(np.int64))})




def embedding_neardup_pairs(ds, threshold: float, id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            max_broadcast_rows: int = 1_000_000):
    """EXACT pairs with cosine >= threshold — the embedding near-dup oracle
    baseline.  The oracle semantics are inherently all-pairs (the bounded-
    recall 100 TB path is embedding_neardup_lsh below), but the full matrix is
    only ever held when it is measured to be small:

    - n <= max_broadcast_rows: matrix ray.put once, actor POOL fetches it once
      per actor (__init__), each batch is one blocked matmul against it.
    - n > max_broadcast_rows: partition-pair banding (STILL exact) — vectors
      hash into P = ceil(n / max_broadcast_rows) bands, every (i, j) band
      pair meets in its own groupby bucket, so a task holds at most 2 bands
      of vectors.  Replication cost is P rows per vector, the standard exact
      all-pairs exchange bound."""
    import ray

    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        ("cos_micro", pa.int64())])
    vecs = ds.select_columns([id_col, emb_col]).materialize()
    n = vecs.count()
    if n <= max_broadcast_rows:
        parts = [b for b in vecs.iter_batches(batch_format="pyarrow",
                                              batch_size=None) if b.num_rows]
        if not parts:
            return schema.empty_table()
        tbl = pa.concat_tables(parts).combine_chunks()
        M = _emb_of(tbl, emb_col)
        ref = ray.put((M, np.linalg.norm(M, axis=1),
                       tbl.column(id_col).to_numpy().astype(np.int64)))

        # stateless tasks, not an actor pool: ray.get of a numpy matrix is a
        # zero-copy plasma read, so per-batch fetch costs nothing while
        # actor-pool startup would dominate small inputs
        def probe(bt: pa.Table) -> pa.Table:
            Mb, norms, ids_all = ray.get(ref)
            emb = _emb_of(bt, emb_col)
            ids = bt.column(id_col).to_numpy().astype(np.int64)
            return _cos_cross(emb, np.linalg.norm(emb, axis=1), ids,
                              Mb, norms, ids_all, threshold)

        return collect_typed(vecs.map_batches(probe, batch_format="pyarrow"),
                             schema)

    # over-cap: partition-pair banding (exact — every pair meets exactly once)
    P = int(np.ceil(n / max_broadcast_rows))

    def replicate(bt: pa.Table) -> pa.Table:
        ids = bt.column(id_col).to_numpy().astype(np.int64)
        part = ((ids.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(2**32)).astype(np.int64) % P
        reps = []
        for q in range(P):
            lo = np.minimum(part, q)
            hi = np.maximum(part, q)
            reps.append(pa.table({
                id_col: bt.column(id_col), emb_col: bt.column(emb_col),
                "_part": pa.array(part), "_pk": pa.array(lo * P + hi)}))
        return pa.concat_tables(reps).combine_chunks()

    def pair_kernel(g: pa.Table) -> pa.Table:
        pk = int(g.column("_pk")[0].as_py())
        i, j = pk // P, pk % P
        part = g.column("_part").to_numpy()
        ids = g.column(id_col).to_numpy().astype(np.int64)
        emb = _emb_of(g, emb_col)
        norms = np.linalg.norm(emb, axis=1)
        if i == j:
            return _cos_cross(emb, norms, ids, emb, norms, ids, threshold)
        ma, mb = part == i, part == j
        # cross pairs only — within-band pairs belong to their (i, i) bucket;
        # both orderings are covered because _cos_cross enforces id_a < id_b
        # and is run in both directions
        t1 = _cos_cross(emb[ma], norms[ma], ids[ma],
                        emb[mb], norms[mb], ids[mb], threshold)
        t2 = _cos_cross(emb[mb], norms[mb], ids[mb],
                        emb[ma], norms[ma], ids[ma], threshold)
        return pa.concat_tables([t1, t2]).combine_chunks()

    rep = vecs.map_batches(replicate, batch_format="pyarrow")
    return collect_typed(
        rep.groupby("_pk").map_groups(pair_kernel, batch_format="pyarrow"),
        schema)


def embedding_neardup_lsh(ds, threshold: float, id_col: str = "vec_id",
                          emb_col: str = "embedding", n_bits: int = 8,
                          n_tables: int = 12, max_bucket: int = 4000):
    """Scale path for embedding near-dup: random-hyperplane sign-bit band
    buckets (ops.similarity plane construction), exact cosine verify WITHIN each
    bucket, distinct pairs via a grouped max.

    The shuffle moves (table, key, id, embedding) rows — n_tables copies of the
    embeddings, hash-bucketed — and every verify task touches only one bucket,
    so no task ever holds the corpus matrix.  Recall is probabilistic in
    (n_bits, n_tables); recall >= 1 - (1 - (1-theta/pi)^n_bits)^n_tables per
    pair at angle theta (tested against the exact operator on the testdata
    corpus).  Partitioning assumption: a single (table, key) bucket fits in one
    task's heap — max_bucket caps pathological buckets with an explicit
    'truncated' flag (no silent caps)."""
    from ray.data.aggregate import Max

    from .similarity import _bucket_keys, _hyperplanes

    def bandify(bt: pa.Table) -> pa.Table:
        emb = np.stack(bt.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        ids = bt.column(id_col).to_numpy()
        planes = _hyperplanes(emb.shape[1], n_bits, n_tables)
        keys = _bucket_keys(emb, planes)          # (n, n_tables)
        n = ids.size
        return pa.table({
            "tbl": pa.array(np.repeat(np.arange(n_tables, dtype=np.int32), n)),
            "key": pa.array(keys.T.reshape(-1)),
            id_col: pa.array(np.tile(ids, n_tables)),
            emb_col: pa.concat_arrays([bt.column(emb_col).combine_chunks()]
                                      * n_tables)})

    def part_key(bt: pa.Table) -> pa.Table:
        comb = pc.add(pc.multiply(pc.cast(bt.column("tbl"), pa.int64()),
                                  1 << n_bits), bt.column("key"))
        return bt.append_column(
            "_part", pc.cast(pc.bit_wise_and(comb, 255), pa.int32()))

    def bucket_pairs_vec(g: pa.Table) -> pa.Table:
        """ALL buckets of a coarse partition expanded in one vectorized call:
        sort by (tbl, key, id), run-length boundaries, closed-form triangular
        pair expansion (_run_pairs), then one row-wise einsum for the exact
        cosines — per-pair dots instead of a per-bucket dense matmul."""
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cos_micro": pa.array([], pa.int64()),
                          "truncated": pa.array([], pa.bool_())})
        if g.num_rows < 2:
            return empty
        order = pc.sort_indices(g, sort_keys=[("tbl", "ascending"),
                                              ("key", "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        tbl = g.column("tbl").to_numpy()
        key = g.column("key").to_numpy()
        ids = g.column(id_col).to_numpy()
        new = np.ones(ids.size, dtype=bool)
        new[1:] = (tbl[1:] != tbl[:-1]) | (key[1:] != key[:-1])
        ia, ib, trunc = _run_pairs(new, max_bucket)
        if ia.size == 0:
            return empty
        emb = np.stack(g.column(emb_col).to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        norms = np.linalg.norm(emb, axis=1)
        num = np.einsum("ij,ij->i", emb[ia], emb[ib])
        cos = num / np.maximum(norms[ia] * norms[ib], 1e-300)
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pa.table({
            "id_a": pa.array(ids[ia[keep]], pa.int64()),
            "id_b": pa.array(ids[ib[keep]], pa.int64()),
            "cos_micro": pa.array(np.rint(cos[keep] * 1e6).astype(np.int64)),
            "truncated": pa.array(trunc[keep])})

    from .joins import sized_groupby

    cand = ds.map_batches(bandify, batch_format="pyarrow") \
        .map_batches(part_key, batch_format="pyarrow") \
        .groupby("_part").map_groups(bucket_pairs_vec, batch_format="pyarrow")
    return sized_groupby(cand, ["id_a", "id_b"],
                         Max("cos_micro", alias_name="cos_micro"),
                         Max("truncated", alias_name="truncated"))


def _components_local(a: np.ndarray, b: np.ndarray):
    """Vectorized min-label fixpoint over dense-indexed edges: alternate
    edge-relaxation (np.minimum.at both ways) with pointer jumping
    (lab = lab[lab]) until stable — O(log diameter) numpy rounds."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        before = lab.copy()
        mn = np.minimum(lab[ai], lab[bi])
        np.minimum.at(lab, ai, mn)
        np.minimum.at(lab, bi, mn)
        lab = lab[lab]
        if np.array_equal(lab, before):
            break
    return nodes, nodes[lab]


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                         max_rounds: int = 64,
                         small_limit: int = 5_000_000):
    """Connected components over a pair list — the transitive closure step
    real dedup needs after candidate verification (A~B and B~C put all three
    in ONE cluster even though (A,C) was never emitted).

    Adaptive by MEASURED edge count (the sized_groupby pattern): at or below
    `small_limit` pairs the edge list is collected (two int64 columns) and a
    vectorized numpy min-label fixpoint finishes in milliseconds — LSH
    candidate pairs are small by construction, and each distributed round
    costs several Ray executions of pure overhead at that size.  Above the
    limit (billions of pairs at corpus scale) it runs distributed min-label
    propagation: every node starts labeled with itself; each round routes
    labels across the (symmetric, materialized once) edge list with a hash
    join, folds them into the per-node minimum with one sized_groupby, and a
    scalar aggregate tells the driver whether any label still moved.  Each
    round then POINTER-JUMPS (label <- label[label], the classic parallel
    union-find shortcut), so convergence is O(log diameter) rounds even on
    chain/ring graphs — near-dup clusters are shallow stars/cliques and
    finish in 2-3 rounds — and every round's shuffle is
    bounded by the EDGE list, never the corpus.  Returns (node, label) with
    label = the component's minimum node id."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from .joins import hash_join, join_partitions, sized_groupby

    if pairs.count() <= small_limit:
        pdf = pairs.select_columns([id_a, id_b]).to_pandas()
        a = pdf[id_a].to_numpy().astype(np.int64)
        b = pdf[id_b].to_numpy().astype(np.int64)
        if a.size == 0:
            return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                           "label": pa.array([], pa.int64())}))
        nodes, labels = _components_local(a, b)
        return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                       "label": pa.array(labels)}))

    def symmetrize(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column(id_a), pa.int64()).combine_chunks()
        c = pc.cast(b.column(id_b), pa.int64()).combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, c]),
                         "dst": pa.concat_arrays([c, a])})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow") \
        .materialize()                      # reused every round

    labels = sized_groupby(
        edges.map_batches(lambda b: pa.table({"node": b.column("src")}),
                          batch_format="pyarrow"),
        "node", Min("node", alias_name="label")).materialize()

    for _ in range(max_rounds):
        lab_as_src = labels.map_batches(
            lambda b: pa.table({"src": b.column("node"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        msgs = hash_join(edges, lab_as_src, on="src",
                         num_partitions=join_partitions()) \
            .map_batches(lambda b: pa.table({"node": b.column("dst"),
                                             "label": b.column("label")}),
                         batch_format="pyarrow")
        new = sized_groupby(msgs.union(labels), "node",
                            Min("label", alias_name="label")).materialize()
        # pointer jump: label <- label[label].  Every label value is itself a
        # node id (the running minimum of some node set), so it has a row in
        # `new`; routing each node's label through that row shortcuts chains,
        # halving the remaining distance to the component minimum each round.
        lut = new.map_batches(
            lambda b: pa.table({"label": b.column("node"),
                                "_l2": b.column("label")}),
            batch_format="pyarrow")
        new = hash_join(new, lut, on="label",
                        num_partitions=join_partitions()) \
            .map_batches(lambda b: pa.table({"node": b.column("node"),
                                             "label": b.column("_l2")}),
                         batch_format="pyarrow").materialize()
        # did any label move?  join old/new and count strict decreases
        old_r = labels.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "_o": b.column("label")}),
            batch_format="pyarrow")
        moved = hash_join(new, old_r, on="node",
                          num_partitions=join_partitions()) \
            .map_batches(lambda b: pa.table({"c": pa.array([int(np.sum(
                b.column("label").to_numpy() < b.column("_o").to_numpy()))],
                pa.int64())}), batch_format="pyarrow") \
            .aggregate(Sum("c", alias_name="c"))
        labels = new
        if not moved or not moved.get("c"):
            break
    return labels


def _bloom_positions(h: np.ndarray, m_bits: int, j: int) -> np.ndarray:
    """(j, n) bit positions per hash — splitmix64 re-mixes with distinct
    additive constants (no Python hash(), process-stable)."""
    from .sketch import _hash64_ints
    pos = np.empty((j, h.size), dtype=np.int64)
    x = h.astype(np.uint64)
    for i in range(j):
        with np.errstate(over="ignore"):
            c = np.uint64(((i + 1) * 0x9E3779B97F4A7C15)
                          & 0xFFFFFFFFFFFFFFFF)
            x = _hash64_ints((x + c).astype(np.int64))
        pos[i] = (x % np.uint64(m_bits)).astype(np.int64)
    return pos


def bloom_build(hashes: np.ndarray, m_bits: int = 1 << 23,
                j: int = 4) -> np.ndarray:
    """Bloom filter words (uint64[m_bits/64]) over 64-bit hashes.  Mergeable
    by bitwise OR."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if hashes.size:
        idx = _bloom_positions(hashes, m_bits, j)
        w = (idx >> 6).ravel()
        b = (idx & 63).ravel().astype(np.uint64)
        np.bitwise_or.at(words, w, np.uint64(1) << b)
    return words


def bloom_test(words: np.ndarray, hashes: np.ndarray,
               j: int = 4) -> np.ndarray:
    """Membership mask; false negatives impossible, false-positive rate
    ~(1 - e^{-jn/m})^j."""
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    m_bits = words.size * 64
    idx = _bloom_positions(hashes, m_bits, j)
    ok = np.ones(hashes.size, dtype=bool)
    for i in range(j):
        w = idx[i] >> 6
        b = idx[i].astype(np.uint64) & np.uint64(63)
        ok &= ((words[w] >> b) & np.uint64(1)).astype(bool)
    return ok


def decontaminate_bloom(train_ds, eval_ds, k: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        m_bits: int = 1 << 23, j: int = 4):
    """Test-set decontamination with NO exact eval broadcast — the 100 TB
    shape of `decontaminate`, producing the IDENTICAL exact answer:

    1. the eval corpus reduces to per-block distinct k-gram hashes
       (materialized once — bounded by eval k-gram count), from which the
       driver ORs per-block Bloom words (the only broadcast: m_bits/8 bytes
       regardless of eval size);
    2. the training corpus streams to distinct (doc_id, kgram_hash) pairs
       PRE-FILTERED by the Bloom mask — non-shared k-grams (the
       overwhelming majority) die locally, false negatives are impossible;
    3. an adaptive join of the survivors against the exact eval-hash table
       kills the Bloom false positives, and a per-doc count yields exactly
       `decontaminate`'s (doc_id, n_shared_kgrams).

    The shuffle is bounded by true matches + the Bloom FP rate times the
    train k-gram count — tunable via m_bits/j — never the corpus."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from .joins import adaptive_join, sized_groupby

    def ev_kernel(bt: pa.Table) -> pa.Table:
        h, _ = _kgram_hash_sets(bt.column(text_col), k)
        u = np.unique(h)
        return pa.table({"kh": pa.array(u.astype(np.int64))})

    ev = eval_ds.map_batches(ev_kernel, batch_format="pyarrow") \
        .materialize()                       # bounded by eval k-gram count
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for bt in ev.iter_batches(batch_format="pyarrow", batch_size=None):
        words |= bloom_build(
            bt.column("kh").to_numpy().astype(np.uint64), m_bits, j)
    import ray
    words_ref = ray.put(words)

    # the eval hash table may carry cross-block duplicates — dedup before
    # the join so the per-doc count stays exact
    ev_distinct = sized_groupby(ev, "kh",
                                Count(alias_name="_c")) \
        .map_batches(lambda b: b.select(["kh"]), batch_format="pyarrow")

    def tr_kernel(bt: pa.Table) -> pa.Table:
        h, o = _kgram_hash_sets(bt.column(text_col), k)
        ids = bt.column(id_col).to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(ids.size), np.diff(o))
        mask = bloom_test(ray.get(words_ref), h, j)
        return pa.table({id_col: pa.array(ids[doc_of[mask]]),
                         "kh": pa.array(h[mask].astype(np.int64))})

    cand = train_ds.map_batches(tr_kernel, batch_format="pyarrow")
    joined = adaptive_join(cand, ev_distinct, on="kh")
    out = sized_groupby(joined, id_col,
                        Count(alias_name="n_shared_kgrams"))
    schema = pa.schema([(id_col, pa.int64()),
                        ("n_shared_kgrams", pa.int64())])
    return collect_typed(out, schema)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (round-4)
# ---------------------------------------------------------------------------

def semantic_dedup(ds, tau_permille: int = 350, cluster_col: str = "label",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster_rows: int = 65536):
    """Semantic deduplication in the SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540 — cluster the embedding space, then prune near-
    duplicate pairs WITHIN each cluster only): a row is a semantic
    duplicate if an EARLIER row (smaller id) of the same cluster has
    cosine similarity >= tau_permille/1000.

    Exact integer contract (so a HUGEINT SQL oracle matches bit-for-bit):
    embeddings quantize to milli-units w = floor(x*1000 + 0.5) and
    cos >= tau/1000  <=>  dot > 0  AND  10^6*dot^2 >= tau^2*(a.a)*(b.b).
    Both sides overflow int64 (~3e20 at D=64), so the comparison runs in
    float64 — each side carries exactly one rounding (dot^2 and na*nb are
    < 2^53, hence exact) — and pairs inside a 4-ulp boundary band are
    re-checked with arbitrary-precision Python ints.  No pair is ever
    decided by inexact arithmetic.

    Scale shape: ONE shuffle (groupby cluster); within-cluster work is a
    BLOCKED int64 GEMM (column strips of 2048, peak memory O(k*block),
    never a k*k Gram matrix) — the k^2-inside-clusters regime SemDeDup
    prescribes (clusters of size ~n/K make the all-pairs matrix
    tractable where corpus-wide all-pairs is not).  Skew guard: any
    cluster above `max_cluster_rows` is re-clustered in-task by k-means
    and the kernel reruns per sub-cluster, recursively — so one hot
    cluster of 10M vectors costs O(sub^2 * n/sub) pair work instead of
    the 10^14-pair GEMM that would sink the stage (see
    `semantic_dup_flags_capped`).  Nothing touches the driver.
    Output: (id, cluster BIGINT, is_dup 0/1, n_cluster)."""
    return _semantic_dedup_impl(ds, tau_permille, cluster_col, id_col,
                                vec_col, max_cluster_rows)


def semantic_dup_flags(W: np.ndarray, tau: int,
                       block: int = 2048) -> np.ndarray:
    """Per-cluster decision kernel of `semantic_dedup`, rows already
    sorted by ascending id: W is the (k, D) int64 milli-quantized matrix;
    returns a bool[k] marking rows with an EARLIER (lower-index) row at
    cosine >= tau/1000, decided by the exact integer inequality
    10^6*dot^2 >= tau^2*na*nb (dot > 0) — float64 fast path, bigint
    re-check inside the 4-ulp boundary band.

    Blocked execution: columns are processed in `block`-wide strips and
    each strip's Gram panel is W[:j1] @ W[j0:j1].T, so peak memory is
    O(k * block) and the full k*k Gram matrix never exists.  The strict
    upper triangle also means each strip only multiplies against rows
    BEFORE its last column — total pair work is k^2/2, half the naive
    full-GEMM kernel.  Flags are bit-identical to the unblocked form."""
    k = W.shape[0]
    out = np.zeros(k, dtype=bool)
    if k < 2:
        return out
    nn = (W * W).sum(axis=1)          # exact int64 (milli-units, D small)
    nf = nn.astype(np.float64)
    tau2 = float(tau * tau)
    eps4 = 4.0 * np.finfo(np.float64).eps
    for j0 in range(1, k, block):
        j1 = min(j0 + block, k)
        G = W[:j1] @ W[j0:j1].T                     # (j1, b) int64 exact
        Gf = G.astype(np.float64)
        lhs = 1e6 * Gf * Gf
        rhs = tau2 * np.outer(nf[:j1], nf[j0:j1])
        pos = G > 0
        dup = pos & (lhs >= rhs)
        border = pos & (np.abs(lhs - rhs) <=
                        eps4 * np.maximum(lhs, rhs))
        if border.any():
            for i, jc in zip(*np.nonzero(border)):
                d = int(G[i, jc])
                dup[i, jc] = (d > 0 and 10**6 * d * d >=
                              tau * tau * int(nn[i]) * int(nn[j0 + jc]))
        # keep only strictly-earlier rows: row index i < column index j
        tri = (np.arange(j1)[:, None] < np.arange(j0, j1)[None, :])
        out[j0:j1] |= (dup & tri).any(axis=0)
    return out


def semantic_dup_flags_capped(ids: np.ndarray, W: np.ndarray, tau: int,
                              max_cluster_rows: int,
                              _depth: int = 0) -> np.ndarray:
    """Skew guard for `semantic_dedup`: a cluster larger than
    `max_cluster_rows` is re-clustered IN-TASK with k-means over the
    milli-quantized matrix and the decision kernel reruns per sub-cluster
    — the SemDeDup paper's own mitigation (Abbas et al. 2023 §3: "we
    cluster ... so that pairwise comparison within each cluster is
    tractable"), recursing until every leaf fits the cap.  Rows keep
    their global ascending-id order inside each sub-cluster, so each
    leaf's flags equal the uncapped kernel run on that leaf (the
    sub-cluster-blind contract: pairs across sub-clusters are not
    compared, exactly as pairs across top-level clusters never are).
    Degenerate splits (all points in one k-means cell, e.g. identical
    vectors) fall back to contiguous id-order chunks so recursion always
    terminates."""
    k = ids.size
    if k <= max_cluster_rows or _depth >= 12:
        return semantic_dup_flags(W, tau)
    from dggsray.ops.similarity import kmeans_centroids
    n_sub = min(int(np.ceil(k / max_cluster_rows)) + 1, 64)
    Xf = W.astype(np.float64)
    C = kmeans_centroids(Xf, n_sub, iters=4, seed=41 + _depth)
    d2 = ((Xf ** 2).sum(1)[:, None] - 2 * Xf @ C.T
          + (C ** 2).sum(1)[None, :])
    assign = d2.argmin(axis=1)
    uniq = np.unique(assign)
    out = np.zeros(k, dtype=bool)
    if uniq.size < 2 or (np.bincount(assign).max() >= k):
        for s in range(0, k, max_cluster_rows):
            e = min(s + max_cluster_rows, k)
            out[s:e] = semantic_dup_flags(W[s:e], tau)
        return out
    for c in uniq:
        m = assign == c
        out[m] = semantic_dup_flags_capped(ids[m], W[m], tau,
                                           max_cluster_rows, _depth + 1)
    return out


def _semantic_dedup_impl(ds, tau_permille, cluster_col, id_col, vec_col,
                         max_cluster_rows=65536):
    """Two-tier skew handling.  Tier 1 (distributed): a cheap
    groupby-count pass finds HOT clusters (> 4*cap rows); for the
    largest 64 of them, k-means centroids trained on a deterministic
    vec_id-strided sample are broadcast via ray.put and a map_batches
    pass re-keys hot rows to (cluster, sub-cell) — so one 10M-row
    cluster fans out over ~size/cap parallel group tasks instead of
    landing on one worker.  Tier 2 (in-task): any group still above the
    cap (moderately-hot clusters, residual oversize sub-cells) goes
    through `semantic_dup_flags_capped`'s recursive in-task split.
    Either way the pipeline stays ONE data shuffle; the count pass
    moves only (cluster, count) pairs and the training sample is
    bounded at 4096 rows x 64 clusters."""
    import ray

    tau = int(tau_permille)
    cap = int(max_cluster_rows)

    def _quantize(emb):
        return np.floor(emb.astype(np.float64) * 1000 + 0.5) \
            .astype(np.int64)

    def kernel_factory(hot_sizes_ref):
        def kernel(g: pa.Table) -> pa.Table:
            hs = ray.get(hot_sizes_ref) if hot_sizes_ref is not None \
                else {}
            ids = g.column(id_col).to_numpy().astype(np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            emb = np.stack(
                g.column(vec_col).to_numpy(zero_copy_only=False))[order]
            W = _quantize(emb)
            is_dup = semantic_dup_flags_capped(ids, W, tau, cap)
            k = ids.size
            lab = pc.cast(g.column(cluster_col), pa.int64())
            lab = lab.take(pa.array(order))
            n_cluster = hs.get(int(lab[0].as_py()), k) if k else k
            cols = {id_col: pa.array(ids),
                    cluster_col: lab,
                    "is_dup": pa.array(is_dup.astype(np.int64)),
                    "n_cluster": pa.array(np.full(k, n_cluster,
                                                  np.int64))}
            return pa.table(cols)
        return kernel

    # metadata-only gate: below ~16 MB of embeddings no cluster can be
    # hot enough for the distributed tier to beat the cost of its own
    # sizing pass — the in-task recursive cap still guards skew there
    try:
        small = (ds.size_bytes() or 0) < 16 * 1024 * 1024
    except Exception:
        small = False
    if small:
        return ds.groupby(cluster_col).map_groups(
            kernel_factory(None), batch_format="pyarrow")

    sizes = ds.groupby(cluster_col).count().to_pandas()
    cnt_col = [c for c in sizes.columns if c != cluster_col][0]
    hot = sizes[sizes[cnt_col] > 4 * cap] \
        .sort_values(cnt_col, ascending=False).head(64)
    hot_sizes = {int(r[cluster_col]): int(r[cnt_col])
                 for _, r in hot.iterrows()}

    if not hot_sizes:
        return ds.groupby(cluster_col).map_groups(
            kernel_factory(None), batch_format="pyarrow")

    # ---- tier 1: distributed sub-cell split for the hot clusters ----
    from dggsray.ops.similarity import kmeans_centroids

    strides = {c: max(1, n // 4096) for c, n in hot_sizes.items()}

    def sample_filter(b: pa.Table) -> pa.Table:
        lab = b.column(cluster_col).to_numpy()
        ids = b.column(id_col).to_numpy()
        keep = np.zeros(len(lab), dtype=bool)
        for c, s in strides.items():
            keep |= (lab == c) & (ids % s == 0)
        return b.select([cluster_col, id_col, vec_col]) \
            .filter(pa.array(keep))

    samp = ds.map_batches(sample_filter, batch_format="pyarrow") \
        .to_pandas()                      # bounded: <=4096 x 64 rows
    centroids = {}
    for c, n in hot_sizes.items():
        sub = samp[samp[cluster_col] == c]
        if len(sub) < 2:
            continue
        Wc = _quantize(np.stack(sub[vec_col].to_numpy())) \
            .astype(np.float64)
        n_sub = min(int(np.ceil(n / cap)) + 1, 256)
        centroids[c] = kmeans_centroids(Wc, n_sub, iters=4, seed=41)
    cref = ray.put(centroids)
    sref = ray.put(hot_sizes)

    def add_subkey(b: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        lab = pc.cast(b.column(cluster_col), pa.int64()).to_numpy()
        sub = np.zeros(len(lab), dtype=np.int64)
        for c, C in cents.items():
            m = lab == c
            if not m.any():
                continue
            Xf = _quantize(np.stack(
                b.column(vec_col).to_numpy(
                    zero_copy_only=False)[m])).astype(np.float64)
            d2 = ((Xf ** 2).sum(1)[:, None] - 2 * Xf @ C.T
                  + (C ** 2).sum(1)[None, :])
            sub[m] = d2.argmin(axis=1)
        # injective (cluster, sub) -> int64: sub < 65536 by construction
        return b.append_column("_subkey",
                               pa.array(lab * 65536 + sub))

    keyed = ds.map_batches(add_subkey, batch_format="pyarrow")
    out = keyed.groupby("_subkey").map_groups(
        kernel_factory(sref), batch_format="pyarrow")
    return out.drop_columns(["_subkey"]) \
        if "_subkey" in out.schema().names else out
