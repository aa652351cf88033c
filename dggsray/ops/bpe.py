"""Distributed byte-pair-encoding merge learning — the tokenizer-training
operator of an LLM data pipeline.

Each of the `n_merges` rounds is ONE streaming pass: every block re-derives
its current segmentation from raw bytes by replaying the merge list learned
so far (stateless tasks — nothing to keep consistent across workers or
resumes), counts adjacent token pairs vectorized (packed uint64 keys,
np.unique), and ships (pair, count) partials; a keyed Sum + partial top-1
picks the round's winner.  The shuffle per round is bounded by
(distinct pairs x blocks) — pair vocabulary, never corpus bytes — and the
merge list itself is tiny (n_merges entries) so replay broadcast is free.

Determinism: ties break on the smallest packed pair key; leftmost-first
application within runs matches the classic sequential BPE exactly (for a
run of the same mergeable pair, the even-indexed occurrences merge).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["apply_merges", "pair_counts", "learn_bpe"]

_PACK = np.uint64(1) << np.uint64(32)


def _flatten(texts: list[bytes]):
    """Concatenated int32 token array (initial vocab = bytes 0..255) +
    doc offsets."""
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    buf = b"".join(texts)
    return np.frombuffer(buf, np.uint8).astype(np.int32), off


def apply_merges(tok: np.ndarray, off: np.ndarray,
                 merges: list[tuple[int, int, int]]):
    """Replay `merges` (a, b, new_id) in learned order over the concatenated
    token array.  Pairs never span doc boundaries; leftmost-first within
    runs (even-indexed matches of each consecutive-match run merge)."""
    for a, b, new_id in merges:
        if tok.size < 2:
            break
        m = (tok[:-1] == a) & (tok[1:] == b)
        # no pair across doc boundaries: position i pairs (i, i+1); kill i
        # when i+1 is a doc start
        starts = off[1:-1]
        m[starts[(starts > 0) & (starts < tok.size)] - 1] = False
        if not m.any():
            continue
        if a == b:
            # leftmost-first inside runs of consecutive matches: keep the
            # even-indexed match of each run
            run_start = np.flatnonzero(m & ~np.r_[False, m[:-1]])
            idx = np.flatnonzero(m)
            rs = run_start[np.searchsorted(run_start, idx, side="right") - 1]
            m[idx[(idx - rs) % 2 == 1]] = False
        else:
            # distinct symbols cannot chain (…a b a b… has no overlapping
            # (a,b) at adjacent positions), no thinning needed
            pass
        pos = np.flatnonzero(m)
        tok = tok.copy()
        tok[pos] = new_id
        drop = np.zeros(tok.size, dtype=bool)
        drop[pos + 1] = True
        # remap offsets: each doc loses its merged positions
        removed_before = np.concatenate([[0], np.cumsum(drop)])
        off = off - removed_before[off]
        tok = tok[~drop]
    return tok, off


def pair_counts(tok: np.ndarray, off: np.ndarray):
    """(packed uint64 pair keys, int64 counts) of adjacent pairs, doc-local."""
    if tok.size < 2:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    a = tok[:-1].astype(np.uint64)
    b = tok[1:].astype(np.uint64)
    valid = np.ones(tok.size - 1, dtype=bool)
    starts = off[1:-1]
    valid[starts[(starts > 0) & (starts < tok.size)] - 1] = False
    keys = a[valid] * _PACK + b[valid]
    u, c = np.unique(keys, return_counts=True)
    return u, c.astype(np.int64)


def _seg_to_list(tok: np.ndarray, off: np.ndarray) -> pa.Table:
    """Concatenated tokens + doc offsets -> one large_list<int32> row per doc.
    int64 offsets so a block's TOTAL token count is not capped at 2^31 (the
    per-token vocab-id domain stays int32)."""
    return pa.table({"tokens": pa.LargeListArray.from_arrays(
        pa.array(off, pa.int64()), pa.array(tok, pa.int32()))})


def _seg_from_list(bt: pa.Table):
    """Inverse of _seg_to_list (zero-copy views of the Arrow buffers)."""
    col = bt.column("tokens")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = pc.list_value_length(arr).to_numpy().astype(np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    return pc.list_flatten(arr).to_numpy().astype(np.int32), off


def learn_bpe(ds, n_merges: int, text_col: str = "text",
              checkpoint_every: int = 16, stats: dict | None = None):
    """Learn `n_merges` BPE merges over a Dataset's text column.  Returns a
    typed Arrow table (rank, left_id, right_id, new_id, pair_count) — the
    merge table a tokenizer trainer persists.

    Each round is one streaming pass over the CHECKPOINTED segmentation (a
    materialized list<int32>-per-doc Dataset, advanced through the learned
    merges every `checkpoint_every` rounds), replaying only the merges since
    the last checkpoint — so learn cost is O(n_merges * corpus *
    checkpoint_every) token touches instead of the O(n_merges^2 * corpus) a
    full from-raw-bytes replay costs at real (30k-merge) vocabulary sizes.
    Tasks stay stateless between checkpoints (a dead worker re-derives its
    block from the checkpoint + the tiny broadcast merge list), and the
    checkpoint only ever SHRINKS below the tokenized corpus — the same
    object-store residency class as the input."""
    from ray.data.aggregate import Sum

    from .joins import sized_groupby
    from .topk import partial_topk

    def tokenize(bt: pa.Table) -> pa.Table:
        texts = [t.encode("utf-8", "ignore")
                 for t in bt.column(text_col).to_pylist()]
        return _seg_to_list(*_flatten(texts))

    seg = ds.map_batches(tokenize, batch_format="pyarrow").materialize()
    since: list[tuple[int, int, int]] = []   # merges since last checkpoint
    out = []
    replayed = 0           # merge-applications per corpus pass, summed —
    #                        the quantity checkpointing exists to bound
    for r in range(n_merges):
        cur = list(since)  # captured by value: tiny
        replayed += len(cur)

        def kernel(bt: pa.Table) -> pa.Table:
            tok, off = _seg_from_list(bt)
            tok, off = apply_merges(tok, off, cur)
            u, c = pair_counts(tok, off)
            return pa.table({"pair": pa.array(u.astype(np.int64)),
                             "n": pa.array(c)})

        tot = sized_groupby(seg.map_batches(kernel, batch_format="pyarrow"),
                            "pair", Sum("n", alias_name="n"))
        top = partial_topk(tot, ["n", "pair"], [True, False], 1).to_pandas()
        if top.empty or int(top["n"].iloc[0]) < 2:
            break
        key = np.uint64(top["pair"].iloc[0])
        a = int(key // _PACK)
        b = int(key % _PACK)
        new_id = 256 + r
        since.append((a, b, new_id))
        out.append((r, a, b, new_id, int(top["n"].iloc[0])))
        if len(since) >= checkpoint_every and r < n_merges - 1:
            cp = list(since)

            def advance(bt: pa.Table) -> pa.Table:
                return _seg_to_list(*apply_merges(*_seg_from_list(bt), cp))

            seg = seg.map_batches(advance,
                                  batch_format="pyarrow").materialize()
            replayed += len(cp)              # the one advance pass
            since = []
    if stats is not None:
        stats["replayed_merges"] = replayed

    return pa.table({
        "rank": pa.array([o[0] for o in out], pa.int64()),
        "left_id": pa.array([o[1] for o in out], pa.int64()),
        "right_id": pa.array([o[2] for o in out], pa.int64()),
        "new_id": pa.array([o[3] for o in out], pa.int64()),
        "pair_count": pa.array([o[4] for o in out], pa.int64())})
