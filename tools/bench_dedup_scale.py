"""At-scale dedup-family record (VERDICT r4 item #5, the mirror of the
10x events window record): a 50,000-document corpus (10x sf0.1) with
planted near-duplicate groups runs the full retention pipeline

    minhash_dedup -> connected_components -> docs_retained_after_dedup

end to end, with conservation invariants verified:
  * retained + dropped = corpus (exact partition);
  * every dropped doc's component keeps exactly its minimum doc_id, and
    that representative IS retained.

Prints one JSON line for BENCH/SCALE records.

Usage:  python tools/bench_dedup_scale.py [n_docs]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_WORDS = np.array(["alpha", "bravo", "charlie", "delta", "echo", "fox",
                   "golf", "hotel", "india", "julie", "kilo", "lima",
                   "mike", "nov", "oscar", "papa", "quebec", "romeo",
                   "sierra", "tango", "uni", "victor", "whiskey", "xray",
                   "yankee", "zulu"])


def synth_corpus(tmp: str, n_docs: int) -> str:
    """Deterministic corpus with planted near-dup groups: ~60% of docs
    belong to a duplicate group of size 2-5 whose members differ by a
    few word substitutions (above-threshold Jaccard), the rest unique."""
    rng = np.random.default_rng(23)
    texts, ids = [], []
    doc_id = 0
    while doc_id < n_docs:
        base = _WORDS[rng.integers(0, _WORDS.size, 40)]
        g = int(rng.integers(1, 6)) if rng.random() < 0.6 else 1
        for _ in range(min(g, n_docs - doc_id)):
            t = base.copy()
            k = int(rng.integers(0, 3))          # 0-2 substitutions
            if k:
                idx = rng.integers(0, t.size, k)
                t[idx] = _WORDS[rng.integers(0, _WORDS.size, k)]
            texts.append(" ".join(t))
            ids.append(doc_id)
            doc_id += 1
    path = os.path.join(tmp, "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["synth"] * len(ids)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}), path)
    return tmp


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    import tempfile

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    from dggsray.pipelines.relational import (docs_dup_components,
                                              docs_minhash_dedup,
                                              docs_retained_after_dedup)

    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = synth_corpus(tmp, n_docs)

        t0 = time.perf_counter()
        pairs = docs_minhash_dedup(sf_dir)
        n_pairs = pairs.num_rows
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        cc = docs_dup_components(sf_dir).to_pandas()
        t_cc = time.perf_counter() - t0

        t0 = time.perf_counter()
        kept = docs_retained_after_dedup(sf_dir).to_pandas()
        t_keep = time.perf_counter() - t0

        kept_ids = set(kept.doc_id.tolist())
        dropped = n_docs - len(kept_ids)
        # invariant 1: retained + dropped = corpus, no phantom ids
        assert len(kept.doc_id.unique()) == len(kept_ids)
        assert kept_ids <= set(range(n_docs))
        # invariant 2: each component keeps exactly its min doc, and every
        # dropped doc's representative is retained
        by_label = cc.groupby("component")["doc_id"]
        for label, nodes in by_label:
            nodes = set(nodes.tolist())
            rep = min(nodes)
            assert rep == label
            assert rep in kept_ids
            assert all(n not in kept_ids for n in nodes - {rep})
        assert dropped == int((cc.doc_id != cc.component).sum())

    wall = t_pairs + t_cc + t_keep
    print(json.dumps({
        "metric": "dedup-family 10x end-to-end (minhash->cc->retain)",
        "n_docs": n_docs, "n_pairs": int(n_pairs),
        "n_dropped": int(dropped), "n_retained": len(kept_ids),
        "pairs_s": round(t_pairs, 2), "cc_s": round(t_cc, 2),
        "retain_s": round(t_keep, 2), "value": round(wall, 2),
        "unit": "sec", "docs_per_sec": round(n_docs / wall, 1),
        "invariants_ok": True,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
