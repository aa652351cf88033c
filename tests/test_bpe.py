"""Distributed BPE merge learning (`dggsray/ops/bpe.py`) vs a sequential
reference implementation."""
import numpy as np
import pyarrow as pa


def _ref_bpe(texts, n_merges):
    """Plain sequential BPE: global pair counts over per-doc token lists,
    best pair by (count desc, packed key asc), leftmost-first apply."""
    docs = [list(t.encode("utf-8")) for t in texts]
    merges = []
    for r in range(n_merges):
        counts = {}
        for d in docs:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] = counts.get((d[i], d[i + 1]), 0) + 1
        if not counts:
            break
        best = min(counts.items(),
                   key=lambda kv: (-kv[1], kv[0][0] * (1 << 32) + kv[0][1]))
        (a, b), n = best
        if n < 2:
            break
        new_id = 256 + r
        merges.append((r, a, b, new_id, n))
        out_docs = []
        for d in docs:
            nd, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    nd.append(new_id)
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            out_docs.append(nd)
        docs = out_docs
    return merges, docs


class TestApplyMerges:
    def test_run_semantics_same_symbol(self):
        from dggsray.ops.bpe import apply_merges, _flatten
        tok, off = _flatten([b"aaaa", b"aaa"])
        out, off2 = apply_merges(tok, off, [(97, 97, 300)])
        # 'aaaa' -> [300, 300]; 'aaa' -> [300, 97]
        assert out.tolist() == [300, 300, 300, 97]
        assert off2.tolist() == [0, 2, 4]

    def test_no_merge_across_doc_boundary(self):
        from dggsray.ops.bpe import apply_merges, _flatten
        tok, off = _flatten([b"xa", b"bx"])
        out, off2 = apply_merges(tok, off, [(97, 98, 300)])
        assert out.tolist() == list(b"xa") + list(b"bx")
        assert off2.tolist() == [0, 2, 4]

    def test_chained_merges(self):
        from dggsray.ops.bpe import apply_merges, _flatten
        # (a,b)->X then (X,c)->Y: 'abc' collapses to [Y]
        tok, off = _flatten([b"abc"])
        out, _ = apply_merges(tok, off, [(97, 98, 300), (300, 99, 301)])
        assert out.tolist() == [301]


class TestLearnBpe:
    def test_matches_sequential_reference(self, ray_session):
        import ray.data as rd
        from dggsray.ops.bpe import learn_bpe
        rng = np.random.default_rng(27)
        alphabet = list("abcdef ")
        texts = ["".join(rng.choice(alphabet, rng.integers(5, 60)))
                 for _ in range(120)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})) \
            .repartition(5)
        got = learn_bpe(ds, 8).to_pandas()
        exp, _ = _ref_bpe(texts, 8)
        assert [tuple(r) for r in got.itertuples(index=False)] == exp

    def test_query_runs(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["docs_bpe_merges"]("/root/testdata/sf0.001") \
            .to_pandas()
        assert len(df) >= 4
        assert (df.new_id == 256 + df["rank"]).all()
        # counts are non-increasing is NOT guaranteed for BPE, but every
        # learned merge must have occurred at least twice
        assert (df.pair_count >= 2).all()
