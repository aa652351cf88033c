"""Deterministic sampling + token-budget packing (ops/sampling.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dggsray.ops.sampling import hash_sample, pack_token_batches, _KNUTH, _MOD


def _docs(ids, langs=None, texts=None):
    t = {"doc_id": pa.array(ids, pa.int64())}
    if langs is not None:
        t["lang"] = pa.array(langs, pa.string())
    if texts is not None:
        t["text"] = pa.array(texts, pa.string())
    return rd.from_arrow(pa.table(t))


class TestHashSample:
    def test_matches_reference_rule_and_is_deterministic(self, ray_session):
        rng = np.random.default_rng(3)
        ids = rng.choice(100_000, size=2000, replace=False)
        langs = rng.choice(["en", "es", "xx"], size=2000)
        rates = {"en": 300, "es": 100}
        ds = _docs(ids, langs)
        out1 = hash_sample(ds, rates, "doc_id", "lang").to_pandas()
        out2 = hash_sample(ds, rates, "doc_id", "lang").to_pandas()
        assert out1.sort_values("doc_id").equals(out2.sort_values("doc_id"))
        keep = (ids.astype(np.int64) * _KNUTH) % _MOD % 1000
        expect = set()
        for i, l, k in zip(ids, langs, keep):
            if k < rates.get(l, 0):     # unknown stratum -> default 0 = drop
                expect.add(int(i))
        assert set(out1.doc_id) == expect

    def test_rate_bounds(self, ray_session):
        ids = np.arange(500)
        ds = _docs(ids, ["en"] * 500)
        assert hash_sample(ds, {"en": 1000}, "doc_id", "lang").count() == 500
        assert hash_sample(ds, {"en": 0}, "doc_id", "lang").count() == 0


class TestPackTokenBatches:
    def _brute(self, ids, ntoks, budget):
        order = np.argsort(ids)
        excl = np.concatenate([[0], np.cumsum(ntoks[order][:-1])])
        bid = excl // budget
        out = {}
        for i, b in zip(np.asarray(ids)[order], bid):
            out[int(i)] = int(b)
        return out

    def test_matches_brute_force_with_sparse_ids(self, ray_session):
        rng = np.random.default_rng(11)
        ids = np.sort(rng.choice(1_000_000, size=3000, replace=False))
        rng.shuffle(ids)                       # arrival order is not id order
        texts = [" ".join(["w"] * int(n)) for n in rng.integers(1, 60, 3000)]
        ntoks = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)
        ds = _docs(ids, texts=texts)
        got = pack_token_batches(ds, budget=512, n_ranges=16).to_pandas()
        brute = self._brute(ids, ntoks, 512)
        assert len(got) == 3000
        assert all(brute[int(i)] == int(b)
                   for i, b in zip(got.doc_id, got.batch_id))
        # token counts carried through
        lookup = dict(zip(ids.tolist(), ntoks.tolist()))
        assert all(lookup[int(i)] == int(n)
                   for i, n in zip(got.doc_id, got.n_tokens))

    def test_precomputed_token_column(self, ray_session):
        ids = np.arange(100, dtype=np.int64)
        n = np.full(100, 10, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                     "n_tok": pa.array(n)}))
        got = pack_token_batches(ds, budget=100, token_col="n_tok",
                                 n_ranges=4).to_pandas().sort_values("doc_id")
        # 10 docs x 10 tokens fill each 100-token batch exactly
        assert got.batch_id.tolist() == [i // 10 for i in range(100)]

    def test_single_range(self, ray_session):
        ids = np.array([5, 3, 9], dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                     "n_tok": pa.array([7, 4, 2], pa.int64())}))
        got = pack_token_batches(ds, budget=10, token_col="n_tok",
                                 n_ranges=1).to_pandas().sort_values("doc_id")
        # order by id: 3(4),5(7),9(2) -> excl 0,4,11 -> batches 0,0,1
        assert got.batch_id.tolist() == [0, 0, 1]


class TestRepetitionMetrics:
    def test_known_counts_and_edges(self, ray_session):
        from dggsray.ops.text import with_repetition
        texts = ["a b a b c",          # 5 tok, 3 distinct; bigrams ab,ba,ab,bc -> 3 distinct
                 "x x x x",            # 4/1; bigrams xx,xx,xx -> 1
                 "",                   # 0/0, 0/0
                 "   ",                # whitespace only -> 0 tokens
                 "solo",               # 1/1, 0 bigrams
                 "é ü é"]              # unicode: 3/2; bigrams éü,üé -> 2
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(6), pa.int64()),
                                     "text": pa.array(texts)}))
        out = with_repetition(ds).to_pandas().sort_values("doc_id")
        assert out.n_tokens.tolist() == [5, 4, 0, 0, 1, 3]
        assert out.n_distinct_tokens.tolist() == [3, 1, 0, 0, 1, 2]
        assert out.n_bigrams.tolist() == [4, 3, 0, 0, 0, 2]
        assert out.n_distinct_bigrams.tolist() == [3, 1, 0, 0, 0, 2]


class TestNgramJaccardPairs:
    def test_planted_pairs_and_short_doc_exclusion(self, ray_session):
        from dggsray.ops.dedup import ngram_jaccard_pairs
        texts = ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy cat",   # near-dup of 0
                 "completely different words entirely here now",
                 "solo",                                          # 0 bigrams
                 "the quick brown fox jumps over the lazy dog"]   # exact dup of 0
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(5), pa.int64()),
                                     "text": pa.array(texts)}))
        out = ngram_jaccard_pairs(ds, 0.5).to_pandas()
        pairs = set(zip(out.id_a, out.id_b))
        assert (0, 4) in pairs                 # identical docs
        assert (0, 1) in pairs and (1, 4) in pairs   # 7/9 common bigrams
        assert all(3 not in p for p in pairs)  # <2-token doc excluded
        exact = out[(out.id_a == 0) & (out.id_b == 4)].jac_micro.iloc[0]
        assert exact == 1_000_000
        near = out[(out.id_a == 0) & (out.id_b == 1)].jac_micro.iloc[0]
        assert near == 7 * 1_000_000 // 9      # |inter|=7, |union|=9


class TestCorpusPipeline:
    def test_matches_pandas_brute_force(self, ray_session, tmp_path):
        import pandas as pd
        from dggsray.pipelines.relational import (
            CORPUS_MAX_CHARS, CORPUS_MIN_TOKENS, PACK_TOKEN_BUDGET,
            SAMPLE_RATES_PER_MILLE, docs_corpus_pipeline)
        rng = np.random.default_rng(17)
        rows = []
        langs = list(SAMPLE_RATES_PER_MILLE) + ["xx"]
        for i in range(800):
            n_words = int(rng.integers(1, 80))
            text = " ".join(rng.choice(["alpha", "beta", "gamma", "delta",
                                        "eps"], n_words))
            rows.append({"doc_id": i, "text": text,
                         "lang": langs[int(rng.integers(0, len(langs)))]})
        # plant exact duplicates with later ids
        for j in range(40):
            src = rows[int(rng.integers(0, 800))]
            rows.append({"doc_id": 800 + j, "text": src["text"],
                         "lang": src["lang"]})
        df = pd.DataFrame(rows)
        pa_tbl = pa.Table.from_pandas(df, preserve_index=False)
        import pyarrow.parquet as pq
        sf_dir = str(tmp_path)
        pq.write_table(pa_tbl, f"{sf_dir}/documents.parquet")

        got = docs_corpus_pipeline(sf_dir).to_pandas() \
            .sort_values("batch_id").reset_index(drop=True)

        # pandas brute force of the same chain
        df["n"] = df.text.str.split(r"\s+").map(len)
        q = df[(df.n >= CORPUS_MIN_TOKENS) & (df.text.str.len() <= CORPUS_MAX_CHARS)]
        keep = q.groupby("text", sort=False).doc_id.min()
        d = q[q.doc_id.isin(set(keep))]
        key = (d.doc_id.to_numpy().astype(np.int64) * 2654435761) % (1 << 32) % 1000
        rate = d.lang.map(lambda l: SAMPLE_RATES_PER_MILLE.get(l, 0)).to_numpy()
        s = d[key < rate].sort_values("doc_id")
        excl = np.concatenate([[0], np.cumsum(s.n.to_numpy()[:-1])])
        bid = excl // PACK_TOKEN_BUDGET
        exp = pd.DataFrame({"batch_id": bid, "n": s.n.to_numpy()}) \
            .groupby("batch_id").agg(sum_tokens=("n", "sum"),
                                     n_docs=("n", "count")).reset_index()
        assert got.batch_id.tolist() == exp.batch_id.tolist()
        assert got.sum_tokens.tolist() == exp.sum_tokens.tolist()
        assert got.n_docs.tolist() == exp.n_docs.tolist()


class TestExactGroupMedian:
    def test_matches_numpy_order_statistics(self, ray_session):
        from dggsray.ops.quantile import exact_group_median
        rng = np.random.default_rng(23)
        groups, vals = [], []
        sizes = {"a": 10001, "b": 5000, "c": 1, "d": 2}
        for g, n in sizes.items():
            groups += [g] * n
            vals.append(rng.normal(float(ord(g)), 7.0, n))
        # degenerate: all-identical values (histogram short-circuit path)
        groups += ["e"] * 999
        vals.append(np.full(999, 42.5))
        v = np.concatenate(vals)
        perm = rng.permutation(len(groups))
        t = pa.table({"g": pa.array(np.array(groups, dtype=object)[perm],
                                    pa.string()),
                      "v": pa.array(v[perm])})
        out = exact_group_median(rd.from_arrow(t), "v", "g").to_pandas() \
            .set_index("g")
        for g in list(sizes) + ["e"]:
            sv = np.sort(v[np.array(groups) == g])
            n = len(sv)
            assert out.loc[g, "med_lo"] == sv[(n - 1) // 2], g
            assert out.loc[g, "med_hi"] == sv[n // 2], g
            assert out.loc[g, "n"] == n


class TestAVQueries:
    def test_audio_and_video_queries_deterministic(self, ray_session):
        from dggsray.pipelines.relational import audio_features, video_frames
        a1 = audio_features("/root/testdata/sf0.001").to_pandas() \
            .sort_values("audio_id").reset_index(drop=True)
        a2 = audio_features("/root/testdata/sf0.001").to_pandas() \
            .sort_values("audio_id").reset_index(drop=True)
        assert len(a1) == 40 and a1.equals(a2)
        assert (a1.n_samples == 2000).all()
        assert (a1.rms_micro > 0).all() and (a1.peak_micro <= 1_000_000).all()
        v = video_frames("/root/testdata/sf0.001").to_pandas()
        assert len(v) == 20 * 3              # 6 frames sampled every 2
        assert set(v.frame_idx) == {0, 2, 4}
        assert v.mean_milli.between(0, 255_000).all()
        # in-row oracles: WAV-decoded features == container-free regenerated
        # features; JPEG-decoded frame brightness within the q95 budget of
        # the regenerated frame
        assert a1.check_ok.all()
        assert v.check_ok.all()


class TestVocabAndProps:
    def test_vocab_topk_matches_bruteforce(self, ray_session):
        from collections import Counter
        import pyarrow.parquet as pq
        from dggsray.pipelines.relational import docs_vocab_topk

        out = docs_vocab_topk("/root/testdata/sf0.001", k=10).to_pandas()
        texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["text"]).column("text").to_pylist()
        c = Counter(w for t in texts for w in t.split())
        exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(map(tuple, out[["token", "n"]].values)) == exp

    def test_props_extract_matches_json_loads(self, ray_session):
        import json
        import pyarrow.parquet as pq
        from dggsray.pipelines.relational import events_props_extract

        out = events_props_extract("/root/testdata/sf0.001").to_pandas() \
            .set_index("event_type")
        t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                          columns=["event_type", "props"]).to_pandas()
        t["k"] = [json.loads(p)["k"] for p in t.props]
        exp = t.groupby("event_type").agg(sum_k=("k", "sum"),
                                          max_k=("k", "max"),
                                          n_events=("k", "size"))
        for et, row in exp.iterrows():
            assert out.loc[et, "sum_k"] == row.sum_k
            assert out.loc[et, "max_k"] == row.max_k
            assert out.loc[et, "n_events"] == row.n_events


class TestVideoSceneCuts:
    def test_cut_detected_at_luminance_wrap(self, ray_session):
        """Every synthetic clip's base luminance is 20*((idx+f) % 5): the one
        frame transition where the cycle wraps (drop of 80) must be flagged,
        and smooth +20 transitions must not."""
        from dggsray.pipelines.relational import video_scene_cuts

        out = video_scene_cuts("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0 and out.is_cut.all()
        for r in out.itertuples():
            idx = int(r.video_id[1:])
            # wrap transition: (idx + f) % 5 == 0 for f in 1..5
            assert (idx + r.frame_idx) % 5 == 0, (r.video_id, r.frame_idx)
            assert r.diff_milli > 50_000
        # exactly one cut per clip that has a wrap within its 6 frames
        assert (out.groupby("video_id").size() == 1).all()
        # in-row oracle: cut lands at the analytically expected transition
        assert out.check_ok.all()

    def test_rawv_path_and_short_clip(self, ray_session):
        import ray.data as rd
        from dggsray.ops.multimodal import VideoSceneCuts

        w, h = 4, 3
        a = np.zeros((h, w, 3), np.uint8)
        b_ = np.full((h, w, 3), 200, np.uint8)
        clip = a.tobytes() + b_.tobytes() + b_.tobytes()
        t = pa.table({"video_id": pa.array(["r1", "short"], pa.string()),
                      "w": pa.array([w, w], pa.int32()),
                      "h": pa.array([h, h], pa.int32()),
                      "fmt": pa.array(["rawv", "rawv"], pa.string()),
                      "bytes": pa.array([clip, a.tobytes()], pa.binary())})
        out = rd.from_arrow(t).map_batches(
            VideoSceneCuts, concurrency=1, batch_format="pyarrow").to_pandas()
        assert set(out.video_id) == {"r1"}      # <2 frames -> no rows
        assert out.loc[out.frame_idx == 1, "diff_milli"].iloc[0] == 200_000
        assert bool(out.loc[out.frame_idx == 1, "is_cut"].iloc[0])
        assert not bool(out.loc[out.frame_idx == 2, "is_cut"].iloc[0])


class TestChunkWindows:
    def test_overlap_structure_and_edges(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from dggsray.pipelines.relational import docs_chunk_windows

        out = docs_chunk_windows("/root/testdata/sf0.001").to_pandas()
        # chunk j holds exactly min(n_doc - j*stride, chunk) tokens, and when
        # a chunk is full, the next one overlaps it by chunk - stride tokens
        for did, g in out.groupby("doc_id"):
            g = g.sort_values("chunk_idx")
            assert list(g.chunk_idx) == list(range(len(g)))
            n_doc = max(g.n_tokens + g.chunk_idx * 24)
            exp = np.minimum(n_doc - g.chunk_idx * 24, 32)
            assert (g.n_tokens.to_numpy() == exp.to_numpy()).all()
            if len(g) >= 2 and g.n_tokens.iloc[0] == 32:
                a = g.chunk_text.iloc[0].split()
                b = g.chunk_text.iloc[1].split()
                assert a[24:] == b[:8]      # stride-24 overlap of 8 tokens
        # reconstruction: stride-aligned concatenation restores the doc
        import pyarrow.parquet as pq
        texts = dict(zip(*[pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"]).column(c).to_pylist()
            for c in ("doc_id", "text")]))
        did = int(out.doc_id.iloc[0])
        g = out[out.doc_id == did].sort_values("chunk_idx")
        toks = []
        for _, r in g.iterrows():
            toks.extend(r.chunk_text.split()[len(toks) - 24 * r.chunk_idx:])
        assert toks == texts[did].split()
