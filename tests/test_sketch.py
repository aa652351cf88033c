"""Mergeable sketches (`dggsray/ops/sketch.py`): HyperLogLog distinct
counting and the exact two-pass heavy-hitter operator."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class TestHLL:
    def test_error_bound_ints(self):
        from dggsray.ops.sketch import hll_estimate, hll_registers_batch
        rng = np.random.default_rng(3)
        for n in (1_000, 50_000):
            vals = rng.choice(10 * n, n, replace=False).astype(np.int64)
            est = hll_estimate(hll_registers_batch(vals, p=14))
            # standard error at p=14 is ~0.8%; allow 4 sigma
            assert abs(est - n) / n < 0.033, (n, est)

    def test_duplicates_dont_inflate(self):
        from dggsray.ops.sketch import hll_estimate, hll_registers_batch
        vals = np.arange(2_000, dtype=np.int64)
        one = hll_estimate(hll_registers_batch(vals, p=14))
        rep = hll_estimate(hll_registers_batch(np.tile(vals, 50), p=14))
        assert one == rep

    def test_merge_equals_single_pass(self):
        from dggsray.ops.sketch import hll_merge, hll_registers_batch
        rng = np.random.default_rng(7)
        vals = rng.integers(0, 1 << 40, 30_000).astype(np.int64)
        whole = hll_registers_batch(vals, p=12)
        parts = [hll_registers_batch(c, p=12)
                 for c in np.array_split(vals, 7)]
        merged = parts[0]
        for q in parts[1:]:
            merged = hll_merge(merged, q)
        assert np.array_equal(whole, merged)

    def test_string_hash_stable_and_small_range(self):
        from dggsray.ops.sketch import hll_estimate, hll_registers_batch
        vals = pa.array([f"user-{i}" for i in range(300)] * 3)
        est = hll_estimate(hll_registers_batch(vals, p=14))
        # linear-counting regime: near-exact for n << 2^p
        assert abs(est - 300) < 6
        est2 = hll_estimate(hll_registers_batch(vals, p=14))
        assert est == est2

    def test_hll_distinct_dataset(self, ray_session):
        import ray.data as rd
        from dggsray.ops.sketch import hll_distinct
        t = pa.table({"u": pa.array(np.arange(5_000, dtype=np.int64))})
        est = hll_distinct(rd.from_arrow(t).repartition(8), "u", p=14)
        assert abs(est - 5_000) / 5_000 < 0.033


def _tok_kernel():
    """Nested so cloudpickle ships it by value (test modules are not
    importable inside Ray workers)."""
    def tok(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.list_flatten(
            pc.split_pattern_regex(b.column("text"), r"\s+"))
        return pa.table({"token": toks.filter(pc.not_equal(toks, ""))})
    return tok


class TestHeavyHitters:
    def test_exact_vs_bruteforce(self, ray_session):
        import ray.data as rd
        from dggsray.ops.sketch import heavy_hitters
        rng = np.random.default_rng(9)
        # zipf-ish corpus: token w{i} with weight 1/(i+1)
        words = [f"w{i}" for i in range(200)]
        wts = 1.0 / np.arange(1, 201)
        wts /= wts.sum()
        texts = [" ".join(rng.choice(words, 40, p=wts)) for _ in range(300)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})) \
            .repartition(6)
        phi = 15_000  # 1.5%
        out = heavy_hitters(ds, _tok_kernel(), phi).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        # brute force
        from collections import Counter
        c = Counter(w for t in texts for w in t.split())
        total = sum(c.values())
        exp = sorted([(w, n) for w, n in c.items()
                      if n * 1_000_000 >= phi * total])
        assert list(zip(out.token, out.n)) == exp
        assert (out.n_total == total).all()

    def test_empty_when_uniform_below_threshold(self, ray_session):
        import ray.data as rd
        from dggsray.ops.sketch import heavy_hitters
        texts = [" ".join(f"t{i}-{j}" for j in range(20))
                 for i in range(50)]  # every token unique
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        out = heavy_hitters(ds, _tok_kernel(), 10_000).to_pandas()
        assert len(out) == 0
        assert list(out.columns) == ["token", "n", "n_total"]


class TestNewQueriesOracle:
    def test_match_duckdb_sf0001(self, ray_session):
        import sys
        import duckdb
        import pandas as pd
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ("documents", "events"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for q in ("docs_heavy_hitters", "events_distinct_users"):
            res = E.queries()[q](sf)
            eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            exp = con.sql(E.oracle_sql()[q]).df()
            cols = sorted(exp.columns)
            eng = eng[cols].sort_values(cols).reset_index(drop=True)
            exp = exp[cols].sort_values(cols).reset_index(drop=True)
            assert eng.equals(exp), q

    def test_hll_query_sane(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        t = E.queries()["events_distinct_users_hll"]("/root/testdata/sf0.001")
        df = t.to_pandas()
        assert len(df) == 5
        # small-range regime: HLL should be near-exact here
        assert (abs(df.n_users_hll - df.n_users_exact)
                <= np.maximum(2, df.n_users_exact * 0.05)).all()


class TestSketchProperties:
    """Hypothesis invariants for the sketch kernels (no Ray needed)."""

    def test_hll_merge_commutative_associative_idempotent(self):
        from hypothesis import given, settings, strategies as st
        from dggsray.ops.sketch import hll_merge, hll_registers_batch

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.integers(-2**62, 2**62), max_size=200),
               st.lists(st.integers(-2**62, 2**62), max_size=200),
               st.lists(st.integers(-2**62, 2**62), max_size=200))
        def run(a, b, c):
            ra, rb, rc = (hll_registers_batch(
                np.array(x, dtype=np.int64), p=8) for x in (a, b, c))
            assert np.array_equal(hll_merge(ra, rb), hll_merge(rb, ra))
            assert np.array_equal(
                hll_merge(hll_merge(ra, rb), rc),
                hll_merge(ra, hll_merge(rb, rc)))
            assert np.array_equal(hll_merge(ra, ra), ra)
            # union bound: merged registers dominate both inputs
            assert (hll_merge(ra, rb) >= ra).all()

        run()

    def test_hll_estimate_monotone_under_merge(self):
        from hypothesis import given, settings, strategies as st
        from dggsray.ops.sketch import (hll_estimate, hll_merge,
                                        hll_registers_batch)

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.integers(0, 2**40), min_size=1, max_size=300),
               st.lists(st.integers(0, 2**40), min_size=1, max_size=300))
        def run(a, b):
            ra = hll_registers_batch(np.array(a, np.int64), p=10)
            rb = hll_registers_batch(np.array(b, np.int64), p=10)
            assert hll_estimate(hll_merge(ra, rb)) >= \
                hll_estimate(ra) - 1e-9

        run()

    def test_string_hash_no_exceptions_and_stable(self):
        from hypothesis import given, settings, strategies as st
        from dggsray.ops.sketch import _hash64

        @settings(max_examples=80, deadline=None)
        @given(st.lists(st.text(max_size=40), max_size=60))
        def run(texts):
            h1 = _hash64(pa.array(texts, pa.string()))
            h2 = _hash64(pa.array(texts, pa.string()))
            assert np.array_equal(h1, h2)
            # distinct strings should not collide in tiny samples
            uniq = len(set(texts))
            assert len(np.unique(h1)) >= max(uniq - 1, 0)

        run()


class TestHammingNearPairs:
    def test_banded_recall_and_transitive_clusters(self, ray_session):
        """A planted hamming chain a~b~c (a-c at distance 4 — NEVER a direct
        pair at max_hamming=3) still lands in ONE component via transitive
        closure, while a far-away signature stays out."""
        import ray.data as rd
        from dggsray.ops.dedup import (connected_components,
                                       hamming_near_pairs)
        h0 = np.uint64(0x0123456789ABCDEF)
        sigs = np.array([
            h0,                                    # 0
            h0 ^ np.uint64(1 << 5),                # 1: d(0,1)=1
            h0 ^ np.uint64((1 << 5) | (1 << 20) | (1 << 40)
                           | (1 << 60)),           # 2: d(1,2)=3, d(0,2)=4
            np.uint64(0xFFFF0000FFFF0000),         # 3: far from all
            np.uint64(0xFFFF0000FFFF0001),         # 4: d(3,4)=1
        ], dtype=np.uint64)
        t = pa.table({"node_id": pa.array(np.arange(5, dtype=np.int64)),
                      "phash": pa.array(sigs)})
        pairs = hamming_near_pairs(rd.from_arrow(t), max_hamming=3,
                                   id_col="node_id", sig_col="phash")
        pdf = pairs.to_pandas()
        got = {tuple(sorted(p)) for p in zip(pdf.id_a, pdf.id_b)}
        assert (0, 1) in got and (1, 2) in got and (3, 4) in got
        assert (0, 2) not in got  # distance 4 > max_hamming
        cc = connected_components(pairs).to_pandas() \
            .set_index("node")["label"].to_dict()
        assert cc[0] == cc[1] == cc[2] == 0
        assert cc[3] == cc[4] == 3

    def test_images_neardup_query(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["images_neardup_components"](
            "/root/testdata/sf0.001").to_pandas()
        # every near-dup cluster links >= 2 DISTINCT signatures (CC only
        # holds paired nodes); members bound phash count; the JPEG
        # re-encodes ride their originals' signatures into the clusters
        assert (df.n_phashes >= 2).all()
        assert (df.n_members >= df.n_phashes).all()
        assert df.n_jpeg.sum() > 0
        assert (df.n_jpeg <= df.n_members).all()


class TestQuantileSketch:
    def test_rank_error_bound_and_merge_order(self, ray_session):
        from dggsray.ops.sketch import (qsketch_batch, qsketch_merge,
                                        qsketch_quantile)
        rng = np.random.default_rng(21)
        data = np.concatenate([rng.normal(0, 1, 60_000),
                               rng.exponential(5, 40_000)])
        n = data.size
        k = 2048
        chunks = np.array_split(data, 13)
        sks = [qsketch_batch(c, k) for c in chunks]
        s = np.sort(data)
        for order in (range(13), reversed(range(13))):
            sk = (np.zeros(0), np.zeros(0))
            for i in order:
                sk = qsketch_merge(sk, sks[i], k)
            for q in (0.01, 0.25, 0.5, 0.9, 0.99):
                est = qsketch_quantile(sk, q)
                # rank of the estimate vs target rank: O(N/k) bound with a
                # generous constant (13 block compactions + 12 merges)
                rank = np.searchsorted(s, est)
                assert abs(rank - q * n) <= 30 * n / k, (q, rank)

    def test_small_input_exact(self):
        from dggsray.ops.sketch import qsketch_batch, qsketch_quantile
        v = np.array([5.0, 1.0, 3.0])
        sk = qsketch_batch(v, 10)
        assert qsketch_quantile(sk, 0.0) == 1.0
        assert qsketch_quantile(sk, 1.0) == 5.0

    def test_dataset_sketch_vs_exact(self, ray_session):
        import ray.data as rd
        from dggsray.ops.sketch import quantile_sketch, qsketch_quantile
        rng = np.random.default_rng(4)
        vals = rng.uniform(0, 1000, 80_000)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(9)
        sk = quantile_sketch(ds, "v", k=2048)
        s = np.sort(vals)
        for q in (0.1, 0.5, 0.95):
            est = qsketch_quantile(sk, q)
            rank = np.searchsorted(s, est)
            assert abs(rank - q * vals.size) <= 30 * vals.size / 2048


class TestQuantileSketchQuery:
    def test_sketch_tracks_exact(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["events_value_quantiles_sketch"](
            "/root/testdata/sf0.001").to_pandas()
        assert len(df) == 5
        # sketch within a small relative band of the exact order statistic
        for p in ("p50", "p90"):
            ex = df[f"{p}_exact_micro"].to_numpy().astype(float)
            sk = df[f"{p}_sketch_micro"].to_numpy().astype(float)
            assert (abs(sk - ex) <= np.maximum(0.08 * abs(ex), 2e6)).all()


class TestBloom:
    def test_no_false_negatives_and_fp_rate(self):
        from dggsray.ops.dedup import bloom_build, bloom_test
        rng = np.random.default_rng(33)
        members = rng.integers(0, 1 << 62, 50_000).astype(np.uint64)
        others = rng.integers(0, 1 << 62, 50_000).astype(np.uint64)
        others = others[~np.isin(others, members)]
        words = bloom_build(members, m_bits=1 << 20, j=4)
        assert bloom_test(words, members, j=4).all()
        fp = bloom_test(words, others, j=4).mean()
        # n/m ~ 0.048, j=4 -> theoretical FP ~(1-e^-0.19)^4 ~ 1e-3
        assert fp < 0.01, fp

    def test_or_merge(self):
        from dggsray.ops.dedup import bloom_build, bloom_test
        a = np.array([1, 2, 3], np.uint64)
        b = np.array([100, 200], np.uint64)
        w = bloom_build(a, 1 << 12, 3) | bloom_build(b, 1 << 12, 3)
        assert bloom_test(w, np.concatenate([a, b]), 3).all()

    def test_bloom_decontaminate_equals_exact(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        exact = E.queries()["docs_decontaminate"]("/root/testdata/sf0.001")
        bloom = E.queries()["docs_decontaminate_bloom"](
            "/root/testdata/sf0.001")
        a = exact.to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = bloom.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestDistributedKmeans:
    def test_equals_driver_lloyd_same_init(self, ray_session):
        """From the identical deterministic init, the distributed per-block
        partial-sum rounds and a driver-side full Lloyd run converge to the
        same centroids (fp summation order is the only difference)."""
        import ray.data as rd
        from dggsray.ops.similarity import (kmeans_centroids,
                                            kmeans_fit_distributed)
        rng = np.random.default_rng(12)
        X = np.concatenate([rng.normal(m, 0.3, (400, 8))
                            for m in (-3.0, 0.0, 3.0, 6.0)])
        t = pa.table({"vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
                      "embedding": pa.array(list(X),
                                            pa.list_(pa.float64()))})
        ds = rd.from_arrow(t).repartition(7)
        C_dist, cnt, inertia = kmeans_fit_distributed(ds, 4, iters=6,
                                                      seed=41)
        # driver reference: same init (sample = first 2048 rows = all here)
        C = kmeans_centroids(X[:2048], 4, seed=41)
        for _ in range(6):
            d2 = (X ** 2).sum(1)[:, None] - 2 * X @ C.T \
                + (C ** 2).sum(1)[None, :]
            a = d2.argmin(axis=1)
            for c in range(4):
                if (a == c).any():
                    C[c] = X[a == c].mean(axis=0)
        assert np.allclose(np.sort(C_dist, axis=0), np.sort(C, axis=0),
                           atol=1e-8)
        assert cnt.sum() == len(X) and inertia > 0

    def test_query_shape(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["embed_kmeans_clusters"](
            "/root/testdata/sf0.001").to_pandas()
        assert len(df) == 16
        assert df.n_members.sum() > 0
        assert df.inertia_milli.nunique() == 1


class TestHeavyHittersJoinFallback:
    def test_fallback_equals_broadcast(self, ray_session):
        import ray.data as rd
        from dggsray.ops.sketch import heavy_hitters
        rng = np.random.default_rng(19)
        words = [f"w{i}" for i in range(100)]
        wts = 1.0 / np.arange(1, 101)
        wts /= wts.sum()
        texts = [" ".join(rng.choice(words, 30, p=wts)) for _ in range(200)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})) \
            .repartition(5)
        a = heavy_hitters(ds, _tok_kernel(), 20_000).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        b = heavy_hitters(ds, _tok_kernel(), 20_000,
                          broadcast_limit=0).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        assert a.equals(b) and len(a) > 0
