"""SemDeDup-style semantic dedup (ops.dedup.semantic_dedup): exact
integer cosine-threshold contract, within-cluster-only pruning,
earlier-id-wins semantics, and the float64-boundary bigint re-check."""
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ds(rows):
    import ray.data as rd
    ids = [r[0] for r in rows]
    labs = [r[1] for r in rows]
    vecs = [r[2] for r in rows]
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))


def _run(rows, tau):
    from dggsray.ops.dedup import semantic_dedup
    out = semantic_dedup(_ds(rows), tau_permille=tau).to_pandas()
    return out.set_index("vec_id").sort_index()


class TestSemanticDedupSemantics:
    def test_identical_pair_later_id_flagged(self, ray_session):
        out = _run([(1, 0, [0.5, 0.5]), (2, 0, [0.5, 0.5]),
                    (3, 0, [0.5, -0.5])], tau=950)
        assert out.loc[1].is_dup == 0          # earliest kept
        assert out.loc[2].is_dup == 1          # exact duplicate of 1
        assert out.loc[3].is_dup == 0          # orthogonal
        assert (out.n_cluster == 3).all()

    def test_cross_cluster_pair_not_flagged(self, ray_session):
        # identical vectors in DIFFERENT clusters are never compared
        out = _run([(1, 0, [0.5, 0.5]), (2, 1, [0.5, 0.5])], tau=950)
        assert out.is_dup.sum() == 0
        assert (out.n_cluster == 1).all()

    def test_exact_boundary_decided_by_integer_math(self, ray_session):
        # milli-quantized (1,0) vs (3,4): cos = 3/5 exactly, so
        # 10^6*dot^2 == tau^2*na*nb at tau=600 — the float64 border band
        # must hand this pair to the bigint re-check, which accepts >=
        rows = [(1, 0, [0.001, 0.0]), (2, 0, [0.003, 0.004])]
        assert _run(rows, tau=600).loc[2].is_dup == 1     # cos == tau
        assert _run(rows, tau=601).loc[2].is_dup == 0     # cos <  tau

    def test_zero_vector_never_duplicate(self, ray_session):
        out = _run([(1, 0, [0.0, 0.0]), (2, 0, [0.0, 0.0]),
                    (3, 0, [0.5, 0.5])], tau=100)
        assert out.is_dup.sum() == 0           # dot > 0 required


class TestSemanticDedupVsBruteForce:
    def test_matches_numpy_brute_force_sf0001(self, ray_session):
        import pyarrow.parquet as pq

        from dggsray.pipelines.relational import embed_semantic_dedup
        tau = 350
        out = embed_semantic_dedup(SF, tau_permille=tau).to_pandas() \
            .set_index("vec_id").sort_index()
        t = pq.read_table(f"{SF}/embeddings.parquet")
        ids = t.column("vec_id").to_numpy()
        lab = t.column("label").to_numpy()
        emb = np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False))
        order = np.argsort(ids, kind="stable")
        ids, lab, emb = ids[order], lab[order], emb[order]
        W = np.floor(emb.astype(np.float64) * 1000 + 0.5).astype(object)
        exp = {}
        for i in range(ids.size):
            d = False
            for j in range(ids.size):
                if ids[j] >= ids[i] or lab[j] != lab[i]:
                    continue
                dot = int((W[i] * W[j]).sum())
                na = int((W[i] * W[i]).sum())
                nb = int((W[j] * W[j]).sum())
                if dot > 0 and 10**6 * dot * dot >= tau * tau * na * nb:
                    d = True
                    break
            exp[int(ids[i])] = int(d)
        assert out.is_dup.to_dict() == exp
        assert out.is_dup.sum() > 0            # non-trivial at this tau
        counts = out.groupby("label").size()
        assert (out.n_cluster ==
                out.label.map(counts)).all()
