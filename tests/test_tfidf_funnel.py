"""docs_tfidf_topk (per-doc distinctive terms, integer-exact tf/df score)
and events_funnel (ordered view->click->purchase per-user funnel)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type)"""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


class TestTfidfTopk:
    def test_hand_scores(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import docs_tfidf_topk
        # "rare" appears in 1 doc, "common" in all 3
        sf = _write_docs(tmp_path, ["rare common common",
                                    "common mid",
                                    "common mid"])
        df = docs_tfidf_topk(sf, k=2).to_pandas()
        d0 = df[df.doc_id == 0].set_index("token")
        # doc 0: rare tf=1 df=1 -> 1_000_000; common tf=2 df=3 -> 666_666
        assert d0.loc["rare", "score"] == 1_000_000
        assert d0.loc["common", "score"] == 2_000_000 // 3
        assert list(d0.sort_values("score", ascending=False).index) \
            == ["rare", "common"]
        d1 = df[df.doc_id == 1].set_index("token")
        # doc 1: mid tf=1 df=2 -> 500_000 beats common tf=1 df=3
        assert d1.loc["mid", "score"] == 500_000
        assert d1.loc["common", "score"] == 1_000_000 // 3

    def test_k_and_tiebreak(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import docs_tfidf_topk
        # four equal-score tokens; k=2 keeps the lexicographically smallest
        sf = _write_docs(tmp_path, ["d c b a"])
        df = docs_tfidf_topk(sf, k=2).to_pandas()
        assert sorted(df.token) == ["a", "b"]

    def test_hash_join_fallback_agrees(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import docs_tfidf_topk
        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(words, rng.integers(3, 30)))
                 for _ in range(60)]
        sf = _write_docs(tmp_path, texts)
        cols = ["doc_id", "score", "token", "tf"]
        a = docs_tfidf_topk(sf, k=3).to_pandas() \
            .sort_values(cols).reset_index(drop=True)[cols]
        b = docs_tfidf_topk(sf, k=3, broadcast_limit=0).to_pandas() \
            .sort_values(cols).reset_index(drop=True)[cols]
        assert a.equals(b)


class TestTokenCommonnessFallback:
    def test_hash_join_fallback_agrees(self, ray_session, tmp_path):
        """Over-cap path (vocabulary too big to broadcast) must equal the
        broadcast path, including a zero-token doc (sentinel-row survival)."""
        from dggsray.pipelines.relational import docs_token_commonness
        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(words, rng.integers(1, 25)))
                 for _ in range(50)]
        texts.append("")            # zero-token doc: must come out all-zero
        sf = _write_docs(tmp_path, texts)
        cols = ["doc_id", "n_tokens", "sum_commonness", "mean_commonness"]
        a = docs_token_commonness(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)[cols]
        b = docs_token_commonness(sf, broadcast_limit=0).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)[cols]
        assert a[cols].astype("int64").equals(b[cols].astype("int64"))
        z = b[b.doc_id == len(texts) - 1]
        assert len(z) == 1 and int(z.n_tokens.iloc[0]) == 0 \
            and int(z.sum_commonness.iloc[0]) == 0


class TestEventsFunnel:
    def test_ordering_semantics(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import events_funnel
        S = 1_000_000
        rows = [
            # user 1 converts: view@1, click@5 (click@0 is BEFORE the view
            # and must be ignored), purchase@9 (purchase@3 precedes the
            # qualifying click and must be ignored)
            (0, 1, 0 * S, "click"),
            (1, 1, 1 * S, "view"),
            (2, 1, 3 * S, "purchase"),
            (3, 1, 5 * S, "click"),
            (4, 1, 9 * S, "purchase"),
            # user 2: view then click but purchase ties the click ts
            # (strictly-after contract -> not converted)
            (5, 2, 1 * S, "view"),
            (6, 2, 2 * S, "click"),
            (7, 2, 2 * S, "purchase"),
            # user 3: view only
            (8, 3, 1 * S, "view"),
            # user 4: full funnel in order
            (9, 4, 1 * S, "view"),
            (10, 4, 2 * S, "click"),
            (11, 4, 3 * S, "purchase"),
        ]
        sf = _write_events(tmp_path, rows)
        df = events_funnel(sf).to_pandas().set_index("user_id").sort_index()
        assert list(df.index) == [1, 4]
        assert df.loc[1].tolist() == [1 * S, 5 * S, 9 * S]
        assert df.loc[4].tolist() == [1 * S, 2 * S, 3 * S]

    def test_matches_duckdb(self, ray_session, tmp_path):
        import sys
        import duckdb
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        rng = np.random.default_rng(11)
        types = ["view", "click", "purchase", "error"]
        rows = [(i, int(rng.integers(0, 25)),
                 int(rng.integers(0, 10_000)) * 1000,
                 types[int(rng.integers(0, 4))]) for i in range(800)]
        sf = _write_events(tmp_path, rows)
        eng = E.queries()["events_funnel"](sf).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf}/events.parquet'")
        exp = con.sql(E.oracle_sql()["events_funnel"]).df() \
            .sort_values("user_id").reset_index(drop=True)
        assert eng[exp.columns.tolist()].equals(exp)
