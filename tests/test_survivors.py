"""docs_dedup_survivors: keep-longest-then-min-id canonical doc per
normalized-text group.  The sf tables have unique texts, so grouping is
exercised on a synthesized corpus with known duplicate structure
(whitespace/case variants that normalize equal), pinned against a direct
DuckDB QUALIFY computation."""
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _mini_corpus(tmp_path):
    docs = [
        (0, "Hello   world"),          # group A, 2 tokens
        (1, "hello world"),            # group A, 2 tokens -> tie, min id 0
        (2, "  HELLO WORLD  "),        # group A
        (3, "a b c d"),                # group B, 4 tokens (winner by len? no:
        (4, "A  B  C  D"),             # same norm, same tokens, min id 3
        (5, "unique document here"),   # group C singleton
        (6, ""),                       # group D: empty
        (7, "   "),                    # normalizes to "" -> group D
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": pa.array([d[1] for d in docs], pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


class TestDedupSurvivors:
    def test_known_groups(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import docs_dedup_survivors
        sf = _mini_corpus(tmp_path)
        out = docs_dedup_survivors(sf)
        got = {r.doc_id: (r.n_tokens, r.group_size)
               for r in out.itertuples()}
        assert got == {0: (2, 3), 3: (4, 2), 5: (3, 1), 6: (1, 2)}

    def test_matches_duckdb_on_sf(self, ray_session):
        from dggsray.pipelines.relational import docs_dedup_survivors
        out = docs_dedup_survivors(SF)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        ref = con.sql(
            "WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g')) AS norm FROM documents), "
            "t AS (SELECT doc_id, norm, "
            "CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens, "
            "COUNT(*) OVER (PARTITION BY norm) AS gs FROM n) "
            "SELECT doc_id, n_tokens, CAST(gs AS BIGINT) AS gsz FROM t "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY norm "
            "ORDER BY n_tokens DESC, doc_id ASC) = 1 "
            "ORDER BY doc_id").df()
        assert out.doc_id.tolist() == ref.doc_id.tolist()
        assert out.n_tokens.tolist() == ref.n_tokens.tolist()
        assert out.group_size.tolist() == ref.gsz.tolist()


class TestPiiScrub:
    def test_planted_pii(self, ray_session, tmp_path):
        from dggsray.pipelines.relational import docs_pii_scrub
        docs = [
            (0, "contact alice@example.com or bob.smith+x@mail.co today"),
            (1, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
            (2, "call +1 555-123-4567 or 0034 666 777 888 now"),
            (3, "mixed: eve@corp.io from 8.8.8.8 dialed 555-000-1111x"),
            (4, "clean text with no sensitive content at all"),
            (5, "version 1.2.3.4.5 is not an ip boundary test 999.999.999.999"),
        ]
        t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                      "text": pa.array([d[1] for d in docs], pa.string())})
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        out = docs_pii_scrub(str(d)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.n_emails.tolist() == [2, 0, 0, 1, 0, 0]
        assert out.n_ips.tolist()[1] == 2
        assert out.n_ips.tolist()[3] == 1
        assert out.n_phones.tolist()[2] == 2
        # doc 4 untouched: scrubbed length == original length
        assert out.n_chars_scrubbed[4] == len(docs[4][1])
        # scrubbing found SOMETHING in every planted doc
        assert (out.loc[[0, 1, 2, 3],
                        ["n_emails", "n_ips", "n_phones"]].sum(axis=1)
                > 0).all()

    def test_matches_duckdb_on_planted(self, ray_session, tmp_path):
        import __ray_entry__ as E
        from dggsray.pipelines.relational import docs_pii_scrub
        docs = [(i, f"user{i}@ex{i}.org ip 10.0.{i}.1 tel +49 1511 000{i}00{i}")
                for i in range(20)]
        t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                      "text": pa.array([d[1] for d in docs], pa.string())})
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        out = docs_pii_scrub(str(d)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        ref = con.sql(E.oracle_sql()["docs_pii_scrub"]
                      + " ORDER BY doc_id").df()
        for c in ["n_emails", "n_ips", "n_phones", "n_chars_scrubbed"]:
            assert out[c].tolist() == ref[c].tolist(), c
        assert (out.n_emails == 1).all() and (out.n_ips == 1).all() \
            and (out.n_phones == 1).all()
