"""Per-row image invariant (BASELINE.json input_hint) and its batched kernels."""
import numpy as np
import pytest


class TestAveragePhashBatch:
    def test_batch_equals_scalar(self):
        from dggsray.io.imagetable import average_phash, average_phash_batch
        rng = np.random.default_rng(0)
        for (w, h) in [(64, 64), (48, 32), (17, 23)]:
            st = rng.integers(0, 256, (20, h, w, 3), dtype=np.uint8)
            assert average_phash_batch(st).tolist() == \
                [average_phash(st[i]) for i in range(20)]


class TestVerifyInvariantQuery:
    def test_all_rows_green_and_detects_corruption(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["images_verify_invariant"](
            "/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        assert df.pixels_ok.all() and df.caption_ok.all() \
            and df.phash_ok.all()

    def test_kernel_flags_corrupt_pixels(self):
        """The batched compare must actually FAIL on a corrupted image —
        guards against a vacuous all-true kernel."""
        import pyarrow.parquet as pq
        from dggsray.io.imagetable import (_pixels_batch, average_phash_batch,
                                           ensure_image_table,
                                           iter_verify_rows)
        import pyarrow.compute as pc
        t = pq.read_table(ensure_image_table(0.001))
        w0 = t.column("w")[0].as_py()
        h0 = t.column("h")[0].as_py()
        b = t.filter(pc.and_(pc.equal(t.column("w"), w0),
                             pc.equal(t.column("h"), h0))).slice(0, 8)
        assert b.num_rows == 8
        rows = list(iter_verify_rows(b))
        imgs = [r[2].copy() for r in rows]
        imgs[3][0, 0, 0] ^= 0xFF            # corrupt one pixel of row 3
        nums = np.array([r[1] for r in rows], np.int64)
        w, h = rows[0][3], rows[0][4]
        ref = _pixels_batch(nums, w, h)
        stack = np.stack(imgs)
        pix_ok = (stack == ref).reshape(len(rows), -1).all(axis=1)
        assert not pix_ok[3] and pix_ok[[0, 1, 2, 4, 5, 6, 7]].all()
        ph = average_phash_batch(stack)
        assert (ph == b.column("phash").to_numpy()).sum() >= 7


class TestImagesFeaturesCheck:
    def test_check_ok_everywhere_and_detects_corruption(self, ray_session):
        """images_features carries its own in-row oracle: the phash of the
        DECODED image equals the phash stored at synthesis (computed from
        the original array, before the PNG/raw container) — and a corrupted
        decode flips exactly that row's check_ok."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from dggsray.ops.multimodal import ImageFeatures
        from dggsray.pipelines.relational import images_features

        out = images_features("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert out.check_ok.all()

        # corrupt one row's stored phash: the stage must surface a mismatch
        from dggsray.io.imagetable import _pixels, encode_image
        img = _pixels(7, 32, 48)
        t = pa.table({
            "image_id": pa.array(["img7"]),
            "bytes": pa.array([encode_image(img, "png")], pa.binary()),
            "w": pa.array([32], pa.int32()), "h": pa.array([48], pa.int32()),
            "fmt": pa.array(["png"]), "phash": pa.array([12345], pa.int64())})
        row = ImageFeatures()(t)
        assert row.column("phash")[0].as_py() \
            != row.column("stored_phash")[0].as_py()
