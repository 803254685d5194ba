"""Native (C++) host runtime: descriptor index, cloud codec, dump loader.

The reference implements these in C++ as CBTree/CBITree (CBNode.h:64-201),
CKeyFrame::saveCloudToFile (CKeyFrame.cpp:138-185), and txt_io playback
(tracker_gt.cpp:182-268); here they are a g++-built shared library loaded
via ctypes (svi_mapper_tpu/native/).
"""

import numpy as np
import pytest

from svi_mapper_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native library unavailable: {native.load_error()}"
)


def _rand_pools(rng, n_kf=8, n_desc=64):
    return [rng.integers(0, 2**32, size=(n_desc, 8), dtype=np.uint32)
            for _ in range(n_kf)]


def _brute_votes(query, pools, cutoff):
    """Oracle for DescriptorIndex.query: each query descriptor votes for the
    keyframe owning its single global nearest neighbour (ties: first)."""
    allw = np.concatenate([p.view(np.uint64) for p in pools])
    owner = np.concatenate([[k] * len(p) for k, p in enumerate(pools)])
    votes = np.zeros(len(pools), np.int32)
    for q in query.view(np.uint64):
        d = np.array([bin(int(x)).count("1") for x in
                      np.bitwise_xor(allw, q[None, :]).reshape(-1, 4).max(axis=0)])
        # recompute properly: popcount over all 4 words
        x = np.bitwise_xor(allw, q[None, :])
        d = np.zeros(len(allw), np.int64)
        for w in range(4):
            v = x[:, w].copy()
            while v.any():
                d += (v & 1).astype(np.int64)
                v >>= 1
        best = int(np.argmin(d))
        if d[best] <= cutoff:
            votes[owner[best]] += 1
    return votes


class TestDescriptorIndex:
    def test_exact_self_query(self):
        rng = np.random.default_rng(0)
        pools = _rand_pools(rng)
        idx = native.DescriptorIndex(max_leaf_size=16)
        for k, p in enumerate(pools):
            idx.add(p, k)
        assert idx.size == sum(len(p) for p in pools)
        # identical descriptors descend to their own leaf: full self-score
        for k in (0, 3, 7):
            votes = idx.query(pools[k], cutoff=0)
            assert votes[k] == len(pools[k])

    def test_votes_match_brute_force_on_separated_pools(self):
        # random 256-bit pools are ~128 bits apart; perturbed copies are
        # within a few bits -> tree descent must find the right pool
        rng = np.random.default_rng(1)
        pools = _rand_pools(rng, n_kf=6, n_desc=40)
        idx = native.DescriptorIndex(max_leaf_size=8)
        for k, p in enumerate(pools):
            idx.add(p, k)
        q = pools[2].copy()
        # flip 3 random bits in each query descriptor
        for i in range(len(q)):
            for bit in rng.integers(0, 256, 3):
                q[i, bit // 32] ^= np.uint32(1) << np.uint32(bit % 32)
        votes = idx.query(q, cutoff=25)
        assert votes[2] >= 0.9 * len(q)
        assert votes.sum() - votes[2] <= 0.1 * len(q)

    def test_empty_query_and_empty_index(self):
        idx = native.DescriptorIndex()
        assert idx.query(np.zeros((0, 8), np.uint32)).shape == (0,)
        idx.add(np.ones((4, 8), np.uint32), 0)
        assert idx.query(np.zeros((0, 8), np.uint32), cutoff=10).tolist() == [0]

    def test_identical_descriptors_unsplittable(self):
        # 1000 identical descriptors exceed any leaf size but cannot split:
        # the index must stay functional (reference dedups instead,
        # CBNode.h:630-665)
        idx = native.DescriptorIndex(max_leaf_size=8)
        d = np.full((1000, 8), 7, np.uint32)
        idx.add(d, 0)
        votes = idx.query(d[:5], cutoff=0)
        assert votes[0] == 5


class TestCloudCodec:
    def test_roundtrip(self, tmp_path):
        from svi_mapper_tpu.io import cloud as cloud_mod

        rng = np.random.default_rng(2)
        n = 33
        c = cloud_mod.KeyframeCloud(
            keyframe_id=9, frame_idx=456,
            T_wc=np.asarray(np.diag([1., 1, 1, 1]), np.float32),
            uids=rng.integers(0, 1000, n).astype(np.int64),
            points_w=rng.normal(size=(n, 3)).astype(np.float32),
            points_cam=rng.normal(size=(n, 3)).astype(np.float32),
            uv_left=rng.random((n, 2)).astype(np.float32),
            uv_right=rng.random((n, 2)).astype(np.float32),
            descriptors=rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32),
        )
        path = tmp_path / "kf.svic"
        cloud_mod.save_cloud(path, c)          # dispatches to native codec
        c2 = cloud_mod.load_cloud(path)
        assert c2.keyframe_id == 9 and c2.frame_idx == 456
        np.testing.assert_array_equal(c2.uids, c.uids)
        np.testing.assert_allclose(c2.points_w, c.points_w)
        np.testing.assert_allclose(c2.uv_right, c.uv_right)
        np.testing.assert_array_equal(
            np.ascontiguousarray(c2.descriptors), c.descriptors)

    def test_bad_file(self, tmp_path):
        p = tmp_path / "junk.svic"
        p.write_bytes(b"not a cloud file")
        with pytest.raises(IOError):
            native.read_cloud_native(p)


class TestDumpLoader:
    def test_roundtrip_with_prefetch(self, tmp_path):
        rng = np.random.default_rng(3)
        path = tmp_path / "seq.svid"
        frames = [
            (i, i * 0.05,
             rng.integers(0, 255, (32, 48), dtype=np.uint8),
             rng.integers(0, 255, (32, 48), dtype=np.uint8))
            for i in range(12)
        ]
        with native.DumpWriter(path, 32, 48) as w:
            for fid, ts, L, R in frames:
                w.append(fid, ts, L, R)
        assert native.validate_dump(path) == 12
        with native.DumpReader(path, prefetch=3) as r:
            assert (r.n_frames, r.height, r.width) == (12, 32, 48)
            for (fid, ts, L, R), (gf, gt, gL, gR) in zip(frames, r):
                assert fid == gf and ts == gt
                np.testing.assert_array_equal(L, gL)
                np.testing.assert_array_equal(R, gR)

    def test_early_close_no_hang(self, tmp_path):
        rng = np.random.default_rng(4)
        path = tmp_path / "seq.svid"
        with native.DumpWriter(path, 16, 16) as w:
            for i in range(50):
                img = rng.integers(0, 255, (16, 16), dtype=np.uint8)
                w.append(i, float(i), img, img)
        r = native.DumpReader(path, prefetch=2)
        next(iter(r))
        r.close()  # must join the prefetch thread cleanly mid-stream

    def test_validate_rejects_corruption(self, tmp_path):
        path = tmp_path / "seq.svid"
        img = np.zeros((8, 8), np.uint8)
        with native.DumpWriter(path, 8, 8) as w:
            w.append(0, 0.0, img, img)
            w.append(1, 1.0, img, img)
        data = bytearray(path.read_bytes())
        data = data[:-10]  # truncate image payload
        path.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="truncated"):
            native.validate_dump(path)

    def test_shape_mismatch_raises(self, tmp_path):
        with native.DumpWriter(tmp_path / "x.svid", 8, 8) as w:
            with pytest.raises(ValueError):
                w.append(0, 0.0, np.zeros((4, 4), np.uint8), np.zeros((8, 8), np.uint8))


class TestNativeShortlistIntegration:
    def test_find_closures_with_native_index(self):
        """KeyframeDatabase(native_index=True) must find the same closure a
        device-scored database finds on a synthetic revisit."""
        from svi_mapper_tpu.mapping import closure as cm

        rng = np.random.default_rng(5)
        n = 64
        desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
        pts = rng.normal(scale=2.0, size=(n, 3)).astype(np.float32) + [0, 0, 5]

        def db_with(native_index):
            db = cm.KeyframeDatabase.create(32, 128, native_index=native_index)
            # keyframes 0..11: distinct pools, then kf 12 revisits kf 0
            for k in range(12):
                d = (desc if k == 0 else
                     rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))
                db.add(d, pts, np.eye(4, dtype=np.float32))
            db.add(desc, pts, np.eye(4, dtype=np.float32))  # kf 12 == kf 0
            return db

        db_native = db_with(True)
        assert db_native.index is not None
        found = cm.find_closures(db_native, 12, min_matches=25)
        assert len(found) == 1 and found[0].ref_kf == 0
        np.testing.assert_allclose(found[0].T_qr, np.eye(4), atol=1e-3)
