"""g2o-format graph snapshot export/import
(ref keyframes_*-*.g2o persistence, Cg2oOptimizer.cpp:493-514)."""

import pytest
import dataclasses

import numpy as np

from svi_mapper_tpu.io import g2o_export as g2o

RNG = np.random.default_rng(5)


def _rand_pose():
    w = RNG.normal(0, 0.3, 3)
    a = np.linalg.norm(w)
    k = w / max(a, 1e-9)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    T = np.eye(4)
    T[:3, :3] = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    T[:3, 3] = RNG.normal(0, 5, 3)
    return T


def test_g2o_roundtrip(tmp_path):
    T = np.stack([_rand_pose() for _ in range(6)]).astype(np.float64)
    edges = [(k - 1, k, T[k] @ np.linalg.inv(T[k - 1])) for k in range(1, 6)]
    edges.append((0, 5, T[5] @ np.linalg.inv(T[0])))
    lm = RNG.normal(0, 10, (7, 3))
    uids = np.arange(100, 107)

    p = tmp_path / "g.g2o"
    g2o.save_g2o(p, T, edges, landmarks=lm, landmark_ids=uids)
    text = p.read_text()
    assert text.count("VERTEX_SE3:QUAT") == 6
    assert text.count("EDGE_SE3:QUAT") == 6
    assert text.count("VERTEX_TRACKXYZ") == 7
    assert "FIX 0" in text
    # landmark id space shifted by 10^6 (ref Cg2oOptimizer.h:83)
    assert f"VERTEX_TRACKXYZ {100 + g2o.LANDMARK_ID_SHIFT}" in text

    T2, edges2, lm2 = g2o.load_g2o(p)
    assert np.allclose(T2, T, atol=1e-5)
    assert len(edges2) == 6
    for (i, j, M), (i2, j2, M2) in zip(edges, edges2):
        assert (i, j) == (i2, j2)
        assert np.allclose(M, M2, atol=1e-5)
    for u in uids:
        assert np.allclose(lm2[int(u)], lm[int(u) - 100], atol=1e-6)


@pytest.mark.slow
def test_slam_writes_snapshots(tmp_path):
    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models.slam import SLAMSystem

    # circular-loop world overrides (see tests/test_slam.py PARAMS rationale)
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512,
                                 max_detections=512,
                                 closure_exclude_recent=10,
                                 max_motion_scaling_for_optimization=2.5)
    seq = SyntheticSequence(n_frames=120, width=512, height=256,
                            trajectory="loop", loop_radius=12.0)
    s = SLAMSystem(seq.cam, params, enable_local_ba=False,
                   graph_snapshot_dir=tmp_path / "g2o")
    for (L, R, _) in seq:
        s.process(L, R)
    # the strict >20-keyframe reference cadence (CTrackerSV.cpp:437) can
    # leave the last closures queued on a short run — the end-of-stream
    # drain runs the optimization (and writes its snapshots)
    s.finalize_backend()
    assert s.stats["closures_accepted"] >= 1
    snaps = sorted((tmp_path / "g2o").glob("*.g2o"))
    assert len(snaps) >= 2          # pre + post per optimization
    T, edges, lm = g2o.load_g2o(snaps[-1])
    assert len(T) == len(s.slam_keyframes)
    # closure edges present beyond the sequential chain
    assert len(edges) >= len(T)
    assert len(lm) > 0
