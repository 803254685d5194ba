"""End-to-end SLAM system tests: loop closure + windowed BA on a loop."""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.eval import trajectory as ev
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.slam import SLAMSystem

PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512, max_detections=512)


@pytest.fixture(scope="module")
def loop_run():
    """One revisiting loop (quite slow: rendered + tracked at 512x256)."""
    seq = SyntheticSequence(
        n_frames=120, width=512, height=256, trajectory="loop", loop_radius=12.0
    )
    s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=True, enable_loop_closure=True)
    for (L, R, _) in seq:
        s.process(L, R)
    return seq, s


def test_slam_loop_closures_found_and_accepted(loop_run):
    _, s = loop_run
    assert s.stats["closures_found"] >= 1
    assert s.stats["closures_accepted"] >= 1
    assert s.stats["pose_graph_runs"] >= 1
    # closures must connect the revisit to the loop start region
    for c in s.accepted_closures:
        assert c.ref_kf < 6
        assert c.query_kf > len(s.slam_keyframes) - 8


def test_slam_loop_improves_ate(loop_run):
    seq, s = loop_run
    m_raw = ev.evaluate(s.trajectory_array, seq.poses_wc)
    m_opt = ev.evaluate(s.optimized_trajectory(), seq.poses_wc)
    assert np.isfinite(m_opt.ate_rmse_m)
    # the optimized trajectory must beat raw VO significantly on a loop
    assert m_opt.ate_rmse_m < 0.7 * m_raw.ate_rmse_m
    assert m_opt.ate_rmse_m < 0.5


def test_slam_keyframe_poses_finite(loop_run):
    _, s = loop_run
    for kf in s.slam_keyframes:
        assert np.isfinite(kf.T_wc).all()
    # rotations stay orthonormal through all corrections
    for kf in s.slam_keyframes:
        R = kf.T_wc[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_slam_ba_gates_reject_bad_windows(loop_run):
    _, s = loop_run
    # the density/delta gates must have engaged at least once on this loop
    assert s.stats["ba_runs"] > 0
    # and every accepted BA kept keyframes sane (checked via finiteness above)
