"""End-to-end pipeline tests: the synthetic-sequence SLAM slice.

This is the framework's equivalent of the reference's dataset-playback
verification (SURVEY.md §4): deterministic synthetic stereo sequences with
exact ground truth, tracked end-to-end, judged by the trajectory metrics of
the re-implemented evaluate_trajectory.
"""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.eval import trajectory as ev
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.tracker import StereoTracker

PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512, max_detections=512)


@pytest.fixture(scope="module")
def sv_run():
    seq = SyntheticSequence(n_frames=14, width=512, height=256, step=0.5)
    tr = StereoTracker(seq.cam, PARAMS, use_gt_pose=False)
    outs = [tr.process(L, R) for (L, R, _) in seq]
    return seq, tr, outs


def test_sv_tracker_poses_accepted(sv_run):
    _, _, outs = sv_run
    # frame 0 bootstraps the map (no landmarks yet); all later solves succeed
    assert all(bool(o.posit_ok) for o in outs[1:])
    assert all(int(o.n_tracked) > 100 for o in outs[1:])


def test_sv_tracker_trajectory_accuracy(sv_run):
    seq, tr, _ = sv_run
    m = ev.evaluate(tr.trajectory_array, seq.poses_wc)
    assert m.ate_rmse_m < 0.10
    assert m.rel_rot_err_rad < 0.005
    assert m.precision > 0.85


def test_sv_tracker_landmarks_become_optimal(sv_run):
    _, tr, outs = sv_run
    assert int(outs[-1].n_optimal) > 50
    table = tr.state.table
    assert int(table.num_active) > 200


def test_gt_tracker_mode(sv_run):
    """GT playback (the reference's enabled tracker_gt binary): pose comes
    from ground truth, map/tracking statistics must stay healthy."""
    seq, _, _ = sv_run
    tr = StereoTracker(seq.cam, PARAMS, use_gt_pose=True)
    outs = [tr.process(L, R, T_gt=T) for (L, R, T) in seq]
    # exact GT poses in, so the trajectory is exact
    m = ev.evaluate(tr.trajectory_array, seq.poses_wc)
    assert m.ate_rmse_m < 1e-5
    assert all(int(o.n_tracked) > 100 for o in outs[1:])
    assert int(outs[-1].n_optimal) > 50


def test_kitti_trajectory_io(tmp_path, sv_run):
    seq, tr, _ = sv_run
    path = tmp_path / "traj.txt"
    ev.save_kitti_trajectory(path, tr.trajectory_array)
    loaded = ev.load_kitti_trajectory(path)
    assert loaded.shape == tr.trajectory_array.shape
    assert np.allclose(loaded, tr.trajectory_array, atol=1e-5)
    # metrics computed on the roundtripped trajectory agree
    m1 = ev.evaluate(tr.trajectory_array, seq.poses_wc)
    m2 = ev.evaluate(loaded, seq.poses_wc)
    assert np.isclose(m1.ate_rmse_m, m2.ate_rmse_m, atol=1e-6)


def test_evaluate_identity_is_zero(sv_run):
    seq, _, _ = sv_run
    m = ev.evaluate(seq.poses_wc, seq.poses_wc)
    assert m.ate_rmse_m < 1e-6
    assert m.rel_trans_err_m < 1e-6
    assert m.precision > 0.999
