"""Chunked (lax.scan) throughput mode must be numerically identical to
sequential per-frame processing."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models import frame as frame_mod

PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=128,
                             max_detections=128, max_measurements=8)


def _frames(n=5):
    seq = SyntheticSequence(n_frames=n, width=256, height=192, step=0.4)
    L, R, T = zip(*list(seq))
    return (jnp.stack([jnp.asarray(x) for x in L]),
            jnp.stack([jnp.asarray(x) for x in R]),
            jnp.stack([jnp.asarray(x, jnp.float32) for x in T]),
            seq.cam)


def _assert_state_equal(a, b, atol=0.0):
    la, ta = jax.tree_util.tree_flatten(a)[0], jax.tree_util.tree_flatten(b)[0]
    for x, y in zip(la, ta):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=atol), (
            x.shape, y.shape)


def test_chunk_matches_sequential_sv_mode():
    L, R, _, cam = _frames(5)
    s_seq = frame_mod.init_state(PARAMS)
    outs = []
    for i in range(5):
        do = (int(s_seq.frame_idx) % 2) == 0
        s_seq, o = frame_mod.process_frame(
            s_seq, L[i], R[i], cam, PARAMS, use_gt_pose=False,
            do_landmark_opt=do)
        outs.append(o)

    s_chunk = frame_mod.init_state(PARAMS)
    s_chunk, stacked = frame_mod.process_chunk(
        s_chunk, L, R, cam, PARAMS, use_gt_pose=False, landmark_opt_every=2)

    _assert_state_equal(s_seq, s_chunk)
    for i, o in enumerate(outs):
        assert np.allclose(np.asarray(o.T_wc), np.asarray(stacked.T_wc[i]))
        assert int(o.n_tracked) == int(stacked.n_tracked[i])
        assert int(o.n_new) == int(stacked.n_new[i])
        assert bool(o.is_keyframe) == bool(stacked.is_keyframe[i])


def test_chunk_matches_sequential_gt_mode():
    L, R, T, cam = _frames(4)
    s_seq = frame_mod.init_state(PARAMS)
    for i in range(4):
        s_seq, _ = frame_mod.process_frame(
            s_seq, L[i], R[i], cam, PARAMS, T[i], use_gt_pose=True,
            do_landmark_opt=True)
    s_chunk = frame_mod.init_state(PARAMS)
    s_chunk, stacked = frame_mod.process_chunk(
        s_chunk, L, R, cam, PARAMS, T, use_gt_pose=True,
        landmark_opt_every=1)
    _assert_state_equal(s_seq, s_chunk)
    assert np.allclose(np.asarray(stacked.T_wc[-1]), np.asarray(T[-1]))


@pytest.mark.slow
def test_chunk_boundaries_preserve_cadence():
    """Splitting one chunk into two must not reset the landmark-opt cadence
    (frame_idx is carried, not restarted)."""
    L, R, _, cam = _frames(5)
    s_a = frame_mod.init_state(PARAMS)
    s_a, _ = frame_mod.process_chunk(s_a, L, R, cam, PARAMS,
                                     landmark_opt_every=2)
    s_b = frame_mod.init_state(PARAMS)
    s_b, _ = frame_mod.process_chunk(s_b, L[:3], R[:3], cam, PARAMS,
                                     landmark_opt_every=2)
    s_b, _ = frame_mod.process_chunk(s_b, L[3:], R[3:], cam, PARAMS,
                                     landmark_opt_every=2)
    _assert_state_equal(s_a, s_b)


@pytest.mark.slow
def test_chunk_slam_runs_backend_on_loop():
    """Chunk mode must fold keyframe events through the FULL back-end
    (DB add, closure search, pose graph, BA) at chunk boundaries — the
    round-1 gap where throughput mode silently dropped the back-end
    (ref: the reference runs the back-end inline, CTrackerSV.cpp:440)."""
    from svi_mapper_tpu.eval import trajectory as ev
    from svi_mapper_tpu.models.slam import SLAMSystem

    n = 96
    seq = SyntheticSequence(n_frames=n, width=512, height=256,
                            trajectory="loop", loop_radius=12.0)
    params = dataclasses.replace(
        DEFAULT_PARAMS, max_landmarks=512, max_detections=512,
        keyframe_translation_m2=4.0, keyframe_rotation_rad2=0.02,
        # circular-loop world (see tests/test_slam.py PARAMS rationale)
        closure_exclude_recent=10, max_motion_scaling_for_optimization=2.5)
    slam = SLAMSystem(seq.cam, params)
    frames = list(seq)
    L = np.stack([np.asarray(f[0]) for f in frames])
    R = np.stack([np.asarray(f[1]) for f in frames])
    outs = slam.process_many(L, R, chunk=16)
    assert len(outs) == n
    assert len(slam.slam_keyframes) >= 8
    # the back-end actually ran in throughput mode
    assert slam.stats["ba_runs"] >= 1
    assert slam.db.n == len(slam.slam_keyframes)
    # the loop revisit is detected and accepted
    assert slam.stats["closures_accepted"] >= 1
    m = ev.evaluate(slam.optimized_trajectory(), seq.poses_wc)
    assert m.ate_rmse_m < 1.0
