"""Chunked (lax.scan) throughput mode must be numerically identical to
sequential per-frame processing."""

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
