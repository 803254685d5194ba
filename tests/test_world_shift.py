"""Robocentric world shift (ref m_vecTranslationToG2o, CTrackerGT.h:84).

The internal world origin rebases to the camera whenever it strays beyond
the threshold, so every f32 world coordinate on device stays small; the
f64 offset maps results back to the output frame. Without it, a long f32
trajectory loses precision once |t| reaches km scale (f32 granularity at
2e5 m is ~1.6 cm)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.eval import trajectory as ev
from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.slam import SLAMSystem
from svi_mapper_tpu.solvers.posit import solve_stereo_posit

PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=256,
                             max_detections=256)


def test_posit_precision_collapses_at_large_offset():
    """The rationale: the SAME pose-solve geometry, translated 200 km from
    the origin, degrades by orders of magnitude in f32 — the shift keeps
    the live problem at the origin."""
    rng = np.random.default_rng(0)
    seq = SyntheticSequence(n_frames=2, width=256, height=128)
    cam = seq.cam
    n = 128
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-2, 2, n),
                    rng.uniform(6, 18, n)], -1).astype(np.float32)
    T_true = np.eye(4, dtype=np.float64)
    T_true[:3, 3] = [0.1, -0.05, 0.3]

    def solve_at(offset):
        # world' = world + off: points p' = p + off, true pose
        # T' = T @ Translate(-off) — identical geometry, shifted coordinates
        off = np.array([offset, 0.0, 0.0])
        Toff = np.eye(4); Toff[:3, 3] = -off
        Tt = T_true @ Toff
        p_w = (pts.astype(np.float64) + off).astype(np.float32)
        # exact (f64) projections — camera-frame geometry is offset-free
        p_c = pts.astype(np.float64) @ T_true[:3, :3].T + T_true[:3, 3]
        fx, fy = float(cam.left.fx), float(cam.left.fy)
        cx, cy = float(cam.left.cx), float(cam.left.cy)
        u_l = fx * p_c[:, 0] / p_c[:, 2] + cx
        v_l = fy * p_c[:, 1] / p_c[:, 2] + cy
        disp = -float(cam.right.P[0, 3]) / p_c[:, 2]
        uv4 = np.stack([u_l, v_l, u_l - disp, v_l], -1)
        # slightly perturbed prior so the GN must iterate in both cases
        T_prior = Tt.copy()
        T_prior[:3, 3] += [0.02, -0.01, 0.03]
        res = solve_stereo_posit(
            jnp.asarray(T_prior, jnp.float32), jnp.asarray(p_w),
            jnp.asarray(uv4, jnp.float32), jnp.ones(n, bool), cam,
            T_prior=jnp.asarray(T_prior, jnp.float32),
        )
        # camera-center error of the solve, in the offset frame
        T_est = np.asarray(res.T_wc, np.float64)
        c_est = -T_est[:3, :3].T @ T_est[:3, 3]
        c_true = -Tt[:3, :3].T @ Tt[:3, 3]
        return bool(res.ok), float(np.linalg.norm(c_est - c_true))

    ok0, err0 = solve_at(0.0)
    okf, errf = solve_at(2e5)
    assert ok0
    assert err0 < 1e-3
    # at 2e5 m the f32 solve is visibly degraded (>= 10x worse)
    assert errf > 10 * err0 or not okf


@pytest.mark.slow
def test_world_shift_preserves_output_trajectory():
    """A run with an aggressively low shift threshold must (a) actually
    shift, (b) keep internal magnitudes bounded, and (c) produce the same
    output trajectory as the unshifted run within the short-run tolerance
    (the VERDICT item-6 acceptance, scaled to CI length)."""
    seq = SyntheticSequence(n_frames=36, width=384, height=192, step=0.8)
    frames = list(seq)

    def run(threshold):
        s = SLAMSystem(seq.cam, PARAMS, use_gt_pose=True,
                       enable_loop_closure=False, enable_local_ba=False)
        s.world_shift_threshold_m = threshold
        for (L, R, T) in frames:
            s.process(L, R, T)
        return s

    s_ref = run(1e12)          # effectively no shift
    s_sh = run(6.0)

    assert s_sh.world_shifts >= 3
    assert s_ref.world_shifts == 0
    # internal pose translation stays bounded by threshold + step margin
    T_int = np.asarray(s_sh.state.T_wc, np.float64)
    assert np.linalg.norm(T_int[:3, 3]) < 6.0 + 2.0
    # output trajectories agree
    A = s_ref.trajectory_array
    B = s_sh.trajectory_array
    assert np.abs(A - B).max() < 5e-3
    # and both match ground truth
    gt = np.stack([T for (_, _, T) in frames])
    m = ev.evaluate(B, gt)
    assert m.ate_rmse_m < 0.05
    # keyframe records moved consistently: output-frame keyframe poses sit
    # on the output trajectory
    for kf in s_sh.slam_keyframes:
        T_out = s_sh._to_output(kf.T_wc)
        assert np.abs(T_out - B[kf.frame_idx]).max() < 5e-3


def test_svi_velocity_survives_world_shift(rng=np.random.default_rng(7)):
    """Regression (ADVICE r2 high): the SVI velocity estimate is a finite
    difference of poses across the frame; if it differences a post-rebase
    internal pose against the pre-rebase one, the robocentric shift is
    absorbed into a huge spurious velocity (shift/dt ~ 40+ m/s here) that
    poisons the next IMU prior. Velocity must stay near the true speed
    through the rebase."""
    from svi_mapper_tpu.imu import interpolator as imu
    from svi_mapper_tpu.models.svi import StereoInertialTracker

    seq = SyntheticSequence(n_frames=10, width=384, height=192, step=0.5)
    dt = 0.05                                   # true speed = 10 m/s
    up = np.array([0.0, -1.0, 0.0])
    fake = imu.ImuCalibration(
        R_imu_to_world=np.eye(3), bias_gyro=np.zeros(3), bias_accel=np.zeros(3),
        noise_gyro=np.zeros(3), noise_accel=np.zeros(3), n_samples=200,
    )
    omega, accel = imu.synthesize_measurements(
        seq.poses_wc, dt, calib=fake, noise_gyro=0.001, noise_accel=0.02)

    tr = StereoInertialTracker(seq.cam, fake, PARAMS, equalize=False,
                               enable_loop_closure=False, enable_local_ba=False)
    tr.world_shift_threshold_m = 2.0            # rebase after ~4 frames
    speeds = []
    for i, (L, R, _) in enumerate(seq):
        if i == 0:
            tr.process_imu(L, R, np.zeros(3), up * imu.GRAVITY, dt)
        else:
            tr.process_imu(L, R, omega[i - 1], accel[i - 1], dt)
        speeds.append(float(np.linalg.norm(tr.velocity)))
    assert tr.world_shifts >= 1
    # velocity never spikes to the shift/dt scale (~40 m/s) — stays near 10
    assert max(speeds) < 20.0
    m = ev.evaluate(tr.trajectory_array, seq.poses_wc)
    assert m.ate_rmse_m < 0.15


@pytest.mark.slow
def test_world_shift_in_chunk_mode():
    """Chunk-mode (process_many) with shifts at chunk boundaries: output
    matches GT and the gauge accumulators stay consistent."""
    seq = SyntheticSequence(n_frames=32, width=384, height=192, step=0.8)
    frames = list(seq)
    Ls = np.stack([np.asarray(f[0]) for f in frames])
    Rs = np.stack([np.asarray(f[1]) for f in frames])
    Ts = np.stack([f[2] for f in frames])
    s = SLAMSystem(seq.cam, PARAMS, use_gt_pose=True,
                   enable_loop_closure=False, enable_local_ba=False)
    s.world_shift_threshold_m = 6.0
    s.process_many(Ls, Rs, Ts, chunk=8)
    assert s.world_shifts >= 2
    m = ev.evaluate(s.trajectory_array, Ts)
    assert m.ate_rmse_m < 0.05
