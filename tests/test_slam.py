"""End-to-end SLAM system tests: loop closure + windowed BA on a loop."""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.eval import trajectory as ev
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.slam import SLAMSystem

pytestmark = pytest.mark.slow  # whole-module e2e (fast-subset excluded)

# Synthetic-world overrides: the 12 m / 120-frame circular loop turns
# continuously (~0.06 rad + 0.7 m per frame -> motion scaling ~2.0), so the
# reference's KITTI-calibrated optimization veto (1.5, CTrackerSV.h:72 —
# straight KITTI driving sits at ~1.4 and turns veto) would block the WHOLE
# back-end in a world with no straights; and the revisit spans only ~3
# keyframes past the reference's 20-keyframe temporal exclusion, so the
# miniature world keeps the pre-r5 exclusion of 10.
PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512,
                             max_detections=512,
                             closure_exclude_recent=10,
                             max_motion_scaling_for_optimization=2.5)


@pytest.fixture(scope="module")
def loop_run():
    """One revisiting loop (quite slow: rendered + tracked at 512x256)."""
    seq = SyntheticSequence(
        n_frames=120, width=512, height=256, trajectory="loop", loop_radius=12.0
    )
    s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=True, enable_loop_closure=True)
    for (L, R, _) in seq:
        s.process(L, R)
    s.finalize_backend()   # drain the closure waiting queue (end of stream)
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


@pytest.fixture(scope="module")
def vo_only_run():
    """The same loop WITHOUT loop closure: visual odometry + local BA.

    ``SLAMSystem.trajectory_array`` is NOT a drift measure once closures
    run — every accepted closure's pose-graph correction folds into the
    live chain, so entries spanning correction events mix gauges and
    their ATE grows with the NUMBER of accepted closures (r3 shipped
    chasing a "raw-VO regression" of exactly this artifact: 0.334 m of
    gauge jumps, not drift). The odometric accuracy bound therefore
    measures a closure-free run — the regime the historical 0.25 m bound
    was calibrated on (front-end + cadence-4 local BA: 0.14-0.19 m;
    front-end alone drifts ~0.28 m)."""
    seq = SyntheticSequence(
        n_frames=120, width=512, height=256, trajectory="loop", loop_radius=12.0
    )
    s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=True,
                   enable_loop_closure=False)
    for (L, R, _) in seq:
        s.process(L, R)
    return seq, s


def test_slam_loop_improves_ate(loop_run, vo_only_run):
    seq, s = loop_run
    _, s_vo = vo_only_run
    m_vo = ev.evaluate(s_vo.trajectory_array, seq.poses_wc)
    m_opt = ev.evaluate(s.optimized_trajectory(), seq.poses_wc)
    assert np.isfinite(m_opt.ate_rmse_m)
    # raw-VO bound on the PURE-VO run (see vo_only_run: the full system's
    # internal trajectory_array mixes gauges at correction events)
    assert m_vo.ate_rmse_m < 0.25
    # the full back-end must beat pure VO (observed r4: opt 0.030 vs
    # VO ~0.15) and hold an absolute accuracy bound
    assert m_opt.ate_rmse_m <= m_vo.ate_rmse_m * 1.02
    assert m_opt.ate_rmse_m < 0.2


@pytest.fixture(scope="module")
def loop_run_no_ba():
    """The same loop WITHOUT bundle adjustment: raw VO drifts more, so the
    closure + pose graph must carry the improvement alone."""
    seq = SyntheticSequence(
        n_frames=120, width=512, height=256, trajectory="loop", loop_radius=12.0
    )
    s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=False, enable_loop_closure=True)
    for (L, R, _) in seq:
        s.process(L, R)
    s.finalize_backend()
    return seq, s


def test_closure_strictly_improves_without_ba(loop_run_no_ba):
    """A no-op back-end must fail this: with BA off, the accepted closure's
    pose-graph relaxation is REQUIRED to strictly beat raw VO (guards
    against the closure stage silently stopping to improve anything)."""
    seq, s = loop_run_no_ba
    assert s.stats["closures_accepted"] >= 1
    assert s.stats["pose_graph_runs"] >= 1
    m_raw = ev.evaluate(s.trajectory_array, seq.poses_wc)
    m_opt = ev.evaluate(s.optimized_trajectory(), seq.poses_wc)
    assert np.isfinite(m_opt.ate_rmse_m)
    assert m_opt.ate_rmse_m < 0.9 * m_raw.ate_rmse_m


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


def test_depth_consistency_gate_excludes_outliers():
    """An observation whose stereo disparity disagrees with the current
    estimate by >25% must never enter BA (ref 0.75-1.25 relative-distance
    gate, Cg2oOptimizer.cpp:1403-1410) — previously one bad stereo match
    fed BA at full robust weight."""
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=256,
                                 max_detections=256,
                                 keyframe_translation_m2=0.25,
                                 keyframe_rotation_rad2=0.01)
    seq = SyntheticSequence(n_frames=24, width=512, height=256, step=0.4)
    s = SLAMSystem(seq.cam, params, enable_loop_closure=False,
                   enable_local_ba=True, local_ba_every=100)  # manual BA only
    for (L, R, _) in seq:
        s.process(L, R)
    assert len(s.slam_keyframes) >= 4
    # corrupt the stereo disparity of a few observations on one keyframe:
    # halving the disparity doubles the measured depth (rel ~ 0.25)
    kf = s.slam_keyframes[-2]
    n_bad = min(6, len(kf.obs_uids))
    assert n_bad >= 3
    uv = kf.obs_uv4.copy()
    disp = uv[:n_bad, 0] - uv[:n_bad, 2]
    uv[:n_bad, 2] = uv[:n_bad, 0] - 0.5 * disp
    kf.obs_uv4 = uv
    before = s.stats.get("obs_depth_gated", 0)
    s._local_ba()
    assert s.stats.get("obs_depth_gated", 0) >= before + n_bad
    for k in s.slam_keyframes:
        assert np.isfinite(k.T_wc).all()


def test_pose_fallback_cascade_recovers_from_bad_prior():
    """Corrupted constant-velocity prior: the raw-prior attempt must fail,
    the rotation-only retry (predicted rotation + last camera center, ref
    CTrackerSV.cpp:294-307) must recover the pose."""
    import jax.numpy as jnp

    from svi_mapper_tpu.frontend.tracking import track_landmarks
    from svi_mapper_tpu.models import frame as frame_mod
    from svi_mapper_tpu.models.tracker import StereoTracker
    from svi_mapper_tpu.ops.descriptors import smooth_brief_dense
    from svi_mapper_tpu.solvers.posit import solve_stereo_posit

    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=256,
                                 max_detections=256)
    seq = SyntheticSequence(n_frames=8, width=256, height=192, step=0.3)
    tracker = StereoTracker(seq.cam, params)
    frames = list(seq)
    for (L, R, _) in frames[:6]:
        tracker.process(L, R)
    assert bool(tracker.outputs[-1].posit_ok)
    assert int(tracker.state.instability) == 0

    # teleport the previous pose 6 m sideways: the CV prior now predicts a
    # 6 m jump, far beyond the tracking lattice reach
    Tp = np.asarray(tracker.state.T_wc_prev).copy()
    Tp[0, 3] += 6.0
    tracker.state = tracker.state.replace(T_wc_prev=jnp.asarray(Tp))

    # differential oracle: a raw-prior-only solve at frame 6 fails
    L6, R6, _ = frames[6]
    st = tracker.state
    T_bad = np.asarray(frame_mod._constant_velocity_prior(st))
    wp = -(-L6.shape[1] // 16) * 16
    Lx = jnp.pad(jnp.asarray(L6, jnp.float32), ((0, 0), (0, wp - L6.shape[1])), mode="edge")
    Rx = jnp.pad(jnp.asarray(R6, jnp.float32), ((0, 0), (0, wp - R6.shape[1])), mode="edge")
    tr = track_landmarks(smooth_brief_dense(Lx), smooth_brief_dense(Rx),
                         st.table, jnp.asarray(T_bad), seq.cam)
    raw = solve_stereo_posit(jnp.asarray(T_bad), st.table.pos_w, tr.uv4,
                             tr.tracked, seq.cam, T_prior=jnp.asarray(T_bad))
    assert not bool(raw.ok), "raw corrupted prior unexpectedly succeeded"

    # the full frame step recovers via the rotation-only retry
    out = tracker.process(L6, R6)
    assert bool(out.posit_ok), "fallback cascade did not recover the pose"
    T_est = np.asarray(out.T_wc)
    T_true = frames[6][2]
    assert np.linalg.norm(T_est[:3, 3] - T_true[:3, 3]) < 0.5


def test_instability_vetoes_local_ba():
    """While the instability counter is > 0 the windowed BA must not run
    (ref CTrackerSV.cpp:430)."""
    import jax.numpy as jnp

    from svi_mapper_tpu.io.synthetic import default_camera

    cam = default_camera(256, 192)
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=128,
                                 max_detections=128)
    slam = SLAMSystem(cam, params, enable_loop_closure=False, local_ba_every=1)

    # fabricate a consistent map: landmarks in front of the camera, stereo
    # observations projected exactly
    L = params.max_landmarks
    rng = np.random.default_rng(0)
    pos_w = rng.uniform([-3, -1, 4], [3, 1, 20], (L, 3)).astype(np.float32)
    t = slam.state.table
    slam.state = slam.state.replace(
        table=t.replace(uid=jnp.arange(L, dtype=jnp.int32),
                        active=jnp.ones(L, bool),
                        pos_w=jnp.asarray(pos_w)))
    fx = float(cam.left.fx); cx = float(cam.left.cx); cy = float(cam.left.cy)
    bq = float(cam.right.P[0, 3])

    def kf_arrays(T_wc):
        p_c = pos_w @ T_wc[:3, :3].T + T_wc[:3, 3]
        u = fx * p_c[:, 0] / p_c[:, 2] + cx
        v = fx * p_c[:, 1] / p_c[:, 2] + cy
        d = -bq / p_c[:, 2]
        return dict(uid=np.arange(L), active=np.ones(L, bool),
                    optimal=np.ones(L, bool), tracked=np.ones(L, bool),
                    uv_left=np.stack([u, v], -1).astype(np.float32),
                    disparity=d.astype(np.float32), pos_w=pos_w,
                    desc=rng.integers(0, 2**32, (L, 8), dtype=np.uint64).astype(np.uint32))

    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32); T1[2, 3] = -0.5
    T2 = np.eye(4, dtype=np.float32); T2[2, 3] = -1.0
    slam._handle_keyframe(frame_idx=0, T_wc=T0, instability=0, **kf_arrays(T0))
    assert slam.stats["ba_runs"] == 0          # < 2 keyframes
    slam._handle_keyframe(frame_idx=1, T_wc=T1, instability=3, **kf_arrays(T1))
    assert slam.stats["ba_runs"] == 0          # vetoed
    assert slam.stats.get("ba_vetoed", 0) == 1
    slam._handle_keyframe(frame_idx=2, T_wc=T2, instability=0, **kf_arrays(T2))
    assert slam.stats["ba_runs"] == 1          # stable again -> BA runs


def test_closure_merges_duplicate_landmarks(loop_run):
    """VERDICT item-5 acceptance: after an accepted closure the re-observed
    landmark duplicates collapse onto one identity (the landmark-identity
    closure constraint, ref EdgePointXYZ Cg2oOptimizer.cpp:444-459), and
    the incremental full-graph BA reconciles the MAP across the loop."""
    _, s = loop_run
    assert s.stats.get("landmarks_merged", 0) >= 10
    # merged pairs resolve to one canonical uid
    import numpy as np
    for c in s.accepted_closures:
        for (uq, ur) in c.uid_pairs[:50]:
            assert s._uid_find(int(uq)) == s._uid_find(int(ur))
    # no two active live-table rows share an identity
    t = s.state.table
    uids = np.asarray(t.uid)[np.asarray(t.active)]
    canon = np.asarray([s._uid_find(int(u)) for u in uids])
    assert len(np.unique(canon)) == len(canon)
    # the incremental full-graph stage ran and advanced its watermark
    assert s._last_opt_kf > 0


def test_incremental_ba_reconciles_loop(loop_run):
    """The BA'd map must collapse duplicate columns: assembling a window
    across the loop yields FEWER unique landmark columns than the raw
    (unmerged) uid count."""
    import numpy as np
    _, s = loop_run
    kfs = s.slam_keyframes
    raw_uids = np.unique(np.concatenate([k.obs_uids for k in kfs]))
    canon_uids = np.unique(s._canon_uids(raw_uids.astype(np.int64)))
    assert len(canon_uids) < len(raw_uids)
