"""Closure waiting-queue cadence (VERDICT r3 Next-1).

The reference buffers keyframes with accepted closures and runs ONE
``Cg2oOptimizer::optimize`` when either the keyframe-delta trigger or the
queue trigger fires (CTrackerSV.cpp:418-451: ``m_uLoopClosingKeyFrames-
InQueue`` / ``m_uLoopClosingKeyFrameWaitingQueue = 1`` /
``m_uIDDeltaKeyFrameForOptimization = 20``) — never one optimization per
acceptance (r3 fired the full back-end per accepting keyframe and lost 4x
full-SLAM throughput to it). These tests pin the trigger logic itself on a
fabricated keyframe stream — no rendering, no device work.
"""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.io.synthetic import default_camera
from svi_mapper_tpu.models.slam import SLAMKeyframe, SLAMSystem


@pytest.fixture
def sys_counted(monkeypatch):
    """A SLAMSystem with the expensive stages replaced by call counters."""
    cam = default_camera(128, 64)
    s = SLAMSystem(cam, DEFAULT_PARAMS, enable_local_ba=True,
                   enable_loop_closure=True, local_ba_every=4)
    calls = {"full": 0, "local": 0, "pg": 0}

    def fake_full():
        calls["full"] += 1
        # mirror the real method's bookkeeping without device work
        if s._closure_kfs_in_queue > 0:
            calls["pg"] += 1
            s._last_closure_opt_kf = len(s.slam_keyframes) - 1
        s._last_opt_kf = len(s.slam_keyframes)
        s._closure_kfs_in_queue = 0
        s._closure_opt_lo = None

    monkeypatch.setattr(s, "_run_queued_optimization", fake_full)
    monkeypatch.setattr(s, "_local_ba", lambda: calls.__setitem__(
        "local", calls["local"] + 1))
    return s, calls


def _push_keyframe(s):
    k = len(s.slam_keyframes)
    s.slam_keyframes.append(SLAMKeyframe(
        index=k, frame_idx=4 * k, T_wc=np.eye(4, dtype=np.float32),
        obs_uids=np.zeros(0, np.int64), obs_uv4=np.zeros((0, 4), np.float32),
        pool_uids=np.zeros(0, np.int64)))


def test_keyframe_delta_trigger_every_20(sys_counted):
    s, calls = sys_counted
    for _ in range(45):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0)
    # full optimization at kf 21 and kf 43 (STRICT > delta, matching the
    # reference's m_uIDDeltaKeyFrameForOptimization < id - last,
    # CTrackerSV.cpp:437; _last_opt_kf advances to id+1 after a run)
    assert calls["full"] == 2
    # local refinement keeps its own cadence between full runs
    assert calls["local"] >= 8
    assert calls["pg"] == 0      # no closures queued


def test_closure_queue_triggers_one_optimization(sys_counted):
    """Many acceptances -> ONE closure-triggered optimization (the r3
    regression fired the full back-end once PER acceptance)."""
    s, calls = sys_counted
    for _ in range(25):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0)
    full_before = calls["full"]
    # closures accepted on 5 consecutive keyframes (the revisit span)
    for _ in range(5):
        _push_keyframe(s)
        s._closure_kfs_in_queue += 1
        s._closure_opt_lo = 2
        s._maybe_trigger_backend(instability=0)
    # queue trigger needs > closure_queue_wait (1) queued keyframes AND
    # >= 20 keyframes since the last closure optimization -> exactly one
    # pose-graph-carrying optimization for the whole burst
    assert calls["pg"] == 1
    assert calls["full"] == full_before + 1
    # acceptances AFTER the trigger re-buffer for the next trigger (the
    # delta guard blocks an immediate re-fire); finalize drains them
    assert s._closure_kfs_in_queue == 3


def test_instability_vetoes_optimization(sys_counted):
    s, calls = sys_counted
    for _ in range(25):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=5)
    assert calls["full"] == 0
    assert calls["local"] == 0
    assert s.stats.get("ba_vetoed", 0) > 0
    # stability returns -> the pending trigger fires
    _push_keyframe(s)
    s._maybe_trigger_backend(instability=0)
    assert calls["full"] == 1


def test_motion_scaling_vetoes_optimization(sys_counted):
    """High average motion scaling vetoes the back-end exactly like
    instability (ref CTrackerSV.cpp:431: optimize only while
    (ms + ms_last)/2 < m_dMaximumMotionScalingForOptimization = 1.5)."""
    s, calls = sys_counted
    for _ in range(25):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0, motion_scaling=2.0)
    assert calls["full"] == 0
    assert calls["local"] == 0
    assert s.stats.get("ba_vetoed", 0) > 0
    # smooth motion returns -> the pending trigger fires
    _push_keyframe(s)
    s._maybe_trigger_backend(instability=0, motion_scaling=1.0)
    assert calls["full"] == 1


def test_host_motion_scaling_matches_device_formula():
    """The host twin reproduces frontend.epipolar.motion_scaling."""
    import jax.numpy as jnp

    from svi_mapper_tpu.frontend import epipolar as epi
    from svi_mapper_tpu.geometry import se3
    from svi_mapper_tpu.models.slam import SLAMSystem

    rng = np.random.default_rng(7)
    for _ in range(5):
        xi = rng.normal(scale=0.2, size=6).astype(np.float32)
        T_prev = np.asarray(se3.exp_se3(jnp.asarray(
            rng.normal(scale=0.3, size=6).astype(np.float32))))
        D = np.asarray(se3.exp_se3(jnp.asarray(xi)), np.float64)
        T_cur = D @ T_prev
        want = float(epi.motion_scaling(jnp.asarray(D, jnp.float32), 5.0))
        got = SLAMSystem._host_motion_scaling(T_prev, T_cur, 5.0)
        assert abs(want - got) < 1e-3


def test_ba_failure_backs_off_and_retains_queue(monkeypatch):
    """ADVICE r4: when the incremental BA bails, the keyframe-delta trigger
    must NOT re-fire the full attempt every keyframe (throughput cliff),
    and the queued closures must survive for the next trigger."""
    from svi_mapper_tpu.io.synthetic import default_camera

    cam = default_camera(128, 64)
    s = SLAMSystem(cam, DEFAULT_PARAMS, enable_local_ba=True,
                   enable_loop_closure=True)
    attempts = {"n": 0}

    def failing_ba(lo=None):
        attempts["n"] += 1
        return False

    monkeypatch.setattr(s, "_incremental_ba", failing_ba)
    monkeypatch.setattr(s, "_optimize_pose_graph", lambda: None)
    for _ in range(22):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0)
    s._closure_kfs_in_queue = 2
    s._closure_opt_lo = 3
    _push_keyframe(s)                      # kf 22 — queue trigger fires
    s._maybe_trigger_backend(instability=0)
    first = attempts["n"]
    assert first >= 1
    # queued closures retained for a retry; trigger backed off
    assert s._closure_kfs_in_queue == 2
    assert s._closure_opt_lo == 3
    assert s.stats.get("closure_opt_deferred", 0) >= 1
    for _ in range(5):                     # no re-fire inside the delta
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0)
    assert attempts["n"] == first


def test_closure_edge_dedup():
    """One accepted edge per revisit event: candidates whose endpoints both
    lie within closure_dedup_radius_kf of an accepted edge are suppressed
    (VERDICT r4 Weak-1: 16 accepted closures on a single-revisit loop)."""
    from svi_mapper_tpu.io.synthetic import default_camera
    from svi_mapper_tpu.mapping.closure import ClosureCandidate

    cam = default_camera(128, 64)
    s = SLAMSystem(cam, DEFAULT_PARAMS, enable_local_ba=False,
                   enable_loop_closure=True)
    for _ in range(40):
        _push_keyframe(s)

    def cand(q, r):
        return ClosureCandidate(
            query_kf=q, ref_kf=r, T_qr=np.eye(4, dtype=np.float32),
            inliers=30, matches=40, pairs=np.zeros((0, 2), np.int32))

    # the same revisit seen on 5 consecutive keyframes (all within the
    # +-4 dedup radius of the first accepted edge)
    for q in range(30, 35):
        s._apply_found_closures([cand(q, q - 25)], q)
    assert s.stats["closures_accepted"] == 1
    assert s.stats.get("closures_deduped", 0) == 4
    assert len(s.accepted_closures) == 1
    # a DISTINCT revisit event (far endpoints) still accepts
    s._apply_found_closures([cand(38, 2)], 38)
    assert s.stats["closures_accepted"] == 2


def test_finalize_drains_pending_queue(sys_counted):
    """Closures whose trigger never fired before end-of-stream still
    reconcile at finalize_backend()."""
    s, calls = sys_counted
    for _ in range(6):
        _push_keyframe(s)
        s._maybe_trigger_backend(instability=0)
    s._closure_kfs_in_queue = 1          # one lone accepted closure
    s._closure_opt_lo = 1
    s._maybe_trigger_backend(instability=0)
    assert calls["pg"] == 0              # queue of 1 never triggers in-run
    s.finalize_backend()
    assert calls["pg"] == 1
    assert s._closure_kfs_in_queue == 0
