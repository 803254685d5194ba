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
    # full optimization at kf 20 and kf 41 (delta from _last_opt_kf = 21)
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
