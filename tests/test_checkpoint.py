"""Checkpoint/resume round-trip (SURVEY.md §5: map-state checkpointing —
the capability the reference lacks; its persistence is only g2o snapshots
Cg2oOptimizer.cpp:493-514 and cloud files CKeyFrame.cpp:138-185)."""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.slam import SLAMSystem
from svi_mapper_tpu.models.tracker import StereoTracker

PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=128,
                             max_detections=128, max_measurements=8)


def _run(tracker, seq, n):
    it = iter(seq)
    for _ in range(n):
        L, R, T = next(it)
        tracker.process(np.asarray(L), np.asarray(R),
                        T_gt=T if tracker.use_gt_pose else None)
    return tracker


def _state_equal(a, b):
    for f in dataclasses.fields(a.table):
        va, vb = np.asarray(getattr(a.table, f.name)), np.asarray(getattr(b.table, f.name))
        assert np.array_equal(va, vb), f"table.{f.name} differs"
    for f in ("T_wc", "T_wc_prev", "T_last_keyframe", "next_uid",
              "frame_idx", "instability"):
        assert np.array_equal(np.asarray(getattr(a, f)),
                              np.asarray(getattr(b, f))), f"state.{f} differs"


@pytest.mark.parametrize("kind", ["tracker", "slam"])
def test_checkpoint_roundtrip_and_resume(tmp_path, kind):
    seq = SyntheticSequence(n_frames=8, width=256, height=192, step=0.35)
    if kind == "slam":
        tr = SLAMSystem(seq.cam, PARAMS, enable_local_ba=False)
    else:
        tr = StereoTracker(seq.cam, PARAMS)
    _run(tr, seq, 5)

    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, tr)
    tr2 = load_checkpoint(path)

    assert type(tr2).__name__ == type(tr).__name__
    assert tr2.frame_count == tr.frame_count
    assert tr2.params == tr.params
    _state_equal(tr.state, tr2.state)
    assert np.allclose(np.stack(tr.trajectory), np.stack(tr2.trajectory))
    if kind == "slam":
        assert len(tr2.slam_keyframes) == len(tr.slam_keyframes)
        assert tr2.db.n == tr.db.n
        assert np.array_equal(np.asarray(tr2.db.desc), np.asarray(tr.db.desc))
    else:
        assert len(tr2.keyframes) == len(tr.keyframes)

    # resuming both trackers over the same frames must agree exactly —
    # the checkpoint carries the complete state
    seq2 = SyntheticSequence(n_frames=8, width=256, height=192, step=0.35)
    frames = list(seq2)[5:8]
    for (L, R, T) in frames:
        tr.process(np.asarray(L), np.asarray(R))
        tr2.process(np.asarray(L), np.asarray(R))
    assert np.allclose(np.stack(tr.trajectory), np.stack(tr2.trajectory),
                       atol=1e-5)


def test_checkpoint_svi_roundtrip(tmp_path):
    """The SVI tracker's IMU state (calibration, velocity, gravity obs,
    rectify maps) survives checkpoint/resume."""
    import sys

    sys.path.insert(0, "tests")
    from test_euroc import _write_mini_euroc

    from svi_mapper_tpu.imu import interpolator as imu_mod
    from svi_mapper_tpu.io.euroc import EurocSequence
    from svi_mapper_tpu.models.svi import StereoInertialTracker

    _write_mini_euroc(tmp_path / "ds")
    seq = EurocSequence(tmp_path / "ds")
    static = seq.static_imu_window(0.3)
    calib = imu_mod.calibrate(static[:, 1:4], static[:, 4:7])
    tr = StereoInertialTracker(seq.cam, calib, PARAMS,
                               rectify_maps=seq.rectify_maps,
                               enable_loop_closure=False,
                               enable_local_ba=False)
    prev_t = None
    for (t, L, R, imu) in seq:
        dt = (t - prev_t) if prev_t is not None else 0.05
        prev_t = t
        om = imu[:, 1:4].mean(0) if len(imu) else np.zeros(3)
        ac = imu[:, 4:7].mean(0) if len(imu) else np.zeros(3)
        tr.process_imu(L, R, om, ac, dt)
    tr.gravity_obs.append(np.array([0, -1, 0], np.float32))

    path = tmp_path / "svi.npz"
    save_checkpoint(path, tr)
    tr2 = load_checkpoint(path)
    assert type(tr2).__name__ == "StereoInertialTracker"
    assert np.allclose(tr2.velocity, tr.velocity)
    assert np.allclose(tr2.calib.bias_gyro, tr.calib.bias_gyro)
    assert np.allclose(tr2.calib.R_imu_to_world, tr.calib.R_imu_to_world)
    assert len(tr2.gravity_obs) == len(tr.gravity_obs)
    assert tr2.rectify_maps is not None
    assert np.allclose(np.asarray(tr2.rectify_maps[0]),
                       np.asarray(tr.rectify_maps[0]))
    _state_equal(tr.state, tr2.state)
    # resumed tracker keeps processing
    tr2.process_imu(np.zeros((48, 64), np.float32),
                    np.zeros((48, 64), np.float32),
                    np.zeros(3), np.zeros(3), 0.05)
    assert tr2.frame_count == tr.frame_count + 1


def test_checkpoint_mid_closure_queue(tmp_path):
    """VERDICT r4 Weak-3: a checkpoint taken with closures QUEUED (trigger
    not yet fired) must resume with the pending reconciliation intact —
    finalize_backend() after reload produces the same optimized keyframe
    chain as the uninterrupted run, and restored edges keep uid_pairs."""
    from svi_mapper_tpu.models.slam import ClosureEdge, SLAMKeyframe

    def build():
        seq = SyntheticSequence(n_frames=2, width=128, height=96)
        s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=False,
                       enable_loop_closure=True)
        # fabricated drifting loop: 12 keyframes walking +z with a small
        # per-step drift in x; the closure says kf11 coincides with kf0
        for k in range(12):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 0.05 * k          # accumulated drift
            T[2, 3] = -(k % 6)          # out and back
            s.slam_keyframes.append(SLAMKeyframe(
                index=k, frame_idx=4 * k, T_wc=T,
                obs_uids=np.zeros(0, np.int64),
                obs_uv4=np.zeros((0, 4), np.float32),
                pool_uids=np.zeros(0, np.int64)))
        edge = ClosureEdge(
            ref_kf=0, query_kf=11, T_qr=np.eye(4, dtype=np.float32),
            accepted=True,
            uid_pairs=np.array([[7, 3], [9, 4]], np.int64))
        s.accepted_closures.append(edge)
        s.closure_candidates.append(edge)
        s._closure_kfs_in_queue = 2     # trigger pending, not yet fired
        s._closure_opt_lo = 0
        s._last_closure_opt_kf = 1
        s._kf_since_local_ba = 3
        return s

    # uninterrupted: finalize drains the queue and runs the pose graph
    ref = build()
    ref.finalize_backend()
    assert ref.stats["pose_graph_runs"] == 1
    T_ref = np.stack([k.T_wc for k in ref.slam_keyframes])

    # interrupted: save mid-queue, reload, then finalize
    s = build()
    path = tmp_path / "midq.npz"
    save_checkpoint(path, s)
    s2 = load_checkpoint(path)
    assert s2._closure_kfs_in_queue == 2
    assert s2._closure_opt_lo == 0
    assert s2._last_closure_opt_kf == 1
    assert s2._kf_since_local_ba == 3
    assert len(s2.accepted_closures) == 1
    assert np.array_equal(s2.accepted_closures[0].uid_pairs,
                          np.array([[7, 3], [9, 4]], np.int64))
    assert s2.accepted_closures[0].suppressed is False
    s2.finalize_backend()
    assert s2.stats["pose_graph_runs"] == 1
    T_resumed = np.stack([k.T_wc for k in s2.slam_keyframes])
    assert np.allclose(T_resumed, T_ref, atol=1e-5)
    # the queue drained on both sides
    assert s2._closure_kfs_in_queue == 0 and ref._closure_kfs_in_queue == 0


def test_checkpoint_rejects_future_version(tmp_path):
    seq = SyntheticSequence(n_frames=2, width=128, height=96)
    tr = StereoTracker(seq.cam, PARAMS)
    path = tmp_path / "c.npz"
    save_checkpoint(path, tr)
    # tamper the version
    import json
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays["__meta__"]).decode())
    meta["version"] = 99
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **arrays)
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(path)
