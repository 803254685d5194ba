"""Stereo rectification (cv::stereoRectify analog) + EuRoC/ASL loader
(ref VI-sensor path: CStereoCameraIMU.h:20-52, CParameterBase.h:169-392)."""

import numpy as np
import pytest

from svi_mapper_tpu.ops.image import stereo_rectify, undistort_rectify_maps

RNG = np.random.default_rng(11)


def _rot(v):
    a = np.linalg.norm(v)
    if a < 1e-12:
        return np.eye(3)
    k = v / a
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _project(P, p_rect0):
    """Common-rectified-frame (cam0-anchored) points -> pixels: both rectified
    projections act on the SAME frame, the baseline lives in P1[0,3] (the
    framework's project_stereo convention, geometry/camera.py)."""
    ph = np.concatenate([p_rect0, np.ones_like(p_rect0[:, :1])], axis=1)
    uvw = ph @ P.T
    return uvw[:, :2] / uvw[:, 2:3]


def test_stereo_rectify_aligns_rows_and_baseline_sign():
    K0 = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]])
    K1 = np.array([[455.0, 0, 379.0], [0, 456.0, 255.0], [0, 0, 1]])
    # cam1 is 11 cm to the right of cam0 with a small relative rotation:
    # x1 = R x0 + t, t = cam0 origin in cam1 coords ~ (-0.11, eps, eps)
    R = _rot(np.array([0.01, -0.02, 0.015]))
    t = np.array([-0.11, 0.002, -0.001])
    T10 = np.eye(4); T10[:3, :3] = R; T10[:3, 3] = t

    R0, R1, P0, P1 = stereo_rectify(K0, np.zeros(4), K1, np.zeros(4),
                                    T10, 752, 480)
    # rectifying rotations are valid and satisfy R_rect1 R = R_rect0
    for Rr in (R0, R1):
        assert np.allclose(Rr @ Rr.T, np.eye(3), atol=1e-10)
        assert abs(np.linalg.det(Rr) - 1) < 1e-10
    assert np.allclose(R1 @ R, R0, atol=1e-10)
    # left-camera convention: P1[0,3] = -fx * baseline
    b = np.linalg.norm(t)
    assert P1[0, 3] < 0
    assert abs(-P1[0, 3] / P1[0, 0] - b) < 1e-9

    # random scene points project to EQUAL ROWS with POSITIVE disparity;
    # consistency: rotating cam1-frame points by R_rect1 must equal the
    # cam0-rectified point plus the rectified baseline
    p0 = np.stack([RNG.uniform(-2, 2, 50), RNG.uniform(-1, 1, 50),
                   RNG.uniform(4, 30, 50)], -1)
    p1 = p0 @ R.T + t
    pr0 = p0 @ R0.T
    pr1 = p1 @ R1.T
    assert np.allclose(pr1 - pr0, (R1 @ t)[None, :], atol=1e-9)
    uv0 = _project(P0, pr0)
    uv1 = _project(P1, pr0)
    assert np.abs(uv0[:, 1] - uv1[:, 1]).max() < 1e-6
    disparity = uv0[:, 0] - uv1[:, 0]
    assert (disparity > 0).all()
    # depth from disparity recovers the rectified-frame depth
    z_rect = (p0 @ R0.T)[:, 2]
    z_est = -P1[0, 3] / disparity
    assert np.allclose(z_est, z_rect, rtol=1e-6)


def test_rectify_maps_identity_when_already_rectified():
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1]])
    P = np.hstack([K, np.zeros((3, 1))])
    mx, my = undistort_rectify_maps(K, np.zeros(4), np.eye(3), P, 64, 48)
    u, v = np.meshgrid(np.arange(64, dtype=np.float32),
                       np.arange(48, dtype=np.float32))
    assert np.allclose(mx, u, atol=1e-4)
    assert np.allclose(my, v, atol=1e-4)


# ---------------------------------------------------------------------------
# mini synthetic EuRoC dataset
# ---------------------------------------------------------------------------

def _write_mini_euroc(root, n_frames=3):
    import yaml
    from PIL import Image

    mav = root / "mav0"
    T_BS0 = np.eye(4)
    T_BS1 = np.eye(4); T_BS1[0, 3] = 0.11   # cam1 11 cm right of cam0 in body
    for name, T_BS in (("cam0", T_BS0), ("cam1", T_BS1)):
        d = mav / name / "data"
        d.mkdir(parents=True)
        y = {
            "sensor_type": "camera",
            "rate_hz": 20,
            "resolution": [64, 48],
            "camera_model": "pinhole",
            "intrinsics": [100.0, 100.0, 32.0, 24.0],
            "distortion_model": "radial-tangential",
            "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
            "T_BS": {"rows": 4, "cols": 4,
                     "data": [float(x) for x in T_BS.reshape(-1)]},
        }
        (mav / name / "sensor.yaml").write_text(yaml.safe_dump(y))
        rows = ["#timestamp [ns],filename"]
        for i in range(n_frames):
            ts = 1000000000 + i * 50000000
            img = (RNG.uniform(0, 255, (48, 64))).astype(np.uint8)
            Image.fromarray(img).save(d / f"{ts}.png")
            rows.append(f"{ts},{ts}.png")
        (mav / name / "data.csv").write_text("\n".join(rows) + "\n")

    imu_dir = mav / "imu0"
    imu_dir.mkdir(parents=True)
    rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i in range(100):
        ts = 900000000 + i * 5000000
        rows.append(f"{ts},0.001,-0.002,0.0005,0.05,-9.8,0.03")
    (imu_dir / "data.csv").write_text("\n".join(rows) + "\n")

    gt_dir = mav / "state_groundtruth_estimate0"
    gt_dir.mkdir(parents=True)
    rows = ["#timestamp,px,py,pz,qw,qx,qy,qz"]
    for i in range(n_frames):
        ts = 1000000000 + i * 50000000
        rows.append(f"{ts},{0.1 * i},0,0,1,0,0,0")
    (gt_dir / "data.csv").write_text("\n".join(rows) + "\n")


def test_euroc_loader_end_to_end(tmp_path):
    from svi_mapper_tpu.io.euroc import EurocSequence

    _write_mini_euroc(tmp_path)
    seq = EurocSequence(tmp_path)
    assert seq.n_frames == 3
    assert abs(float(seq.cam.baseline) - 0.11) < 1e-6
    # identity-extrinsic rig: rectify maps are the identity sampling
    mx = seq.rectify_maps[0]
    assert np.allclose(mx[0, :5], np.arange(5), atol=1e-3)

    frames = list(seq)
    assert len(frames) == 3
    t0, L, R, imu0 = frames[0]
    assert L.shape == (48, 64) and R.shape == (48, 64)
    assert len(imu0) == 0                     # nothing before first frame
    _, _, _, imu1 = frames[1]
    assert len(imu1) == 10                    # 50 ms at 200 Hz
    assert seq.gt_T_wc is not None and len(seq.gt_T_wc) == 3
    # GT at frame 1: camera moved +0.1 m in world x -> world->cam t = -0.1
    assert abs(seq.gt_T_wc[1][0, 3] + 0.1) < 1e-6

    # the static window feeds IMU calibration
    static = seq.static_imu_window(0.3)
    assert len(static) >= 10
    from svi_mapper_tpu.imu import interpolator as imu_mod

    calib = imu_mod.calibrate(static[:, 1:4], static[:, 4:7])
    assert np.allclose(calib.bias_gyro, [0.001, -0.002, 0.0005], atol=1e-6)


@pytest.mark.slow
def test_euroc_svi_tracker_runs(tmp_path):
    """Drive StereoInertialTracker over the mini dataset (the tracker_svi
    main-loop shape, tracker_svi.cpp:216-261)."""
    import dataclasses

    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.imu import interpolator as imu_mod
    from svi_mapper_tpu.io.euroc import EurocSequence
    from svi_mapper_tpu.models.svi import StereoInertialTracker

    _write_mini_euroc(tmp_path)
    seq = EurocSequence(tmp_path)
    static = seq.static_imu_window(0.3)
    calib = imu_mod.calibrate(static[:, 1:4], static[:, 4:7])
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=64,
                                 max_detections=64)
    tracker = StereoInertialTracker(seq.cam, calib, params,
                                    rectify_maps=seq.rectify_maps,
                                    enable_loop_closure=False,
                                    enable_local_ba=False)
    prev_t = None
    for (t, L, R, imu) in seq:
        dt = (t - prev_t) if prev_t is not None else 0.05
        prev_t = t
        if len(imu):
            # per-sample 200 Hz integration (run_euroc's feed)
            dts = np.full(len(imu), 0.005, np.float32)
            out = tracker.process_imu_samples(L, R, dts, imu[:, 1:4],
                                              imu[:, 4:7])
        else:
            out = tracker.process_imu(L, R, np.zeros(3), np.zeros(3), dt)
    assert tracker.frame_count == 3
    assert np.isfinite(np.stack(tracker.trajectory)).all()
