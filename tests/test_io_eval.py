"""Tests for the IO/eval parity layer: KITTI loader, clouds, timing."""

import dataclasses
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.io import cloud as cloud_mod
from svi_mapper_tpu.io.kitti import KittiSequence, validate_sequence
from svi_mapper_tpu.eval.timing import StageTimer
from svi_mapper_tpu.models import frame as frame_mod


def _write_png(path: Path, img: np.ndarray) -> None:
    import cv2

    cv2.imwrite(str(path), img.astype(np.uint8))


@pytest.fixture
def fake_kitti(tmp_path, rng):
    """A tiny synthetic KITTI odometry tree (3 frames)."""
    seq_dir = tmp_path / "sequences" / "00"
    (seq_dir / "image_0").mkdir(parents=True)
    (seq_dir / "image_1").mkdir(parents=True)
    for i in range(3):
        img = (rng.random((64, 128)) * 255).astype(np.uint8)
        _write_png(seq_dir / "image_0" / f"{i:06d}.png", img)
        _write_png(seq_dir / "image_1" / f"{i:06d}.png", img)
    (seq_dir / "times.txt").write_text("0.0\n0.1\n0.2\n")
    (seq_dir / "calib.txt").write_text(
        "P0: 100 0 64 0 0 100 32 0 0 0 1 0\n"
        "P1: 100 0 64 -54 0 100 32 0 0 0 1 0\n"
    )
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    lines = []
    for i in range(3):
        T = np.eye(4)
        T[2, 3] = i * 0.5
        lines.append(" ".join(str(x) for x in T[:3].reshape(-1)))
    (poses_dir / "00.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_kitti_loader(fake_kitti):
    seq = KittiSequence(fake_kitti, "00")
    assert seq.n_frames == 3
    assert seq.cam.width == 128 and seq.cam.height == 64
    assert np.isclose(float(seq.cam.baseline), 0.54)
    assert seq.poses_wc is not None and seq.poses_wc.shape == (3, 4, 4)
    L, R, T = seq.frame(1)
    assert L.shape == (64, 128) and L.dtype == np.float32
    # pose file stores camera->world; loader returns world->camera
    assert np.isclose(T[2, 3], -0.5)
    assert validate_sequence(seq) == []


def test_kitti_validation_catches_problems(fake_kitti):
    seq = KittiSequence(fake_kitti, "00")
    seq.times = np.asarray([0.0, 0.2, 0.1])  # non-monotonic
    problems = validate_sequence(seq)
    assert any("monotonic" in p for p in problems)


def test_kitti_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        KittiSequence(tmp_path, "07")


def test_cloud_roundtrip(tmp_path, rng):
    c = cloud_mod.KeyframeCloud(
        keyframe_id=3,
        frame_idx=42,
        T_wc=np.eye(4, dtype=np.float32),
        uids=np.arange(10, dtype=np.int64),
        points_w=rng.random((10, 3)).astype(np.float32),
        points_cam=rng.random((10, 3)).astype(np.float32),
        uv_left=rng.random((10, 2)).astype(np.float32),
        uv_right=rng.random((10, 2)).astype(np.float32),
        descriptors=rng.integers(0, 2**32, (10, 8), dtype=np.uint64).astype(np.uint32),
    )
    path = tmp_path / "kf3.npz"
    cloud_mod.save_cloud(path, c)
    c2 = cloud_mod.load_cloud(path)
    assert c2.keyframe_id == 3 and c2.frame_idx == 42
    assert np.array_equal(c2.descriptors, c.descriptors)
    assert np.allclose(c2.points_w, c.points_w)


def test_cloud_from_slam_state(rng):
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=16, max_measurements=4)
    state = frame_mod.init_state(params)
    t = state.table
    t = t.replace(
        active=jnp.asarray([True] * 8 + [False] * 8),
        is_optimal=jnp.asarray([True] * 4 + [False] * 12),
        uid=jnp.arange(16, dtype=jnp.int32),
        pos_w=jnp.asarray(rng.random((16, 3)).astype(np.float32)),
    )
    state = state.replace(table=t)
    c = cloud_mod.cloud_from_slam_state(state, keyframe_id=0, frame_idx=5)
    assert len(c.uids) == 4  # active AND optimal
    assert c.points_cam.shape == (4, 3)


def test_stage_timer_report():
    timer = StageTimer()
    with timer.stage("track"):
        pass
    timer.add("ba", 0.5)
    rep = timer.report(n_frames=100, wall_seconds=2.0)
    assert "avg fps: 50.00" in rep
    assert "x real time: 2.50" in rep
    assert "ba" in rep and "track" in rep
