"""Keyframe descriptor-cloud serialization.

Replaces the reference's binary ``.cloud`` files (written by
``CKeyFrame::saveCloudToFile`` CKeyFrame.cpp:138-185, re-loaded by the file
constructor :102-119, datum helpers CLogger.h:36-46): a keyframe's pose +
landmark snapshot {uid, world/camera positions, stereo UVs, descriptors}
persisted so the loop-closure subsystem can be exercised offline (the
``test_cloud_matching`` workflow, test_cloud_matching.cpp:17-180).

Format: NumPy ``.npz`` — self-describing, mmap-able, portable; the schema
mirrors ``CDescriptorVectorPoint3DWORLD`` (TypesCloud.h:20-46).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1


@dataclasses.dataclass
class KeyframeCloud:
    """Serializable keyframe snapshot (ref CDescriptorVectorPoint3DWORLD)."""

    keyframe_id: int
    frame_idx: int
    T_wc: np.ndarray          # [4,4]
    uids: np.ndarray          # [n] int64
    points_w: np.ndarray      # [n,3] world positions
    points_cam: np.ndarray    # [n,3] camera-frame positions
    uv_left: np.ndarray       # [n,2]
    uv_right: np.ndarray      # [n,2]
    descriptors: np.ndarray   # [n,8] uint32 packed BRIEF


def save_cloud(path: str | Path, cloud: KeyframeCloud) -> None:
    """Write a cloud file; ``.svic`` dispatches to the native binary codec
    (svi_mapper_tpu.native.write_cloud_native), anything else to ``.npz``."""
    if str(path).endswith(".svic"):
        from svi_mapper_tpu import native

        native.write_cloud_native(path, cloud)
        return
    np.savez_compressed(
        path,
        format_version=FORMAT_VERSION,
        keyframe_id=cloud.keyframe_id,
        frame_idx=cloud.frame_idx,
        T_wc=cloud.T_wc.astype(np.float32),
        uids=cloud.uids.astype(np.int64),
        points_w=cloud.points_w.astype(np.float32),
        points_cam=cloud.points_cam.astype(np.float32),
        uv_left=cloud.uv_left.astype(np.float32),
        uv_right=cloud.uv_right.astype(np.float32),
        descriptors=cloud.descriptors.astype(np.uint32),
    )


def load_cloud(path: str | Path) -> KeyframeCloud:
    if str(path).endswith(".svic"):
        from svi_mapper_tpu import native

        return native.read_cloud_native(path)
    with np.load(path) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            from svi_mapper_tpu.utils.errors import InvalidFileError

            raise InvalidFileError(
                f"cloud file {path} has unsupported version {version}")
        return KeyframeCloud(
            keyframe_id=int(z["keyframe_id"]),
            frame_idx=int(z["frame_idx"]),
            T_wc=z["T_wc"],
            uids=z["uids"],
            points_w=z["points_w"],
            points_cam=z["points_cam"],
            uv_left=z["uv_left"],
            uv_right=z["uv_right"],
            descriptors=z["descriptors"],
        )


def cloud_from_slam_state(state, keyframe_id: int, frame_idx: int) -> KeyframeCloud:
    """Snapshot the visible optimal landmarks of a live FrameState
    (the cloud the reference writes per keyframe, CTrackerGT.cpp:222-250)."""
    t = state.table
    sel = np.asarray(t.active & t.is_optimal)
    T_wc = np.asarray(state.T_wc)
    pos_w = np.asarray(t.pos_w)[sel]
    p_cam = pos_w @ T_wc[:3, :3].T + T_wc[:3, 3]
    uv_l = np.asarray(t.uv_left_last)[sel]
    disp = np.asarray(t.disparity_last)[sel]
    uv_r = np.stack([uv_l[:, 0] - disp, uv_l[:, 1]], axis=-1)
    return KeyframeCloud(
        keyframe_id=keyframe_id,
        frame_idx=frame_idx,
        T_wc=T_wc,
        uids=np.asarray(t.uid)[sel].astype(np.int64),
        points_w=pos_w,
        points_cam=p_cam,
        uv_left=uv_l,
        uv_right=uv_r,
        descriptors=np.asarray(t.desc_left_ref)[sel],
    )
