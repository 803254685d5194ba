"""Headless viewer outputs (the GUI layer analog,
gt_tracking_context_viewer.h:7-37 / CTrackerGT HUD :723-758)."""

import json
import re

import numpy as np

from svi_mapper_tpu.eval import viewer


def _traj(n):
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, 0, 3] = -np.arange(n, dtype=np.float32)   # world->cam: camera at x=i
    return T


def test_render_map_png(tmp_path):
    p = tmp_path / "map.png"
    viewer.render_map(
        p, _traj(10),
        landmarks=np.random.default_rng(0).normal(size=(50, 3)),
        keyframe_indices=[0, 5, 9],
        closures=[(0, 9)],
        ground_truth=_traj(10),
        hud={"tracked": np.arange(10), "active": np.full(10, 50)},
    )
    head = p.read_bytes()[:8]
    assert head[:4] == b"\x89PNG"


def test_export_html_selfcontained(tmp_path):
    p = tmp_path / "map.html"
    viewer.export_html(p, _traj(7), landmarks=np.zeros((3, 3)),
                       keyframe_indices=[2], closures=[(0, 6)],
                       hud={"tracked": [1] * 7})
    html = p.read_text()
    assert "<script src=" not in html         # no external resources
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1))
    assert len(data["traj"]) == 7
    assert data["kf"] == [2] and data["cl"] == [[0, 6]]
    # camera centers: world->cam with t=(-i,0,0) -> center at x=+i
    assert data["traj"][3][0] == 3.0


def test_snapshot_tracker_fields(tmp_path):
    import dataclasses

    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models.slam import SLAMSystem

    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=64,
                                 max_detections=64)
    seq = SyntheticSequence(n_frames=3, width=160, height=120)
    s = SLAMSystem(seq.cam, params, enable_local_ba=False)
    for (L, R, _) in seq:
        s.process(np.asarray(L), np.asarray(R))
    snap = viewer.snapshot_tracker(s)
    assert snap["trajectory"].shape == (3, 4, 4)
    assert "hud" in snap and len(snap["hud"]["tracked"]) == 3
    viewer.render_map(tmp_path / "s.png", **snap)
    viewer.export_html(tmp_path / "s.html", **snap)
