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
