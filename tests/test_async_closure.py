"""Async loop closure: the search runs off the tracking path on a worker
thread over database snapshots (SURVEY.md §7 host/device ping-pong note —
the reference searches closures inline, CTrackerGT.cpp:257)."""

import dataclasses

import numpy as np
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.models.slam import SLAMSystem

pytestmark = pytest.mark.slow  # whole-module e2e (fast-subset excluded)

# circular-loop world overrides (see tests/test_slam.py PARAMS rationale)
PARAMS = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512,
                             max_detections=512,
                             closure_exclude_recent=10,
                             max_motion_scaling_for_optimization=2.5)


@pytest.fixture(scope="module")
def loop_runs():
    """The same revisiting loop tracked synchronously and asynchronously."""
    out = {}
    for mode in ("sync", "async"):
        seq = SyntheticSequence(n_frames=120, width=512, height=256,
                                trajectory="loop", loop_radius=12.0)
        s = SLAMSystem(seq.cam, PARAMS, enable_local_ba=False,
                       enable_loop_closure=True,
                       async_closure=(mode == "async"))
        for (L, R, _) in seq:
            s.process(L, R)
        s.flush_closures(block=True)
        out[mode] = s
    return out


def test_async_finds_the_same_closures(loop_runs):
    sync, asyn = loop_runs["sync"], loop_runs["async"]
    assert asyn.stats["closures_found"] >= 1
    assert asyn.stats["closures_accepted"] >= 1
    # the searches are identical computations over the same pools; only the
    # fold-in timing differs — found counts must match exactly
    assert asyn.stats["closures_found"] == sync.stats["closures_found"]
    pairs_s = {(c.ref_kf, c.query_kf) for c in sync.accepted_closures}
    pairs_a = {(c.ref_kf, c.query_kf) for c in asyn.accepted_closures}
    assert pairs_a == pairs_s


def test_async_trajectory_stays_consistent(loop_runs):
    asyn = loop_runs["async"]
    T = asyn.optimized_trajectory()
    assert np.isfinite(T).all()
    assert len(T) == asyn.frame_count


def test_flush_is_idempotent_and_sync_mode_noop(loop_runs):
    for s in loop_runs.values():
        before = s.stats["closures_found"]
        s.flush_closures(block=True)
        s.flush_closures(block=True)
        assert s.stats["closures_found"] == before
    assert not loop_runs["async"]._pending_closures
