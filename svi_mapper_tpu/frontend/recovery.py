"""Regional detection recovery — the batched stage-2 second chance.

TPU-native replacement for the reference's regional GFTT recovery
(CFundamentalMatcher.cpp:495-727): for every landmark the direct window
check missed, the reference re-detects GFTT corners inside a search
rectangle around the predicted reprojection — half size
``round(principal_weight + motion_scaling) * 15`` px per axis
(CFundamentalMatcher.cpp:499-503, block size ``.h:95``) — brute-force
Hamming-matches the landmark's last descriptor against the region's corner
descriptors (cutoff 50, ``.cpp:546``), and stereo-triangulates the winner.
The region grows with motion and eccentricity far beyond any dense scoring
window (up to +-75 px), so this stage recovers landmarks whose prediction
error exceeds the window reach of frontend.tracking.

The TPU restructuring inverts the loop: corners are detected ONCE over the
whole image (a full-image structure-tensor response costs the same as one
region on TPU), descriptors for all K detections are gathered in one batch,
and the landmark-region containment + Hamming acceptance becomes one
``[L, K]`` masked matrix reduced by argmin. One-to-one assignment (the
reference's vote dedup ``_getMatchNN``, CTrackerGT.cpp:648-678) keeps, per
detection, only the landmark with the smallest distance. Recovery runs
AFTER the pose solve, under the refined pose — the reference's ordering
(stages run inside getPoseStereoPosit with the prior, then trackEpipolar
re-runs with the optimized pose; here the dense window covers the prior
pass and this stage covers the refined-pose recovery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.geometry.camera import StereoCamera
from svi_mapper_tpu.mapping.landmarks import LandmarkTable
from svi_mapper_tpu.ops.corners import detect_corners
from svi_mapper_tpu.ops.descriptors import brief_at
from svi_mapper_tpu.ops.hamming import hamming_mxu

_BIG = jnp.int32(1 << 20)

# region half-size unit (ref m_uSearchBlockSizePoseOptimization = 15,
# CFundamentalMatcher.h:95)
SEARCH_BLOCK_PX = 15.0


@struct.dataclass
class RecoveryResult:
    recovered: jax.Array    # [L] bool — recovered this frame (left + right)
    uv4: jax.Array          # [L, 4] stereo measurement of recovered landmarks
    desc_left: jax.Array    # [L, 8] descriptor at the recovered left corner
    n_candidates: jax.Array  # int32 — landmarks that needed recovery


@functools.partial(
    jax.jit,
    static_argnames=("cutoff", "cutoff_stereo", "max_detections",
                     "detect_cell", "detect_quality", "use_desc_history"),
)
def regional_recovery(
    dense_left: jax.Array,      # [H, W, 8] dense BRIEF of current LEFT
    dense_right: jax.Array,
    img_left: jax.Array,        # [H, W] float32 (unpadded) for detection
    table: LandmarkTable,
    tracked: jax.Array,         # [L] bool — already matched by the window pass
    T_wc: jax.Array,            # [4,4] REFINED world->LEFT-camera pose
    cam: StereoCamera,
    ms: jax.Array | float,      # motion scaling (ref CTrackerGT.cpp:157)
    *,
    cutoff: int = 50,           # ref m_dMatchingDistanceCutoffTrackingStage2
    cutoff_stereo: int = 100,   # right-image re-match (ref CTriangulator.cpp:13)
    max_detections: int = 1024,
    detect_cell: int = 4,
    detect_quality: float = 0.01,
    use_desc_history: bool = True,
) -> RecoveryResult:
    """Recover un-tracked landmarks from freshly detected corners."""
    L = table.capacity
    dt = table.pos_w.dtype

    # --- who needs recovery, and where ------------------------------------
    p_c = se3.transform(T_wc, table.pos_w)                  # [L, 3]
    uv_pred = cam.left.project(p_c)
    in_front = p_c[:, 2] > 0.05
    in_view = cam.left.in_fov(uv_pred) & in_front
    need = table.active & ~tracked & in_view

    # per-landmark region half sizes (ref .cpp:499-503)
    pw = cam.left.principal_weight(
        jnp.nan_to_num(uv_pred, nan=0.0, posinf=0.0, neginf=0.0))
    scale = jnp.round(pw + jnp.asarray(ms, dt))             # [L, 2]
    half = scale * SEARCH_BLOCK_PX                          # (hw, hh)

    n_need = jnp.sum(need.astype(jnp.int32))

    # The whole detect-describe-match-triangulate body runs under a
    # ``lax.cond`` on any landmark actually needing recovery: the reference
    # only runs stage 2 for MISSED landmarks (CFundamentalMatcher.cpp:495),
    # and on frames where the window pass tracked everything the full-image
    # corner pass is pure waste (VERDICT r2 Weak-4).
    def _skip(_):
        return RecoveryResult(
            recovered=jnp.zeros((L,), jnp.bool_),
            uv4=jnp.zeros((L, 4), dt),
            desc_left=jnp.zeros_like(table.desc_left_last),
            n_candidates=jnp.int32(0),
        )

    def _run(_):
        return _recover(
            dense_left, dense_right, img_left, table, need, half, uv_pred,
            cam, cutoff=cutoff, cutoff_stereo=cutoff_stereo,
            max_detections=max_detections, detect_cell=detect_cell,
            detect_quality=detect_quality, use_desc_history=use_desc_history,
            n_need=n_need,
        )

    return jax.lax.cond(n_need > 0, _run, _skip, None)


def _recover(
    dense_left, dense_right, img_left, table, need, half, uv_pred, cam, *,
    cutoff, cutoff_stereo, max_detections, detect_cell, detect_quality,
    use_desc_history, n_need,
) -> RecoveryResult:
    from svi_mapper_tpu.frontend.stereo import match_stereo

    L = table.capacity
    dt = table.pos_w.dtype

    # --- one full-image detection (the reference's per-region GFTT) -------
    # A finer NMS cell than new-landmark detection: recovery needs the
    # corner nearest the old feature, not a spread-out constellation.
    uv_c, _, valid_c = detect_corners(
        img_left, k=max_detections, cell=detect_cell,
        quality=detect_quality, border=28,
    )
    # BRIEF decorrelates within ~2 px, and corner localization shifts a few
    # px between views — score each corner's 3x3 neighborhood so the
    # landmark can re-anchor on the exact pixel (the reference gets this
    # slack from GFTT sub-cell positions + the 16*keypointSize extraction
    # margin, CFundamentalMatcher.cpp:2200-2210)
    offs = jnp.asarray(
        [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
         (1, 1), (1, -1), (-1, 1), (-1, -1)], dt)
    uv_det = (uv_c[:, None, :] + offs[None, :, :]).reshape(-1, 2)  # [K*9, 2]
    valid_det = jnp.repeat(valid_c, offs.shape[0])
    desc_det = brief_at(dense_left, uv_det)                 # [K*9, 8]
    K = uv_det.shape[0]

    # --- [L, K] masked Hamming acceptance (MXU bit-matmul: the naive
    #     XOR+popcount would materialize [L, K, 8]) ------------------------
    from svi_mapper_tpu.mapping.landmarks import anchor_descriptors

    # same dual gate as the window pass: last descriptor + history anchor
    # (drift-tolerant "original", see mapping.landmarks.anchor_descriptors)
    desc_anchor = (anchor_descriptors(table) if use_desc_history
                   else table.desc_left_ref)
    d_last = hamming_mxu(table.desc_left_last, desc_det)    # [L, K]
    d_ref = hamming_mxu(desc_anchor, desc_det)

    du = uv_det[None, :, 0] - uv_pred[:, None, 0]           # [L, K]
    dv = uv_det[None, :, 1] - uv_pred[:, None, 1]
    in_region = (jnp.abs(du) <= half[:, None, 0]) & (jnp.abs(dv) <= half[:, None, 1])
    ok = (need[:, None] & valid_det[None, :] & in_region
          & (d_last <= cutoff) & (d_ref <= cutoff))
    cost = jnp.where(ok, d_last, _BIG)                      # [L, K]

    best = jnp.argmin(cost, axis=1).astype(jnp.int32)       # [L]
    best_cost = jnp.take_along_axis(cost, best[:, None], 1)[:, 0]
    accept = best_cost < _BIG

    # one-to-one: per detection keep the lowest-cost claiming landmark
    # (ref vote dedup _getMatchNN, CTrackerGT.cpp:648-678)
    det_best = jnp.full((K,), _BIG, jnp.int32)
    det_best = det_best.at[best].min(jnp.where(accept, best_cost, _BIG))
    accept = accept & (jnp.take(det_best, best) == best_cost)
    # distance ties between two landmarks on one detection: keep the
    # lowest landmark index (matches the sequential reference order)
    first_l = jnp.full((K,), L, jnp.int32).at[best].min(
        jnp.where(accept, jnp.arange(L, dtype=jnp.int32), L))
    accept = accept & (jnp.take(first_l, best) == jnp.arange(L))

    uv_l = uv_det[best]                                     # [L, 2]
    desc_l = desc_det[best]

    # --- stereo correspondence + depth gates (ref .cpp:556-575) ----------
    sm = match_stereo(
        dense_right, uv_l, desc_l, accept, cam,
        cutoff=cutoff_stereo,
        disparity_center=table.disparity_last,
        search_range=jnp.maximum(jnp.asarray(60.0, dt),
                                 0.5 * table.disparity_last),
    )
    recovered = accept & sm.ok
    uv4 = jnp.concatenate([uv_l, sm.uv_right], -1)
    return RecoveryResult(
        recovered=recovered,
        uv4=uv4,
        desc_left=desc_l,
        n_candidates=n_need,
    )
