"""Temporal landmark tracking: the 3-stage matcher as one masked lattice op.

TPU-native replacement for the tracking engine of ``CFundamentalMatcher``
(CFundamentalMatcher.cpp:391-2397). The reference runs, per landmark, a
try/catch cascade of three stages:
  stage 1 — direct reprojection descriptor check (cutoff 25, :391-487);
  stage 2 — regional GFTT + brute-force recovery   (cutoff 50, :495-727);
  stage 3 — recursive epipolar-curve sampling      (cutoff 50, :2142-2397),
with search windows scaled by principal-point weight and motion
(:856-977) and a dual-descriptor acceptance (distance to the *last* AND to
the *original* descriptor, :2336-2397).

Here the cascade becomes a static candidate lattice per landmark — a union
of three offset tiers around the predicted reprojection, each carrying its
stage's Hamming cutoff — evaluated in ONE gather into the dense descriptor
field + XOR-popcount + masked argmin. Tier priority is enforced by biasing
scores: a stage-1 acceptance always beats stage-2/3 (mirroring the cascade
order), and the dual-descriptor rule is applied to every candidate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.geometry.camera import StereoCamera
from svi_mapper_tpu.mapping.landmarks import LandmarkTable
from svi_mapper_tpu.ops.descriptors import brief_at


def _build_lattice() -> tuple[np.ndarray, np.ndarray]:
    """Static (offsets [C,2], tier [C]) arrays.

    tier 0: 3x3 dense around the prediction         (stage 1, cutoff 25)
    tier 1: |dx|,|dy| <= 8, stride 2                 (stage 2, cutoff 50)
    tier 2: |dx| <= 28 stride 2, dy in {-2, 0, 2}    (stage 3 epipolar band,
                                                      cutoff 50)
    The stage-3 band is horizontal because rectified temporal epipolar
    curves for forward motion are near-horizontal; the principal-weight
    window scaling (CFundamentalMatcher.cpp:856-977) is subsumed by the
    fixed +-28 px reach.
    """
    seen = set()
    offs, tiers = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            seen.add((dx, dy)); offs.append((dx, dy)); tiers.append(0)
    for dy in range(-8, 9, 2):
        for dx in range(-8, 9, 2):
            if (dx, dy) not in seen:
                seen.add((dx, dy)); offs.append((dx, dy)); tiers.append(1)
    for dy in (-2, 0, 2):
        for dx in range(-28, 29, 2):
            if (dx, dy) not in seen:
                seen.add((dx, dy)); offs.append((dx, dy)); tiers.append(2)
    return np.asarray(offs, np.float32), np.asarray(tiers, np.int32)


_OFFSETS_NP, _TIERS_NP = _build_lattice()
_OFFSETS = jnp.asarray(_OFFSETS_NP)      # [C, 2]
_TIERS = jnp.asarray(_TIERS_NP)          # [C]
# score bias per tier: stage-1 hits dominate stage-2 dominate stage-3,
# mirroring the reference's cascade short-circuit order
_TIER_BIAS = jnp.asarray([0, 1000, 2000], jnp.int32)

_BIG = jnp.int32(1 << 20)


@struct.dataclass
class TrackResult:
    tracked: jax.Array      # [L] bool — matched this frame (left + right)
    uv4: jax.Array          # [L, 4] (uL, vL, uR, vR)
    desc_left: jax.Array    # [L, 8] descriptor at the matched left location
    p_cam: jax.Array        # [L, 3] instantaneous stereo triangulation
    depth: jax.Array        # [L]
    tier: jax.Array         # [L] int32 — which stage matched (0/1/2)
    distance: jax.Array     # [L] Hamming distance (to last descriptor)
    uv_pred: jax.Array      # [L, 2] predicted left reprojection


@functools.partial(jax.jit, static_argnames=("cutoff_s1", "cutoff_s2", "cutoff_ref", "max_disparity"))
def track_landmarks(
    dense_left: jax.Array,      # [H, W, 8] dense BRIEF of current LEFT
    dense_right: jax.Array,     # [H, W, 8] dense BRIEF of current RIGHT
    table: LandmarkTable,
    T_wc_prior: jax.Array,      # [4,4] predicted world->LEFT-camera
    cam: StereoCamera,
    *,
    cutoff_s1: int = 25,        # ref CFundamentalMatcher.cpp:23
    cutoff_s2: int = 50,        # ref :24-26 (stage2 + epipolar)
    cutoff_ref: int = 50,       # vs the original descriptor (ref _getMatch)
    max_disparity: int = 128,
) -> TrackResult:
    """Track every active landmark into the current stereo frame."""
    from svi_mapper_tpu.frontend.stereo import match_stereo

    L = table.capacity
    pos_w = table.pos_w
    p_c = se3.transform(T_wc_prior, pos_w)                 # [L, 3]
    uv_pred = cam.left.project(p_c)                        # [L, 2]
    in_front = p_c[:, 2] > 0.05
    in_view = cam.left.in_fov(uv_pred) & in_front

    if jax.default_backend() == "tpu":
        # Pallas band-sweep kernel: one HBM pass over the dense field,
        # per-landmark window scoring in VMEM (ops.track_kernel). Produces
        # bit-identical scores for in-FoV landmarks (the 28 px FoV inset
        # guarantees candidate windows stay inside the image).
        from svi_mapper_tpu.ops.track_kernel import BLOCK_W, track_scores

        best_score, lin, best_dist, xbase, ybase = track_scores(
            dense_left, uv_pred, table.desc_left_last, table.desc_left_ref,
            cutoff_s1=cutoff_s1, cutoff_s2=cutoff_s2, cutoff_ref=cutoff_ref,
        )
        uvs = jnp.nan_to_num(uv_pred, nan=0.0, posinf=0.0, neginf=0.0)
        frac = uvs - jnp.round(uvs)
        uv_l = jnp.stack(
            [(xbase + lin % BLOCK_W).astype(uv_pred.dtype),
             (ybase + lin // BLOCK_W).astype(uv_pred.dtype)], axis=-1
        ) + frac
        best_tier = jnp.clip(best_score // 1000, 0, 2)
    else:
        cand_uv = uv_pred[:, None, :] + _OFFSETS[None, :, :]   # [L, C, 2]
        cand_desc = brief_at(dense_left, cand_uv)              # [L, C, 8]

        d_last = jnp.sum(
            jax.lax.population_count(cand_desc ^ table.desc_left_last[:, None, :]),
            axis=-1,
        ).astype(jnp.int32)                                    # [L, C]
        d_ref = jnp.sum(
            jax.lax.population_count(cand_desc ^ table.desc_left_ref[:, None, :]),
            axis=-1,
        ).astype(jnp.int32)

        tier_cutoff = jnp.where(_TIERS == 0, cutoff_s1, cutoff_s2)  # [C]
        accept = (d_last <= tier_cutoff[None, :]) & (d_ref <= cutoff_ref)
        score = jnp.where(accept, d_last + _TIER_BIAS[_TIERS][None, :], _BIG)

        best = jnp.argmin(score, axis=1).astype(jnp.int32)     # [L]
        best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
        uv_l = jnp.take_along_axis(cand_uv, best[:, None, None], axis=1)[:, 0]
        best_tier = _TIERS[best]
        best_dist = jnp.take_along_axis(d_last, best[:, None], axis=1)[:, 0]

    left_ok = (best_score < _BIG) & in_view & table.active
    # descriptor at the matched pixel (round(uv_l) is exactly that pixel:
    # the carried fractional part is < 0.5 by construction)
    desc_new = brief_at(dense_left, uv_l)

    # right-image correspondence around the last disparity
    # (ref CTriangulator bounded search, CTriangulator.h:20-21)
    sm = match_stereo(
        dense_right, uv_l, desc_new, left_ok, cam,
        max_disparity=max_disparity,
        cutoff=cutoff_s2,
        disparity_center=table.disparity_last,
        search_range=jnp.maximum(
            jnp.asarray(20.0, pos_w.dtype),
            0.5 * table.disparity_last,
        ),
    )
    tracked = left_ok & sm.ok
    uv4 = jnp.concatenate([uv_l, sm.uv_right], axis=-1)
    return TrackResult(
        tracked=tracked,
        uv4=uv4,
        desc_left=desc_new,
        p_cam=sm.p_cam,
        depth=sm.depth,
        tier=best_tier,
        distance=best_dist,
        uv_pred=uv_pred,
    )
