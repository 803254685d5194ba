"""Epipolar-row stereo correspondence on the dense descriptor field.

TPU-native replacement for ``CTriangulator`` (CTriangulator.cpp:13-356):
the reference generates a dense row of candidate keypoints along the
rectified scanline in RIGHT, extracts BRIEF for each, and brute-force
Hamming-matches (cutoff 100, search range bounded by the last disparity or
60 px, depth from disparity with a min-disparity floor). Here the right
image's descriptors are precomputed densely once (ops.descriptors.brief_dense)
so the scanline search is a ``[K, D]`` gather + XOR-popcount + masked argmin —
one fused op for all keypoints at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from svi_mapper_tpu.geometry.camera import StereoCamera
from svi_mapper_tpu.ops.descriptors import brief_at
from svi_mapper_tpu.ops.hamming import hamming_packed

_BIG = jnp.int32(1 << 20)


@struct.dataclass
class StereoMatches:
    uv_right: jax.Array    # [K, 2]
    disparity: jax.Array   # [K]
    depth: jax.Array       # [K]
    p_cam: jax.Array       # [K, 3] triangulated camera-frame points
    distance: jax.Array    # [K] Hamming distance of the accepted match
    ok: jax.Array          # [K] bool


@functools.partial(
    jax.jit, static_argnames=("max_disparity", "cutoff")
)
def match_stereo(
    dense_right: jax.Array,     # [H, W, 8] uint32 dense BRIEF of RIGHT
    uv_left: jax.Array,         # [K, 2] left keypoints
    desc_left: jax.Array,       # [K, 8] their descriptors
    valid: jax.Array,           # [K] bool
    cam: StereoCamera,
    *,
    max_disparity: int = 128,
    cutoff: int = 100,          # ref CTriangulator.cpp:13
    min_disparity: float = 0.5,
    min_depth: float = 0.05,
    max_depth: float = 1000.0,
    disparity_center: jax.Array | None = None,  # [K] previous disparity
    search_range: jax.Array | None = None,      # [K] +- px around center
) -> StereoMatches:
    """Match left keypoints into the right image along rectified scanlines.

    When ``disparity_center``/``search_range`` are given the candidate set is
    masked to ``|d - center| <= range`` — the reference's bounded re-search
    around the last disparity (CTriangulator.h:20-21, fMinimumSearchRange 60).

    Returns a StereoMatches batch; ``ok`` encodes what the reference
    signalled with CExceptionNoMatchFound / CExceptionZeroDisparity.
    """
    K = uv_left.shape[0]
    D = max_disparity
    disps = jnp.arange(D, dtype=uv_left.dtype)                    # [D]
    cand_u = uv_left[:, 0:1] - disps[None, :]                     # [K, D]
    cand_v = jnp.broadcast_to(uv_left[:, 1:2], (K, D))
    cand_uv = jnp.stack([cand_u, cand_v], axis=-1)                # [K, D, 2]
    cand_desc = brief_at(dense_right, cand_uv)                    # [K, D, 8]

    # Hamming of each candidate against its left descriptor
    x = cand_desc ^ desc_left[:, None, :]
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)

    # candidate validity: inside image, disparity floor, optional range bound
    inside = cand_u >= 0.0
    okc = inside & (disps[None, :] >= min_disparity)
    if disparity_center is not None:
        rng = search_range if search_range is not None else jnp.full((K,), 60.0, uv_left.dtype)
        okc = okc & (jnp.abs(disps[None, :] - disparity_center[:, None]) <= rng[:, None])
    dist = jnp.where(okc, dist, _BIG)

    best = jnp.argmin(dist, axis=1).astype(jnp.int32)             # [K]
    best_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    disparity = best.astype(uv_left.dtype)

    # refine disparity to sub-pixel with a 3-point parabola on the Hamming
    # profile (cheap accuracy win over the reference's integer candidates)
    dm = jnp.take_along_axis(dist, jnp.clip(best - 1, 0, D - 1)[:, None], axis=1)[:, 0]
    dp = jnp.take_along_axis(dist, jnp.clip(best + 1, 0, D - 1)[:, None], axis=1)[:, 0]
    denom = (dm + dp - 2 * best_dist).astype(uv_left.dtype)
    delta = jnp.where(
        (denom > 0) & (dm < _BIG) & (dp < _BIG),
        0.5 * (dm - dp).astype(uv_left.dtype) / jnp.maximum(denom, 1e-6),
        0.0,
    )
    disparity = disparity + jnp.clip(delta, -0.5, 0.5)

    depth = cam.depth_from_disparity(disparity)
    uv_right = jnp.stack([uv_left[:, 0] - disparity, uv_left[:, 1]], axis=-1)
    p_cam = cam.triangulate(uv_left, uv_right)

    ok = (
        valid
        & (best_dist <= cutoff)
        & (disparity >= min_disparity)
        & (depth > min_depth)
        & (depth < max_depth)
    )
    return StereoMatches(
        uv_right=uv_right,
        disparity=disparity,
        depth=depth,
        p_cam=p_cam,
        distance=best_dist,
        ok=ok,
    )
