"""Pallas band-sweep kernel for stereo scanline Hamming profiles.

The epipolar stereo matcher (frontend.stereo.match_stereo, the TPU analog of
``CTriangulator``, CTriangulator.cpp:13-356) needs, per left keypoint, the
Hamming distance of its descriptor against every candidate pixel of the
rectified scanline span in RIGHT. As vmapped dynamic slices that is a
[K, D, 8] fetch whose producer/layout interactions dominate the frame step.

Same structure as ops.track_kernel: keypoints sort by row, the field streams
through VMEM in 24-row band slabs (double-buffered DMA — one HBM read of the
field total), and each keypoint's scanline span is scored in VMEM:
row-select, XOR + popcount against its descriptor, and an 8-word group-sum
as one small MXU matmul. The kernel returns the raw column-indexed profile
``[K, SPAN]``; ALL matching semantics (disparity grid, float-edge masks,
cutoffs, sub-pixel parabola, tie-breaking) stay in frontend.stereo — the
kernel only replaces the fetch + popcount.

Column convention: profile[k, c] is the distance at pixel ``xa[k] + c``
where ``xa = x0 - x0 % 16`` (lane-aligned span origin, same formula in the
wrapper and kernel); pixels are ascending, so callers flip to get
ascending-disparity order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BAND_H = 24          # rows per band slab (multiple of 8)
SPAN_PAD = 16         # extra pixels so any 16-aligned origin covers the span


def _kernel(
    # scalar prefetch
    starts_ref,       # [NB+1] int32 — keypoint ranges per band (sorted)
    v_ref,            # [K] int32 rounded row per sorted keypoint
    xa_ref,           # [K] int32 lane-aligned span origin (pixels)
    # tensor inputs
    dense_ref,        # [H, W8] uint32 in HBM/ANY
    desc_ref,         # [K, SPAN*8] uint32 — descriptor tiled across the span
    group_ref,        # [SPAN*8, SPAN] f32 block-diagonal word-group matrix
    # outputs
    out_ref,          # [K, SPAN] int32 distance profile
    # scratch
    slab,             # [2, BAND_H, W8P] uint32
    sems,             # [2] DMA semaphores
    *,
    hp: int,
    w8: int,
    span: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def band_row0(band):
        # 24b clipped to keep the slab inside the (8-aligned) field
        return pl.multiple_of(
            jnp.minimum(band * _BAND_H, hp - _BAND_H), 8)

    def slab_dma(band, slot):
        return pltpu.make_async_copy(
            dense_ref.at[pl.ds(band_row0(band), _BAND_H)],
            slab.at[slot, :, 0:w8],
            sems.at[slot],
        )

    @pl.when(b == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(b + 1 < nb)
    def _():
        slab_dma(b + 1, (b + 1) % 2).start()

    slab_dma(b, b % 2).wait()
    slot = b % 2
    row0 = band_row0(b)

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    outrow = jax.lax.broadcasted_iota(jnp.int32, (8, span), 0)

    def body(i, _):
        v = v_ref[i]
        xa8 = pl.multiple_of(xa_ref[i] * 8, 128)
        lv = v - row0
        va = pl.multiple_of(lv - (lv % 8), 8)
        block = slab[slot, pl.ds(va, 8), pl.ds(xa8, span * 8)]   # [8, S*8]
        # select the keypoint's row (sublane-granular loads force 8 rows)
        sel = (rows8 == (lv - va)).astype(jnp.int32)
        row = jnp.sum(pltpu.bitcast(block, jnp.int32) * sel, axis=0,
                      keepdims=True)                             # [1, S*8]
        x = pltpu.bitcast(row, jnp.uint32) ^ desc_ref[pl.ds(i, 1), :]
        pc = jax.lax.population_count(x).astype(jnp.int32).astype(jnp.float32)
        prof = jnp.dot(pc, group_ref[...],
                       preferred_element_type=jnp.float32)       # [1, S]
        # aligned read-modify-write of the 8-row output tile around row i
        ia = pl.multiple_of(i - (i % 8), 8)
        tile = out_ref[pl.ds(ia, 8), :]
        upd = jnp.where(outrow == (i - ia), prof.astype(jnp.int32), tile)
        out_ref[pl.ds(ia, 8), :] = upd
        return 0

    jax.lax.fori_loop(starts_ref[b], starts_ref[b + 1], body, 0)


@functools.partial(jax.jit, static_argnames=("max_disparity", "interpret"))
def stereo_profiles(
    dense_right: jax.Array,    # [H, W, 8] uint32 dense BRIEF field
    uv_left: jax.Array,        # [K, 2] float left keypoints
    desc_left: jax.Array,      # [K, 8] uint32
    *,
    max_disparity: int = 128,
    interpret: bool = False,
):
    """Column-indexed Hamming profiles of every keypoint's scanline span.

    Returns ``(profile [K, SPAN] int32, xa [K] int32)`` with
    ``profile[k, c]`` = Hamming(desc_left[k], dense_right[v_r[k], xa[k]+c]);
    SPAN = max_disparity + 16. Spans are clamped inside the image; callers
    mask candidates by their disparity grid (column slack has out-of-range
    disparities, so it is masked naturally).
    """
    h, w, _ = dense_right.shape
    K = uv_left.shape[0]
    De = min(max_disparity, w)
    span = De + SPAN_PAD
    assert h >= _BAND_H, f"image height {h} < band {_BAND_H}"

    uvs = jnp.nan_to_num(uv_left, nan=0.0, posinf=0.0, neginf=0.0)
    u_r = jnp.clip(jnp.round(uvs[:, 0]).astype(jnp.int32), 0, w - 1)
    v_r = jnp.clip(jnp.round(uvs[:, 1]).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(u_r - (De - 1), 0, w - De)
    xa = x0 - (x0 % 16)

    # alignment bookkeeping (see ops.track_kernel): 8-aligned rows,
    # 128-word-aligned row length, lane-padded slab
    w8 = w * 8
    w8a = -(-w8 // 128) * 128
    hp = max(-(-h // 8) * 8, _BAND_H)
    w8p = w8a
    xa_max = ((w - De) // 16) * 16
    while xa_max * 8 + span * 8 > w8p:
        w8p += 128

    Kp = -(-K // 8) * 8
    uv_pad = jnp.zeros((Kp - K,), jnp.int32)
    nb = -(-hp // _BAND_H)
    order = jnp.argsort(v_r)
    v_s = jnp.concatenate([v_r[order], uv_pad])
    xa_s = jnp.concatenate([xa[order], uv_pad])
    edges = jnp.arange(1, nb + 1, dtype=jnp.int32) * _BAND_H
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.searchsorted(v_r[order], edges).astype(jnp.int32),
    ])
    # padded tail keypoints (v=0) belong to band 0's range only if K==Kp;
    # they are simply never visited because starts are built from the real K
    desc_t = jnp.tile(desc_left, (1, span))
    desc_s = jnp.concatenate(
        [desc_t[order], jnp.zeros((Kp - K, span * 8), jnp.uint32)])
    group = (
        jax.lax.broadcasted_iota(jnp.int32, (span * 8, span), 0) // 8
        == jax.lax.broadcasted_iota(jnp.int32, (span * 8, span), 1)
    ).astype(jnp.float32)

    kern = functools.partial(_kernel, hp=hp, w8=w8a, span=span)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _BAND_H, w8p), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prof_s = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Kp, span), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts, v_s, xa_s,
        (dense_right.reshape(h, w8) if hp == h and w8a == w8
         else jnp.pad(dense_right.reshape(h, w8),
                      ((0, hp - h), (0, w8a - w8)))),
        desc_s, group,
    )
    profile = jnp.zeros((K, span), jnp.int32).at[order].set(prof_s[:K])
    return profile, xa
