"""Pallas band-sweep kernel for temporal tracking candidate scoring.

The tracking hot loop (frontend.tracking.track_landmarks, the TPU analog of
CFundamentalMatcher's 3-stage cascade, CFundamentalMatcher.cpp:391-2397)
must score, for every landmark, the dense window of candidate descriptors
around its predicted reprojection. As an XLA window gather that is the
single most expensive op of the frame step: TPU gathers of 32-byte rows run
at ~2 GB/s effective.

This kernel restructures the access as a **band sweep**: landmarks are
sorted by predicted row, the image is processed in horizontal bands, and
each band's row slab is DMA'd HBM->VMEM ONCE (double-buffered across grid
steps) — the total HBM traffic collapses to one read of the dense field
(~15 MB) regardless of landmark count. Each landmark then scores its
41x57 candidate window directly in VMEM: XOR + popcount against its last
AND reference descriptors, the 3-tier mask/cutoff/bias logic of
frontend.tracking (bit-identical, including the per-landmark oriented
epipolar band of frontend.epipolar in fixed-point), and a masked argmin.

Outputs per landmark: biased best score (int32, >= 1<<20 when no candidate
accepted), the winning pixel (x, y), and its Hamming distance to the last
descriptor. Grid/band bookkeeping (sorting, band ranges, inverse
permutation) happens in plain XLA in the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svi_mapper_tpu.frontend.epipolar import BAND_HALF_WIDTH_Q

# window geometry — the acceptance-mask reach of frontend.tracking
REACH_X = 28                 # ref: epipolar reach, <= the 28 px FoV inset
REACH_Y = 20                 # vertical reach for steep epipolar lines
WIN_W = 2 * REACH_X + 1      # 57 px of true candidate reach
WIN_H = 2 * REACH_Y + 1      # 41
# Mosaic vector loads need 8-aligned sublane and 128-aligned lane starts, so
# each landmark reads an aligned block strictly containing its window; the
# tier masks reject the slack.
BLOCK_H = 48                 # rows (>= WIN_H + 7, multiple of 8)
BLOCK_W = 80                 # pixels (>= WIN_W + 15; 80*8 words = 5*128 lanes)
_BAND_H = 24                 # landmark rows per band
# slab rows per band: window reach + 8-row alignment slack on both the DMA
# start (multiple of 8) and the in-slab block start
_SLAB_H = _BAND_H + BLOCK_H  # 72

BIG = 1 << 20
_TIER_BIAS = (0, 1000, 2000)


# rejected-candidate sentinel inside the kernel: small enough that the fused
# (score, position) min-key (score*4096 + pos) stays exact in int32
# (pos < BLOCK_H*BLOCK_W = 3840 < 4096)
_BIG_K = 4096


def _score_window(win, dl_t, dr_t, group, dx, dy, nxq, nyq, c0q, ru, rv,
                  cutoff_s1, cutoff_s2, cutoff_ref):
    """Score one [BLOCK_H, BLOCK_W*8] aligned block against one landmark.

    Reproduces frontend.tracking.tier_masks exactly: the 3x3 stage-1 cell,
    the |dx|,|dy| <= 8 stage-2 square, and the stage-3 oriented epipolar
    band (fixed-point line test |c0q + nxq*dx + nyq*dy| <= 640 within the
    per-landmark (ru, rv) reach), each with its stage cutoff, the
    dual-descriptor gate, and tier score bias. The block is larger than the
    41x57 window (aligned load); positions outside the mask reach are
    rejected by the |dx|/|dy| bounds.

    Mosaic shapes the math: per-candidate 8-word popcount sums come from one
    [BW*8, BW] block-diagonal matmul on the MXU (3D reshapes don't lower),
    and best-candidate selection is a fused min over score*4096 + position
    (argmin/dynamic indexing don't lower either). Returns the min key.
    """
    # uint32 -> int32 -> float32 (Mosaic has no direct unsigned-float cast)
    pc1 = jax.lax.population_count(win ^ dl_t).astype(jnp.int32).astype(jnp.float32)
    pc2 = jax.lax.population_count(win ^ dr_t).astype(jnp.int32).astype(jnp.float32)
    d1 = jnp.dot(pc1, group, preferred_element_type=jnp.float32)
    d2 = jnp.dot(pc2, group, preferred_element_type=jnp.float32)
    d1 = d1.astype(jnp.int32)                              # [BLOCK_H, BLOCK_W]
    d2 = d2.astype(jnp.int32)

    # cumulative tier fallbacks — frontend.tracking.tier_scores verbatim
    adx, ady = jnp.abs(dx), jnp.abs(dy)
    t0 = (adx <= 1) & (ady <= 1)
    t1 = (adx <= 8) & (ady <= 8)
    on_band = jnp.abs(c0q + nxq * dx + nyq * dy) <= BAND_HALF_WIDTH_Q
    t2 = on_band & (adx <= ru) & (ady <= rv)
    ref_ok = d2 <= cutoff_ref
    s0 = jnp.where(t0 & (d1 <= cutoff_s1) & ref_ok, d1 + _TIER_BIAS[0], _BIG_K)
    ok2 = (d1 <= cutoff_s2) & ref_ok
    s1 = jnp.where(t1 & ok2, d1 + _TIER_BIAS[1], _BIG_K)
    s2 = jnp.where(t2 & ok2, d1 + _TIER_BIAS[2], _BIG_K)
    score = jnp.minimum(s0, jnp.minimum(s1, s2))

    pos = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_H, BLOCK_W), 0) * BLOCK_W \
        + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_H, BLOCK_W), 1)
    return jnp.min(score * _BIG_K + pos)


def _kernel(
    # scalar prefetch
    starts_ref,        # [NB+1] int32 — landmark range per band (sorted order)
    u_ref,             # [L] int32 rounded u of each sorted landmark
    v_ref,             # [L] int32 rounded v
    x0_ref,            # [L] int32 window origin column (clamped)
    y0_ref,            # [L] int32 window origin row (clamped)
    nxq_ref,           # [L] int32 — epipolar band normal x (x256)
    nyq_ref,           # [L] int32 — epipolar band normal y (x256)
    c0q_ref,           # [L] int32 — band offset at the prediction (x256)
    ru_ref,            # [L] int32 — horizontal reach (px)
    rv_ref,            # [L] int32 — vertical reach (px)
    # tensor inputs
    dense_ref,         # [H, W*8] uint32 in HBM/ANY
    dlast_ref,         # [L, BW*8] uint32 (sorted, tiled across candidates)
    dref_ref,          # [L, BW*8] uint32 (sorted, tiled)
    group_ref,         # [BW*8, BW] float32 block-diagonal word-group matrix
    # outputs
    score_ref,         # [L] int32
    lin_ref,           # [L] int32
    dist_ref,          # [L] int32
    ybase_ref,         # [L] int32 — global image row of block row 0
    # scratch
    slab,              # [2, SLAB_H, W8P] uint32 VMEM (W8P >= w8, lane-padded)
    sems,              # [2] DMA semaphores
    *,
    h: int,
    w8: int,
    cutoff_s1: int,
    cutoff_s2: int,
    cutoff_ref: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    # h is padded to a multiple of 8 by the wrapper, so row_top and every
    # band start (24b - 24) are multiples of 8 — provable via the hint
    row_top = jnp.maximum(h - _SLAB_H, 0)

    def band_row0(band):
        return pl.multiple_of(
            jnp.clip(band * _BAND_H - _BAND_H, 0, row_top), 8)

    def slab_dma(band, slot):
        # the slab is lane-padded wider than the field; DMA fills only the
        # real w8 columns — the slack columns are never scored (every
        # accepted candidate has |dx| <= 28, inside the image for in-FoV
        # landmarks), so they can stay uninitialized
        return pltpu.make_async_copy(
            dense_ref.at[pl.ds(band_row0(band), _SLAB_H)],
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

    # local offset grids are shared by every landmark in the band
    col8 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_H, BLOCK_W), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_H, BLOCK_W), 0)

    def body(i, _):
        u = u_ref[i]
        v = v_ref[i]
        x0 = x0_ref[i]
        y0 = y0_ref[i]
        # aligned block: row start multiple of 8, lane start multiple of 128
        # (i.e. pixel start multiple of 16); slack masked by the tier masks
        ly = y0 - row0
        ya = pl.multiple_of(ly - (ly % 8), 8)
        xa = x0 - (x0 % 16)
        xa8 = pl.multiple_of(xa * 8, 128)
        win = slab[slot, pl.ds(ya, BLOCK_H), pl.ds(xa8, BLOCK_W * 8)]
        dx = (xa + col8) - u
        dy = (row0 + ya + row8) - v
        key = _score_window(
            win, dlast_ref[pl.ds(i, 1), :], dref_ref[pl.ds(i, 1), :],
            group_ref[...], dx, dy,
            nxq_ref[i], nyq_ref[i], c0q_ref[i], ru_ref[i], rv_ref[i],
            cutoff_s1, cutoff_s2, cutoff_ref,
        )
        score = key // _BIG_K
        score = jnp.where(score >= _BIG_K, BIG, score)
        # per-landmark scalar results go to SMEM (VMEM stores need lane
        # alignment; SMEM is scalar-addressable)
        score_ref[i] = score
        lin_ref[i] = key % _BIG_K
        # score = d1 + tier*1000 for accepted candidates (d1 <= 256), so the
        # Hamming part is recoverable without dynamic indexing
        dist_ref[i] = score % 1000
        ybase_ref[i] = row0 + ya
        return 0

    jax.lax.fori_loop(starts_ref[b], starts_ref[b + 1], body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cutoff_s1", "cutoff_s2", "cutoff_ref", "interpret"),
)
def track_scores(
    dense_left: jax.Array,     # [H, W, 8] uint32 dense BRIEF field
    uv_pred: jax.Array,        # [L, 2] float predicted reprojections
    desc_last: jax.Array,      # [L, 8] uint32
    desc_ref: jax.Array,       # [L, 8] uint32
    band: tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array],
    *,
    cutoff_s1: int = 25,
    cutoff_s2: int = 50,
    cutoff_ref: int = 50,
    interpret: bool = False,
):
    """Band-sweep candidate scoring for every landmark.

    ``band = (nxq, nyq, c0q, ru, rv)`` are the per-landmark fixed-point
    epipolar band parameters (frontend.epipolar.epipolar_band_params).

    Returns ``(score [L], x [L], y [L], dist [L])`` int32: ``score >= BIG``
    means no accepted candidate; ``(x, y)`` is the winning pixel. For
    in-FoV landmarks this is bit-identical to
    frontend.tracking.window_scores.
    """
    h, w, _ = dense_left.shape
    L = uv_pred.shape[0]
    assert h >= _SLAB_H, f"image height {h} < slab {_SLAB_H}"
    nxq, nyq, c0q, ru, rv = band

    uvs = jnp.nan_to_num(uv_pred, nan=0.0, posinf=0.0, neginf=0.0)
    u_r = jnp.clip(jnp.round(uvs[:, 0]).astype(jnp.int32), 0, w - 1)
    v_r = jnp.clip(jnp.round(uvs[:, 1]).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(u_r - REACH_X, 0, w - WIN_W)
    y0 = jnp.clip(v_r - REACH_Y, 0, h - WIN_H)

    # Alignment: band DMA needs 8-aligned rows and 128-word-aligned row
    # length. models.frame feeds fields whose width is already a multiple
    # of 16 px (it edge-extends the raw image — far cheaper than padding
    # the 15 MB field here, which is the fallback for direct callers).
    w8 = w * 8
    w8a = -(-w8 // 128) * 128
    hp = -(-h // 8) * 8
    # the slab may be wider than the field: aligned block reads near the
    # right edge may poke into never-scored slack columns
    w8p = w8a
    xa_max = ((w - WIN_W) // 16) * 16
    while xa_max * 8 + BLOCK_W * 8 > w8p:
        w8p += 128

    nb = -(-h // _BAND_H)
    order = jnp.argsort(v_r)
    edges = jnp.arange(1, nb + 1, dtype=jnp.int32) * _BAND_H
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.searchsorted(v_r[order], edges).astype(jnp.int32),
    ])

    kern = functools.partial(
        _kernel, h=hp, w8=w8a,
        cutoff_s1=cutoff_s1, cutoff_s2=cutoff_s2, cutoff_ref=cutoff_ref,
    )
    # tile descriptors across the block's candidate columns; build the
    # block-diagonal word-group reduction matrix for the MXU
    dl_t = jnp.tile(desc_last, (1, BLOCK_W))
    dr_t = jnp.tile(desc_ref, (1, BLOCK_W))
    group = (
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK_W * 8, BLOCK_W), 0) // 8
        == jax.lax.broadcasted_iota(jnp.int32, (BLOCK_W * 8, BLOCK_W), 1)
    ).astype(jnp.float32)
    out_shape = [jax.ShapeDtypeStruct((L,), jnp.int32)] * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # dense field (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # desc_last (tiled)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # desc_ref (tiled)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # group matrix
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, _SLAB_H, w8p), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    score_s, lin_s, dist_s, ybase_s = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts, u_r[order], v_r[order], x0[order], y0[order],
        nxq[order], nyq[order], c0q[order], ru[order], rv[order],
        (dense_left.reshape(h, w8) if hp == h and w8a == w8
         else jnp.pad(dense_left.reshape(h, w8),
                      ((0, hp - h), (0, w8a - w8)))),
        dl_t[order], dr_t[order], group,
    )
    # unsort back to table order
    score = jnp.zeros((L,), jnp.int32).at[order].set(score_s)
    lin = jnp.zeros((L,), jnp.int32).at[order].set(lin_s)
    dist = jnp.zeros((L,), jnp.int32).at[order].set(dist_s)
    ybase = jnp.zeros((L,), jnp.int32).at[order].set(ybase_s)
    xbase = x0 - (x0 % 16)         # same formula as the kernel's lane align
    x = xbase + lin % BLOCK_W
    y = ybase + lin // BLOCK_W
    return score, x, y, dist
