"""BRIEF-style binary descriptor extraction as a batched device op.

TPU-native replacement for OpenCV's ``BriefDescriptorExtractor`` (used at
CTriangulator.cpp:11 and throughout CFundamentalMatcher) and the reference's
``CDescriptorBRIEF`` 256-bit type (CDescriptorBRIEF.h:16-37,
DESCRIPTOR_SIZE_BITS=256 Types.h:6).

Design: descriptors are 256 Boolean intensity comparisons on a smoothed
image patch. The OpenCV implementation walks keypoints on the host; here the
whole keypoint batch is processed at once:

  1. the caller smooths the image once per frame (ops.image.box_blur);
  2. a 32x32 patch is cut per keypoint (vmapped dynamic_slice);
  3. the 256 compare pairs are *static* indices into the flattened patch, so
     sampling is a constant-index gather XLA lowers to cheap selects;
  4. bits pack into 8 uint32 words — the storage format all Hamming kernels
     (ops.hamming) operate on.

The sample pattern is a fixed Gaussian pattern (BRIEF paper's G II sampling)
generated from a constant seed — any fixed pattern works as long as detection
and matching share it, exactly like the reference shares one OpenCV pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_BITS = 256          # ref Types.h:6
DESCRIPTOR_WORDS = 8           # 256 bits packed into 8 x uint32
PATCH_SIZE = 32                # ref: OpenCV BRIEF 48x48 window, KERNEL 9;
PATCH_HALF = PATCH_SIZE // 2   # 32 keeps VMEM small and matches 256 pairs


def _make_pattern(seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian sample-pair pattern, clipped to the patch interior."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_SIZE / 5.0
    a = rng.normal(0.0, sigma, size=(DESCRIPTOR_BITS, 2))
    b = rng.normal(0.0, sigma, size=(DESCRIPTOR_BITS, 2))
    lim = PATCH_HALF - 1
    a = np.clip(np.round(a), -lim, lim).astype(np.int32) + PATCH_HALF
    b = np.clip(np.round(b), -lim, lim).astype(np.int32) + PATCH_HALF
    # avoid degenerate identical pairs
    same = np.all(a == b, axis=-1)
    b[same, 0] = (b[same, 0] + 3) % PATCH_SIZE
    return a, b


_PATTERN_A, _PATTERN_B = _make_pattern()
# flattened static indices into a 32*32 patch (row-major [v, u])
_IDX_A = jnp.asarray(_PATTERN_A[:, 1] * PATCH_SIZE + _PATTERN_A[:, 0])
_IDX_B = jnp.asarray(_PATTERN_B[:, 1] * PATCH_SIZE + _PATTERN_B[:, 0])

_BIT_WEIGHTS = jnp.asarray(
    (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
)


def pack_bits(bits: jax.Array) -> jax.Array:
    """[..., 256] bool -> [..., 8] uint32 (little-endian bit order)."""
    words = bits.reshape(bits.shape[:-1] + (DESCRIPTOR_WORDS, 32))
    return jnp.sum(
        words.astype(jnp.uint32) * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint32
    )


def unpack_bits(packed: jax.Array) -> jax.Array:
    """[..., 8] uint32 -> [..., 256] bool."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(packed.shape[:-1] + (DESCRIPTOR_BITS,)).astype(jnp.bool_)


def extract_patches(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Cut a 32x32 patch around each keypoint (clamped inside the image).

    Args:
      img: [H, W] float32 (already smoothed).
      uv: [K, 2] float32 keypoint centers (u=x, v=y).

    Returns: [K, 32, 32] float32 patches.
    """
    h, w = img.shape
    top = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32) - PATCH_HALF, 0, h - PATCH_SIZE)
    left = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32) - PATCH_HALF, 0, w - PATCH_SIZE)

    def cut(t, l):
        return jax.lax.dynamic_slice(img, (t, l), (PATCH_SIZE, PATCH_SIZE))

    return jax.vmap(cut)(top, left)


@jax.jit
def brief_descriptors(img_smooth: jax.Array, uv: jax.Array) -> jax.Array:
    """Extract packed BRIEF descriptors for a keypoint batch.

    Args:
      img_smooth: [H, W] float32 smoothed image.
      uv: [K, 2] float32 keypoints.

    Returns: [K, 8] uint32 packed 256-bit descriptors.
    """
    patches = extract_patches(img_smooth, uv)            # [K, 32, 32]
    flat = patches.reshape(patches.shape[0], -1)         # [K, 1024]
    pa = flat[:, _IDX_A]                                  # [K, 256] static gather
    pb = flat[:, _IDX_B]
    bits = pa < pb                                        # BRIEF test
    return pack_bits(bits)


@jax.jit
def brief_dense(img_smooth: jax.Array) -> jax.Array:
    """Dense BRIEF: the packed descriptor of EVERY pixel, as one fused op.

    The TPU-native replacement for the reference's per-candidate descriptor
    extraction along epipolar scanlines (CTriangulator.cpp:65-117 extracts
    BRIEF for a dense row of candidate keypoints every frame; the epipolar
    tracker re-extracts along sampled curves, CFundamentalMatcher.cpp:
    2142-2397). Computing bit i for all pixels is one shifted-image
    comparison ``img[y+ay, x+ax] < img[y+by, x+bx]`` — 256 fused VPU ops —
    after which *all* matching anywhere in the frame is a cheap gather into
    the [H, W, 8] uint32 field. Descriptors agree bit-for-bit with
    :func:`brief_descriptors` away from the image border.

    Cost for KITTI (376x1241): ~120M comparisons + packing, well under a
    millisecond on one TPU chip; field size 15 MB in HBM.
    """
    h, w = img_smooth.shape
    pad = PATCH_HALF
    padded = jnp.pad(img_smooth, pad, mode="edge")

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(padded, (pad + dy, pad + dx), (h, w))

    words = []
    for wi in range(DESCRIPTOR_WORDS):
        acc = jnp.zeros((h, w), jnp.uint32)
        for bi in range(32):
            i = wi * 32 + bi
            ay, ax = int(_PATTERN_A[i, 1]) - PATCH_HALF, int(_PATTERN_A[i, 0]) - PATCH_HALF
            by, bx = int(_PATTERN_B[i, 1]) - PATCH_HALF, int(_PATTERN_B[i, 0]) - PATCH_HALF
            bit = shifted(ay, ax) < shifted(by, bx)
            acc = acc | (bit.astype(jnp.uint32) << jnp.uint32(bi))
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _brief_dense_kernel(img_ref, out_ref):
    """Pallas tile kernel: fused 5x5 box blur + 256 BRIEF comparisons.

    ``img_ref`` is an overlapping input tile [TH + 2*HALO, TW + 2*HALO] of
    the edge-padded image; ``out_ref`` is [8, TH, TW] packed words. Keeping
    the tile in VMEM turns the XLA path's ~512 full-image HBM passes into a
    single halo-tile read — the op becomes compute-bound.
    """
    tile = img_ref[:]                       # aligned input window in VMEM
    th = out_ref.shape[1]
    tw = out_ref.shape[2]
    halo = _HALO

    # separable 5x5 box blur over the region needed by the pattern:
    # output-pixel offsets span [-15, 15], so blur the central
    # [th + 30, tw + 30] window (halo = 17 = 15 pattern + 2 blur).
    # The input window is over-read to TPU-aligned sizes; extra rows/cols
    # are simply never sliced.
    ph, pw = th + 2 * (halo - 2), tw + 2 * (halo - 2)
    # same arithmetic (taps * 0.2 per separable pass, same accumulation
    # order) as ops.image.box_blur -> interior bits are EXACTLY equal
    # all offsets are static Python ints -> plain static slices (the only
    # slicing Mosaic lowers for values inside a kernel)
    acc = jnp.zeros((ph, tile.shape[1]), jnp.float32)
    for dy in range(5):
        acc = acc + tile[dy:dy + ph, :] * jnp.float32(0.2)
    blur = jnp.zeros((ph, pw), jnp.float32)
    for dx in range(5):
        blur = blur + acc[:, dx:dx + pw] * jnp.float32(0.2)

    # blurred value at output-pixel offset (dy, dx) in [-15, 15]
    def shifted(dy, dx):
        r0 = dy + halo - 2
        c0 = dx + halo - 2
        return blur[r0:r0 + th, c0:c0 + tw]

    for wi in range(DESCRIPTOR_WORDS):
        word = jnp.zeros((th, tw), jnp.uint32)
        for bi in range(32):
            i = wi * 32 + bi
            ay, ax = int(_PATTERN_A[i, 1]) - PATCH_HALF, int(_PATTERN_A[i, 0]) - PATCH_HALF
            by, bx = int(_PATTERN_B[i, 1]) - PATCH_HALF, int(_PATTERN_B[i, 0]) - PATCH_HALF
            bit = shifted(ay, ax) < shifted(by, bx)
            word = word | (bit.astype(jnp.uint32) << jnp.uint32(bi))
        out_ref[wi] = word


_TILE_H = 16
_TILE_W = 128
_HALO = PATCH_HALF - 1 + 2   # 15 px pattern reach + 2 px blur = 17
# input windows over-read up to TPU-aligned sizes (divisible by 8 x 128)
_IN_H = -(-(_TILE_H + 2 * _HALO) // 8) * 8        # 56
_IN_W = -(-(_TILE_W + 2 * _HALO) // 128) * 128    # 256


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_dense_fused(img: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused smooth+describe: raw image -> dense packed BRIEF field.

    Semantically identical to ``brief_dense(box_blur(img, 5))`` (tested
    bit-exact); implemented as one Pallas kernel over halo tiles.
    """
    from jax.experimental import pallas as pl

    h, w = img.shape
    ph = (-h) % _TILE_H
    pw = (-w) % _TILE_W
    hp, wp = h + ph, w + pw
    # edge-pad: halo for the pattern+blur reach, tile alignment, and the
    # aligned over-read of the last tile's input window
    pad_bottom = _HALO + ph + (_IN_H - _TILE_H - 2 * _HALO)
    pad_right = _HALO + pw + (_IN_W - _TILE_W - 2 * _HALO)
    padded = jnp.pad(img, ((_HALO, pad_bottom), (_HALO, pad_right)), mode="edge")

    out = pl.pallas_call(
        _brief_dense_kernel,
        out_shape=jax.ShapeDtypeStruct((DESCRIPTOR_WORDS, hp, wp), jnp.uint32),
        grid=(hp // _TILE_H, wp // _TILE_W),
        in_specs=[
            # overlapping halo tiles: pl.Element makes the index map return
            # ELEMENT offsets, so tile (i, j) reads the aligned window
            # starting at (i*TILE_H, j*TILE_W)
            pl.BlockSpec(
                (pl.Element(_IN_H), pl.Element(_IN_W)),
                lambda i, j: (i * _TILE_H, j * _TILE_W),
            )
        ],
        out_specs=pl.BlockSpec(
            (DESCRIPTOR_WORDS, _TILE_H, _TILE_W), lambda i, j: (0, i, j)
        ),
        interpret=interpret,
    )(padded)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


def smooth_brief_dense(img: jax.Array) -> jax.Array:
    """Canonical smooth+describe (XLA path: blur then shifted comparisons).

    Note: a fused Pallas variant exists (:func:`brief_dense_fused`) but XLA
    fuses the shifted-comparison chain well enough that the hand-written
    kernel measured SLOWER on v5e (6.2 vs 2.1 ms at KITTI resolution) and
    Mosaic's float reassociation breaks bit-exactness — so the XLA path is
    canonical and the Pallas kernel stays as an experiment.
    """
    from svi_mapper_tpu.ops.image import box_blur

    return brief_dense(box_blur(img, 5))


@jax.jit
def brief_at(dense: jax.Array, uv: jax.Array) -> jax.Array:
    """Gather packed descriptors from a dense field at (possibly fractional)
    pixel locations (nearest-pixel, clamped to the image)."""
    h, w = dense.shape[:2]
    x = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    return dense[y, x]


@jax.jit
def brief_descriptors_at_offsets(
    img_smooth: jax.Array, uv: jax.Array, offsets: jax.Array
) -> jax.Array:
    """Descriptors at ``uv[k] + offsets[c]`` for every (keypoint, candidate).

    Used by epipolar search: the reference extracts BRIEF along sampled
    curve points (CFundamentalMatcher.cpp:2142-2397); here all K x C
    candidate locations are described in one batch.

    Args:
      img_smooth: [H, W]; uv: [K, 2]; offsets: [C, 2].

    Returns: [K, C, 8] uint32.
    """
    k, c = uv.shape[0], offsets.shape[0]
    all_uv = (uv[:, None, :] + offsets[None, :, :]).reshape(k * c, 2)
    d = brief_descriptors(img_smooth, all_uv)
    return d.reshape(k, c, DESCRIPTOR_WORDS)
