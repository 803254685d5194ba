"""Pallas fused Schur-complement assembly for bundle adjustment.

One LM iteration of the batched BA (solvers.ba.bundle_adjust) spends its
time materializing Jacobian tensors: J_pose [K,L,4,6], J_point [K,L,4,3],
their weighted copies, transposed reshapes, and the [K,L,6,3] coupling
blocks — hundreds of MB of HBM traffic per iteration at the 32x4096
production window, against ~0.5 GFLOP of actual math.

This kernel fuses the whole assembly: for each landmark block it computes
residuals, robust weights, and analytic Jacobians ON THE FLY in VMEM
(never materializing them to HBM). With sqrt-weighted rows
``jps = sqrt(w) J_pose``, ``jls = sqrt(w) J_point``, ``rss = sqrt(w) r``,
everything reduces to MXU matmuls over [rows, BL] matrices:

  * W Hll^-1 W^T   — three [K6, BL] x [BL, K6] products (one per landmark
    coordinate), sidestepping the lane-interleaved [K6, 3L] layout
  * H_pp           — four J_r J_r^T products (diagonal 6x6 blocks read out
    by the wrapper; off-diagonal garbage is never used)
  * b_p            — four thin J_r RS_r^T products (entry [6k+a, k])

Per-landmark outputs (damped Hll^-1, b_l, and the three W planes) feed the
XLA-side rhs assembly and back-substitution. K and the 4 residual rows are
unrolled; all per-landmark math is [BL]-wide VPU arithmetic.

Numerics: float32 with a different accumulation order than the XLA path —
results agree to ~1e-4 relative, not bit-exactly; solvers.ba gates usage
behind a backend check and the tests compare against the XLA oracle with
tolerances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BL = 512          # landmarks per grid step (lane-aligned)
KP = 128          # padded keyframe lane count for the thin b_p product


def _accumulate_block(
    T_ref, par_ref, x_ref, obs_ref, w_ref,
    w0_ref, w1_ref, w2_ref, Js, RSs, *, K: int, k0: int = 0,
):
    """Shared per-(keyframe-range, landmark-block) assembly body: for
    keyframes ``k0 .. k0+K`` compute residuals/weights/Jacobians on the fly
    and (a) write the W-plane and sqrt-weighted J/RS rows, (b) return the
    per-landmark ``Hll`` upper-triangle and ``b_l`` accumulators as [1, BL]
    vectors. ``obs_ref``/``w_ref`` blocks are LOCAL to the range (row k),
    ``T_ref`` is the full SMEM pose array (row k0+k)."""
    fx = par_ref[0]
    fy = par_ref[1]
    cx = par_ref[2]
    cy = par_ref[3]
    bq = par_ref[4]
    kernel_px2 = par_ref[5]

    X = x_ref[...]                           # [3, BL]
    px, py, pz = X[0:1], X[1:2], X[2:3]      # [1, BL]

    zero = jnp.zeros((1, BL), jnp.float32)
    Hll = [[zero] * 3 for _ in range(3)]
    bl = [zero] * 3

    for ref in (w0_ref, w1_ref, w2_ref) + tuple(Js) + tuple(RSs):
        ref[...] = jnp.zeros_like(ref)

    for k in range(K):
        R = [[T_ref[k0 + k, 4 * r + c] for c in range(3)] for r in range(3)]
        t = [T_ref[k0 + k, 4 * r + 3] for r in range(3)]
        pc = [R[r][0] * px + R[r][1] * py + R[r][2] * pz + t[r]
              for r in range(3)]
        xc, yc, zc = pc
        safe = jnp.where(jnp.abs(zc) < 1e-6, 1e-6, zc)
        iz = 1.0 / safe
        iz2 = iz * iz

        u_l = fx * xc * iz + cx
        v_l = fy * yc * iz + cy
        u_r = (fx * xc + bq) * iz + cx
        o = obs_ref[k]                        # [4, BL]
        rs = [u_l - o[0:1], v_l - o[1:2], u_r - o[2:3], v_l - o[3:4]]
        err2 = (rs[0] * rs[0] + rs[1] * rs[1]
                + rs[2] * rs[2] + rs[3] * rs[3])
        w = jnp.where(err2 > kernel_px2,
                      kernel_px2 / jnp.maximum(err2, 1e-12), 1.0)
        w = w * w_ref[k][None, :] * (zc > 0.05)
        sw = jnp.sqrt(w)

        # sqrt-weighted image jacobian rows wrt the camera-frame point
        Ju = [sw * fx * iz, zero, sw * -fx * xc * iz2]
        Jv = [zero, sw * fy * iz, sw * -fy * yc * iz2]
        Jr = [sw * fx * iz, zero, sw * -(fx * xc + bq) * iz2]
        Juv = [Ju, Jv, Jr, Jv]                # [4][3] of [1, BL]
        rss = [sw * rs[r] for r in range(4)]

        # d pc / d xi (left-mult se3): [I | -hat(pc)]
        nhat = [[None, zc, -yc],
                [-zc, None, xc],
                [yc, -xc, None]]              # -hat(pc); None = 0

        jps = []                              # sqrt-w pose-jac rows [4][6]
        for r in range(4):
            row = list(Juv[r])                # identity columns 0..2
            for a in range(3):
                acc = None
                for ii in range(3):
                    term = nhat[ii][a]
                    if term is None:
                        continue
                    contrib = Juv[r][ii] * term
                    acc = contrib if acc is None else acc + contrib
                row.append(acc if acc is not None else zero)
            jps.append(row)
        jls = [[Juv[r][0] * R[0][b] + Juv[r][1] * R[1][b]
                + Juv[r][2] * R[2][b] for b in range(3)] for r in range(4)]

        # H_ll, b_l accumulation
        for a in range(3):
            for b in range(a, 3):
                Hll[a][b] = Hll[a][b] + (
                    jls[0][a] * jls[0][b] + jls[1][a] * jls[1][b]
                    + jls[2][a] * jls[2][b] + jls[3][a] * jls[3][b])
            bl[a] = bl[a] + (jls[0][a] * rss[0] + jls[1][a] * rss[1]
                             + jls[2][a] * rss[2] + jls[3][a] * rss[3])

        # row writes: W planes, sqrt-w J matrices, residual matrices
        for a in range(6):
            row = 6 * k + a
            w0_ref[row] = (jls[0][0] * jps[0][a] + jls[1][0] * jps[1][a]
                           + jls[2][0] * jps[2][a] + jls[3][0] * jps[3][a])[0]
            w1_ref[row] = (jls[0][1] * jps[0][a] + jls[1][1] * jps[1][a]
                           + jls[2][1] * jps[2][a] + jls[3][1] * jps[3][a])[0]
            w2_ref[row] = (jls[0][2] * jps[0][a] + jls[1][2] * jps[1][a]
                           + jls[2][2] * jps[2][a] + jls[3][2] * jps[3][a])[0]
            for r in range(4):
                Js[r][row] = jps[r][a][0]
        for r in range(4):
            RSs[r][k] = rss[r][0]

    return Hll, bl


def _kernel(
    T_ref,          # [K, 16] f32 SMEM — row-major world->cam transforms
    par_ref,        # [8] f32 SMEM — fx fy cx cy bq kernel_px2
                    #   point_damping lam
    x_ref,          # [3, BL] f32 — landmark block (transposed)
    obs_ref,        # [K, 4, BL] f32 — observations (transposed)
    w_ref,          # [K, BL] f32 — observation mask
    WW_ref,         # [K6P, K6P] f32 out — W Hll^-1 W^T
    HPP_ref,        # [K6P, K6P] f32 out — sum_r J_r J_r^T
    BP_ref,         # [K6P, KP] f32 out — sum_r J_r RS_r^T
    pl_ref,         # [16, BL] f32 out — rows 0-8 Hll^-1, 9-11 b_l
    w0_ref, w1_ref, w2_ref,   # [K6P, BL] f32 out — W planes (row 6k+a)
    WW_acc,         # [K6P, K6P] f32 VMEM scratch
    HPP_acc,        # [K6P, K6P] f32 VMEM scratch
    BP_acc,         # [K6P, KP] f32 VMEM scratch
    J0, J1, J2, J3,           # [K6P, BL] f32 VMEM scratch (sqrt-w J rows)
    RS,                       # [4 * KP? -> (KP, BL)] per-r reuse: [KP, BL]
    RS1, RS2, RS3,            # [KP, BL]
    *,
    K: int,
    K6P: int,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    point_damping = par_ref[6]
    lam = par_ref[7]
    zero = jnp.zeros((1, BL), jnp.float32)

    @pl.when(i == 0)
    def _():
        WW_acc[...] = jnp.zeros_like(WW_acc)
        HPP_acc[...] = jnp.zeros_like(HPP_acc)
        BP_acc[...] = jnp.zeros_like(BP_acc)

    Js = (J0, J1, J2, J3)
    RSs = (RS, RS1, RS2, RS3)
    Hll, bl = _accumulate_block(
        T_ref, par_ref, x_ref, obs_ref, w_ref,
        w0_ref, w1_ref, w2_ref, Js, RSs, K=K)

    # ---- damped 3x3 inverse per landmark (closed form, vector ops) -------
    d = lam + point_damping
    a00 = Hll[0][0] + d; a01 = Hll[0][1]; a02 = Hll[0][2]
    a11 = Hll[1][1] + d; a12 = Hll[1][2]
    a22 = Hll[2][2] + d
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    Hi = [[c00 * idet, c01 * idet, c02 * idet],
          [c01 * idet, c11 * idet, c12 * idet],
          [c02 * idet, c12 * idet, c22 * idet]]

    for a in range(3):
        for b in range(3):
            pl_ref[3 * a + b] = Hi[a][b][0]
        pl_ref[9 + a] = bl[a][0]
    for r in range(12, 16):
        pl_ref[r] = zero[0]

    # ---- MXU reductions ---------------------------------------------------
    W0 = w0_ref[...]
    W1 = w1_ref[...]
    W2 = w2_ref[...]
    C0 = W0 * Hi[0][0] + W1 * Hi[1][0] + W2 * Hi[2][0]
    C1 = W0 * Hi[0][1] + W1 * Hi[1][1] + W2 * Hi[2][1]
    C2 = W0 * Hi[0][2] + W1 * Hi[1][2] + W2 * Hi[2][2]
    WW_acc[...] += (jnp.dot(C0, W0.T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(C1, W1.T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(C2, W2.T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST))
    HPP_acc[...] += (
        jnp.dot(J0[...], J0[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J1[...], J1[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J2[...], J2[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J3[...], J3[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST))
    BP_acc[...] += (
        jnp.dot(J0[...], RS[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J1[...], RS1[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J2[...], RS2[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J3[...], RS3[...].T, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST))

    @pl.when(i == nb - 1)
    def _():
        WW_ref[...] = WW_acc[...]
        HPP_ref[...] = HPP_acc[...]
        BP_ref[...] = BP_acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_assemble(
    T_wc: jax.Array,        # [K,4,4] f32
    points_w: jax.Array,    # [L,3] f32
    obs_uv: jax.Array,      # [K,L,4] f32
    obs_w: jax.Array,       # [K,L] f32 (mask as float)
    lam: jax.Array,         # scalar f32 (traced)
    *,
    fx, fy, cx, cy, bq,      # traced or concrete scalars
    kernel_px2=10.0,
    point_damping=1e-6,
    interpret: bool = False,
):
    """Fused Schur assembly. Returns
    ``(S [K,6,K,6], rhs [K,6], Hll_inv [L,3,3], b_l [L,3], W [3,K6,L])``
    where ``S = H_pp - W Hll^-1 W^T`` (Levenberg damping of the pose
    blocks NOT included — the caller adds ``lam I``) and
    ``rhs = b_p - (W Hll^-1) b_l``."""
    K, L = obs_w.shape
    K6 = 6 * K
    K6P = -(-K6 // 128) * 128
    Lp = -(-L // BL) * BL
    nb = Lp // BL

    Xt = jnp.pad(points_w.T, ((0, 0), (0, Lp - L)))              # [3, Lp]
    obs_t = jnp.pad(obs_uv.transpose(0, 2, 1), ((0, 0), (0, 0), (0, Lp - L)))
    w_t = jnp.pad(obs_w.astype(jnp.float32), ((0, 0), (0, Lp - L)))
    T_flat = T_wc.reshape(K, 16)

    kern = functools.partial(_kernel, K=K, K6P=K6P)
    par = jnp.stack([
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        jnp.asarray(bq, jnp.float32),
        jnp.asarray(kernel_px2, jnp.float32),
        jnp.asarray(point_damping, jnp.float32),
        jnp.asarray(lam, jnp.float32),
    ])
    out_shape = [
        jax.ShapeDtypeStruct((K6P, K6P), jnp.float32),   # W Hinv W^T
        jax.ShapeDtypeStruct((K6P, K6P), jnp.float32),   # sum_r J J^T
        jax.ShapeDtypeStruct((K6P, KP), jnp.float32),    # sum_r J RS^T
        jax.ShapeDtypeStruct((16, Lp), jnp.float32),     # Hinv + b_l
        jax.ShapeDtypeStruct((K6P, Lp), jnp.float32),    # W plane 0
        jax.ShapeDtypeStruct((K6P, Lp), jnp.float32),    # W plane 1
        jax.ShapeDtypeStruct((K6P, Lp), jnp.float32),    # W plane 2
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # T_flat
            pl.BlockSpec(memory_space=pltpu.SMEM),               # lam
            pl.BlockSpec((3, BL), lambda i: (0, i)),             # Xt
            pl.BlockSpec((K, 4, BL), lambda i: (0, 0, i)),       # obs
            pl.BlockSpec((K, BL), lambda i: (0, i)),             # w
        ],
        out_specs=[
            pl.BlockSpec((K6P, K6P), lambda i: (0, 0)),
            pl.BlockSpec((K6P, K6P), lambda i: (0, 0)),
            pl.BlockSpec((K6P, KP), lambda i: (0, 0)),
            pl.BlockSpec((16, BL), lambda i: (0, i)),
            pl.BlockSpec((K6P, BL), lambda i: (0, i)),
            pl.BlockSpec((K6P, BL), lambda i: (0, i)),
            pl.BlockSpec((K6P, BL), lambda i: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((K6P, K6P), jnp.float32),
            pltpu.VMEM((K6P, K6P), jnp.float32),
            pltpu.VMEM((K6P, KP), jnp.float32),
            pltpu.VMEM((K6P, BL), jnp.float32),
            pltpu.VMEM((K6P, BL), jnp.float32),
            pltpu.VMEM((K6P, BL), jnp.float32),
            pltpu.VMEM((K6P, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
        ],
    )
    WW, HPP, BP, pl_out, w0, w1, w2 = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(T_flat, par, Xt, obs_t, w_t)

    ks = jnp.arange(K)
    H_pp = HPP[:K6, :K6].reshape(K, 6, K, 6)[ks, :, ks, :]       # [K,6,6]
    S = -WW[:K6, :K6].reshape(K, 6, K, 6)
    S = S.at[ks, :, ks, :].add(H_pp)
    b_p = BP[:K6, :K].reshape(K, 6, K)[ks, :, ks]                # [K,6]
    Hll_inv = pl_out[:9, :L].T.reshape(L, 3, 3)
    b_l = pl_out[9:12, :L].T
    W = jnp.stack([w0[:K6, :L], w1[:K6, :L], w2[:K6, :L]])
    # rhs = b_p - (W Hll^-1) b_l. HIGHEST precision: the l-contraction is
    # L-long and would otherwise run at bf16 MXU precision on TPU
    prec = jax.lax.Precision.HIGHEST
    C = jnp.einsum("bql,lbc->cql", W, Hll_inv, precision=prec)
    rhs = b_p - jnp.einsum("cql,lc->q", C, b_l, precision=prec).reshape(K, 6)
    return S, rhs, Hll_inv, b_l, W


# ---------------------------------------------------------------------------
# K-tiled variant: keyframe windows past SCHUR_KERNEL_MAX_K
# ---------------------------------------------------------------------------
#
# The single-grid kernel's VMEM working set grows with (6K)^2 (WW/HPP
# scratch) and 7 x [6K, BL] row matrices — K = 64 no longer fits alongside
# the pipeline's double buffering. The tiled variant adds a keyframe-tile
# grid dimension (KT = 32 keyframes per tile) and keeps only PER-TILE state
# on chip:
#
#   * H_pp diagonal blocks and b_p involve one keyframe each — accumulated
#     per tile in scratch, written at the last landmark block;
#   * H_ll / b_l sum over ALL keyframes — each tile emits its PARTIAL sums
#     (6 upper-triangle rows + 3 b_l rows per landmark), reduced in XLA;
#   * W Hll^-1 W^T couples keyframes ACROSS tiles — the W planes (already
#     HBM outputs) feed 3 [K6, L] x [L, K6] XLA matmuls instead (pure MXU
#     work; the C planes are needed for the rhs/backsub anyway).
#
# The Jacobian rows still never touch HBM; only the W planes (needed by the
# caller regardless) and the 9 partial-Hll rows per tile do.

KT = 32           # keyframes per tile (the proven single-grid budget)


def _tile_kernel(
    T_ref,          # [K, 16] f32 SMEM — ALL poses (indexed k0 + k)
    par_ref,        # [8] f32 SMEM — fx fy cx cy bq kernel_px2 damping lam
    x_ref,          # [3, BL] f32 — landmark block
    obs_ref,        # [KT, 4, BL] f32 — this tile's observations
    w_ref,          # [KT, BL] f32 — this tile's mask
    HPP_ref,        # [KT6P, KT6P] f32 out at (kt, 0)
    BP_ref,         # [KT6P, KP] f32 out at (kt, 0)
    hll_ref,        # [1, 16, BL] f32 out at (kt, 0, i) — rows 0-5 partial
                    #   Hll upper triangle, 6-8 partial b_l
    w0_ref, w1_ref, w2_ref,   # [KT6P, BL] f32 out at (kt, i)
    HPP_acc,        # [KT6P, KT6P] f32 VMEM scratch
    BP_acc,         # [KT6P, KP] f32 VMEM scratch
    J0, J1, J2, J3,           # [KT6P, BL] f32 VMEM scratch
    RS, RS1, RS2, RS3,        # [KP, BL] f32 VMEM scratch
    *,
    KT6P: int,
):
    kt = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        HPP_acc[...] = jnp.zeros_like(HPP_acc)
        BP_acc[...] = jnp.zeros_like(BP_acc)

    Js = (J0, J1, J2, J3)
    RSs = (RS, RS1, RS2, RS3)
    Hll, bl = _accumulate_block(
        T_ref, par_ref, x_ref, obs_ref, w_ref,
        w0_ref, w1_ref, w2_ref, Js, RSs, K=KT, k0=kt * KT)

    # partial per-landmark sums (upper triangle order 00 01 02 11 12 22)
    zero = jnp.zeros((BL,), jnp.float32)
    for r, (a, b) in enumerate(((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))):
        hll_ref[0, r] = Hll[a][b][0]
    for a in range(3):
        hll_ref[0, 6 + a] = bl[a][0]
    for r in range(9, 16):
        hll_ref[0, r] = zero

    HPP_acc[...] += (
        jnp.dot(J0[...], J0[...].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J1[...], J1[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J2[...], J2[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J3[...], J3[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))
    BP_acc[...] += (
        jnp.dot(J0[...], RS[...].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J1[...], RS1[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J2[...], RS2[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(J3[...], RS3[...].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))

    @pl.when(i == nb - 1)
    def _():
        HPP_ref[...] = HPP_acc[...]
        BP_ref[...] = BP_acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_assemble_tiled(
    T_wc: jax.Array,        # [K,4,4] f32, K a multiple of KT
    points_w: jax.Array,    # [L,3] f32
    obs_uv: jax.Array,      # [K,L,4] f32
    obs_w: jax.Array,       # [K,L] f32 (mask as float)
    lam: jax.Array,         # scalar f32 (traced)
    *,
    fx, fy, cx, cy, bq,
    kernel_px2=10.0,
    point_damping=1e-6,
    interpret: bool = False,
):
    """K-tiled fused Schur assembly for K > SCHUR_KERNEL_MAX_K. Same
    return contract as :func:`schur_assemble`."""
    K, L = obs_w.shape
    if K % KT != 0:
        raise ValueError(f"tiled Schur assembly needs K % {KT} == 0, got {K}")
    nk = K // KT
    K6 = 6 * K
    KT6 = 6 * KT
    KT6P = -(-KT6 // 128) * 128
    Lp = -(-L // BL) * BL
    nb = Lp // BL

    Xt = jnp.pad(points_w.T, ((0, 0), (0, Lp - L)))              # [3, Lp]
    obs_t = jnp.pad(obs_uv.transpose(0, 2, 1), ((0, 0), (0, 0), (0, Lp - L)))
    w_t = jnp.pad(obs_w.astype(jnp.float32), ((0, 0), (0, Lp - L)))
    T_flat = T_wc.reshape(K, 16)
    par = jnp.stack([
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        jnp.asarray(bq, jnp.float32),
        jnp.asarray(kernel_px2, jnp.float32),
        jnp.asarray(point_damping, jnp.float32),
        jnp.asarray(lam, jnp.float32),
    ])

    kern = functools.partial(_tile_kernel, KT6P=KT6P)
    out_shape = [
        jax.ShapeDtypeStruct((nk * KT6P, KT6P), jnp.float32),    # HPP tiles
        jax.ShapeDtypeStruct((nk * KT6P, KP), jnp.float32),      # BP tiles
        jax.ShapeDtypeStruct((nk, 16, Lp), jnp.float32),         # partial Hll
        jax.ShapeDtypeStruct((nk * KT6P, Lp), jnp.float32),      # W plane 0
        jax.ShapeDtypeStruct((nk * KT6P, Lp), jnp.float32),      # W plane 1
        jax.ShapeDtypeStruct((nk * KT6P, Lp), jnp.float32),      # W plane 2
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nk, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # T_flat
            pl.BlockSpec(memory_space=pltpu.SMEM),               # par
            pl.BlockSpec((3, BL), lambda kt, i: (0, i)),         # Xt
            pl.BlockSpec((KT, 4, BL), lambda kt, i: (kt, 0, i)),  # obs
            pl.BlockSpec((KT, BL), lambda kt, i: (kt, i)),       # w
        ],
        out_specs=[
            pl.BlockSpec((KT6P, KT6P), lambda kt, i: (kt, 0)),
            pl.BlockSpec((KT6P, KP), lambda kt, i: (kt, 0)),
            pl.BlockSpec((1, 16, BL), lambda kt, i: (kt, 0, i)),
            pl.BlockSpec((KT6P, BL), lambda kt, i: (kt, i)),
            pl.BlockSpec((KT6P, BL), lambda kt, i: (kt, i)),
            pl.BlockSpec((KT6P, BL), lambda kt, i: (kt, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((KT6P, KT6P), jnp.float32),
            pltpu.VMEM((KT6P, KP), jnp.float32),
            pltpu.VMEM((KT6P, BL), jnp.float32),
            pltpu.VMEM((KT6P, BL), jnp.float32),
            pltpu.VMEM((KT6P, BL), jnp.float32),
            pltpu.VMEM((KT6P, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
            pltpu.VMEM((KP, BL), jnp.float32),
        ],
    )
    HPPt, BPt, HLL, w0, w1, w2 = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        # the tile working set (scratch + double-buffered blocks) peaks at
        # ~19 MB — past XLA's conservative 16 MB scoped default but well
        # inside the v5e's 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(T_flat, par, Xt, obs_t, w_t)

    # ---- XLA reductions over the tile outputs ----------------------------
    # per-landmark totals + damped closed-form 3x3 inverse
    hs = jnp.sum(HLL, axis=0)[:, :L]                             # [16, L]
    d = jnp.asarray(lam, jnp.float32) + point_damping
    a00 = hs[0] + d; a01 = hs[1]; a02 = hs[2]
    a11 = hs[3] + d; a12 = hs[4]
    a22 = hs[5] + d
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    Hll_inv = jnp.stack([
        jnp.stack([c00 * idet, c01 * idet, c02 * idet], -1),
        jnp.stack([c01 * idet, c11 * idet, c12 * idet], -1),
        jnp.stack([c02 * idet, c12 * idet, c22 * idet], -1),
    ], -2)                                                        # [L,3,3]
    b_l = hs[6:9].T                                               # [L,3]

    def tile_rows(w):
        return w.reshape(nk, KT6P, Lp)[:, :KT6, :L].reshape(K6, L)

    W = jnp.stack([tile_rows(w0), tile_rows(w1), tile_rows(w2)])  # [3,K6,L]

    # H_pp diagonal blocks / b_p from the per-tile accumulators
    ks = jnp.arange(KT)
    Hpp_t = HPPt.reshape(nk, KT6P, KT6P)[:, :KT6, :KT6] \
        .reshape(nk, KT, 6, KT, 6)
    H_pp = Hpp_t[:, ks, :, ks, :].transpose(1, 0, 2, 3) \
        .reshape(K, 6, 6)                                         # [K,6,6]
    Bp_t = BPt.reshape(nk, KT6P, KP)[:, :KT6, :KT].reshape(nk, KT, 6, KT)
    b_p = Bp_t[:, ks, :, ks].transpose(1, 0, 2).reshape(K, 6)     # [K,6]

    # S = diag(H_pp) - W Hll^-1 W^T with the coupling product on the MXU.
    # HIGHEST precision throughout: the L-long contractions would otherwise
    # run as bf16 MXU passes with ~1e-3 relative error — enough to stall LM
    prec = jax.lax.Precision.HIGHEST
    C = jnp.einsum("bql,lbc->cql", W, Hll_inv, precision=prec)    # [3,K6,L]
    WW = jnp.einsum("cql,cpl->qp", C, W, precision=prec)          # [K6,K6]
    S = (-WW).reshape(K, 6, K, 6)
    kk = jnp.arange(K)
    S = S.at[kk, :, kk, :].add(H_pp)
    rhs = b_p - jnp.einsum("cql,lc->q", C, b_l, precision=prec).reshape(K, 6)
    return S, rhs, Hll_inv, b_l, W
