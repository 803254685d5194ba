"""Validate the Pallas kernels against their XLA oracles ON THIS BACKEND.

CI asserts kernel/oracle bit-identity in interpret mode (CPU); this tool
re-runs the same parity checks on whatever backend is live — run it on a
real TPU to certify the compiled Mosaic kernels, not just their
interpretation. Exits non-zero on any mismatch.

Usage: python -m svi_mapper_tpu.tools.validate_tpu_kernels [--size WxH]
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from svi_mapper_tpu.frontend.epipolar import fixed_band_params
    from svi_mapper_tpu.frontend.stereo import match_stereo
    from svi_mapper_tpu.frontend.tracking import window_scores
    from svi_mapper_tpu.ops import track_kernel as tk
    from svi_mapper_tpu.ops.hamming import hamming_packed, hamming_pallas

    size = "1248x376"
    for a in sys.argv[1:]:
        if a.startswith("--size"):
            size = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
    w, h = (int(x) for x in size.split("x"))
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    print(f"backend: {backend} ({'compiled Mosaic' if on_tpu else 'interpret'}) "
          f"field {w}x{h}")
    rng = np.random.default_rng(20)
    failures = 0

    # ---- tracking band-sweep kernel vs dense window oracle ---------------
    L = 1024
    dense = rng.integers(0, 2 ** 32, (h, w, 8), dtype=np.uint64).astype(np.uint32)
    uv = np.stack([rng.uniform(29, w - 30, L),
                   rng.uniform(29, h - 30, L)], 1).astype(np.float32)
    dlast = rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint64).astype(np.uint32)
    theta = rng.uniform(0, 2 * np.pi, L)
    band = tuple(jnp.asarray(a) for a in (
        np.round(np.cos(theta) * 256).astype(np.int32),
        np.round(np.sin(theta) * 256).astype(np.int32),
        rng.integers(-600, 600, L).astype(np.int32),
        rng.integers(8, 29, L).astype(np.int32),
        rng.integers(8, 21, L).astype(np.int32),
    ))
    for i in range(0, L, 2):   # plant on-band matches for half the landmarks
        nx, ny, c0 = (float(band[0][i]) / 256, float(band[1][i]) / 256,
                      float(band[2][i]) / 256)
        s = float(rng.uniform(-10, 10))
        dx = int(np.clip(round(-s * ny - c0 * nx), -28, 28))
        dy = int(np.clip(round(s * nx - c0 * ny), -20, 20))
        d = dlast[i].copy(); d[0] ^= np.uint32(0b1111)
        dense[int(round(uv[i, 1])) + dy, int(round(uv[i, 0])) + dx] = d
    args = (jnp.asarray(dense), jnp.asarray(uv), jnp.asarray(dlast),
            jnp.asarray(dlast), band)
    out_k = jax.device_get(tk.track_scores(
        *args, cutoff_s1=25, cutoff_s2=50, cutoff_ref=50,
        interpret=not on_tpu))
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        out_x = jax.device_get(jax.jit(lambda *a: window_scores(
            *a, cutoff_s1=25, cutoff_s2=50, cutoff_ref=50))(
            *jax.device_put(args, cpus[0])))
    acc = out_x[0] < (1 << 20)
    names = ("score", "x", "y", "dist")
    for nm, a, b in zip(names, out_k, out_x):
        m = acc if nm != "score" else np.ones_like(acc)
        bad = int((np.asarray(a)[m] != np.asarray(b)[m]).sum())
        status = "OK " if bad == 0 else "FAIL"
        failures += bad > 0
        print(f"  track_kernel {nm:6s} {status} ({acc.sum()} accepted, "
              f"{bad} mismatches)")

    # ---- stereo scanline kernel vs XLA row-span path ----------------------
    K = 512
    uv_l = np.stack([rng.uniform(130, w - 30, K),
                     rng.uniform(29, h - 30, K)], 1).astype(np.float32)
    dq = np.stack([dense[int(round(v)), int(round(u)) - int(rng.integers(2, 60))]
                   for (u, v) in uv_l])
    from svi_mapper_tpu.geometry.camera import StereoCamera  # noqa: F401
    from svi_mapper_tpu.io.synthetic import default_camera
    cam = default_camera(w, h)
    valid = jnp.ones((K,), bool)
    sk = jax.device_get(match_stereo(
        jnp.asarray(dense), jnp.asarray(uv_l), jnp.asarray(dq), valid, cam,
        force_kernel=True))
    with jax.default_device(cpus[0]):
        sx = jax.device_get(match_stereo(
            *jax.device_put((jnp.asarray(dense), jnp.asarray(uv_l),
                             jnp.asarray(dq), valid), cpus[0]), cam,
            force_kernel=False))
    both = np.asarray(sk.ok) & np.asarray(sx.ok)
    bad = int((np.abs(np.asarray(sk.disparity)[both]
                      - np.asarray(sx.disparity)[both]) > 1e-4).sum())
    ok_agree = int((np.asarray(sk.ok) != np.asarray(sx.ok)).sum())
    status = "OK " if bad == 0 and ok_agree == 0 else "FAIL"
    failures += (bad > 0 or ok_agree > 0)
    print(f"  stereo_kernel       {status} ({both.sum()} matched, "
          f"{bad} disparity mismatches, {ok_agree} ok-flag diffs)")

    # ---- fused BA Schur assembly vs the XLA bundle adjuster ---------------
    from svi_mapper_tpu.solvers import ba as ba_mod
    from svi_mapper_tpu.io.synthetic import default_camera as _dc
    camb = _dc(640, 480)
    fxb = float(camb.left.fx); cxb = float(camb.left.cx)
    cyb = float(camb.left.cy); bqb = float(camb.right.P[0, 3])
    Kb, Lb = 16, 2048
    Xb = rng.uniform([-10, -3, 4], [10, 3, 40], (Lb, 3)).astype(np.float32)
    Tb = np.tile(np.eye(4, dtype=np.float32), (Kb, 1, 1))
    Tb[:, 2, 3] = -np.arange(Kb) * 0.8
    pcb = np.einsum("kij,lj->kli", Tb[:, :3, :3], Xb) + Tb[:, None, :3, 3]
    zb = pcb[..., 2]
    obsb = np.stack([fxb*pcb[...,0]/zb+cxb, fxb*pcb[...,1]/zb+cyb,
                     (fxb*pcb[...,0]+bqb)/zb+cxb, fxb*pcb[...,1]/zb+cyb], -1)
    obsb += rng.normal(0, 0.5, obsb.shape)
    maskb = zb > 1.0
    fixb = np.zeros(Kb, bool); fixb[0] = True
    argsb = (jnp.asarray(Tb), jnp.asarray(Xb + 0.1),
             jnp.asarray(obsb, jnp.float32), jnp.asarray(maskb), camb,
             jnp.asarray(fixb))
    rx = ba_mod.bundle_adjust(*argsb, max_iterations=8,
                              min_rel_improvement=0.0, use_schur_kernel=False)
    rk = ba_mod.bundle_adjust(*argsb, max_iterations=8,
                              min_rel_improvement=0.0,
                              use_schur_kernel=on_tpu)
    cxla, ck = float(rx.chi2_final), float(rk.chi2_final)
    dT = float(np.abs(np.asarray(rk.T_wc) - np.asarray(rx.T_wc)).max())
    ok_ba = abs(ck - cxla) < 0.02 * cxla + 1.0 and dT < 5e-3
    failures += not ok_ba
    print(f"  ba_schur_kernel     {'OK ' if ok_ba else 'FAIL'} "
          f"(chi2 {cxla:.1f} vs {ck:.1f}, max pose delta {dT:.1e})")

    # ---- Pallas Hamming tile kernel vs packed popcount --------------------
    a = rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2 ** 32, (384, 8), dtype=np.uint64).astype(np.uint32)
    dk = np.asarray(hamming_pallas(jnp.asarray(a), jnp.asarray(b),
                                   interpret=not on_tpu))
    dx = np.asarray(hamming_packed(jnp.asarray(a), jnp.asarray(b)))
    bad = int((dk != dx).sum())
    status = "OK " if bad == 0 else "FAIL"
    failures += bad > 0
    print(f"  hamming_pallas      {status} ({bad} mismatches)")

    print("ALL KERNELS BIT-IDENTICAL" if failures == 0
          else f"{failures} KERNEL(S) FAILED")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
