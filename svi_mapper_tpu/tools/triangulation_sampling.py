"""Rectified-geometry invariant self-check — the ``triangulation_sampling``
runnable (triangulation_sampling.cpp:49-80): verifies on random scene points
that the rectified stereo model satisfies its invariants and that
depth-from-disparity round-trips.

Checks (the reference's asserts, Types.h:48-51 / CTriangulator.cpp:24-31):
  * v_L == v_R (rectified rows align)
  * u_L > u_R (positive disparity)
  * z = -P_R(0,3) / (u_L - u_R) recovers the true depth
  * triangulate(project(p)) == p

Usage: python -m svi_mapper_tpu.tools.triangulation_sampling [--samples N]
Exits non-zero on any violated invariant.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--calib", nargs=2, metavar=("LEFT", "RIGHT"), default=None,
                    help="hardware_parameters-style calibration files (optional)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    if args.calib:
        from svi_mapper_tpu.config import load_stereo_camera

        cam = load_stereo_camera(args.calib[0], args.calib[1])
    else:
        from svi_mapper_tpu.io.synthetic import default_camera

        cam = default_camera(width=1241, height=376)

    rng = np.random.default_rng(0)
    n = args.samples
    # sample camera-frame points across the depth range
    z = rng.uniform(1.0, 80.0, n)
    u = rng.uniform(40, cam.width - 40, n)
    v = rng.uniform(40, cam.height - 40, n)
    fx = float(cam.left.P[0, 0]); fy = float(cam.left.P[1, 1])
    cx = float(cam.left.P[0, 2]); cy = float(cam.left.P[1, 2])
    p = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1).astype(np.float32)
    pj = jnp.asarray(p)

    uv_l, uv_r = cam.project_stereo(pj)
    uv_l, uv_r = np.asarray(uv_l), np.asarray(uv_r)

    fails = 0
    row_err = np.abs(uv_l[:, 1] - uv_r[:, 1]).max()
    if row_err > 1e-3:
        print(f"FAIL rectified-row invariant: max |v_L - v_R| = {row_err}")
        fails += 1
    disparity = uv_l[:, 0] - uv_r[:, 0]
    if (disparity <= 0).any():
        print(f"FAIL disparity positivity: min = {disparity.min()}")
        fails += 1
    z_rec = np.asarray(cam.depth_from_disparity(jnp.asarray(disparity)))
    z_err = np.abs(z_rec - z).max()
    if z_err > 1e-1:
        print(f"FAIL depth-from-disparity: max |dz| = {z_err}")
        fails += 1
    p_rec = np.asarray(cam.triangulate(jnp.asarray(uv_l), jnp.asarray(uv_r)))
    tri_err = np.abs(p_rec - p).max()
    if tri_err > 1e-1:
        print(f"FAIL triangulation round-trip: max err = {tri_err}")
        fails += 1

    print(f"{n} samples: row_err={row_err:.2e} min_disparity="
          f"{disparity.min():.4f} depth_err={z_err:.2e} tri_err={tri_err:.2e}")
    if fails:
        raise SystemExit(f"{fails} invariant(s) violated")
    print("all rectified-geometry invariants hold")


if __name__ == "__main__":
    main()
