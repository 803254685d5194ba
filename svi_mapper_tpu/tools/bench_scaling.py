"""Scaling-efficiency benchmark — BASELINE.json configs 4-5 measurement
harness: distributed Schur-complement BA throughput vs mesh size.

Runs the same BA problem on 1, 2, 4, ... device meshes and reports
iterations/s and parallel efficiency. On a CPU host set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to validate the sharding (numbers are then about correctness, not speed).

Usage: python -m svi_mapper_tpu.tools.bench_scaling [--points 8192] [--kfs 16]
Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--kfs", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (pair with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu.io.synthetic import default_camera
    from svi_mapper_tpu.parallel.mesh import make_map_mesh
    from svi_mapper_tpu.parallel.sharded_ba import bundle_adjust_sharded

    n_dev_all = len(jax.devices())
    cam = default_camera(width=1241, height=376)
    rng = np.random.default_rng(0)
    K, L = args.kfs, args.points

    # synthetic BA problem: points in front of a forward-moving camera chain
    X = np.stack([rng.uniform(-20, 20, L), rng.uniform(-5, 5, L),
                  rng.uniform(5, 60, L)], -1).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 2, 3] = -0.5 * np.arange(K)          # camera advances in z
    obs = np.zeros((K, L, 4), np.float32)
    mask = np.zeros((K, L), bool)
    for k in range(K):
        p_cam = X @ T[k, :3, :3].T + T[k, :3, 3]
        uvl, uvr = (np.asarray(u) for u in cam.project_stereo(jnp.asarray(p_cam)))
        vis = (p_cam[:, 2] > 1.0) & (uvl[:, 0] > 0) & (uvl[:, 0] < cam.width)
        obs[k] = np.concatenate([uvl, uvr], -1) + rng.normal(0, 0.3, (L, 4))
        mask[k] = vis
    X0 = (X + rng.normal(0, 0.3, X.shape)).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True

    base_dt = None
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_all]
    for n in sizes:
        mesh = make_map_mesh(n)
        run = lambda: bundle_adjust_sharded(
            mesh, jnp.asarray(T), jnp.asarray(X0), jnp.asarray(obs),
            jnp.asarray(mask), cam, jnp.asarray(fix))
        res = run()                            # compile + warm
        jax.block_until_ready(res.T_wc)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = run()
        jax.block_until_ready(res.T_wc)
        dt = (time.perf_counter() - t0) / args.reps
        if base_dt is None:
            base_dt = dt
        eff = base_dt / (dt * n)
        print(json.dumps({
            "metric": "sharded_ba_solves_per_sec",
            "devices": n,
            "value": round(1.0 / dt, 3),
            "unit": "solves/s",
            "efficiency_vs_1dev": round(eff, 3),
            "chi2_final": float(res.chi2_final),
        }))


if __name__ == "__main__":
    main()
