"""Descriptor-matching benchmark over saved keyframe clouds — the
``match_clouds`` / ``test_cloud_matching`` runnables
(match_clouds.cpp, test_cloud_matching.cpp:17-180).

Loads ``.npz`` keyframe clouds (io.cloud format), runs all-pairs pool
matching + ICP closure validation offline, and reports match counts and
timing — exercising the loop-closure subsystem without running SLAM.

Usage: python -m svi_mapper_tpu.tools.match_clouds CLOUD1.npz CLOUD2.npz ...
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("clouds", nargs="+")
    ap.add_argument("--cutoff", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu.io.cloud import load_cloud
    from svi_mapper_tpu.mapping.closure import match_pools
    from svi_mapper_tpu.solvers.icp import align_clouds

    clouds = [load_cloud(p) for p in args.clouds]
    print(f"loaded {len(clouds)} clouds: " +
          ", ".join(f"kf{c.keyframe_id}({len(c.uids)} pts)" for c in clouds))

    P = max(len(c.uids) for c in clouds)

    def pad_pool(c):
        n = len(c.uids)
        d = np.zeros((P, 8), np.uint32); d[:n] = c.descriptors
        p = np.zeros((P, 3), np.float32); p[:n] = c.points_cam
        v = np.zeros(P, bool); v[:n] = True
        return jnp.asarray(d), jnp.asarray(p), jnp.asarray(v)

    pools = [pad_pool(c) for c in clouds]
    t0 = time.perf_counter()
    for i in range(len(clouds)):
        for j in range(i + 1, len(clouds)):
            dq, pq, vq = pools[i]
            dr, pr, vr = pools[j]
            a, b, ok, _ = match_pools(dq, pq, vq, dr, pr, vr, cutoff=args.cutoff)
            n_matches = int(jnp.sum(ok))
            line = f"kf{clouds[i].keyframe_id} <-> kf{clouds[j].keyframe_id}: {n_matches} matches"
            if n_matches >= 25:
                res = align_clouds(a, b, ok)
                line += (f"  ICP ok={bool(res.ok)} inliers={int(res.inliers)} "
                         f"err={float(res.avg_error):.3f}")
            print(line)
    print(f"total matching+ICP time: {time.perf_counter() - t0:.3f} s")


if __name__ == "__main__":
    main()
